"""Custom stateful streaming operators via ``applyInPandasWithState``.

This is the streaming analog of LibMR's accumulate step
(``/root/reference/src/mr.c:787-810``): a per-key fold whose state
lives across micro-batches instead of across a batch pull. State is
partitioned by key (Spark shuffles each micro-batch to the state
owner), and evicted by timeout — the same watermark discipline as the
windowed operators.
"""

from __future__ import annotations

from typing import Any, Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def running_accumulator(
    sdf: DataFrame,
    key_cols: list[str],
    fold: Callable[[Any, pd.DataFrame], Any],
    zero: Any,
    state_schema: str,
    out_schema: str,
    emit: Callable[[tuple, Any], dict],
) -> DataFrame:
    """Streaming per-key fold: ``state = fold(state, batch)`` per
    micro-batch, emitting ``emit(key, state)`` after each update.

    fold receives the key's rows of the current micro-batch as one
    pandas DataFrame (Arrow-batched — never row-at-a-time Python).
    """

    def step(key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        acc = state.get[0] if state.exists else zero
        for pdf in pdfs:
            acc = fold(acc, pdf)
        state.update((acc,))
        row = emit(key, acc)
        # emit may return one dict (one row) or a list of dicts
        # (multi-row update, e.g. one row per map-state entry)
        yield pd.DataFrame(row if isinstance(row, list) else [row])

    return sdf.groupBy(*key_cols).applyInPandasWithState(
        step,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def sessionizer(
    sdf: DataFrame,
    key_cols: list[str],
    ts_col: str,
    gap_seconds: float,
    out_schema: str = "user_id bigint, n_sessions bigint, n_events bigint",
) -> DataFrame:
    """Stateful sessionization: counts sessions per key across
    micro-batches using a 'last event time' carried in state — the
    streaming twin of the batch ``sessionize_events`` query, kept
    behaviorally identical so batch output is its oracle."""

    def step(key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        if state.exists:
            last_ts, n_sessions, n_events = state.get
        else:
            last_ts, n_sessions, n_events = None, 0, 0
        for pdf in pdfs:
            for t in sorted(pd.to_datetime(pdf[ts_col]).astype("int64") // 1_000_000):
                if last_ts is None or t - last_ts > gap_seconds * 1000:
                    n_sessions += 1
                n_events += 1
                last_ts = int(t)
        state.update((last_ts, n_sessions, n_events))
        yield pd.DataFrame([{"user_id": key[0], "n_sessions": n_sessions, "n_events": n_events}])

    return sdf.groupBy(*key_cols).applyInPandasWithState(
        step,
        outputStructType=out_schema,
        stateStructType="last_ts bigint, n_sessions bigint, n_events bigint",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def user_stats_tws(sdf, value_col: str = "value") -> DataFrame:
    """Per-key running (count, max) via ``transformWithStateInPandas`` —
    Spark 4's successor to applyInPandasWithState: typed state handles
    (value/list/map state), timers, and TTL, backed by the RocksDB
    state store.

    ENVIRONMENT GATE: the transformWithState Python worker speaks a
    protobuf-based state-server protocol; on hosts with a broken or
    absent ``google.protobuf`` install the query fails at stream start with
    STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE. The operator is
    therefore exercised by a skip-gated test
    (tests/test_streaming.py::test_transform_with_state_user_stats)
    rather than the oracle-gated query surface; the
    applyInPandasWithState sessionizer above is the always-available
    stateful path. ``sdf`` is a GroupedData (``stream.groupBy(key)``);
    set the RocksDB state-store provider before starting the query.
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class UserStats(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("stats", "n bigint, vmax double")

        def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
            n, vmax = 0, None
            for pdf in rows:
                n += len(pdf)
                m = pdf[value_col].max()
                vmax = m if vmax is None else max(vmax, m)
            if self._state.exists():
                pn, pv = self._state.get()
                n += pn
                vmax = pv if vmax is None else max(vmax, pv)
            self._state.update((n, float(vmax)))
            yield pd.DataFrame([{"user_id": key[0], "n": n, "vmax": float(vmax)}])

        def close(self) -> None:
            pass

    return sdf.transformWithStateInPandas(
        UserStats(),
        outputStructType="user_id bigint, n bigint, vmax double",
        outputMode="Update",
        timeMode="None",
    )


def event_profile_tws(
    sdf, type_col: str = "event_type", value_col: str = "value"
) -> DataFrame:
    """Per-user event-type PROFILE via ``transformWithStateInPandas``
    exercising the COMPOSITE typed-state handles the value-state gate
    (:func:`user_stats_tws`) does not touch:

    * ``MapState`` (event_type → running count) — per-type counters
      updated in place, read back with ``iterator()`` at emit time;
    * ``ListState`` (the user's observed values) — appended per batch
      with ``appendList``, folded with order-free statistics (len /
      max) so the emitted row is exact regardless of replay order.

    Emits, per user per batch, one UPDATE row per event type seen so
    far: ``(user_id, event_type, n_type, n_total, vmax)``.  All three
    statistics are monotone (counters and a max), so the FINAL state
    per (user, type) is the batch-split-invariant per-key maximum —
    the same serving contract as the value-state gate.  Same
    environment gate as :func:`user_stats_tws` (protobuf worker
    runtime; RocksDB provider).
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class Profile(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._counts = handle.getMapState("counts", "t string", "n bigint")
            self._vals = handle.getListState("vals", "v double")

        def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
            frames = [pdf for pdf in rows]
            batch = (
                pd.concat(frames)
                if frames
                else pd.DataFrame(columns=[type_col, value_col])
            )
            for t, n in batch.groupby(type_col).size().items():
                cur = (
                    self._counts.getValue((t,))[0]
                    if self._counts.containsKey((t,))
                    else 0
                )
                self._counts.updateValue((t,), (int(cur) + int(n),))
            if len(batch):
                self._vals.appendList(
                    [(float(v),) for v in batch[value_col].tolist()]
                )
            vals = [v[0] for v in self._vals.get()]
            n_total, vmax = len(vals), max(vals)
            out = [
                {
                    "user_id": key[0],
                    "event_type": t[0],
                    "n_type": int(n[0]),
                    "n_total": n_total,
                    "vmax": float(vmax),
                }
                for t, n in self._counts.iterator()
            ]
            yield pd.DataFrame(out)

        def close(self) -> None:
            pass

    return sdf.transformWithStateInPandas(
        Profile(),
        outputStructType=(
            "user_id bigint, event_type string, n_type bigint, "
            "n_total bigint, vmax double"
        ),
        outputMode="Update",
        timeMode="None",
    )


def timer_heartbeat_tws(sdf) -> DataFrame:
    """``transformWithStateInPandas`` TIMER surface — the last typed-
    state API (``registerTimer`` / ``listTimers`` / ``deleteTimer`` /
    ``handleExpiredTimer``) left unexercised by the value-state and
    composite-state processors: per-user running count with an EVENT-
    TIME timer re-armed every batch (one live timer per key — existing
    timers are swept via ``listTimers`` + ``deleteTimer`` before
    re-registering; expiry = current watermark + 1ms, so the timer
    fires as soon as the NEXT batch advances the watermark), whose
    expiry emits a 'timer' snapshot row alongside the per-batch 'live'
    rows.  ``sdf`` must carry a watermark (``withWatermark``) for
    ``timeMode='EventTime'``.

    Event-time (not processing-time) timers on purpose: watermark
    advance is data-driven, so an availableNow drain terminates and
    the firing schedule is replay-stable — a processing-time short
    fuse under availableNow re-batches on the wall clock instead of
    the data (unbounded empty micro-batches). Timer-channel CONTENT is
    still registration-order-dependent across keys, so this operator
    is pytest-pinned (timers fired, snapshots bounded, live channel
    exact) rather than oracle-gated. Production use of the same shape:
    state GC / session-timeout emission, where the callback clears
    state instead of snapshotting it. Same environment gate as
    :func:`user_stats_tws`.
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class Heartbeat(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._n = handle.getValueState("n", "n bigint")
            self._handle = handle

        def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
            n = sum(len(pdf) for pdf in rows)
            if self._n.exists():
                n += self._n.get()[0]
            self._n.update((n,))
            for t in self._handle.listTimers():
                self._handle.deleteTimer(t)
            self._handle.registerTimer(
                timerValues.getCurrentWatermarkInMs() + 1
            )
            yield pd.DataFrame(
                [{"user_id": key[0], "kind": "live", "n": int(n)}]
            )

        def handleExpiredTimer(self, key, timerValues, expiredTimerInfo) -> Iterator[pd.DataFrame]:
            n = self._n.get()[0] if self._n.exists() else 0
            yield pd.DataFrame(
                [{"user_id": key[0], "kind": "timer", "n": int(n)}]
            )

        def close(self) -> None:
            pass

    return sdf.transformWithStateInPandas(
        Heartbeat(),
        outputStructType="user_id bigint, kind string, n bigint",
        outputMode="Update",
        timeMode="EventTime",
    )


def rolling_extremes(
    sdf: DataFrame,
    key_cols: list[str],
    ts_col: str,
    order_col: str,
    value_col: str,
    window: int = 100,
    min_n: int = 30,
    out_schema: str = "event_id bigint, event_type string, value double, kind string",
) -> DataFrame:
    """Trailing-window extreme detection with per-key carried state: an
    event is flagged 'high'/'low' when its value exceeds the max / min
    of the previous ``window`` events of its key (after a ``min_n``
    warm-up). This is the chunked-carry production swap documented on
    the batch ``rolling_zscore_events`` query: the per-key state IS the
    trailing-window summary carried across micro-batch (= time-chunk)
    boundaries, so no partition ever holds a key's whole history. The
    comparisons are exact (min/max, no float accumulation), so the
    batch window-frame query is a bit-exact oracle.

    Ordering contract: rows are folded in (ts, order_col) order WITHIN
    each micro-batch; cross-batch order is the file replay order. A
    production deployment pairs this with a watermark + sorted buffer
    per batch (same contract as the sessionizer above).
    """

    def step(key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        vals: list[float] = list(state.get[0]) if state.exists else []
        chunks = [pdf for pdf in pdfs if len(pdf)]
        out: list[tuple] = []
        if chunks:
            rows = pd.concat(chunks, ignore_index=True).sort_values([ts_col, order_col])
            for r in rows.itertuples(index=False):
                v = float(getattr(r, value_col))
                if len(vals) >= min_n:
                    if v > max(vals):
                        out.append((getattr(r, order_col), key[0], v, "high"))
                    elif v < min(vals):
                        out.append((getattr(r, order_col), key[0], v, "low"))
                vals.append(v)
                if len(vals) > window:
                    vals = vals[-window:]
        state.update((vals,))
        if out:
            yield pd.DataFrame(out, columns=["event_id", "event_type", "value", "kind"])

    return sdf.groupBy(*key_cols).applyInPandasWithState(
        step,
        outputStructType=out_schema,
        stateStructType="values array<double>",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def ab_pattern_match(
    sdf: DataFrame,
    key_cols: list[str],
    ts_col: str,
    order_col: str,
    type_col: str,
    a_type: str,
    b_type: str,
    within_sec: int,
    out_schema: str = "user_id bigint, event_id bigint, lag_sec bigint",
) -> DataFrame:
    """Streaming A-then-B pattern detection (the CEP primitive): emit a
    row for every ``b_type`` event preceded by an ``a_type`` event of
    the same key STRICTLY earlier and at most ``within_sec`` before.
    Per-key state is a single long — the latest A timestamp in
    microseconds — so state size is O(keys), never O(events): the
    100 TB-stream property; a buffered-join formulation keeps a window
    of raw events per key and dies on hot keys.

    Strict inequality is the cross-engine tie contract: an A sharing
    B's exact timestamp never matches, whatever order the micro-batch
    replay delivers the tie in (rows fold in (ts, order_col) order
    within a batch, same contract as rolling_extremes) — and a same-ts
    A must also not HIDE an earlier in-window A from a same-ts B, so
    within-timestamp A updates are buffered until the clock advances.
    ``lag_sec`` is floor-of-seconds arithmetic on both engines. Output
    rows are ``(*key_cols, order_col, lag_sec)`` in ``out_schema``'s
    column order.
    """

    out_cols = [f.strip().split()[0] for f in out_schema.split(",")]

    def step(key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        # last_a = latest A STRICTLY BEFORE the row being processed;
        # an A sharing the current row's timestamp is held in pend_a
        # until the clock advances, so a same-ts A can never clobber an
        # earlier in-window A out from under a same-ts B (B@t must
        # match the latest A with ts < t, whatever the within-ts
        # processing order). The merged value is committed to state:
        # a next-batch B at the same ts still fails the strict 0 < diff.
        last_a: int = int(state.get[0]) if state.exists else -1
        pend_ts: int = -1
        pend_a: int = -1
        chunks = [pdf for pdf in pdfs if len(pdf)]
        out: list[tuple] = []
        if chunks:
            rows = pd.concat(chunks, ignore_index=True).sort_values([ts_col, order_col])
            for r in rows.itertuples(index=False):
                t_us = int(getattr(r, ts_col).value // 1000)  # pandas ns -> us
                if pend_ts >= 0 and t_us > pend_ts:
                    last_a = max(last_a, pend_a)
                    pend_ts = pend_a = -1
                et = getattr(r, type_col)
                if et == b_type:
                    if last_a >= 0 and 0 < t_us - last_a <= within_sec * 1_000_000:
                        out.append(
                            (
                                *key,
                                int(getattr(r, order_col)),
                                t_us // 1_000_000 - last_a // 1_000_000,
                            )
                        )
                if et == a_type:
                    pend_ts = t_us
                    pend_a = max(pend_a, t_us)
        state.update((max(last_a, pend_a),))
        if out:
            yield pd.DataFrame(out, columns=out_cols)

    return sdf.groupBy(*key_cols).applyInPandasWithState(
        step,
        outputStructType=out_schema,
        stateStructType="last_a long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
