"""Point and broadcast task analogs of the reference's RPC surface.

* ``run_on_key`` ≈ MR_RunOnKey (``/root/reference/src/mr.c:2120-2173``):
  run a named task against the rows owning one key. Spark is
  scan-oriented, so this compiles to a keyed filter that Catalyst turns
  into partition/file pruning + parquet predicate pushdown — the same
  "only touch the owning shard" effect, at scan latency rather than RPC
  latency (the latency-class difference is documented in SURVEY §7.4).

* ``run_on_all_shards`` ≈ MR_RunOnAllShards
  (``/root/reference/src/mr.c:2263-2311``): run a task once per shard
  and gather the per-shard results at the initiator — here one result
  row per partition via ``mapInPandas``, gathered by ``collect``.
"""

from __future__ import annotations

from typing import Any, Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .builder import run_with_job_group_timeout
from .registry import GLOBAL_REGISTRY, Registry, StepType
from .smalldf import local_df

#: Error string raised when a per-call RPC deadline passes; matches the
#: reference's "Remote task timeout" (/root/reference/src/mr.c:2085-2099).
REMOTE_TASK_TIMEOUT_ERROR = "Remote task timeout"


def _maybe_timed(result: DataFrame, timeout_ms: int | None) -> DataFrame:
    """With a deadline set, the call becomes eager (the reference's RPC
    is always eager — the timer spans the remote call): run under a
    cancellable job group and re-wrap the rows so the caller still gets
    a DataFrame."""
    if timeout_ms is None:
        return result
    rows = run_with_job_group_timeout(
        result.sparkSession, result.collect, timeout_ms, REMOTE_TASK_TIMEOUT_ERROR
    )
    return local_df(result.sparkSession, rows, result.schema)


def run_on_key(
    df: DataFrame,
    key_col: str,
    key: Any,
    task: str | Callable[[DataFrame, Any], DataFrame] | None = None,
    args: Any = None,
    registry: Registry | None = None,
    timeout_ms: int | None = None,
) -> DataFrame:
    """Point lookup: rows of ``df`` where ``key_col == key``, optionally
    post-processed by a named remote task. The reference short-circuits
    to a local call when the slot is local
    (``/root/reference/src/mr.c:2133-2136``); Catalyst's pushdown +
    pruning is the equivalent short-circuit here. ``timeout_ms`` mirrors
    MR_RunOnKey's per-call deadline (``/root/reference/src/mr.c:2085-2099``).
    """
    hit = df.filter(F.col(key_col) == F.lit(key))
    if task is None:
        return _maybe_timed(hit, timeout_ms)
    fn = (registry or GLOBAL_REGISTRY).get(StepType.REMOTE_TASK, task).fn if isinstance(task, str) else task
    out = fn(hit, args) if args is not None else fn(hit)
    return _maybe_timed(out, timeout_ms)


def run_on_all_shards(
    df: DataFrame,
    task: str | Callable[[pd.DataFrame, Any], dict],
    out_schema: str,
    args: Any = None,
    registry: Registry | None = None,
    timeout_ms: int | None = None,
) -> DataFrame:
    """One task invocation per partition ("shard"), each emitting one
    result row; the caller gathers with ``.collect()`` like the
    reference's initiator barrier (``/root/reference/src/mr.c:1904-1949``).
    ``timeout_ms`` bounds the whole fan-out+gather, as MR_RunOnAllShards'
    deadline does (``/root/reference/src/mr.c:2263-2311``).

    Example parity target: RemoteTaskDBSize — per-shard dbsize summed at
    the initiator (``/root/reference/tests/mr_test_module/src/lib.rs:478-505``)
    ≡ ``run_on_all_shards(df, dbsize, "n bigint")`` then sum.
    """
    fn = (registry or GLOBAL_REGISTRY).get(StepType.REMOTE_TASK, task).fn if isinstance(task, str) else task

    def per_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        frames = [b for b in batches]
        part = pd.concat(frames) if frames else pd.DataFrame()
        row = fn(part, args) if args is not None else fn(part)
        if row is not None:
            yield pd.DataFrame([row])

    return _maybe_timed(df.mapInPandas(per_partition, schema=out_schema), timeout_ms)


def internal_command(
    df: DataFrame,
    commands: list[str],
    reply_parser: Callable[[str, Any], dict] | None = None,
    out_schema: str = "command string, reply string",
) -> DataFrame:
    """Analog of the reference's internal-commands execution
    (``/root/reference/src/mr.c:1160-1220``): a pipeline consisting
    only of named commands, fanned out to every shard, each reply
    parsed into a record on the initiator; per-element errors become
    error records (``/root/reference/src/mr.c:1203-1214``).

    Here a "shard" is a partition and a command is a named admin
    operation evaluated against the partition's rows. One result row
    per (partition, command); a ``reply_parser`` turns the raw reply
    into the record shape, mirroring InternalCommandReplyParser
    (``/root/reference/src/mr.h:212-214``).
    """
    known = {
        "DBSIZE": lambda part: str(len(part)),
        "PING": lambda part: "PONG",
        "MEMORY": lambda part: str(int(part.memory_usage(deep=True).sum()) if len(part) else 0),
    }

    def per_partition(batches) -> "Iterator[pd.DataFrame]":
        frames = [b for b in batches]
        part = pd.concat(frames) if frames else pd.DataFrame()
        rows = []
        for cmd in commands:
            try:
                raw = known[cmd.upper()](part)
                rows.append(
                    reply_parser(cmd, raw) if reply_parser else {"command": cmd, "reply": raw}
                )
            except Exception as e:  # per-element error record
                rows.append({"command": cmd, "reply": f"ERR {e}"})
        yield pd.DataFrame(rows)

    return df.mapInPandas(per_partition, schema=out_schema)


def dbsize(part: pd.DataFrame) -> dict:
    """Per-shard record count (parity with RemoteTaskDBSize)."""
    return {"n": int(len(part))}


GLOBAL_REGISTRY_TASKS_INITIALIZED = False


def register_builtin_tasks(registry: Registry | None = None) -> None:
    from .registry import StepImpl

    reg = registry or GLOBAL_REGISTRY
    reg.register(StepImpl("dbsize", StepType.REMOTE_TASK, dbsize, relational=False))
