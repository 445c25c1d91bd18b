"""ExecutionBuilder — LibMR's pipeline programming model compiled to
Spark DataFrames.

Reference model: a client composes named steps
``reader → map/filter/accumulate → reshuffle/collect`` into an
execution (builder API ``/root/reference/src/mr.h:116-145``,
``/root/reference/src/mr.c:336-450``; typed Rust front-end
``/root/reference/rust_api/libmr/execution_builder.rs:38-132``), the
pipeline is distributed to every shard and records are pulled through
the step chain (``/root/reference/src/mr.c:926-970``).

Here the same chain is *compiled into a Catalyst logical plan*:

* relational steps become DataFrame transformations (whole-stage
  codegen, predicate pushdown, column pruning — all free),
* arbitrary-Python steps become Arrow-batched ``mapInPandas`` stages
  with LibMR's per-record error channel
  (``/root/reference/src/mr.c:954-957``: a step error turns the record
  into an ErrorRecord and the pipeline keeps running),
* ``reshuffle`` is a hash repartition (the reference routes records by
  CRC16 slot — ``/root/reference/src/mr.c:736-785``),
* ``collect`` gathers to one task (the reference gathers to the
  initiating shard — ``/root/reference/src/mr.c:812-862``).

Everything the reference hand-builds for distribution — topology,
serialization, retries, completion barriers (~70% of its code) — is
supplied by Spark's scheduler/shuffle and deliberately NOT rebuilt.
"""

from __future__ import annotations

import dataclasses
import threading
import uuid
from dataclasses import dataclass, field
from typing import Any, Callable, Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark.sql.types import StructType

from .registry import GLOBAL_REGISTRY, PyAccumulator, Registry, StepImpl, StepType

ERROR_COL = "__mr_error__"

#: Error string raised on timeout; matches the reference's
#: "execution max idle reached" (/root/reference/src/mr.c:1306-1331).
MAX_IDLE_ERROR = "execution max idle reached"


class ExecutionError(RuntimeError):
    pass


def run_with_job_group_timeout(spark: SparkSession, work: Callable[[], Any], timeout_ms: int, error_msg: str) -> Any:
    """Run ``work`` (which triggers Spark jobs) with a deadline: the jobs
    are tagged with a job group and cancelled on the cluster if the
    deadline passes, then ``ExecutionError(error_msg)`` is raised. This
    is the Spark analog of the reference's event-loop delay-task timers
    (execution max-idle /root/reference/src/mr.c:1306-1331, remote-task
    timeout /root/reference/src/mr.c:2085-2099)."""
    sc = spark.sparkContext
    group = f"libmr-timeout-{uuid.uuid4().hex}"
    out: dict[str, Any] = {}

    def target():
        sc.setJobGroup(group, "libmr_spark timed work", interruptOnCancel=True)
        try:
            out["value"] = work()
        except Exception as e:  # surfaced below
            out["exc"] = e

    t = threading.Thread(target=target, daemon=True)
    t.start()
    t.join(timeout_ms / 1000.0)
    if t.is_alive():
        sc.cancelJobGroup(group)
        raise ExecutionError(error_msg)
    if "exc" in out:
        raise out["exc"]
    return out["value"]


@dataclass
class ExecutionResult:
    """The reference's done-callback contract: ``(results, errors)``
    (``/root/reference/src/mr.h:65-69``). ``errors`` are record-level
    error strings; a failing step yields ``(0 results, N errors)``
    with the execution still completing normally
    (``/root/reference/tests/mr_test_module/pytests/test_errors.py:5-25``).
    """

    results: list
    errors: list[str]


@dataclass
class _Step:
    step_type: StepType
    name: str | None
    args: Any
    impl: StepImpl | Callable | None = None
    key: Any = None  # reshuffle key expression(s)


def _resolve(registry: Registry, step_type: StepType, name_or_fn, relational_default=True) -> StepImpl:
    if isinstance(name_or_fn, str):
        return registry.get(step_type, name_or_fn)
    if isinstance(name_or_fn, StepImpl):
        return name_or_fn
    if isinstance(name_or_fn, PyAccumulator):
        return StepImpl(name=f"<py:{step_type.value}>", step_type=step_type, fn=name_or_fn, relational=False)
    return StepImpl(
        name=f"<inline:{step_type.value}>",
        step_type=step_type,
        fn=name_or_fn,
        relational=relational_default,
    )


def _py_map_stage(df: DataFrame, fn: Callable, args: Any, out_schema: str | None) -> DataFrame:
    """Wrap a per-record Python mapper in mapInPandas with the error
    channel. Output = mapped columns (nulled on error) + ERROR_COL."""
    in_cols = [c for c in df.columns if c != ERROR_COL]
    if out_schema is None:
        out_fields = ", ".join(f"`{c}` {t}" for c, t in df.dtypes if c != ERROR_COL)
    else:
        out_fields = out_schema
    full_schema = f"{out_fields}, {ERROR_COL} string"
    # parse the DDL rather than splitting on ',' — field types like
    # decimal(18,2) or map<string,int> contain commas
    out_cols = [f.name for f in StructType.fromDDL(out_fields).fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_rows = []
            had_err = ERROR_COL in pdf.columns
            for rec in pdf.to_dict("records"):
                err = rec.pop(ERROR_COL, None) if had_err else None
                if err is not None:
                    out_rows.append({**{c: None for c in out_cols}, ERROR_COL: err})
                    continue
                try:
                    mapped = fn(rec, args) if args is not None else fn(rec)
                    out_rows.append({**{c: mapped.get(c) for c in out_cols}, ERROR_COL: None})
                except Exception as e:  # record-level error, keep going
                    out_rows.append({**{c: None for c in out_cols}, ERROR_COL: str(e)})
            yield pd.DataFrame(out_rows, columns=[*out_cols, ERROR_COL])

    return df.select(*in_cols, *( [F.col(ERROR_COL)] if ERROR_COL in df.columns else [] )).mapInPandas(
        run, schema=full_schema
    )


def _py_filter_stage(df: DataFrame, fn: Callable, args: Any) -> DataFrame:
    """Per-record Python predicate with the error channel; loops rows
    like the reference's pipelined filter (/root/reference/src/mr.c:864-889)."""
    cols = [c for c in df.columns if c != ERROR_COL]
    schema = ", ".join(f"`{c}` {t}" for c, t in df.dtypes if c != ERROR_COL) + f", {ERROR_COL} string"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_rows = []
            had_err = ERROR_COL in pdf.columns
            for rec in pdf.to_dict("records"):
                err = rec.pop(ERROR_COL, None) if had_err else None
                if err is not None:
                    out_rows.append({**{c: None for c in cols}, ERROR_COL: err})
                    continue
                try:
                    keep = fn(rec, args) if args is not None else fn(rec)
                    if keep:
                        out_rows.append({**rec, ERROR_COL: None})
                except Exception as e:
                    out_rows.append({**{c: None for c in cols}, ERROR_COL: str(e)})
            yield pd.DataFrame(out_rows, columns=[*cols, ERROR_COL])

    return df.mapInPandas(run, schema=schema)


def _py_accumulate_stage(df: DataFrame, acc: PyAccumulator, global_fold: bool) -> DataFrame:
    """LibMR accumulate: streaming fold, one emitted record per shard;
    empty input emits nothing (/root/reference/src/mr.c:787-810,794-798).

    Per-partition fold via mapInPandas; a global fold (accumulate after
    collect) first gathers to a single partition, mirroring the
    reference's collect-then-fold-at-initiator.
    """
    if global_fold:
        df = df.coalesce(1) if df.rdd.getNumPartitions() > 1 else df
    cols = [c for c in df.columns if c != ERROR_COL]
    schema = acc.schema

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        state = acc.zero
        seen = False
        for pdf in batches:
            had_err = ERROR_COL in pdf.columns
            for rec in pdf.to_dict("records"):
                if had_err and rec.pop(ERROR_COL, None) is not None:
                    continue  # error records bypass the fold
                seen = True
                state = acc.fn(state, rec)
        if seen:
            row = acc.finish(state) if acc.finish else state
            if not isinstance(row, dict):
                raise ExecutionError("PyAccumulator must fold to a dict (or provide finish())")
            yield pd.DataFrame([row])

    return df.select(*cols).mapInPandas(run, schema=schema)


class Execution:
    """A compiled pipeline: a results DataFrame plus lazily-evaluated
    error branches (the reference's in-band ErrorRecord list,
    ``/root/reference/src/mr.c:954-957``)."""

    def __init__(self, spark: SparkSession, df: DataFrame, error_dfs: list[DataFrame], max_idle_ms: int | None):
        self.spark = spark
        self._df = df
        self._error_dfs = error_dfs
        self.max_idle_ms = max_idle_ms
        self.execution_id = uuid.uuid4().hex  # ≈ shardId+counter id (/root/reference/src/mr.c:452-464)

    def dataframe(self) -> DataFrame:
        """The distributed results (stays lazy — preferred at scale)."""
        if ERROR_COL in self._df.columns:
            return self._df.filter(F.col(ERROR_COL).isNull()).drop(ERROR_COL)
        return self._df

    def errors_dataframe(self) -> DataFrame | None:
        branches = list(self._error_dfs)
        if ERROR_COL in self._df.columns:
            branches.append(self._df.filter(F.col(ERROR_COL).isNotNull()).select(F.col(ERROR_COL).alias("error")))
        if not branches:
            return None
        out = branches[0]
        for b in branches[1:]:
            out = out.unionByName(b)
        return out

    def run(self) -> ExecutionResult:
        """Execute and gather ``(results, errors)`` to the driver —
        the reference's done-callback (/root/reference/src/mr.c:1014-1057).
        ``max_idle_ms`` maps to job-group cancellation (the reference
        kills idle executions after maxIdle — /root/reference/src/mr.c:26-28,1306-1331).
        """
        if self.max_idle_ms is None:
            return ExecutionResult(self._collect_results(), self._collect_errors())
        return run_with_job_group_timeout(
            self.spark,
            lambda: ExecutionResult(self._collect_results(), self._collect_errors()),
            self.max_idle_ms,
            MAX_IDLE_ERROR,
        )

    def _collect_results(self) -> list:
        return self.dataframe().collect()

    def _collect_errors(self) -> list[str]:
        edf = self.errors_dataframe()
        if edf is None:
            return []
        return [r[0] for r in edf.collect()]


class ExecutionBuilder:
    """Fluent pipeline builder, mirroring
    ``create_builder(reader).map(m).filter(f).reshuffle().collect()
    .accumulate(a).create_execution()``
    (``/root/reference/rust_api/libmr/execution_builder.rs:38-132``)."""

    def __init__(
        self,
        spark: SparkSession,
        reader,
        args: Any = None,
        registry: Registry | None = None,
    ):
        self.spark = spark
        self.registry = registry or GLOBAL_REGISTRY
        self._steps: list[_Step] = []
        self._max_idle_ms: int | None = None
        if isinstance(reader, DataFrame):
            impl = StepImpl("<df>", StepType.READER, lambda s, a: reader)
            self._steps.append(_Step(StepType.READER, "<df>", None, impl))
        else:
            impl = _resolve(self.registry, StepType.READER, reader)
            self._steps.append(_Step(StepType.READER, impl.name, args, impl))

    # -- pipeline steps ------------------------------------------------
    def map(self, fn, args: Any = None, *, relational: bool | None = None, out_schema: str | None = None):
        impl = _resolve(self.registry, StepType.MAPPER, fn, relational_default=relational is not False)
        # copy before overriding — _resolve may return the registry-owned
        # instance, and a per-call override must not rewrite the global step
        if relational is not None and impl.relational != relational:
            impl = dataclasses.replace(impl, relational=relational)
        if out_schema is not None and impl.out_schema != out_schema:
            impl = dataclasses.replace(impl, out_schema=out_schema)
        self._steps.append(_Step(StepType.MAPPER, impl.name, args, impl))
        return self

    def filter(self, fn, args: Any = None, *, relational: bool | None = None):
        impl = _resolve(self.registry, StepType.FILTER, fn, relational_default=relational is not False)
        if relational is not None and impl.relational != relational:
            impl = dataclasses.replace(impl, relational=relational)
        self._steps.append(_Step(StepType.FILTER, impl.name, args, impl))
        return self

    def accumulate(self, fn, args: Any = None):
        impl = _resolve(self.registry, StepType.ACCUMULATOR, fn)
        if isinstance(impl.fn, PyAccumulator) and impl.relational:
            impl = dataclasses.replace(impl, relational=False)
        self._steps.append(_Step(StepType.ACCUMULATOR, impl.name, args, impl))
        return self

    def reshuffle(self, key=None, num_partitions: int | None = None):
        """Hash-repartition by ``key`` (column name/Column/list). The
        reference routes by each record's hashTag slot
        (/root/reference/src/mr.c:736-785); Murmur3 hash partitioning
        is the Spark-native equivalent (SURVEY §1.4)."""
        s = _Step(StepType.RESHUFFLE, None, num_partitions, None)
        s.key = key
        self._steps.append(s)
        return self

    def collect(self):
        """Gather to the initiator (/root/reference/src/mr.c:812-862).
        Compiled as: global scope for a following accumulate; a
        single-partition gather for Python steps that follow."""
        self._steps.append(_Step(StepType.COLLECT, None, None, None))
        return self

    def max_idle(self, ms: int):
        """≈ MR_SetMaxIdle (/root/reference/src/mr.h:169)."""
        self._max_idle_ms = ms
        return self

    # -- spec round-trip (the reference's wire format: names + args,
    #    /root/reference/src/mr.c:1259-1286) ---------------------------
    def to_spec(self) -> list[dict]:
        out = []
        for s in self._steps:
            if s.name is not None and s.name.startswith("<"):
                raise ExecutionError(f"step {s.name} is inline; only named steps serialize")
            out.append({"type": s.step_type.value, "name": s.name, "args": s.args, "key": s.key})
        return out

    @classmethod
    def from_spec(cls, spark: SparkSession, spec: list[dict], registry: Registry | None = None) -> "ExecutionBuilder":
        registry = registry or GLOBAL_REGISTRY
        if not spec or spec[0]["type"] != StepType.READER.value:
            raise ExecutionError("spec must start with a reader")
        b = cls(spark, spec[0]["name"], spec[0].get("args"), registry)
        for s in spec[1:]:
            t = StepType(s["type"])
            if t is StepType.MAPPER:
                b.map(s["name"], s.get("args"))
            elif t is StepType.FILTER:
                b.filter(s["name"], s.get("args"))
            elif t is StepType.ACCUMULATOR:
                b.accumulate(s["name"], s.get("args"))
            elif t is StepType.RESHUFFLE:
                b.reshuffle(s.get("key"), s.get("args"))
            elif t is StepType.COLLECT:
                b.collect()
            else:
                raise ExecutionError(f"unknown step type {t}")
        return b

    # -- compile -------------------------------------------------------
    def create_execution(self) -> Execution:
        df: DataFrame | None = None
        error_dfs: list[DataFrame] = []
        collected = False

        def split_errors(d: DataFrame) -> DataFrame:
            """Divert error rows out of the main stream before a step
            that collapses/changes schema."""
            if ERROR_COL in d.columns:
                error_dfs.append(d.filter(F.col(ERROR_COL).isNotNull()).select(F.col(ERROR_COL).alias("error")))
                return d.filter(F.col(ERROR_COL).isNull()).drop(ERROR_COL)
            return d

        for s in self._steps:
            impl = s.impl
            if s.step_type is StepType.READER:
                df = impl.fn(self.spark, s.args)
            elif s.step_type is StepType.MAPPER:
                if impl.relational:
                    clean = split_errors(df)
                    df = impl.fn(clean, s.args) if s.args is not None else impl.fn(clean)
                else:
                    df = _py_map_stage(df, impl.fn, s.args, impl.out_schema)
            elif s.step_type is StepType.FILTER:
                if impl.relational:
                    pred = impl.fn(df, s.args) if s.args is not None else impl.fn(df)
                    if not isinstance(pred, Column):
                        raise ExecutionError("relational filter must return a Column predicate")
                    if ERROR_COL in df.columns:
                        pred = pred | F.col(ERROR_COL).isNotNull()
                    df = df.filter(pred)
                else:
                    df = _py_filter_stage(df, impl.fn, s.args)
            elif s.step_type is StepType.RESHUFFLE:
                clean = df
                n = s.args
                if s.key is None:
                    df = clean.repartition(n) if n else clean.repartition(self.spark.sparkContext.defaultParallelism)
                else:
                    keys = s.key if isinstance(s.key, (list, tuple)) else [s.key]
                    keys = [F.col(k) if isinstance(k, str) else k for k in keys]
                    df = clean.repartition(n, *keys) if n else clean.repartition(*keys)
            elif s.step_type is StepType.COLLECT:
                collected = True
            elif s.step_type is StepType.ACCUMULATOR:
                if impl.relational:
                    clean = split_errors(df)
                    exprs = impl.fn(s.args) if s.args is not None else impl.fn()
                    if isinstance(exprs, Column):
                        exprs = [exprs]
                    if collected:
                        # Global agg that emits NOTHING on empty input
                        # (/root/reference/src/mr.c:794-798): grouped agg
                        # on a constant yields 0 rows when input is empty.
                        df = clean.groupBy(F.lit(1).alias("__g__")).agg(*exprs).drop("__g__")
                    else:
                        # per-shard partial: one row per non-empty partition
                        df = (
                            clean.withColumn("__pid__", F.spark_partition_id())
                            .groupBy("__pid__")
                            .agg(*exprs)
                            .drop("__pid__")
                        )
                else:
                    clean = split_errors(df)
                    df = _py_accumulate_stage(clean, impl.fn, global_fold=collected)
            else:
                raise ExecutionError(f"unhandled step {s.step_type}")

        if collected and df is not None and ERROR_COL not in df.columns:
            # "collect then keep processing" for python stages happens on
            # one task; pure-relational chains need no physical gather.
            pass
        return Execution(self.spark, df, error_dfs, self._max_idle_ms)

    def run(self) -> ExecutionResult:
        return self.create_execution().run()


def create_builder(spark: SparkSession, reader, args: Any = None, registry: Registry | None = None) -> ExecutionBuilder:
    """≈ MR_CreateExecutionBuilder (/root/reference/src/mr.c:336-356)."""
    return ExecutionBuilder(spark, reader, args, registry)
