"""Structured Streaming windowed operators.

The reference has no streaming runtime at all (SURVEY §2.2: LibMR
executions are finite batch jobs; the only time concepts are idle/RPC
timeouts). These operators provide the streaming constructs the brief
requires — tumbling/sliding/session windows with watermark-based late
data handling — as thin declarative layers over Structured Streaming,
so the exact same aggregation expressions run in batch (tested against
the batch oracle) and in a stream.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def tumbling_window_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    group_cols: list[str],
    aggs: list[Column],
    watermark: str | None = None,
) -> DataFrame:
    """Non-overlapping fixed windows. On a stream, ``watermark`` bounds
    state: windows older than (max event time - watermark) finalize and
    evict — required for append-mode sinks."""
    if watermark and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return df.groupBy(F.window(ts_col, duration).alias("win"), *group_cols).agg(*aggs)


def sliding_window_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    slide: str,
    group_cols: list[str],
    aggs: list[Column],
    watermark: str | None = None,
) -> DataFrame:
    """Overlapping windows (each event lands in duration/slide windows)."""
    if watermark and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return df.groupBy(F.window(ts_col, duration, slide).alias("win"), *group_cols).agg(*aggs)


def session_window_agg(
    df: DataFrame,
    ts_col: str,
    gap: str,
    group_cols: list[str],
    aggs: list[Column],
    watermark: str | None = None,
) -> DataFrame:
    """Data-driven session windows: a session closes after ``gap`` of
    inactivity per group. Uses Spark's native session_window (state is
    merged incrementally — no per-event sort)."""
    if watermark and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return df.groupBy(F.session_window(ts_col, gap).alias("win"), *group_cols).agg(*aggs)


def stream_from_parquet_dir(spark, path: str, schema) -> DataFrame:
    """File-based stream source (each new file = a micro-batch input) —
    the standard pattern for replaying a table as a stream in tests."""
    return spark.readStream.schema(schema).parquet(path)


def run_to_memory_sink(sdf: DataFrame, name: str, output_mode: str = "complete"):
    """Drain all currently-available input into an in-memory table and
    stop — deterministic finite execution for testing a stream."""
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
