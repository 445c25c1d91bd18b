"""Sinks. The reference's only "sink" is a side-effecting map writing
back into Redis (WriteDummyString,
``/root/reference/tests/mr_test_module/src/lib.rs:741-764``) or a RESP
reply to the client (``/root/reference/src/mr.h:244,250``).

Spark-native sinks: table writes (parquet/csv/json) and
``foreachPartition`` for external systems. At scale, a write is a job:
partition the output sensibly (``partitionBy`` for pruning on read,
sorted-within-partitions for locality) rather than coalescing to one
file.
"""

from __future__ import annotations

from typing import Callable, Iterator

from pyspark.sql import DataFrame


def write_parquet(df: DataFrame, path: str, mode: str = "overwrite", partition_by: list[str] | None = None) -> None:
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).option("header", "true").csv(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def foreach_partition_sink(df: DataFrame, fn: Callable[[Iterator], None]) -> None:
    """Side-effecting sink: ``fn`` runs once per partition on the
    executors (connection-per-partition pattern — the distributed
    read-modify-write idiom of the reference,
    ``tests/mr_test_module/src/lib.rs:323-353``)."""
    df.foreachPartition(fn)
