"""Scan-layout helpers.

``fan_out`` fixes the "one huge unsplittable input split" shape (guide
§2.5): a scan whose physical parallelism is below the session's core
count serializes every downstream per-row cost (Arrow UDF batches,
window explodes, bucket self-joins) onto a handful of tasks.  The fix
is the canonical one — repartition immediately after the read — but
GUARDED so it is a no-op at scale: when the scan already has at least
``defaultParallelism`` partitions (any real multi-file table), no
exchange is added.  Every caller is an operator whose result is
partitioning-independent by construction (associative integer sums,
per-row signatures, equi-join candidate generation), so the oracle
hash cannot change.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, *key_cols: str) -> DataFrame:
    """Hash-repartition ``df`` to ``defaultParallelism`` on
    ``key_cols`` (deterministic — no round-robin retry hazard,
    SPARK-38388) when its current physical parallelism is below the
    session core count; return ``df`` unchanged otherwise.  Call it on
    a cheap frame (scan + projection) — the partition-count probe
    compiles the physical plan but runs no job."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    try:
        n = df.rdd.getNumPartitions()
    except Exception:  # noqa: BLE001 — probe failure must never break the query
        return df
    if n >= target:
        return df
    if key_cols:
        return df.repartition(target, *key_cols)
    return df.repartition(target)
