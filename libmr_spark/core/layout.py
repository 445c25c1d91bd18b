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


def rebalanced(df: DataFrame, *key_cols: str) -> DataFrame:
    """Size-targeted output partitioning for store-table writes (guide
    §6 — aim for advisory-sized output files): an AQE ``REBALANCE``
    shuffle whose reducer count is coalesced toward
    ``spark.sql.adaptive.advisoryPartitionSizeInBytes`` REGARDLESS of
    the parallelism-first floor — one file for a KB-scale commit batch,
    ~64 MB files at production scale.  Without it a store write
    inherits the upstream stage's parallelism-first partition count
    (32 tiny files per tiny commit under the 64k ``minPartitionSize``
    floor), and the fragmentation COMPOUNDS: every later commit
    re-lists and re-scans all history files (measured 13 s → 33 s on
    the 5-commit matview soak).  Pass ``key_cols`` to keep the written
    files clustered by a key the store's readers prune on; plain
    round-robin otherwise.  Under a non-AQE plan (foreachBatch
    micro-batches) the hint degrades to a plain shuffle — no worse
    than the status quo."""
    if key_cols:
        return df.hint("rebalance", *key_cols)
    return df.hint("rebalance")


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
