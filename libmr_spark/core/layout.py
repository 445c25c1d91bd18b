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


#: Partition-count gate for ``rebalanced(probe=True)``: a frame already
#: at or below this many partitions writes at most this many files —
#: adding a REBALANCE exchange there is pure overhead (~0.2-0.5 s of
#: extra stage per store commit, measured on the matview/minhash soaks).
_REBALANCE_MIN_PARTS = 8


def rebalanced(df: DataFrame, *key_cols: str, probe: bool = False) -> DataFrame:
    """Size-targeted output partitioning for store-table writes (guide
    §6 — aim for advisory-sized output files): an AQE ``REBALANCE``
    shuffle whose reducer count is coalesced toward
    ``spark.sql.adaptive.advisoryPartitionSizeInBytes`` — one file for
    a KB-scale commit batch, ~64 MB files at production scale (the
    same shuffle-before-write Iceberg's hash distribution mode pays
    for the same reason).  Without it a NARROW-lineage or checkpointed
    write inherits the upstream stage's parallelism-first partition
    count (measured: a 32-slice checkpointed commit batch writes 32
    tiny files; every later commit re-lists and re-scans all history,
    so the fragmentation compounds — and scales with CORE COUNT, the
    r11 32-vs-8-core lifecycle anti-scaling).  Pass ``key_cols`` to
    keep the written files clustered by a key the store's readers
    prune on.

    Shuffle-TAILED frames (aggregation/join outputs) should NOT come
    here: AQE's partition coalescing already bounds their write
    parallelism toward the advisory size (measured: matview/vocab
    net-fold commits write 1 file with no hint), so the hint only adds
    an exchange.  ``probe=True`` (for frames whose partition count is
    knowable WITHOUT running jobs: checkpointed / narrow-over-scan
    lineage) skips the hint when the frame is already at most
    ``_REBALANCE_MIN_PARTS`` partitions — never probe a lazy
    shuffle-tailed frame, ``.rdd`` materializes its AQE stages.

    Under a non-AQE plan the hint degrades to a plain shuffle — no
    worse than the status quo (and foreachBatch batch plans DO get AQE
    in Spark 4: verified 32 files -> 1 inside a micro-batch)."""
    import os

    if os.environ.get("SPARK_GRAFT_REBALANCE_WRITES", "1") == "0":
        return df  # A/B escape hatch: measure the pre-r12 write layout
    if probe:
        try:
            if df.rdd.getNumPartitions() <= _REBALANCE_MIN_PARTS:
                return df
        except Exception:  # noqa: BLE001 — probe failure must never break a commit
            pass
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
