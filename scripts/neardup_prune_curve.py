"""Near-dup store probe-pruning curve (round 11): after a zoned
compaction (zone_by={"index": "bucket", "payload": "<id>"}), a commit's
candidate generation opens only the index files covering the batch's
band buckets and its Jaccard verify only the payload files covering the
candidate ids — both O(batch/candidates) while the history's file
count grows with corpus size.

Usage:
    python scripts/neardup_prune_curve.py [sizes ...]
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from libmr_spark.operators import dedup as DD
from libmr_spark.session import get_spark

BATCH = 200
PROBE_DOCS = 4  # files-opened probe batch (uniform buckets hit ~min(probes, files))
BANDS = 4
NUM_HASHES = 64


def _docs(spark, lo, hi):
    # distinct 6-word bodies: no accidental near-dups across ids
    return spark.range(lo, hi).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("alpha beta gamma delta body "), F.col("id").cast("string"),
            F.lit(" tail "), (F.col("id") * 7 % 1000).cast("string"),
        ).alias("text"),
    )


def main() -> int:
    sizes = [int(a) for a in sys.argv[1:]] or [5_000, 50_000, 200_000]
    spark = get_spark("neardup-curve", shuffle_partitions=32)
    out = {"batch_rows": BATCH, "points": []}
    print(
        "| history rows | admit wall (s) | index files | index opened "
        f"({PROBE_DOCS}-doc probe) | payload files | payload opened |"
    )
    print("|---|---|---|---|---|---|")
    for n in sizes:
        path = f"/tmp/libmr_ndp_curve_{n}"
        shutil.rmtree(path, ignore_errors=True)
        half = n // 2
        kw = dict(num_hashes=NUM_HASHES, bands=BANDS)
        DD.dedup_incremental_minhash(spark, path, _docs(spark, 0, half), **kw)
        DD.dedup_incremental_minhash(spark, path, _docs(spark, half, n), **kw)
        n_files = max(16, n // 2_000)
        DD.compact_incremental_store(
            spark, path, zone_by={"index": "bucket", "payload": "doc_id"},
            n_files=n_files,
        )
        # measure the file counts against the FRESHLY-compacted layout
        # (the wall-loop ingests below append unzoned dirs that serve
        # whole by design — a steady-state deployment re-zones them at
        # the next compaction cadence)
        tags = DD._manifest_read(os.path.join(path, "_BATCHES"), None)

        def opened(table, col, values):
            ps = DD._probe_paths(path, table, tags, col, values)
            files = sum(1 for p in ps if p.endswith(".parquet"))
            files += sum(
                len([f for f in os.listdir(p) if f.endswith(".parquet")])
                for p in ps if not p.endswith(".parquet")
            )
            return files

        def total(table):
            root = os.path.join(path, table)
            return sum(
                len([f for f in os.listdir(os.path.join(root, d))
                     if f.endswith(".parquet")])
                for d in os.listdir(root) if d.startswith("batch=")
            )

        # probe batch: PROBE_DOCS docs -> <= PROBE_DOCS x BANDS buckets
        from libmr_spark.operators.dedup import minhash_signature

        probe = _docs(spark, 20_000_000, 20_000_000 + PROBE_DOCS)
        sigs = minhash_signature(probe, NUM_HASHES, "text", "doc_id")
        rows = NUM_HASHES // BANDS
        banded = sigs.select(
            F.explode(
                F.array(*[
                    F.xxhash64(*[F.col("sig")[b * rows + r] for r in range(rows)])
                    for b in range(BANDS)
                ])
            ).alias("bucket")
        )
        buckets = [r.bucket for r in banded.distinct().collect()]
        idx_opened = opened("index", "bucket", buckets)
        idx_total, pay_total = total("index"), total("payload")
        # payload probe: a handful of stored candidate ids
        pay_opened = opened("payload", "doc_id", [1, half, n - 1])

        walls = []
        for i in range(3):
            lo = 10_000_000 + i * BATCH
            t0 = time.time()
            adm = DD.dedup_incremental_minhash(
                spark, path, _docs(spark, lo, lo + BATCH), **kw
            )
            walls.append(time.time() - t0)
            assert adm.count() == BATCH
        wall = round(statistics.median(walls), 2)
        print(
            f"| {n} | {wall} | {idx_total} | {idx_opened} "
            f"| {pay_total} | {pay_opened} |"
        )
        out["points"].append({
            "history": n, "wall_s": wall,
            "index_files": idx_total, "index_opened": idx_opened,
            "payload_files": pay_total, "payload_opened": pay_opened,
        })
        shutil.rmtree(path, ignore_errors=True)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
