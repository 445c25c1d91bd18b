"""Admission-cost-vs-history-size curve for the signature stores
(round 10): the restrict-then-anti decomposition means a commit
semi-probes the history with the broadcast batch keys (scan, never a
history shuffle) and anti-joins the batch against the batch-bounded
hits — so admitting a fixed-size batch should stay near-FLAT as the
fingerprint history grows.

Usage:
    python scripts/admission_cost_curve.py [sizes ...]
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

BATCH = 1_000


def _docs(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("document body "), F.col("id").cast("string")).alias(
            "text"
        ),
    )


def main() -> int:
    sizes = [int(a) for a in sys.argv[1:]] or [50_000, 500_000, 2_000_000]
    spark = get_spark("admission-curve", shuffle_partitions=32)
    # warm codegen/scan paths
    warm = "/tmp/libmr_adm_warm"
    shutil.rmtree(warm, ignore_errors=True)
    DD.dedup_incremental_exact(spark, warm, _docs(spark, 0, 2_000))
    DD.dedup_incremental_exact(spark, warm, _docs(spark, 2_000, 3_000))
    shutil.rmtree(warm, ignore_errors=True)

    out = {"batch_rows": BATCH, "points": []}
    print("| history rows | admit wall, 1k batch (s) |")
    print("|---|---|")
    for n in sizes:
        path = f"/tmp/libmr_adm_curve_{n}"
        shutil.rmtree(path, ignore_errors=True)
        DD.dedup_incremental_exact(spark, path, _docs(spark, 0, n))
        walls = []
        for i in range(3):
            lo = 10_000_000 + i * BATCH
            t0 = time.time()
            adm = DD.dedup_incremental_exact(
                spark, path, _docs(spark, lo, lo + BATCH)
            )
            walls.append(time.time() - t0)
            assert adm.count() == BATCH
        wall = round(statistics.median(walls), 2)
        print(f"| {n} | {wall} |")
        out["points"].append({"history": n, "wall_s": wall})
        shutil.rmtree(path, ignore_errors=True)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
