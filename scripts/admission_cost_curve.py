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
PROBE_BATCH = 8  # files-opened column probe (see inline note)


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
    print(
        "| history rows | admit wall, 1k batch (s) | history files "
        f"| files opened ({PROBE_BATCH}-fp probe) |"
    )
    print("|---|---|---|---|")
    for n in sizes:
        path = f"/tmp/libmr_adm_curve_{n}"
        shutil.rmtree(path, ignore_errors=True)
        half = n // 2
        DD.dedup_incremental_exact(spark, path, _docs(spark, 0, half))
        DD.dedup_incremental_exact(spark, path, _docs(spark, half, n))
        # the catalog-bucketed layout: range-cluster the history BY
        # FINGERPRINT so admission's probe prunes files zones can't
        # (hash-uniform keys) — files opened stays O(batch) while the
        # history file count grows with n
        n_files = max(16, n // 15_625)
        DD.compact_incremental_store(
            spark, path, tables=("fps",), zone_by={"fps": "fp"},
            n_files=n_files,
        )
        walls = []
        opened = total_files = 0
        for i in range(3):
            lo = 10_000_000 + i * BATCH
            t0 = time.time()
            adm = DD.dedup_incremental_exact(
                spark, path, _docs(spark, lo, lo + BATCH)
            )
            walls.append(time.time() - t0)
            assert adm.count() == BATCH
        # files-opened column: re-derive the probe's read list for a
        # SMALL fresh batch against the zoned history (metadata-only).
        # Uniform keys hit ~min(batch, files) files, so the sub-linear
        # story is "opened plateaus at O(batch) while the history's
        # file count keeps growing" — an 8-fp probe makes that visible
        # at toy file counts (a 1k-fp batch would legitimately touch
        # every file until the history spans >1k files).
        tags = DD._manifest_read(os.path.join(path, "_BATCHES"), None)
        probe = (
            _docs(spark, 20_000_000, 20_000_000 + PROBE_BATCH)
            .select(DD.fingerprint(F.col("text")).alias("fp"), "doc_id")
        )
        paths = DD._admission_paths(spark, path, tags, probe)
        opened = sum(1 for p in paths if p.endswith(".parquet"))
        opened += sum(
            len([f for f in os.listdir(p) if f.endswith(".parquet")])
            for p in paths
            if not p.endswith(".parquet")
        )
        total_files = sum(
            len([f for f in os.listdir(os.path.join(path, "fps", d))
                 if f.endswith(".parquet")])
            for d in os.listdir(os.path.join(path, "fps"))
            if d.startswith("batch=")
        )
        wall = round(statistics.median(walls), 2)
        print(f"| {n} | {wall} | {total_files} | {opened} |")
        out["points"].append(
            {
                "history": n,
                "wall_s": wall,
                "history_files": total_files,
                "files_opened": opened,
            }
        )
        shutil.rmtree(path, ignore_errors=True)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
