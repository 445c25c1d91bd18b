"""Zone-map pruning curve for the signature stores (round 10): build
an exact-fp store of N fingerprint rows, compact with
``zone_by={"fps": "doc_id"}`` into F range-sorted files, then probe
ranges of decreasing selectivity and record (files opened / files
total, wall) vs the unzoned full scan.  The point being measured:
probe cost tracks SELECTIVITY, not state size — the lakehouse
data-skipping contract on the id-keyed families.

Usage:
    python scripts/zonemap_prune_curve.py [n_rows] [n_files]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from libmr_spark.operators import dedup as DD
from libmr_spark.session import get_spark


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    spark = get_spark("zonemap-curve", shuffle_partitions=32)
    path = f"/tmp/libmr_zone_curve_{n}"
    shutil.rmtree(path, ignore_errors=True)

    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("document body "), F.col("id").cast("string")).alias(
            "text"
        ),
    )
    half = n // 2
    DD.dedup_incremental_exact(spark, path, docs.filter(F.col("doc_id") < half))
    DD.dedup_incremental_exact(spark, path, docs.filter(F.col("doc_id") >= half))
    assert (
        DD.compact_incremental_store(
            spark, path, tables=("fps",), zone_by={"fps": "doc_id"},
            n_files=n_files,
        )
        == 2
    )

    out = {"n_rows": n, "n_files": n_files, "probes": []}
    print("| probe selectivity | files opened / total | wall (s) |")
    print("|---|---|---|")
    for frac in (0.001, 0.01, 0.1, 1.0):
        width = max(1, int(n * frac))
        lo, hi = n // 3, n // 3 + width - 1
        t0 = time.time()
        probe = DD.read_incremental_store_zoned(
            spark, path, "fps", "doc_id", lo, hi
        )
        cnt = probe.count()
        wall = round(time.time() - t0, 2)
        opened = len(set(probe.inputFiles()))
        assert cnt == min(width, n - lo), (cnt, width)
        print(f"| {frac:g} | {opened}/{n_files} | {wall} |")
        out["probes"].append(
            {"selectivity": frac, "files": opened, "wall_s": wall}
        )
    shutil.rmtree(path, ignore_errors=True)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
