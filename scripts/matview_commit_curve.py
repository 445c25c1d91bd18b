"""Matview commit-cost-vs-state-size curve: the evidence for the
round-10 scale lever (operators/matview.py::_pre_parts).

A join-MV commit must not pay a FULL-STATE SHUFFLE: the pre-state is
served as (compact batch as written) + (netted ingest tail), admission
restricts state to the batch's identities with a broadcast semi join,
and the view-delta joins distribute over the part sum.  Per-commit
cost is therefore full-state scans + batch-bounded shuffles, so the
post-compaction commit wall should stay near-FLAT as the state grows
10x/25x while a commit over a long UNCOMPACTED tail pays the tail
net-fold and grows with it.

For each state size N: bulk-load N rows per side in 4 batches,
measure a fixed 1k-row commit (a) on the uncompacted 4-batch store
and (b) after compaction, 3 commits each, median wall.  Prints
markdown rows for SCALING.md plus one JSON line.

Usage:
    python scripts/matview_commit_curve.py [sizes ...]
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

from libmr_spark.operators.matview import (
    compact_matview_store,
    matview_ingest,
    matview_read,
)
from libmr_spark.session import get_spark

DELTA = 1_000


def _side(spark, lo, hi, col):
    return (
        spark.range(lo, hi)
        .select(
            F.col("id").alias("k"),
            F.concat(F.lit(col), F.col("id").cast("string")).alias(col),
        )
        .withColumn("m", F.lit(1))
    )


def build(spark, path, n):
    shutil.rmtree(path, ignore_errors=True)
    step = n // 4
    for i in range(4):
        lo, hi = i * step, (i + 1) * step if i < 3 else n
        matview_ingest(
            spark,
            path,
            _side(spark, lo, hi, "lv"),
            _side(spark, lo, hi, "rv"),
            on="k",
        )


def commit_wall(spark, path, base_id, rounds=3):
    walls = []
    for i in range(rounds):
        lo = base_id + i * DELTA
        delta = _side(spark, lo, lo + DELTA, "lv")
        t0 = time.time()
        matview_ingest(spark, path, left_delta=delta, on="k")
        walls.append(time.time() - t0)
    return round(statistics.median(walls), 2)


def main() -> int:
    sizes = [int(a) for a in sys.argv[1:]] or [20_000, 100_000, 500_000]
    spark = get_spark("matview-commit-curve", shuffle_partitions=32)
    # warm the JVM/codegen path so the first-measured point doesn't
    # absorb one-time startup cost
    warm = "/tmp/libmr_mv_curve_warm"
    build(spark, warm, 4_000)
    commit_wall(spark, warm, base_id=10_000_000, rounds=1)
    shutil.rmtree(warm, ignore_errors=True)
    out = {"delta_rows": DELTA, "points": []}
    print("| state rows/side | commit wall, 4-batch tail (s) | "
          "commit wall, post-compaction (s) |")
    print("|---|---|---|")
    for n in sizes:
        path = f"/tmp/libmr_mv_curve_{n}"
        build(spark, path, n)
        tail_wall = commit_wall(spark, path, base_id=10_000_000)
        compact_matview_store(spark, path)
        post_wall = commit_wall(spark, path, base_id=20_000_000)
        # the measured deltas are left-only keys with no right partner,
        # so the served view must be exactly the bulk state
        served = matview_read(spark, path).count()
        assert served == n, (served, n)
        print(f"| {n} | {tail_wall} | {post_wall} |")
        out["points"].append(
            {"state": n, "tail_wall_s": tail_wall, "post_wall_s": post_wall}
        )
        shutil.rmtree(path, ignore_errors=True)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
