"""DSIR scale curve (round 11): corpus wall-clock and intermediate
cardinalities as the raw pool grows. The claims to verify measured:

* the per-doc-bucket count table (the ONE corpus-keyed shuffle) grows
  linearly with the corpus;
* the bucket-weight table is BOUNDED by the bucket count regardless of
  corpus size (it is what broadcasts into the dot product);
* wall grows sub-linearly vs corpus rows at toy scale (fixed job
  overhead dominates) and the plan shape is size-invariant.

Usage:
    python scripts/dsir_scale_curve.py [sizes ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from libmr_spark.operators.sampling import dsir_importance_select
from libmr_spark.session import get_spark

BUCKETS = 2048
K = 200
WORDS = "alpha beta gamma delta epsilon zeta eta theta iota kappa".split()


def _docs(spark, n):
    # ~20-token synthetic docs; ids < n//10 form the 'curated' target
    w = F.array(*[F.lit(x) for x in WORDS])
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            *[
                F.element_at(w, ((F.col("id") * (i + 3) + i * i) % 10 + 1).cast("int"))
                for i in range(20)
            ],
        ).alias("text"),
    )


def main() -> int:
    sizes = [int(a) for a in sys.argv[1:]] or [10_000, 100_000, 400_000]
    spark = get_spark("dsir-curve", shuffle_partitions=32)
    print("| corpus rows | wall (s) | doc-bucket rows | weight-table rows |")
    print("|---|---|---|---|")
    for n in sizes:
        docs = _docs(spark, n)
        tgt = F.col("doc_id") < n // 10
        t0 = time.time()
        out = dsir_importance_select(
            docs, tgt, k=K, buckets=BUCKETS, seed="curve"
        )
        got = out.count()
        wall = time.time() - t0
        assert got == K, got
        # re-derive the intermediate cardinalities the claims are about
        toks = F.filter(F.split(F.trim(F.lower(F.col("text"))), r"\s+"), lambda w: w != "")
        base = docs.select("doc_id", toks.alias("ws"))
        npairs = F.greatest(F.size("ws") - 1, F.lit(0))
        occ = base.select(
            "doc_id",
            F.explode(
                F.zip_with(
                    F.slice(F.col("ws"), 1, npairs),
                    F.slice(F.col("ws"), 2, npairs),
                    lambda a, b: F.concat(a, F.lit(" "), b),
                )
            ).alias("bg"),
        ).select(
            "doc_id",
            (
                F.conv(F.substring(F.md5(F.concat(F.lit("curve:"), F.col("bg"))), 1, 6), 16, 10)
                .cast("bigint") % BUCKETS
            ).alias("b"),
        )
        db_rows = occ.groupBy("doc_id", "b").count().count()
        wt_rows = occ.select("b").distinct().count()
        assert wt_rows <= BUCKETS
        print(f"| {n} | {wall:.2f} | {db_rows} | {wt_rows} |")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
