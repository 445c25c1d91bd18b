"""Round-4 scale stress: 1× vs 10× wall-clock for the per-key operators
touched in round 3 (embedding sign-LSH dedup, winnowing, n-gram
Jaccard, salted fact-fact join), plus a SKEWED hot-shingle corpus that
forces the ngram max_df defense to engage at its production default.

The 10× dir comes from scripts/synth_scale.py (duplicate-neutral
replication — constant dup density, so candidate volume scales with
the corpus, not quadratically with replication). The skew corpus
appends one boilerplate sentence to 30% of the 10× documents: its
shingles land in ~15k docs, far above max_df=10k, so the defense MUST
engage — an undefended run would push ~10·(15k)²/2 ≈ 10⁹ candidate
rows through the self-join.

Usage:
    python scripts/synth_scale.py 10 /root/testdata/sf0.1 /tmp/libmr_synth_sf10x
    python scripts/scale_stress.py [base_sf_dir] [synth_dir] [query ...]

Extra args select the queries to stress (default: the round-4 TARGETS
list below). Prints markdown table rows for SCALING.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from libmr_spark.queries import QUERIES
from libmr_spark.session import get_spark
from libmr_spark.sources.readers import load_table

TARGETS = [
    "dedup_embedding_cosine",
    "dedup_winnowing",
    "dedup_ngram_jaccard",
    "salted_join_revenue_by_status",
    # round 5: the rewritten candidate-verify edit distance + the two
    # iterative operators that had no measured 10x row
    "text_edit_distance_pairs",
    "pagerank_dup_graph",
    "dedup_clusters",
]

BOILERPLATE = (
    "this document is provided as is without warranty of any kind either "
    "express or implied including fitness for a particular purpose"
)


def run_noop(spark, name: str, sf_dir: str) -> float:
    t0 = time.time()
    QUERIES[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    return round(time.time() - t0, 2)


def build_skew_corpus(spark, synth_dir: str, out_dir: str) -> None:
    """30% of the 10× docs get one shared boilerplate tail (df ≈ 15k)."""
    docs = load_table(spark, "documents", synth_dir)
    skewed = docs.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 10 < 3, F.concat_ws(" ", F.col("text"), F.lit(BOILERPLATE))
        ).otherwise(F.col("text")),
    )
    skewed.write.mode("overwrite").parquet(os.path.join(out_dir, "documents.parquet"))


def main() -> int:
    base = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    synth = sys.argv[2] if len(sys.argv) > 2 else "/tmp/libmr_synth_sf10x"
    targets = sys.argv[3:] or TARGETS
    skew_dir = "/tmp/libmr_skew_docs"
    spark = get_spark("scale-stress")

    print("| query | 1× (sf0.1) | 10× | ratio |")
    print("|---|---|---|---|")
    for name in targets:
        t1 = run_noop(spark, name, base)
        t10 = run_noop(spark, name, synth)
        print(f"| {name} | {t1}s | {t10}s | {round(t10 / t1, 1)}× |", flush=True)

    os.makedirs(skew_dir, exist_ok=True)
    build_skew_corpus(spark, synth, skew_dir)
    t0 = time.time()
    from libmr_spark.operators import dedup as DD

    n_pairs = DD.ngram_jaccard_pairs(
        load_table(spark, "documents", skew_dir), threshold=0.2
    ).count()
    t_skew = round(time.time() - t0, 2)
    print(
        f"\nskewed hot-shingle corpus (50k docs, boilerplate df≈15k > max_df=10k):"
        f" ngram_jaccard {t_skew}s, {n_pairs} pairs (defense engaged)",
        flush=True,
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
