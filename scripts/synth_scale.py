"""Synthesize a k×-scaled copy of a testdata sf dir for SCALE testing
(bench only — correctness oracles always run against the driver's own
parquet, never synthesized data).

Fact tables are replicated k× with shifted primary keys and CONSISTENT
foreign keys (lineitem follows orders' key shift); dimension tables are
copied as-is. Text/embedding corpora are replicated in a
duplicate-NEUTRAL way — per-replica tag interleave for documents (no
shingle overlap between replicas) and sign-flip decorrelation for
embeddings — so dedup/ANN workloads scale the ENGINE's work, not the
pair-output volume (a naive copy makes every replica a near-duplicate
and measures output size instead; see SCALING.md "Measured scaling
curve" for why that matters).

Usage:
    python scripts/synth_scale.py [k] [src_sf_dir] [out_dir]
Defaults: k=10, src=/root/testdata/sf0.1, out=/tmp/libmr_synth_sf{k}x
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from libmr_spark.session import get_spark
from libmr_spark.sources.readers import load_table

DIMS = ["region", "nation", "customer", "supplier", "part"]


def main() -> int:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    out = sys.argv[3] if len(sys.argv) > 3 else f"/tmp/libmr_synth_sf{k}x"
    spark = get_spark("synth-scale")
    reps = spark.range(k).select(F.col("id").alias("rep"))

    for name in DIMS:
        load_table(spark, name, src).write.mode("overwrite").parquet(os.path.join(out, f"{name}.parquet"))

    orders = load_table(spark, "orders", src)
    okey_off = orders.agg(F.max("o_orderkey")).first()[0] + 1
    (
        orders.crossJoin(reps)
        .withColumn("o_orderkey", F.col("o_orderkey") + F.col("rep") * okey_off)
        .drop("rep")
        .write.mode("overwrite")
        .parquet(os.path.join(out, "orders.parquet"))
    )
    (
        load_table(spark, "lineitem", src)
        .crossJoin(reps)
        .withColumn("l_orderkey", F.col("l_orderkey") + F.col("rep") * okey_off)
        .drop("rep")
        .write.mode("overwrite")
        .parquet(os.path.join(out, "lineitem.parquet"))
    )

    events = load_table(spark, "events", src)
    ekey_off = events.agg(F.max("event_id")).first()[0] + 1
    (
        events.crossJoin(reps)
        .withColumn("event_id", F.col("event_id") + F.col("rep") * ekey_off)
        .drop("rep")
        .write.mode("overwrite")
        .parquet(os.path.join(out, "events.parquet"))
    )

    docs = load_table(spark, "documents", src)
    dkey_off = docs.agg(F.max("doc_id")).first()[0] + 1
    new_id = F.col("doc_id") + F.col("rep") * dkey_off
    tag = F.concat(F.lit("v"), new_id.cast("string"))
    (
        docs.crossJoin(reps)
        .withColumn(
            "text",
            F.when(F.col("rep") == 0, F.col("text")).otherwise(
                F.concat_ws(
                    " ", tag, F.regexp_replace(F.col("text"), r"\s+", F.concat(F.lit(" "), tag, F.lit(" ")))
                )
            ),
        )
        .withColumn("doc_id", new_id)
        .drop("rep")
        .write.mode("overwrite")
        .parquet(os.path.join(out, "documents.parquet"))
    )

    emb = load_table(spark, "embeddings", src)
    vkey_off = emb.agg(F.max("vec_id")).first()[0] + 1
    (
        emb.crossJoin(reps)
        .withColumn(
            # Per-replica sign-flip decorrelation. The mask must vary by
            # BOTH dimension and replica beyond parity: a mask shared by
            # all vectors of a replica is an isometry (flipping dim i for
            # both a and b leaves a_i*b_i unchanged), so replicas whose
            # masks coincide are bit-identical corpora and pair output
            # grows O(k^2). xxhash64(i, rep) gives each replica an
            # independent pseudorandom mask -> cross-replica cosines
            # concentrate near 0 at high dim. rep=0 keeps the base corpus
            # exactly.
            "embedding",
            F.transform(
                "embedding",
                lambda x, i: F.when(
                    (F.col("rep") == 0) | (F.xxhash64(i, F.col("rep")) % 2 == 0), x
                ).otherwise(-x),
            ),
        )
        .withColumn("vec_id", F.col("vec_id") + F.col("rep") * vkey_off)
        .drop("rep")
        .write.mode("overwrite")
        .parquet(os.path.join(out, "embeddings.parquet"))
    )

    print(out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
