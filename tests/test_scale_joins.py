"""Scale-path join strategies: bucketed co-located joins (zero
exchange) and salted joins (skew spreading), verified for both
correctness and plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from libmr_spark.operators.relational import co_located_join, salted_join, write_bucketed
from libmr_spark.plans.explain import count_exchanges, formatted_plan
from libmr_spark.sources.readers import load_table


@pytest.fixture(scope="module")
def bucketed(spark, sf_dir):
    o = load_table(spark, "orders", sf_dir)
    c = load_table(spark, "customer", sf_dir)
    write_bucketed(o.select("o_orderkey", "o_custkey", "o_totalprice"), "orders_b", "o_custkey", 8)
    write_bucketed(c.select("c_custkey", "c_name"), "customer_b", "c_custkey", 8)
    yield
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS customer_b")


def test_bucketed_join_is_exchange_free(spark, bucketed):
    j = co_located_join(
        spark, "orders_b", "customer_b", F.col("o_custkey") == F.col("c_custkey")
    )
    plan = formatted_plan(j)
    assert "SortMergeJoin" in plan
    assert count_exchanges(j) == 0  # both sides scan-local: bucketing == pre-shuffled
    # buckets are pre-sorted single files, so the SMJ needs no Sort either
    assert "(+- Sort" not in plan.replace("   ", " ")


def test_bucketed_join_matches_plain_join(spark, bucketed, sf_dir):
    j = co_located_join(spark, "orders_b", "customer_b", F.col("o_custkey") == F.col("c_custkey"))
    o = load_table(spark, "orders", sf_dir)
    c = load_table(spark, "customer", sf_dir)
    plain = o.join(c, o.o_custkey == c.c_custkey)
    assert j.count() == plain.count()


def test_salted_join_matches_plain_join(spark, sf_dir):
    o = load_table(spark, "orders", sf_dir).withColumnRenamed("o_custkey", "custkey")
    c = load_table(spark, "customer", sf_dir).withColumnRenamed("c_custkey", "custkey")
    salted = salted_join(o, c.select("custkey", "c_name"), "custkey", num_salts=4)
    plain = o.join(c.select("custkey", "c_name"), "custkey")
    assert sorted(r.o_orderkey for r in salted.select("o_orderkey").collect()) == sorted(
        r.o_orderkey for r in plain.select("o_orderkey").collect()
    )


def test_salted_join_spreads_keys(spark, sf_dir):
    # every original key appears under num_salts distinct join sub-keys
    o = load_table(spark, "orders", sf_dir).withColumnRenamed("o_custkey", "custkey")
    fact_s = o.withColumn("__salt__", F.pmod(F.monotonically_increasing_id(), F.lit(4)).cast("int"))
    n_subkeys = fact_s.select("custkey", "__salt__").distinct().count()
    n_keys = o.select("custkey").distinct().count()
    assert n_subkeys > n_keys  # hot keys split across sub-keys


def test_bucket_pruned_point_lookup(spark, bucketed, sf_dir):
    """The at-scale form of the reference's RunOnKey (point lookup RPC,
    src/mr.c:2120-2173): an equality filter on the bucket key scans ONE
    bucket of the table, not all of them — Spark's analog of routing a
    GET to the slot-owning shard."""
    # autoBucketedScan turns the bucketed layout OFF for plans that
    # don't need its distribution — point lookups DO want it (pruning),
    # so pin it on, the way a lookup-serving session would
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try:
        lookup = spark.table("orders_b").filter(F.col("o_custkey") == 42)
        plan = formatted_plan(lookup)
        assert "SelectedBucketsCount: 1 out of 8" in plan, plan
    finally:
        spark.conf.unset("spark.sql.sources.bucketing.autoBucketedScan.enabled")
    lookup = spark.table("orders_b").filter(F.col("o_custkey") == 42)
    want = load_table(spark, "orders", sf_dir).filter(F.col("o_custkey") == 42).count()
    assert lookup.count() == want


def test_salted_join_hot_only_matches_plain(spark):
    # hot-threshold form: one key carries 1000 fact rows, 50 cold keys
    # carry 2 each; results must equal the plain join exactly, for both
    # inner and left (incl. a fact key missing from dim)
    fact = spark.createDataFrame(
        [(1, i) for i in range(1000)] + [(k, 0) for k in range(2, 52) for _ in range(2)] + [(999, -1)],
        "k int, payload int",
    )
    dim = spark.createDataFrame([(k, f"d{k}") for k in range(1, 52)], "k int, label string")
    for how in ("inner", "left"):
        got = salted_join(fact, dim, "k", num_salts=4, how=how, hot_threshold=100)
        want = fact.join(dim, "k", how)
        assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect())), how


def test_salted_join_hot_only_bounds_dim_inflation(spark):
    # only the hot key's dim row explodes to num_salts salts; cold dim
    # rows stay single — the whole point of the hot-threshold form
    from libmr_spark.operators.relational import salted_join as _sj  # noqa: F401

    fact = spark.createDataFrame(
        [(1, i) for i in range(1000)] + [(k, 0) for k in range(2, 52)], "k int, payload int"
    )
    dim = spark.createDataFrame([(k, f"d{k}") for k in range(1, 52)], "k int, label string")
    hot = (
        fact.groupBy("k")
        .agg(F.count(F.lit(1)).alias("__cnt__"))
        .filter(F.col("__cnt__") > 100)
        .select("k", F.lit(True).alias("__is_hot__"))
    )
    dim_s = dim.join(F.broadcast(hot), "k", "left").withColumn(
        "__salt__",
        F.explode(
            F.when(F.col("__is_hot__"), F.sequence(F.lit(0), F.lit(3))).otherwise(
                F.sequence(F.lit(0), F.lit(0))
            )
        ),
    )
    assert dim_s.count() == 51 + 3  # 50 cold rows + hot row exploded to 4


def test_salted_join_rejects_outer(spark, sf_dir):
    # the dim side is replicated num_salts times; a right/full outer join
    # would emit every unmatched dim row once per salt (ADVICE r1)
    import pytest
    from libmr_spark.sources.readers import load_table

    o = load_table(spark, "orders", sf_dir).withColumnRenamed("o_custkey", "custkey")
    c = load_table(spark, "customer", sf_dir).withColumnRenamed("c_custkey", "custkey")
    with pytest.raises(ValueError, match="inner/left"):
        salted_join(o, c.select("custkey", "c_name"), "custkey", how="right")
