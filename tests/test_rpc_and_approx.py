"""InternalCommand fan-out parity and approximate-aggregate accuracy."""

from __future__ import annotations

from pyspark.sql import functions as F

from libmr_spark.core.rpc import internal_command
from libmr_spark.sources.readers import kv_table, load_table


def test_internal_command_fanout(spark, sf_dir):
    # reference: internal-commands pipeline broadcast to all shards,
    # replies parsed per node (src/mr.c:1160-1220)
    kv = kv_table(spark, sf_dir).repartition(4)
    out = internal_command(kv, ["DBSIZE", "PING"]).collect()
    dbsizes = [int(r.reply) for r in out if r.command == "DBSIZE"]
    pings = [r.reply for r in out if r.command == "PING"]
    assert sum(dbsizes) == kv.count()
    assert len(pings) <= 4 and all(p == "PONG" for p in pings)


def test_internal_command_error_record(spark, sf_dir):
    # unknown command → in-band ERR reply, execution completes
    kv = kv_table(spark, sf_dir).repartition(2)
    out = internal_command(kv, ["NOSUCH"]).collect()
    assert all(r.reply.startswith("ERR") for r in out)
    assert len(out) >= 1


def test_internal_command_reply_parser(spark, sf_dir):
    kv = kv_table(spark, sf_dir).repartition(2)
    out = internal_command(
        kv,
        ["DBSIZE"],
        reply_parser=lambda cmd, raw: {"command": cmd, "n": int(raw)},
        out_schema="command string, n bigint",
    ).collect()
    assert sum(r.n for r in out) == kv.count()


def test_approx_count_distinct_accuracy(spark, sf_dir):
    li = load_table(spark, "lineitem", sf_dir)
    exact = {
        r.l_returnflag: r.n
        for r in li.groupBy("l_returnflag").agg(F.countDistinct("l_partkey").alias("n")).collect()
    }
    approx = {
        r.l_returnflag: r.n
        for r in li.groupBy("l_returnflag").agg(F.approx_count_distinct("l_partkey").alias("n")).collect()
    }
    for k, v in exact.items():
        assert abs(approx[k] - v) / v < 0.05  # HLL++ default rsd


def test_percentile_approx_bounds(spark, sf_dir):
    li = load_table(spark, "lineitem", sf_dir)
    row = li.agg(
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("p50"),
        F.min("l_extendedprice").alias("lo"),
        F.max("l_extendedprice").alias("hi"),
        F.expr("percentile(l_extendedprice, 0.5)").alias("exact_p50"),
    ).first()
    assert row.lo <= row.p50 <= row.hi
    assert abs(row.p50 - row.exact_p50) / row.exact_p50 < 0.05


def test_rpc_timeout_mirrors_reference(spark, sf_dir):
    # per-call deadline parity with MR_RunOnKey/MR_RunOnAllShards
    # (/root/reference/src/mr.c:2085-2099): past the deadline the jobs
    # are cancelled and "Remote task timeout" is raised
    import time

    import pytest

    from libmr_spark.core.builder import ExecutionError
    from libmr_spark.core.rpc import (
        REMOTE_TASK_TIMEOUT_ERROR,
        run_on_all_shards,
        run_on_key,
    )

    kv = kv_table(spark, sf_dir)

    def slow_task(part, args=None):
        time.sleep(30)
        return {"n": len(part)}

    with pytest.raises(ExecutionError, match=REMOTE_TASK_TIMEOUT_ERROR):
        run_on_all_shards(kv, slow_task, "n bigint", timeout_ms=1500)

    def slow_point(hit):
        time.sleep(30)
        return hit

    some_key = kv.select("key").first().key
    with pytest.raises(ExecutionError, match=REMOTE_TASK_TIMEOUT_ERROR):
        # the task builds a lazy plan instantly; the deadline must cover
        # the actual execution, which blocks in the slow python stage
        run_on_key(
            kv,
            "key",
            some_key,
            task=lambda hit: hit.mapInPandas(
                lambda it: (_ for _ in ()).throw(SystemError) if time.sleep(30) else it,
                schema="key string, value string, type string",
            ),
            timeout_ms=1500,
        )

    # a fast call under deadline returns normal rows
    got = run_on_key(kv, "key", some_key, timeout_ms=30000)
    assert got.count() == 1
