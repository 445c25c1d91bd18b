"""Sources and sinks: format round-trips, the KeysReader prefix
filter, and the foreachPartition side-effecting sink (the reference's
write-back idiom, tests/mr_test_module/src/lib.rs:741-764)."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from libmr_spark.sources.readers import keys_reader, kv_table, load_table
from libmr_spark.sources.sinks import write_csv, write_json, write_parquet


def _sorted_rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.select(*cols).collect())


def test_parquet_sink_roundtrip(spark, sf_dir, tmp_path):
    kv = kv_table(spark, sf_dir)
    path = str(tmp_path / "kv_parquet")
    write_parquet(kv, path, partition_by=["type"])
    back = spark.read.parquet(path)
    assert _sorted_rows(back, ["key", "value"]) == _sorted_rows(kv, ["key", "value"])
    # partitionBy produced prunable directories (partition pruning on read)
    assert any(d.startswith("type=") for d in os.listdir(path))


def test_csv_json_sink_roundtrip(spark, sf_dir, tmp_path):
    kv = kv_table(spark, sf_dir).limit(100)
    want = _sorted_rows(kv, ["key", "value"])

    cpath = str(tmp_path / "kv_csv")
    write_csv(kv, cpath)
    back_csv = spark.read.option("header", "true").csv(cpath)
    assert _sorted_rows(back_csv, ["key", "value"]) == want

    jpath = str(tmp_path / "kv_json")
    write_json(kv, jpath)
    back_json = spark.read.json(jpath)
    assert _sorted_rows(back_json, ["key", "value"]) == want


def test_keys_reader_prefix_filter(spark, duck, sf_dir):
    # reference KeysReader takes an optional key-prefix match
    # (tests/mr_test_module/src/lib.rs:861-872)
    got = keys_reader(spark, {"sf_dir": sf_dir, "prefix": "key1"})
    want = duck.sql(
        "SELECT count(*) FROM orders WHERE concat('key', CAST(o_orderkey AS VARCHAR)) LIKE 'key1%'"
    ).fetchone()[0]
    assert got.count() == want
    assert all(r.key.startswith("key1") for r in got.select("key").collect())


def test_events_reader_timestamps_usable(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    assert dict(ev.dtypes)["ts"] == "timestamp"
    row = ev.agg(F.min("ts").alias("lo"), F.max("ts").alias("hi")).first()
    assert row.lo <= row.hi


def test_partition_pruning_on_read(spark, sf_dir, tmp_path):
    """partitionBy on write must translate into PartitionFilters on a
    filtered read — at 100 TB this is the difference between scanning
    one directory and scanning the corpus."""
    from libmr_spark.plans.explain import formatted_plan

    ev = load_table(spark, "events", sf_dir)
    path = str(tmp_path / "ev_by_type")
    write_parquet(ev, path, partition_by=["event_type"])
    back = spark.read.parquet(path).filter(F.col("event_type") == "click").select("event_id")
    plan = formatted_plan(back)
    m = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert m and any("event_type" in ln for ln in m), plan
    # and the pruned read still returns exactly the right rows
    assert back.count() == ev.filter(F.col("event_type") == "click").count()


def test_orc_sink_roundtrip(spark, sf_dir, tmp_path):
    kv = kv_table(spark, sf_dir).limit(200)
    path = str(tmp_path / "kv_orc")
    kv.write.mode("overwrite").orc(path)
    back = spark.read.orc(path)
    assert _sorted_rows(back, ["key", "value"]) == _sorted_rows(kv, ["key", "value"])


def test_kv_datasource(spark, duck, sf_dir):
    # custom Python DataSource (Spark 4 pluggable-source API): the kv
    # keyspace served through spark.read.format("libmr_kv"), one input
    # partition per CRC16 slot range — the reference's shard-scan shape
    from pyspark.sql import functions as F

    from libmr_spark.core.partitioner import key_slot
    from libmr_spark.sources.pyds import register_kv_datasource

    register_kv_datasource(spark)
    df = (
        spark.read.format("libmr_kv")
        .option("sf_dir", sf_dir)
        .option("numPartitions", "4")
        .load()
    )
    want = sorted(
        r[0] for r in duck.sql("SELECT concat('key', CAST(o_orderkey AS VARCHAR)) FROM orders").fetchall()
    )
    assert sorted(r.key for r in df.select("key").collect()) == want

    # slot-locality: every key's CRC16 slot falls in its partition's range
    with_pid = df.withColumn("pid", F.spark_partition_id()).select("key", "pid").collect()
    assert {r.pid for r in with_pid} == {0, 1, 2, 3}
    step = 16384 // 4
    for r in with_pid:
        assert r.pid * step <= key_slot(r.key) < (r.pid + 1) * step

    # prefix filter applied inside the source (KeysReader parity)
    some = spark.read.format("libmr_kv").option("sf_dir", sf_dir).option("prefix", "key1").load()
    got = [r.key for r in some.collect()]
    assert got and all(k.startswith("key1") for k in got)


def test_schema_guard_loads_all_tables(spark, sf_dir):
    """Every driver table loads under the dtype contract — the loud
    early failure for the next testdata regeneration (round 2's events
    drift surfaced as 11 per-query AnalysisExceptions instead)."""
    from libmr_spark.sources.readers import TABLE_NAMES, load_table

    for name in TABLE_NAMES:
        df = load_table(spark, name, sf_dir)
        assert df.columns, name
    # events.ts lands as a session-tz timestamp whatever the file had
    ts_type = dict(load_table(spark, "events", sf_dir).dtypes)["ts"]
    assert ts_type == "timestamp"


def test_schema_guard_detects_drift(spark):
    from libmr_spark.sources.readers import SchemaDriftError, check_schema

    bad = spark.createDataFrame([(1, "2024")], "event_id long, ts string")
    with pytest.raises(SchemaDriftError) as ei:
        check_schema("events", bad)
    msg = str(ei.value)
    assert "events" in msg and "'ts'" in msg and "user_id" in msg


def test_events_ts_dispatch_all_physical_types(spark, sf_dir, tmp_path):
    """The driver has shipped events.ts as TIMESTAMP(NANOS) (round 1)
    and timestamp[us] (round 2+). Pin all three dispatch branches of
    _normalize_events_ts by writing the same rows in each physical
    layout and asserting identical loaded values."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from libmr_spark.sources.readers import events_table

    base = [
        (1, 1704067200_123_456_000, 10, "click", 1.5, "{}"),
        (2, 1704070800_987_654_000, 11, "view", 2.5, "{}"),
    ]

    def write(dirname, ts_type, ts_vals):
        d = tmp_path / dirname
        d.mkdir()
        t = pa.table(
            {
                "event_id": pa.array([r[0] for r in base], pa.int64()),
                "ts": pa.array(ts_vals, ts_type),
                "user_id": pa.array([r[2] for r in base], pa.int64()),
                "event_type": pa.array([r[3] for r in base]),
                "value": pa.array([r[4] for r in base], pa.float64()),
                "props": pa.array([r[5] for r in base]),
            }
        )
        pq.write_table(t, str(d / "events.parquet"))
        return str(d)

    nanos = [r[1] for r in base]
    micros = [r[1] // 1000 for r in base]
    d_ns = write("sf_ns", pa.timestamp("ns"), nanos)
    d_us = write("sf_us", pa.timestamp("us"), micros)
    d_tz = write("sf_tz", pa.timestamp("us", tz="UTC"), micros)

    out = {}
    for label, d in [("ns", d_ns), ("us", d_us), ("tz", d_tz)]:
        df = events_table(spark, d)
        assert dict(df.dtypes)["ts"] == "timestamp", label
        out[label] = {
            r.event_id: r.ms
            for r in df.select("event_id", F.unix_millis("ts").alias("ms")).collect()
        }
    # all three physical layouts load to the same instant (ns floors)
    assert out["ns"] == out["us"] == out["tz"]
    assert out["us"][1] == 1704067200123


def test_compaction_reduces_file_count(spark, sf_dir, tmp_path):
    # 64 tiny files -> ceil(bytes/target); rows and values preserved
    import os

    from libmr_spark.sources.sinks import compact_small_files

    path = str(tmp_path / "many_small")
    d = load_table(spark, "documents", sf_dir).select("doc_id", "source", "n_chars")
    d.repartition(64).write.mode("overwrite").parquet(path)
    n_before = len([f for f in os.listdir(path) if f.endswith(".parquet")])
    assert n_before == 64

    before = sorted(r.doc_id for r in spark.read.parquet(path).collect())
    n_out = compact_small_files(spark, path, target_bytes=64 * 1024 * 1024)
    n_after = len([f for f in os.listdir(path) if f.endswith(".parquet")])
    assert n_after == n_out < n_before
    after = sorted(r.doc_id for r in spark.read.parquet(path).collect())
    assert before == after


def test_sorted_write_skips_row_groups(spark, sf_dir, tmp_path):
    # measure ACTUAL parquet footer min/max stats: for a 5-day range
    # predicate, the sorted layout's overlapping row-group fraction
    # must be far below the unsorted layout's (which is ~1.0 because
    # every file spans the whole month)
    import datetime
    import os

    import pyarrow.parquet as pq

    from libmr_spark.sources.sinks import write_sorted

    e = load_table(spark, "events", sf_dir).select("event_id", "ts", "value")
    sorted_path = str(tmp_path / "sorted")
    unsorted_path = str(tmp_path / "unsorted")
    write_sorted(e, sorted_path, range_col="ts", n_files=16)
    # unsorted control needs stats too (Spark's default INT96 timestamps
    # carry none — the trap write_sorted's docstring documents)
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    try:
        e.repartition(16).write.mode("overwrite").parquet(unsorted_path)
    finally:
        spark.conf.unset("spark.sql.parquet.outputTimestampType")

    lo = datetime.datetime(2024, 1, 10)
    hi = datetime.datetime(2024, 1, 15)

    def overlap_frac(path):
        total = hit = 0
        for fname in os.listdir(path):
            if not fname.endswith(".parquet"):
                continue
            md = pq.ParquetFile(os.path.join(path, fname)).metadata
            ts_idx = md.schema.to_arrow_schema().get_field_index("ts")
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(ts_idx).statistics
                total += 1
                mn = st.min.replace(tzinfo=None) if st.min.tzinfo else st.min
                mx = st.max.replace(tzinfo=None) if st.max.tzinfo else st.max
                if mx >= lo and mn < hi:
                    hit += 1
        assert total > 0
        return hit / total

    f_sorted = overlap_frac(sorted_path)
    f_unsorted = overlap_frac(unsorted_path)
    assert f_unsorted > 0.9          # every unsorted file spans the month
    assert f_sorted <= 0.5           # sorted layout prunes most row groups
    assert f_sorted < f_unsorted / 2


def test_merge_upsert_randomized_scenarios(spark, sf_dir, tmp_path):
    # seeded random update batches vs an in-memory reference merge:
    # covers pure-update, pure-insert, mixed, multi-partition, and
    # empty batches; plus the duplicate-source-key contract
    import random

    import pytest as _pytest
    from pyspark.sql import functions as F

    from libmr_spark.sources.sinks import merge_upsert

    rng = random.Random(42)
    base_rows = [(k, k % 5, float(k)) for k in range(200)]
    schema = "k bigint, p int, v double"

    for trial in range(4):
        path = str(tmp_path / f"tbl{trial}")
        spark.createDataFrame(base_rows, schema).write.mode("overwrite").partitionBy(
            "p"
        ).parquet(path)

        upd_keys = rng.sample(range(200), rng.randint(0, 40))          # updates
        ins_keys = rng.sample(range(1000, 1100), rng.randint(0, 20))   # inserts
        upd_rows = [(k, k % 5, float(k) + 0.5) for k in upd_keys] + [
            (k, k % 5, -1.0) for k in ins_keys
        ]
        if not upd_rows:
            continue
        merge_upsert(
            spark,
            path,
            spark.createDataFrame(upd_rows, schema),
            keys=["k"],
            partition_col="p",
        )
        got = sorted(map(tuple, spark.read.parquet(path).select("k", "p", "v").collect()))
        ref = {k: (k, k % 5, float(k)) for k in range(200)}
        for k, p, v in upd_rows:
            ref[k] = (k, p, v)
        assert got == sorted(ref.values()), f"trial {trial}"

    # duplicate source keys must be rejected, and the base untouched
    path = str(tmp_path / "tbl_dup")
    spark.createDataFrame(base_rows, schema).write.mode("overwrite").partitionBy(
        "p"
    ).parquet(path)
    dup_batch = spark.createDataFrame([(1, 1, 9.0), (1, 1, 8.0)], schema)
    with _pytest.raises(ValueError, match="duplicate key"):
        merge_upsert(spark, path, dup_batch, keys=["k"], partition_col="p")
    assert spark.read.parquet(path).count() == len(base_rows)


def test_incremental_agg_refresh_touches_only_delta_partitions(spark, sf_dir, tmp_path):
    # base agg over days 1-20; delta for days 21+ and late day-19 rows:
    # days 1-18 + 20 files must be byte-identical (mtime) after refresh,
    # and the refreshed table must equal the from-scratch aggregate
    import os

    from pyspark.sql import functions as F

    from libmr_spark.sources.readers import load_table
    from libmr_spark.sources.sinks import refresh_incremental_agg

    path = str(tmp_path / "agg")
    e = load_table(spark, "events", sf_dir).select(
        F.dayofmonth("ts").cast("int").alias("d"),
        "event_type",
        "event_id",
        F.col("value").cast("decimal(18,6)").alias("v"),
    )

    def agg(df):
        return df.groupBy("d", "event_type").agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("v").cast("decimal(18,6)").alias("sum_value"),
        )

    late = (F.col("d") == 19) & (F.col("event_id") % 7 == 0)
    agg(e.filter((F.col("d") <= 20) & ~late)).write.mode("overwrite").partitionBy(
        "d"
    ).parquet(path)

    def mtimes():
        out = {}
        for part in os.listdir(path):
            if part.startswith("d="):
                p = os.path.join(path, part)
                out[part] = {f: os.path.getmtime(os.path.join(p, f)) for f in os.listdir(p)}
        return out

    before = mtimes()
    refresh_incremental_agg(
        spark,
        path,
        agg(e.filter((F.col("d") > 20) | late)),
        keys=["d", "event_type"],
        partition_col="d",
        merge_cols=["n", "sum_value"],
    )
    after = mtimes()
    for part in before:
        day = int(part.split("=")[1])
        if day <= 18 or day == 20:
            assert before[part] == after[part], f"{part} should be untouched"
    assert before["d=19"] != after["d=19"]  # late data rewrote day 19

    got = sorted(
        map(tuple, spark.read.parquet(path).select("d", "event_type", "n", "sum_value").collect())
    )
    want = sorted(map(tuple, agg(e).select("d", "event_type", "n", "sum_value").collect()))
    assert got == want  # bit-identical to from-scratch aggregate


def test_kv_writer_two_phase_commit(spark, sf_dir, tmp_path):
    # commit: only manifest-listed files are visible; abort: a failed
    # job publishes NOTHING (no manifest, no data files); orphans in
    # the directory are invisible to the manifest-honoring reader
    import json
    import os

    from pyspark.sql import functions as F

    from libmr_spark.sources.pyds import read_kv_sink, register_kv_datasource

    register_kv_datasource(spark)
    path = str(tmp_path / "kv_out")
    kv = load_table(spark, "orders", sf_dir).select(
        F.concat(F.lit("key"), F.col("o_orderkey").cast("string")).alias("key"),
        F.col("o_totalprice").cast("string").alias("value"),
        F.lit("string").alias("type"),
    )
    kv.repartition(4).write.format("libmr_kv").option("path", path).mode(
        "overwrite"
    ).save()
    manifest = json.load(open(os.path.join(path, "_KV_SUCCESS")))
    assert manifest["n_rows"] == kv.count()
    assert read_kv_sink(spark, path).count() == kv.count()

    # an orphan file (e.g. an undead task attempt) is not visible
    with open(os.path.join(path, "zz_orphan.jsonl"), "w") as f:
        f.write('{"key": "kX", "value": "1", "type": "string"}\n')
    assert read_kv_sink(spark, path).count() == kv.count()

    # failed job: one partition poisons -> abort -> nothing published
    fail_path = str(tmp_path / "kv_fail")

    @F.udf("string")
    def poison(k):
        if k == "key1":
            raise RuntimeError("poisoned row")
        return k

    bad = kv.withColumn("key", poison("key"))
    import pytest as _pytest

    with _pytest.raises(Exception):
        bad.repartition(4).write.format("libmr_kv").option("path", fail_path).mode(
            "overwrite"
        ).save()
    published = [
        f for f in os.listdir(fail_path) if not f.startswith("_staging")
    ] if os.path.exists(fail_path) else []
    assert "_KV_SUCCESS" not in published
    assert not [f for f in published if f.endswith(".jsonl")]


def test_pyds_stream_resumes_from_checkpoint(spark, sf_dir, tmp_path):
    # drain 1 (clock=day 10) sinks exactly days 1-10; drain 2 (clock=31)
    # adds ONLY days 11-30 — a re-read from initialOffset would double
    # the early days, a skipped resume would lose the late ones
    from pyspark.sql import functions as F

    from libmr_spark.sources.pyds import register_events_stream_source

    register_events_stream_source(spark)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    def drain(upto):
        q = (
            spark.readStream.format("libmr_events_stream")
            .option("sf_dir", sf_dir)
            .option("upto_day", str(upto))
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    e = load_table(spark, "events", sf_dir)
    drain(10)
    got1 = spark.read.parquet(out)
    assert got1.count() == e.filter(F.dayofmonth("ts") <= 10).count()
    assert got1.agg(F.max("d")).first()[0] <= 10

    drain(31)
    got2 = spark.read.parquet(out)
    assert got2.count() == e.count()
    # early days present exactly once (no re-read across the restart)
    assert (
        got2.filter("d <= 10").count()
        == e.filter(F.dayofmonth("ts") <= 10).count()
    )


def test_kv_stream_sink_epoch_replay_is_idempotent(spark, sf_dir, tmp_path):
    # a re-delivered batchId must REPLACE its epoch, not append; torn
    # epochs (no manifest) are invisible to the reader
    import json
    import os

    from libmr_spark.sources.pyds import KvStreamWriter, read_kv_stream_sink

    import pyarrow as pa

    path = str(tmp_path / "stream_sink")
    w = KvStreamWriter({"path": path})

    def rb(*ids):
        return pa.RecordBatch.from_pylist([{"event_id": i} for i in ids])

    # epoch 0, attempt 1 (the writer receives Arrow RecordBatches)
    m1 = w.write(iter([rb(1, 2)]))
    w.commit([m1], batchId=0)
    # epoch 0 RE-DELIVERED (failure recovery) with the same rows
    m2 = w.write(iter([rb(1, 2)]))
    w.commit([m2], batchId=0)
    # epoch 1
    m3 = w.write(iter([rb(3)]))
    w.commit([m3], batchId=1)
    # epoch 2 aborts after staging
    m4 = w.write(iter([rb(4)]))
    w.abort([m4], batchId=2)

    back = read_kv_stream_sink(spark, path, "event_id bigint")
    assert sorted(r.event_id for r in back.collect()) == [1, 2, 3]
    manifest = json.load(open(os.path.join(path, "epoch=0", "_EPOCH_SUCCESS")))
    assert manifest["n_rows"] == 2  # replaced, not doubled
    assert not os.path.exists(os.path.join(path, "epoch=2"))


def test_kv_writer_append_merges_manifest_and_format_readback(spark, sf_dir, tmp_path):
    # append mode must MERGE the prior commit's manifest (not orphan
    # it), and format("libmr_kv").option("path") reads back through
    # the manifest — full symmetry through the format string
    from pyspark.sql import functions as F

    from libmr_spark.sources.pyds import register_kv_datasource

    register_kv_datasource(spark)
    path = str(tmp_path / "kv_append")
    kv = load_table(spark, "orders", sf_dir).select(
        F.concat(F.lit("key"), F.col("o_orderkey").cast("string")).alias("key"),
        F.col("o_totalprice").cast("string").alias("value"),
        F.lit("string").alias("type"),
    )
    b1 = kv.filter("key like 'key1%'")
    b2 = kv.filter("key like 'key2%'")
    b1.repartition(2).write.format("libmr_kv").option("path", path).mode("overwrite").save()
    b2.repartition(2).write.format("libmr_kv").option("path", path).mode("append").save()
    back = spark.read.format("libmr_kv").option("path", path).load()
    assert back.count() == b1.count() + b2.count()
    assert back.filter("key like 'key1%'").count() == b1.count()


def test_kv_writer_commit_crash_leaves_old_snapshot(tmp_path, monkeypatch):
    # round-6 advice: the manifest swap is the commit point. A driver
    # crash ANYWHERE inside commit() before the os.replace() must
    # leave the previously-published snapshot fully readable (old
    # manifest naming old files, all still on disk); a crash after
    # the swap leaves exactly the new snapshot. Unit-level: drive
    # KvDataSourceWriter.commit directly with a poisoned os.replace.
    import json
    import os

    from libmr_spark.sources.pyds import KvCommit, KvDataSourceWriter

    path = str(tmp_path / "kv")
    os.makedirs(path)
    # previously-published snapshot
    with open(os.path.join(path, "old.jsonl"), "w") as f:
        f.write('{"key": "a", "value": "1", "type": "string"}\n')
    with open(os.path.join(path, "_KV_SUCCESS"), "w") as f:
        json.dump({"files": ["old.jsonl"], "n_rows": 1}, f)

    # a staged new attempt
    staging = os.path.join(path, "_staging")
    os.makedirs(staging)
    with open(os.path.join(staging, "new.jsonl"), "w") as f:
        f.write('{"key": "b", "value": "2", "type": "string"}\n')

    w = KvDataSourceWriter({"path": path}, overwrite=True)
    real_replace = os.replace

    def boom(src, dst):
        raise OSError("simulated driver crash at the swap")

    monkeypatch.setattr(os, "replace", boom)
    try:
        w.commit([KvCommit("new.jsonl", 1)])
    except OSError:
        pass
    monkeypatch.setattr(os, "replace", real_replace)

    # old snapshot intact: manifest still names old.jsonl and it exists
    manifest = json.load(open(os.path.join(path, "_KV_SUCCESS")))
    assert manifest["files"] == ["old.jsonl"]
    for fname in manifest["files"]:
        assert os.path.exists(os.path.join(path, fname))

    # retry (no crash): new snapshot fully replaces the old one
    staging2 = os.path.join(path, "_staging")
    os.makedirs(staging2, exist_ok=True)
    with open(os.path.join(staging2, "new2.jsonl"), "w") as f:
        f.write('{"key": "b", "value": "2", "type": "string"}\n')
    w.commit([KvCommit("new2.jsonl", 1)])
    manifest = json.load(open(os.path.join(path, "_KV_SUCCESS")))
    assert manifest["files"] == ["new2.jsonl"]
    assert not os.path.exists(os.path.join(path, "old.jsonl"))
    assert not os.path.exists(os.path.join(path, "_KV_SUCCESS.tmp"))
