"""Round-5 additions: the distributed-algorithm shapes a 100 TB
deployment leans on when the naive plan stops fitting.

Six groups (29 queries):
- scale-pattern algorithms: Misra-Gries two-pass heavy hitters,
  mergeable histogram percentiles, time-bucketed interval overlap
  join, degree-oriented edge-centric triangle counting, HLL sketch
  rollups, md5-60bit cross-engine-verifiable SimHash;
- table maintenance: SCD2, Z-order clustered writes, idempotent
  append, dynamic partition pruning, retention vacuum, runtime bloom
  join, snapshot-diff CDC, incremental dedup vs persisted history;
- LLM-pipeline analytics: cross-source contamination matrix,
  histogram-decile curriculum assignment, closed-form trend fit,
  end-to-end gate->dedup->pack composition;
- pluggable Python DataSource quadrilogy: kv batch writer (two-phase
  commit), checkpointable stream source, per-epoch streaming sink;
- streaming CEP + CDC apply: A-then-B pattern matcher,
  foreachBatch + recency-aware MERGE;
- Spark-4 SQL surfaces + audit: VARIANT extraction, WITH RECURSIVE
  bounded-hop BFS, LATERAL correlated top-k, Welch t from moments,
  order-free content audit hashes.

Registered into the same ``QUERIES`` dict as queries.py / queries_ext /
queries_pipeline (imported from queries.py last).  New names export
AFTER the round-5 gate window — neither in ``_NEWEST`` nor
``_DRIVER_CHECKED`` — so they gate in round 6 without displacing the
rotation's evidence plan.

Determinism notes (queries.py module-docstring contract): every
boundary decision is integer arithmetic (histogram bins, ceil via
``(a + b - 1) div b``, session break flags), every top-k has a unique
tie-break, and no libm-derived value feeds a comparison.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .queries import QUERIES, _quality_sql, _t, defquery  # noqa: F401

_DEC6 = "decimal(18,6)"  # exact accumulation type for double `value` sums

# ------------------------------------------------------------------
# 1. Two-pass heavy hitters (Misra-Gries partials + exact verify)
# ------------------------------------------------------------------

_MG_CAPACITY = 512  # per-partition summary size m: any key with global
                    # frequency > n/(m+1) survives every partial (the
                    # MG bound sums across partitions), so pass 2 sees it
_HH_K = 10


@defquery(
    "heavy_hitters_2pass",
    f"""
    SELECT user_id, CAST(count(*) AS BIGINT) AS n
    FROM events GROUP BY user_id
    ORDER BY n DESC, user_id LIMIT {_HH_K}
    """,
    "two-pass exact heavy hitters: pass 1 runs a mergeable Misra-Gries "
    "summary (capacity m=512) per partition — memory O(m) regardless "
    "of per-partition distinct count, the property a 100 TB user-id "
    "column needs where a plain groupBy's hash table is unbounded — "
    "and the union of partial summaries provably contains every key "
    "with global frequency > n/(m+1) (each partial's undercount is at "
    "most n_part/(m+1); the bounds sum). Pass 2 broadcast-semi-joins "
    "the <= m*P candidates back and counts them EXACTLY, so the "
    "output is identical to the oracle's full groupBy top-k whenever "
    "the k-th frequency clears the bound (holds at every test SF; at "
    "100 TB m scales with n/f_k, still driver-trivial). Tie-broken on "
    "user_id so the boundary row is unique cross-engine.",
)
def heavy_hitters_2pass_q(spark, sf_dir):
    from .operators.sketches import heavy_hitters

    e = _t(spark, sf_dir, "events").select("user_id")
    return heavy_hitters(e, "user_id", k=_HH_K, capacity=_MG_CAPACITY)


# ------------------------------------------------------------------
# 2. Mergeable histogram percentiles (no global sort)
# ------------------------------------------------------------------

_BIN_W = 5  # value domain is [0, ~500); 100 fixed-width bins


@defquery(
    "hist_percentiles_mergeable",
    f"""
    WITH partial AS (
        SELECT event_type, CAST(day(ts) AS INT) AS d,
               CAST(floor(value / {_BIN_W}) AS INT) AS bin,
               count(*) AS c
        FROM events GROUP BY 1, 2, 3),
    merged AS (
        SELECT event_type, bin, SUM(c) AS c FROM partial GROUP BY 1, 2),
    cum AS (
        SELECT event_type, bin, c,
               SUM(c) OVER (PARTITION BY event_type ORDER BY bin) AS cum,
               SUM(c) OVER (PARTITION BY event_type) AS n
        FROM merged)
    SELECT event_type, CAST(max(n) AS BIGINT) AS n,
           CAST({_BIN_W} * (min(CASE WHEN cum * 100 >= n * 50 THEN bin END) + 1) AS DOUBLE) AS p50_est,
           CAST({_BIN_W} * (min(CASE WHEN cum * 100 >= n * 90 THEN bin END) + 1) AS DOUBLE) AS p90_est,
           CAST({_BIN_W} * (min(CASE WHEN cum * 100 >= n * 99 THEN bin END) + 1) AS DOUBLE) AS p99_est
    FROM cum GROUP BY event_type
    """,
    "percentiles from mergeable fixed-width histograms: the per-(type, "
    "day, bin) counts are the stored partial — SUM-mergeable under any "
    "arrival grouping exactly like incremental_agg_refresh's partials, "
    "so a 100 TB deployment maintains them incrementally per day and "
    "answers any percentile from ~|types|*100 rows without ever "
    "sorting the raw column (the global-sort percentile is the plan "
    "that dies first at scale; approx_percentile re-scans raw data "
    "every query). Estimates are deterministic bin upper-edges and the "
    "integer predicate cum*100 >= n*p avoids any float boundary — the "
    "error bound is the bin width, fixed at write time. Estimates "
    "follow percentile_disc semantics (value at rank ceil(p*n)): the "
    "returned edge is within one bin width ABOVE the disc percentile, "
    "always; the interpolating percentile() can differ from any "
    "rank-based answer by a whole tail gap, which is a property of "
    "sparse tails, not of the histogram.",
)
def hist_percentiles_mergeable_q(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    partial = (
        e.select(
            "event_type",
            F.dayofmonth("ts").cast("int").alias("d"),
            F.floor(F.col("value") / _BIN_W).cast("int").alias("bin"),
        )
        .groupBy("event_type", "d", "bin")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    merged = partial.groupBy("event_type", "bin").agg(F.sum("c").alias("c"))
    w = Window.partitionBy("event_type").orderBy("bin")
    cum = merged.select(
        "event_type",
        "bin",
        F.sum("c").over(w).alias("cum"),
        F.sum("c").over(Window.partitionBy("event_type")).alias("n"),
    )

    def edge(p):
        hit = F.when(F.col("cum") * 100 >= F.col("n") * p, F.col("bin"))
        return (float(_BIN_W) * (F.min(hit) + 1)).cast("double").alias(f"p{p}_est")

    return cum.groupBy("event_type").agg(
        F.max("n").cast("bigint").alias("n"), edge(50), edge(90), edge(99)
    )


# ------------------------------------------------------------------
# 3. Interval overlap join via time-bucket blocking
# ------------------------------------------------------------------

_GAP_MIN = 30  # session gap; sessions need >= 2 events to be intervals


@defquery(
    "interval_overlap_sessions",
    f"""
    WITH s AS (
        SELECT user_id, ts,
               CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                      OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                         > INTERVAL {_GAP_MIN} MINUTE
                    THEN 1 ELSE 0 END AS brk
        FROM events),
    g AS (SELECT user_id, ts,
                 SUM(brk) OVER (PARTITION BY user_id ORDER BY ts) AS sid
          FROM s),
    iv AS (SELECT user_id, CAST(sid AS INT) AS sid,
                  min(ts) AS st, max(ts) AS en
           FROM g GROUP BY 1, 2 HAVING count(*) >= 2)
    SELECT a.user_id AS user_a, a.sid AS sid_a,
           b.user_id AS user_b, b.sid AS sid_b,
           CAST(floor(epoch(least(a.en, b.en))) - floor(epoch(greatest(a.st, b.st)))
                AS BIGINT) AS overlap_sec
    FROM iv a JOIN iv b
      ON a.st <= b.en AND b.st <= a.en AND a.user_id < b.user_id
    """,
    "interval overlap join with time-bucket blocking: sessions "
    "(30-min gap, >= 2 events) become [start, end] intervals; each "
    "interval is exploded to the hour buckets it covers and pairs meet "
    "ONLY inside a shared bucket (equi-join), then the exact overlap "
    "predicate verifies. The oracle is the unblocked theta self-join — "
    "blocking must be semantically transparent, which holds because "
    "two overlapping intervals always share the bucket containing "
    "max(start): per-pair work is bounded by bucket occupancy, not "
    "n^2, and the bucket width tunes fan-out (sessions span few hours "
    "by the gap bound, so the explode factor is small and the "
    "candidate set is LINEAR in concurrent-session density — the same "
    "bounded-blocking contract as dedup_ngram_jaccard's max_df). "
    "A Spark range-join hint covers the same shape engine-side; this "
    "is the portable plan a 100 TB event log needs when it can't "
    "trust the engine to avoid the cartesian fallback.",
)
def interval_overlap_sessions_q(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts")
    # microsecond-exact gap test — the oracle compares INTERVAL values,
    # so a seconds-truncated diff would disagree on sub-second boundaries
    brk = (
        F.when(
            F.lag("ts").over(w).isNull()
            | (
                F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
                > _GAP_MIN * 60 * 1_000_000
            ),
            1,
        )
        .otherwise(0)
        .alias("brk")
    )
    g = e.select("user_id", "ts", brk).select(
        "user_id", "ts", F.sum("brk").over(w).cast("int").alias("sid")
    )
    iv = (
        g.groupBy("user_id", "sid")
        .agg(F.min("ts").alias("st"), F.max("ts").alias("en"), F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= 2)
        .drop("cnt")
    )
    from .operators.relational import interval_overlap_join

    pairs, _ = interval_overlap_join(
        iv,
        "st",
        "en",
        bucket="hour",
        pair_filter=lambda a, b: F.col("a.user_id") < F.col("b.user_id"),
    )
    return pairs.select(
        F.col("a_user_id").alias("user_a"),
        F.col("a_sid").alias("sid_a"),
        F.col("b_user_id").alias("user_b"),
        F.col("b_sid").alias("sid_b"),
        (
            F.least("a_en", "b_en").cast("long")
            - F.greatest("a_st", "b_st").cast("long")
        ).alias("overlap_sec"),
    )


# ------------------------------------------------------------------
# 4. Triangle counting with degree orientation
# ------------------------------------------------------------------


@defquery(
    "triangle_count_copurchase",
    """
    WITH e AS (
        SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey)
    SELECT CAST((SELECT count(DISTINCT l_partkey) FROM lineitem) AS BIGINT)
               AS n_vertices,
           CAST((SELECT count(*) FROM e) AS BIGINT) AS n_edges,
           CAST((SELECT count(*)
                 FROM e e1
                 JOIN e e2 ON e2.u = e1.u AND e1.v < e2.v
                 JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v) AS BIGINT)
               AS n_triangles
    """,
    "triangle counting on the co-purchase graph (edge = two parts "
    "appearing in the same order). Edge GENERATION is linear by the "
    "data model itself: per-order pair fan-out is bounded by the "
    "basket size (<= 7 lineitems per TPC-H order -> <= 21 pairs), so "
    "no hot-group cap is needed — unlike a time-cell co-occurrence "
    "graph, whose cells densify quadratically as rows-per-cell grow "
    "with data volume (measured: the (type,hour) variant of this "
    "query hit 95s at sf0.1 and was replaced). The COUNT uses degree "
    "orientation: each undirected edge directed from its lower-"
    "(degree, id) endpoint, every triangle counted exactly once as a "
    "wedge at its smallest vertex, per-vertex wedge fan-out bounded "
    "by out-degree = O(sqrt(m)) — the bound that survives power-law "
    "hub parts where the unoriented wedge join is quadratic in hub "
    "degree. The oracle counts the same triangles with an unoriented "
    "3-way self-join: orientation must be count-preserving.",
)
def triangle_count_q(spark, sf_dir):
    from .operators.graph import triangle_count

    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    # basket expansion instead of a self-join: one groupBy shuffle
    # builds each order's (sorted, deduped) part set, pairs expand
    # in-line from the array — per-row fan-out bounded by the basket
    # size, and the join's second shuffle of the whole fact disappears
    # (measured 7.5s -> ~2s for edge generation at sf0.1)
    baskets = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_set("l_partkey")).alias("ps")
    )
    edges = (
        baskets.select(
            F.explode(
                F.expr(
                    "flatten(transform(ps, (x, i) -> "
                    "transform(slice(ps, i + 2, size(ps)), y -> struct(x AS u, y AS v))))"
                )
            ).alias("p")
        )
        .select("p.u", "p.v")
        .distinct()
    )
    counts = triangle_count(edges, "u", "v")
    n_vert = li.agg(
        F.count_distinct("l_partkey").cast("bigint").alias("n_vertices")
    )
    return n_vert.crossJoin(counts)


# ------------------------------------------------------------------
# 5. SCD type-2 dimension maintenance
# ------------------------------------------------------------------


@defquery(
    "scd2_customer_segments",
    """
    WITH cur AS (SELECT c_custkey, c_mktsegment, c_nationkey FROM customer),
    changed AS (SELECT * FROM cur WHERE c_custkey % 10 = 0)
    SELECT c_custkey, c_mktsegment, CAST(c_nationkey AS INT) AS c_nationkey,
           1 AS valid_from, CAST(NULL AS INT) AS valid_to, TRUE AS is_current
    FROM cur WHERE c_custkey % 10 <> 0
    UNION ALL
    SELECT c_custkey, c_mktsegment, CAST(c_nationkey AS INT), 1, 2, FALSE
    FROM changed
    UNION ALL
    SELECT c_custkey, 'PROMO', CAST(c_nationkey AS INT), 2, CAST(NULL AS INT), TRUE
    FROM changed
    UNION ALL
    SELECT c_custkey + 10000000, 'NEWBIE', CAST(c_nationkey AS INT), 2,
           CAST(NULL AS INT), TRUE
    FROM cur WHERE c_custkey % 100 = 0
    """,
    "slowly-changing-dimension type-2 maintenance: an initial customer "
    "snapshot loads at version 1, then a version-2 snapshot arrives "
    "with ~10% of segments changed plus new customers; scd2_merge "
    "closes changed rows (valid_to=2), opens replacements, inserts new "
    "keys, and leaves unchanged keys' validity untouched. Layout is "
    "the 100 TB cost contract: the is_current=true partition (the live "
    "dim, O(|dim|)) is the ONLY thing a merge rewrites, and the "
    "is_current=false history partition is append-only — history "
    "files are never rewritten (mtime-pinned in tests), so merge cost "
    "is flat in the number of accumulated versions. The oracle "
    "reconstructs the exact post-merge table state arithmetically: "
    "versioning must be deterministic, not incidental.",
)
def scd2_customer_segments_q(spark, sf_dir):
    from .queries_ext import _sink_dir
    from .sources.sinks import scd2_init, scd2_merge

    path = _sink_dir("customer_scd2", sf_dir)
    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", F.col("c_nationkey").cast("int").alias("c_nationkey")
    )
    keys, tracked = ["c_custkey"], ["c_mktsegment", "c_nationkey"]
    scd2_init(cust, path, keys, tracked, version=1)
    snap2 = cust.withColumn(
        "c_mktsegment",
        F.when(F.col("c_custkey") % 10 == 0, F.lit("PROMO")).otherwise(
            F.col("c_mktsegment")
        ),
    ).unionByName(
        cust.filter(F.col("c_custkey") % 100 == 0).select(
            (F.col("c_custkey") + 10_000_000).alias("c_custkey"),
            F.lit("NEWBIE").alias("c_mktsegment"),
            "c_nationkey",
        )
    )
    scd2_merge(spark, path, snap2, keys, tracked, version=2)
    return spark.read.parquet(path).select(
        "c_custkey",
        "c_mktsegment",
        "c_nationkey",
        "valid_from",
        "valid_to",
        # hive partition values read back as strings — restore the bool
        F.col("is_current").cast("boolean").alias("is_current"),
    )


# ------------------------------------------------------------------
# 6. Z-order clustered write (multi-column data skipping)
# ------------------------------------------------------------------


@defquery(
    "sink_zorder_skipping_roundtrip",
    """
    SELECT
      CAST(SUM(CASE WHEN user_id BETWEEN 40 AND 47 THEN 1 ELSE 0 END) AS BIGINT)
          AS n_user_band,
      CAST(SUM(CASE WHEN value >= 480 THEN 1 ELSE 0 END) AS BIGINT) AS n_value_band,
      CAST(SUM(CASE WHEN user_id BETWEEN 40 AND 47 THEN CAST(value AS DECIMAL(18,6))
                    ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE) AS sum_user_band
    FROM events
    """,
    "Z-order clustered write + roundtrip: events are rewritten sorted "
    "by the Morton interleave of (user_id, floor(value)) — one sorted "
    "layout that makes parquet min/max row-group stats selective on "
    "BOTH columns at once, where write_sorted's lexicographic layout "
    "only skips on its leading column (a trailing column's min/max "
    "spans everything in every file). The interleave is pure JVM "
    "Column bit algebra (shiftleft/OR, codegen-able, no UDF). The "
    "oracle aggregates the RAW table — clustering must be a pure "
    "layout change; the measured both-dimension row-group pruning is "
    "pinned in test_zorder_write_skips_on_both_columns. At 100 TB "
    "this is the OPTIMIZE ZORDER pattern: pay one clustered rewrite, "
    "then every selective scan on any interleaved dimension reads a "
    "near-minimal file set.",
)
def sink_zorder_skipping_q(spark, sf_dir):
    from .queries_ext import _sink_dir
    from .sources.sinks import write_zorder

    path = _sink_dir("events_zorder", sf_dir)
    e = _t(spark, sf_dir, "events").select(
        "event_id", "user_id", "value",
        F.floor("value").cast("int").alias("vbin"),
    )
    # bits=12 covers user_id at every test SF (sf0.1 has ids > 1023 —
    # write_zorder now REJECTS out-of-range values instead of silently
    # aliasing them, so the resolution must cover the domain)
    write_zorder(e, path, cols=["user_id", "vbin"], n_files=16, bits=12)
    back = spark.read.parquet(path)
    user_band = F.col("user_id").between(40, 47)
    return back.agg(
        F.sum(user_band.cast("bigint")).cast("bigint").alias("n_user_band"),
        F.sum((F.col("value") >= 480).cast("bigint")).cast("bigint").alias("n_value_band"),
        F.sum(
            F.when(user_band, F.col("value").cast(_DEC6)).otherwise(
                F.lit(0).cast(_DEC6)
            )
        )
        .cast("double")
        .alias("sum_user_band"),
    )


# ------------------------------------------------------------------
# 7. Idempotent batch append (exactly-once under retry)
# ------------------------------------------------------------------


@defquery(
    "sink_idempotent_retry",
    """
    SELECT CAST(CASE WHEN day(ts) <= 10 THEN 1
                     WHEN day(ts) <= 20 THEN 2 ELSE 3 END AS INT) AS batch_id,
           CAST(count(*) AS BIGINT) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
    FROM events GROUP BY 1
    """,
    "exactly-once ingestion under at-least-once delivery: three "
    "day-range batches append into batch_id partitions, then batch 1 "
    "is REDELIVERED (the failure mode every distributed ingest has) — "
    "append_idempotent routes each batch through dynamic partition "
    "overwrite of its own batch_id partition, so the replay replaces "
    "its previous attempt instead of duplicating it, and a partially-"
    "written failed attempt would be healed the same way. The oracle "
    "is the batch arithmetic over the source: the final table must "
    "hold each row exactly once. This is Structured Streaming's "
    "foreachBatch idempotence recipe (batchId-keyed overwrite) made "
    "explicit; retry cost is O(batch), never O(table).",
)
def sink_idempotent_retry_q(spark, sf_dir):
    from .queries_ext import _sink_dir
    from .sources.sinks import append_idempotent

    path = _sink_dir("events_idempotent", sf_dir)
    import shutil

    shutil.rmtree(path, ignore_errors=True)
    e = _t(spark, sf_dir, "events").select("event_id", "ts", "value")
    d = F.dayofmonth("ts")
    batches = [
        (1, e.filter(d <= 10)),
        (2, e.filter((d > 10) & (d <= 20))),
        (3, e.filter(d > 20)),
    ]
    for bid, b in batches:
        append_idempotent(spark, path, b, batch_id=bid)
    # redelivery: batch 1 arrives again (different partitioning — the
    # content, not the physical write, is what must be idempotent)
    append_idempotent(spark, path, batches[0][1].repartition(7), batch_id=1)
    back = spark.read.parquet(path)
    return back.groupBy(F.col("batch_id").cast("int").alias("batch_id")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("value").cast(_DEC6)).cast("double").alias("sum_value"),
    )


# ------------------------------------------------------------------
# 8. Dynamic partition pruning
# ------------------------------------------------------------------


@defquery(
    "dpp_partitioned_agg",
    """
    WITH fact AS (
        SELECT CAST(day(ts) AS INT) AS d, event_type, value FROM events),
    hot_days AS (
        SELECT d FROM (SELECT CAST(day(ts) AS INT) AS d, max(value) mx
                       FROM events WHERE event_type = 'purchase' GROUP BY 1)
        WHERE mx >= 300)
    SELECT f.event_type, CAST(count(*) AS BIGINT) AS n,
           CAST(SUM(CAST(f.value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
    FROM fact f JOIN hot_days h ON f.d = h.d
    GROUP BY f.event_type
    """,
    "dynamic partition pruning: the fact side is a day-partitioned "
    "parquet table; the dim side (days whose max purchase value >= "
    "300) is only known at runtime, so static partition pruning can't "
    "fire — Spark's DPP plants a dynamicpruningexpression subquery on "
    "the fact scan's partition filter, the broadcast dim's day values "
    "prune fact PARTITION DIRECTORIES before any fact file is opened "
    "(pinned in test_dpp_plan_prunes_fact_partitions). At 100 TB this "
    "is the difference between scanning ~3 hot days and scanning the "
    "whole fact table to throw 90% of it away post-join; it needs the "
    "join key to BE the partition column — the layout decision is the "
    "optimization.",
)
def dpp_partitioned_agg_q(spark, sf_dir):
    import os

    from .queries_ext import _sink_dir

    path = _sink_dir("events_by_day", sf_dir)
    e = _t(spark, sf_dir, "events")
    # build the day-partitioned fact copy once per sf_dir (a fixture
    # table; rewriting it per run would time the write, not the DPP)
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        e.select(
            "event_id", "event_type", "value", F.dayofmonth("ts").cast("int").alias("d")
        ).write.mode("overwrite").partitionBy("d").parquet(path)
    fact = spark.read.parquet(path)
    hot = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy(F.dayofmonth("ts").cast("int").alias("d"))
        .agg(F.max("value").alias("mx"))
        .filter(F.col("mx") >= 300)
        .select("d")
    )
    return (
        fact.join(F.broadcast(hot), "d")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.col("value").cast(_DEC6)).cast("double").alias("sum_value"),
        )
    )


# ------------------------------------------------------------------
# 9. Streaming A-then-B pattern match (CEP primitive)
# ------------------------------------------------------------------


@defquery(
    "streaming_pattern_view_purchase",
    """
    SELECT p.user_id, p.event_id,
           CAST(floor(epoch(p.ts)) - floor(epoch(max(v.ts))) AS BIGINT) AS lag_sec
    FROM events p JOIN events v
      ON v.user_id = p.user_id AND v.event_type = 'view'
     AND v.ts < p.ts AND p.ts - v.ts <= INTERVAL 60 MINUTE
    WHERE p.event_type = 'purchase'
    GROUP BY p.user_id, p.event_id, p.ts
    """,
    "REAL streaming CEP: every purchase preceded by a view of the same "
    "user strictly earlier and within 60 minutes, detected by "
    "applyInPandasWithState with per-user state = ONE long (latest "
    "view timestamp, us). State is O(users) regardless of event "
    "volume — the buffered-join formulation keeps raw event windows "
    "per key and dies on hot keys; this one cannot. Strict-inequality "
    "tie contract makes same-timestamp A/B pairs a non-match on both "
    "engines regardless of replay order; the oracle is the batch "
    "trailing-window join, so batch/stream parity is hash-verified. "
    "lag_sec is floor-of-seconds integer arithmetic on both engines.",
)
def streaming_pattern_q(spark, sf_dir):
    from .sources.readers import events_stream
    from .streaming.stateful import ab_pattern_match
    from .streaming.windows import run_to_memory_sink

    sdf = events_stream(spark, sf_dir).select(
        "user_id", "ts", "event_id", "event_type"
    ).filter(F.col("event_type").isin("view", "purchase"))
    out = ab_pattern_match(
        sdf,
        key_cols=["user_id"],
        ts_col="ts",
        order_col="event_id",
        type_col="event_type",
        a_type="view",
        b_type="purchase",
        within_sec=3600,
    )
    run_to_memory_sink(out, "q_streaming_pattern_vp", output_mode="append")
    return spark.table("q_streaming_pattern_vp")


# ------------------------------------------------------------------
# 10. Rolling distinct-count from mergeable HLL sketch partials
# ------------------------------------------------------------------


@defquery(
    "distinct_users_rolling_hll",
    """
    WITH days AS (SELECT DISTINCT CAST(day(ts) AS INT) AS d FROM events)
    SELECT days.d,
           (SELECT count(DISTINCT e.user_id) FROM events e
            WHERE CAST(day(e.ts) AS INT) BETWEEN days.d - 6 AND days.d)
               AS est_users
    FROM days
    """,
    "trailing-7-day distinct users per day from MERGEABLE HLL sketch "
    "partials (Spark's datasketches hll_sketch_agg/hll_union_agg): one "
    "sketch per day is the stored partial — the incremental_agg_refresh "
    "discipline applied to COUNT DISTINCT, which has no exact "
    "SUM-mergeable partial — and any window is answered by unioning "
    "its days' sketches, never re-scanning raw events (the exact "
    "rolling count-distinct re-shuffles the full user column per "
    "window at 100 TB; the sketch rollup touches |days| kilobyte-sized "
    "blobs). Estimate exactness is a DOCUMENTED regime, not luck: a "
    "datasketches HLL stays in exact (coupon) mode until ~2^lgK/4 "
    "entries, so at lgConfigK=14 estimates are bit-exact below ~4k "
    "distinct keys per window — which covers every test SF (hence the "
    "exact-count oracle) — and degrade gracefully to the published "
    "+/-1.6% rse beyond; a deployment sizes lgK to its cardinality "
    "the way _MG_CAPACITY sizes to n/f_k.",
)
def distinct_users_rolling_hll_q(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    daily = e.groupBy(F.dayofmonth("ts").cast("int").alias("d")).agg(
        F.expr("hll_sketch_agg(user_id, 14)").alias("sk")
    )
    target = daily.select("d")
    # 30 x 7 day-range join over kilobyte sketches — driver-trivial,
    # broadcast; the raw events table is touched exactly once (daily agg)
    src = daily.select(F.col("d").alias("sd"), "sk")
    return (
        target.join(
            F.broadcast(src),
            (F.col("sd") >= F.col("d") - 6) & (F.col("sd") <= F.col("d")),
        )
        .groupBy("d")
        .agg(
            F.expr("hll_sketch_estimate(hll_union_agg(sk))")
            .cast("bigint")
            .alias("est_users")
        )
    )


# ------------------------------------------------------------------
# 11. Retention vacuum (partition-directory deletes, O(dropped) cost)
# ------------------------------------------------------------------


@defquery(
    "sink_retention_vacuum",
    """
    SELECT CAST(day(ts) AS INT) AS d, CAST(count(*) AS BIGINT) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
    FROM events WHERE day(ts) > 14 GROUP BY 1
    """,
    "retention vacuum: a day-partitioned events table drops every "
    "partition older than the 14-day cutoff as a DIRECTORY delete — "
    "no data file read, no surviving file touched (mtime-pinned in "
    "test_vacuum_drops_only_expired_partitions), cost O(dropped "
    "partitions) whatever the table size. The oracle aggregates the "
    "source with the same cutoff predicate: vacuum must equal the "
    "WHERE clause it implements. At 100 TB, retention done any other "
    "way on plain parquet is a full-table read-rewrite; partition "
    "layout is what turns a policy into a metadata operation.",
)
def sink_retention_vacuum_q(spark, sf_dir):
    import os

    from .queries_ext import _sink_dir
    from .sources.sinks import vacuum_partitions

    path = _sink_dir("events_retention", sf_dir)
    e = _t(spark, sf_dir, "events").select(
        "event_id", "value", F.dayofmonth("ts").cast("int").alias("d")
    )
    # (re)build the partitioned table each run — vacuum is destructive,
    # so the fixture cannot be cached like dpp_partitioned_agg's
    e.write.mode("overwrite").partitionBy("d").parquet(path)
    vacuum_partitions(path, "d", lambda v: int(v) > 14)
    back = spark.read.parquet(path)
    return back.groupBy(F.col("d").cast("int").alias("d")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("value").cast(_DEC6)).cast("double").alias("sum_value"),
    )


# ------------------------------------------------------------------
# 12. Cross-source contamination matrix
# ------------------------------------------------------------------

_CM_W = 40  # span window width/stride shared with dedup_exact_substring
_CM_S = 20


@defquery(
    "contamination_matrix",
    f"""
    WITH norm AS (
        SELECT doc_id, source,
               regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS t
        FROM documents),
    win AS (
        SELECT DISTINCT source, substr(t, CAST(i AS INT), {_CM_W}) AS w
        FROM norm,
             unnest(range(1, greatest(len(t) - {_CM_W} + 1, 1) + 1, {_CM_S})) u(i)),
    sz AS (SELECT source, count(*) AS n FROM win GROUP BY 1),
    shared AS (
        SELECT a.source AS source_a, b.source AS source_b,
               count(*) AS n_shared
        FROM win a JOIN win b ON a.w = b.w AND a.source < b.source
        GROUP BY 1, 2)
    SELECT s.source_a, s.source_b, CAST(s.n_shared AS BIGINT) AS n_shared,
           round(s.n_shared / CAST(least(za.n, zb.n) AS DOUBLE), 6)
               AS containment
    FROM shared s
    JOIN sz za ON za.source = s.source_a
    JOIN sz zb ON zb.source = s.source_b
    """,
    "cross-source contamination matrix: which corpus domains share "
    "verbatim spans (the dataset-level view of dedup_exact_substring's "
    "doc-level spans — same normalization, same 40-char/20-stride "
    "windows, so the two reports reconcile). The scale contract is "
    "WHERE the dedup happens: windows collapse to the (source, window) "
    "level BEFORE the self-join, so per-window join fan-out is bounded "
    "by |sources| choose 2 (190 at 20 sources) NO MATTER how many "
    "documents repeat the span — occurrence-level pairing would be "
    "quadratic in span popularity, the exact hot-shingle failure "
    "max_df defends against elsewhere; here the source-level rollup "
    "IS the defense, with no recall loss for the source-pair "
    "statistic. Output is O(|sources|^2) rows, driver-trivial at any "
    "corpus size; containment = shared / min(|A|,|B|) window sets.",
)
def contamination_matrix_q(spark, sf_dir):
    d = _t(spark, sf_dir, "documents").select(
        "source",
        F.regexp_replace(F.lower(F.trim("text")), r"\s+", " ").alias("t"),
    )
    win = (
        d.select(
            "source",
            F.explode(
                F.sequence(
                    F.lit(1),
                    F.greatest(F.length("t") - _CM_W + 1, F.lit(1)),
                    F.lit(_CM_S),
                )
            ).alias("i"),
            "t",
        )
        .select("source", F.expr(f"substr(t, i, {_CM_W})").alias("w"))
        .distinct()
    )
    sz = win.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    a, b = win.alias("a"), win.alias("b")
    shared = (
        a.join(b, (F.col("a.w") == F.col("b.w")) & (F.col("a.source") < F.col("b.source")))
        .groupBy(F.col("a.source").alias("source_a"), F.col("b.source").alias("source_b"))
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    za = sz.select(F.col("source").alias("source_a"), F.col("n").alias("na"))
    zb = sz.select(F.col("source").alias("source_b"), F.col("n").alias("nb"))
    return (
        shared.join(F.broadcast(za), "source_a")
        .join(F.broadcast(zb), "source_b")
        .select(
            "source_a",
            "source_b",
            F.col("n_shared").cast("bigint").alias("n_shared"),
            F.round(
                F.col("n_shared") / F.least("na", "nb").cast("double"), 6
            ).alias("containment"),
        )
    )


# ------------------------------------------------------------------
# 13. Curriculum assignment (decile + shuffle key, no global window)
# ------------------------------------------------------------------


@defquery(
    "curriculum_assignment",
    """
    WITH q AS (
        SELECT doc_id, {_qs} AS quality FROM documents),
    b AS (SELECT doc_id, quality,
                 CAST(floor(quality * 1000) AS INT) AS bin FROM q),
    hist AS (SELECT bin, count(*) AS c FROM b GROUP BY bin),
    cum AS (SELECT bin, SUM(c) OVER (ORDER BY bin) - c AS cum_before,
                   SUM(c) OVER () AS n
            FROM hist)
    SELECT b.doc_id, b.quality,
           CAST(least(9, cum.cum_before * 10 // cum.n) AS INT) AS decile,
           md5(CAST(b.doc_id AS VARCHAR)) AS shuffle_key
    FROM b JOIN cum ON cum.bin = b.bin
    """.format(_qs=_quality_sql()),
    "curriculum assignment for staged pretraining: each document gets "
    "a quality DECILE (easy->hard schedule) and a deterministic "
    "shuffle key (md5 of doc_id) for within-decile order. The scale "
    "design is what is ABSENT: no global window — percent_rank/ntile "
    "deciles sort the whole corpus through one partition; here deciles "
    "derive from a ~1000-bin quality histogram (one bounded agg + a "
    "window over BINS, then a broadcast map join back), the same "
    "mergeable-histogram move as hist_percentiles_mergeable, with "
    "decile boundaries as integer arithmetic on cumulative counts "
    "(docs in one bin never straddle engines differently). The global "
    "curriculum ORDER is then materialized by a range-partitioned "
    "sorted write on (decile, shuffle_key) — write_sorted's layout, "
    "the distributed answer to 'sort 100 TB once' — not by a window.",
)
def curriculum_assignment_q(spark, sf_dir):
    from .functions import text as TX

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", TX.quality_score(F.col("text")).alias("quality")
    )
    b = d.withColumn("bin", F.floor(F.col("quality") * 1000).cast("int"))
    hist = b.groupBy("bin").agg(F.count(F.lit(1)).alias("c"))
    w = Window.orderBy("bin")
    cum = hist.select(
        "bin",
        (F.sum("c").over(w) - F.col("c")).alias("cum_before"),
        F.sum("c").over(Window.partitionBy()).alias("n"),
    )
    return (
        b.join(F.broadcast(cum), "bin")
        .select(
            "doc_id",
            "quality",
            # `div`, not `/`: Spark's / is double division and a
            # boundary like 0.9999.. can round across the integer; the
            # oracle's integer / truncates — use integer division on
            # both engines so decile edges cannot disagree
            F.least(F.lit(9), F.expr("cum_before * 10 div n"))
            .cast("int")
            .alias("decile"),
            F.md5(F.col("doc_id").cast("string")).alias("shuffle_key"),
        )
    )


# ------------------------------------------------------------------
# 14. Runtime bloom-filter join pruning (row-level sibling of DPP)
# ------------------------------------------------------------------


@defquery(
    "runtime_bloom_join",
    """
    SELECT l.l_linestatus, CAST(count(*) AS BIGINT) AS n,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
               AS revenue
    FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderpriority = '1-URGENT'
    GROUP BY l.l_linestatus
    """,
    "runtime bloom-filter join pruning — the row-level sibling of "
    "dpp_partitioned_agg: for a shuffle join whose dim side carries a "
    "selective filter, Spark builds a bloom filter of the surviving "
    "join keys and injects might_contain() into the FACT scan, so "
    "~75% of fact rows drop before the shuffle instead of after the "
    "join. The planner arms this only when the fact scan is large "
    "(applicationSideScanSizeThreshold, default 10 GB) and the join "
    "is shuffle-based — i.e. exactly at 100 TB and exactly not at "
    "test SF, where the dim broadcasts — so this query emulates the "
    "production regime (thresholds lowered, broadcast off) around an "
    "EAGER materialization and restores every conf after; the plan "
    "with BloomFilterAggregate + bloom_filter_might_contain is pinned "
    "in test_runtime_bloom_plan_shape. The oracle is the plain join: "
    "the filter is sound-but-not-complete (false positives only), so "
    "it can never change results, only shuffle volume.",
)
def runtime_bloom_join_q(spark, sf_dir):
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    prev = {}
    for k, v in confs.items():
        prev[k] = spark.conf.get(k, None)
        spark.conf.set(k, v)
    try:
        li = _t(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_linestatus", "l_extendedprice"
        )
        o = _t(spark, sf_dir, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        ).select("o_orderkey")
        out = (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("l_linestatus")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n"),
                F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
                .cast("double")
                .alias("revenue"),
            )
        )
        # confs must be live at EXECUTION, not planning — queries are
        # lazy, so materialize eagerly inside the conf scope (output is
        # |linestatus| rows; the checkpoint is trivially small)
        return out.localCheckpoint(eager=True)
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


# ------------------------------------------------------------------
# 15. Per-group trend fit (closed-form least squares, exact sums)
# ------------------------------------------------------------------


@defquery(
    "trend_slope_by_type",
    """
    WITH daily AS (
        SELECT event_type, CAST(day(ts) AS INT) AS x,
               SUM(CAST(value AS DECIMAL(18,6))) AS y
        FROM events GROUP BY 1, 2),
    s AS (
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n,
               SUM(CAST(x AS DECIMAL(18,6))) AS sx,
               SUM(y) AS sy,
               SUM(CAST(x AS DECIMAL(18,6)) * CAST(x AS DECIMAL(18,6))) AS sxx,
               SUM(CAST(x AS DECIMAL(18,6)) * y) AS sxy
        FROM daily GROUP BY 1)
    SELECT event_type, n,
           round(CAST(n * sxy - sx * sy AS DOUBLE)
                 / CAST(n * sxx - sx * sx AS DOUBLE), 6) AS slope,
           round((CAST(sy AS DOUBLE)
                  - CAST(n * sxy - sx * sy AS DOUBLE)
                    / CAST(n * sxx - sx * sx AS DOUBLE)
                    * CAST(sx AS DOUBLE)) / n, 6) AS intercept
    FROM s
    """,
    "per-group linear trend (daily revenue slope per event type) via "
    "the closed-form least-squares normal equations — ONE aggregation "
    "pass producing five mergeable partials (n, Sx, Sy, Sxx, Sxy), "
    "never a per-group sort or an iterative fit. Cross-engine "
    "determinism is the design: double summation is order-dependent "
    "and Spark partial aggregation reorders freely, so every sum runs "
    "in DECIMAL (exact, association-free) and floats appear only in "
    "the final slope/intercept division, rounded once. The same "
    "five-partial shape maintains incrementally (incremental_agg_"
    "refresh discipline) — a 100 TB metrics store fits trends per key "
    "from partials without touching raw history.",
)
def trend_slope_by_type_q(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    dec = lambda c: c.cast("decimal(18,6)")  # noqa: E731
    daily = e.groupBy(
        "event_type", F.dayofmonth("ts").cast("int").alias("x")
    ).agg(F.sum(dec(F.col("value"))).alias("y"))
    x = dec(F.col("x"))
    s = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(x).alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(x * F.col("y")).alias("sxy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    # every division in IEEE doubles over EXACT decimal sums cast to
    # double (all magnitudes < 2^53, so the casts are exact): decimal
    # division precision/scale rules differ between engines, doubles
    # with a fixed op order do not
    slope_raw = num.cast("double") / den.cast("double")
    return s.select(
        "event_type",
        "n",
        F.round(slope_raw, 6).alias("slope"),
        F.round(
            (F.col("sy").cast("double") - slope_raw * F.col("sx").cast("double"))
            / F.col("n"),
            6,
        ).alias("intercept"),
    )


# ------------------------------------------------------------------
# 16. Snapshot diff (CDC derivation from two table versions)
# ------------------------------------------------------------------


@defquery(
    "snapshot_diff_orders",
    """
    WITH v1 AS (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
    v2 AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 13 = 0 THEN 'X' ELSE o_orderstatus END
                   AS o_orderstatus,
               o_totalprice
        FROM orders WHERE o_orderkey % 11 <> 0
        UNION ALL
        SELECT o_orderkey + 50000000, 'N', o_totalprice
        FROM orders WHERE o_orderkey % 17 = 0)
    SELECT coalesce(v2.o_orderkey, v1.o_orderkey) AS o_orderkey,
           CASE WHEN v1.o_orderkey IS NULL THEN 'insert'
                WHEN v2.o_orderkey IS NULL THEN 'delete'
                ELSE 'update' END AS change_type,
           v1.o_orderstatus AS old_status,
           v2.o_orderstatus AS new_status
    FROM v1 FULL OUTER JOIN v2 ON v1.o_orderkey = v2.o_orderkey
    WHERE v1.o_orderkey IS NULL OR v2.o_orderkey IS NULL
       OR v1.o_orderstatus <> v2.o_orderstatus
       OR v1.o_totalprice <> v2.o_totalprice
    """,
    "snapshot diff — deriving a change feed (CDC) from two table "
    "versions when the source system can't emit one: full outer join "
    "on the key, classify insert/delete/update, emit only changed "
    "rows (deterministic synthetic v2: ~9% deletes, ~7% status "
    "updates, ~6% inserts). The 100 TB form is exactly this plan plus "
    "two reducers: partition pruning when snapshots are date-"
    "partitioned (diff only partitions whose files differ — the "
    "incremental_agg_refresh scoping), and comparing a precomputed "
    "row-hash column instead of N attribute columns so the shuffle "
    "carries keys + 8-byte hashes, not full rows. The oracle is the "
    "same join arithmetic; the operator contract is that diff(v1, v2) "
    "applied to v1 reproduces v2 (pinned in "
    "test_snapshot_diff_roundtrips).",
)
def snapshot_diff_orders_q(spark, sf_dir):
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    v2 = o.filter(F.col("o_orderkey") % 11 != 0).select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 13 == 0, F.lit("X"))
        .otherwise(F.col("o_orderstatus"))
        .alias("o_orderstatus"),
        "o_totalprice",
    ).unionByName(
        o.filter(F.col("o_orderkey") % 17 == 0).select(
            (F.col("o_orderkey") + 50_000_000).alias("o_orderkey"),
            F.lit("N").alias("o_orderstatus"),
            "o_totalprice",
        )
    )
    a, b = o.alias("a"), v2.alias("b")
    j = a.join(b, F.col("a.o_orderkey") == F.col("b.o_orderkey"), "full_outer")
    changed = (
        F.col("a.o_orderkey").isNull()
        | F.col("b.o_orderkey").isNull()
        | (F.col("a.o_orderstatus") != F.col("b.o_orderstatus"))
        | (F.col("a.o_totalprice") != F.col("b.o_totalprice"))
    )
    return j.filter(changed).select(
        F.coalesce(F.col("b.o_orderkey"), F.col("a.o_orderkey")).alias("o_orderkey"),
        F.when(F.col("a.o_orderkey").isNull(), "insert")
        .when(F.col("b.o_orderkey").isNull(), "delete")
        .otherwise("update")
        .alias("change_type"),
        F.col("a.o_orderstatus").alias("old_status"),
        F.col("b.o_orderstatus").alias("new_status"),
    )


# ------------------------------------------------------------------
# 17. Pluggable kv sink (Python DataSource writer, two-phase commit)
# ------------------------------------------------------------------


@defquery(
    "kv_write_pyds",
    """
    WITH kv AS (
        SELECT concat('key', CAST(o_orderkey AS VARCHAR)) AS key,
               CAST(o_totalprice AS VARCHAR) AS value,
               CASE WHEN o_orderstatus = 'O' THEN 'string' ELSE 'hash' END AS type
        FROM orders)
    SELECT type, CAST(count(*) AS BIGINT) AS n,
           CAST(count(DISTINCT key) AS BIGINT) AS n_keys
    FROM kv GROUP BY type
    """,
    "pluggable kv SINK via the Spark-4 Python DataSource writer API — "
    "the writer half of kv_scan_pyds, and the parity target for the "
    "reference's write-back pipeline reshuffle().map(WriteDummyString) "
    "(each record written by its OWNING shard after reshuffle; "
    "mr_test_module lib.rs:323-353): rows are repartitioned by CRC16 "
    "slot (the reference's reshuffle), each write task stages its "
    "partition as one file, and the driver's commit() publishes "
    "staged files atomically under a _KV_SUCCESS manifest — Spark's "
    "task-commit protocol standing in for Redis shard locality. The "
    "query writes the kv projection of orders through the sink, reads "
    "it back VIA THE MANIFEST, and aggregates; the oracle aggregates "
    "the same projection directly, so a lost, doubled, or torn write "
    "breaks the hash. abort() visibility is pinned in "
    "test_kv_writer_two_phase_commit.",
)
def kv_write_pyds_q(spark, sf_dir):
    import shutil

    from .core.partitioner import slot_col
    from .queries_ext import _sink_dir
    from .sources.pyds import read_kv_sink, register_kv_datasource

    register_kv_datasource(spark)
    path = _sink_dir("kv_pyds_out", sf_dir)
    shutil.rmtree(path, ignore_errors=True)
    o = _t(spark, sf_dir, "orders")
    kv = o.select(
        F.concat(F.lit("key"), F.col("o_orderkey").cast("string")).alias("key"),
        F.col("o_totalprice").cast("string").alias("value"),
        F.when(F.col("o_orderstatus") == "O", "string").otherwise("hash").alias("type"),
    )
    n = spark.sparkContext.defaultParallelism
    # the reference's reshuffle: route each record to its slot's owner
    kv.repartition(n, slot_col(F.col("key"))).write.format("libmr_kv").option(
        "path", path
    ).mode("overwrite").save()
    back = read_kv_sink(spark, path)
    return back.groupBy("type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.count_distinct("key").cast("bigint").alias("n_keys"),
    )


# ------------------------------------------------------------------
# 18. Python streaming source with checkpointed resume
# ------------------------------------------------------------------


@defquery(
    "streaming_pyds_resume",
    """
    SELECT event_type, CAST(count(*) AS BIGINT) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
    FROM events GROUP BY event_type
    """,
    "custom Python STREAMING source (Spark-4 SimpleDataSourceStream"
    "Reader) with checkpointed restart: the source replays events as "
    "a day-offset feed with a simulated clock; drain 1 runs with the "
    "clock at day 15, then a SECOND query with the clock at day 31 "
    "resumes from the CHECKPOINTED offset {day:16} — not from "
    "initialOffset — into the same exactly-once parquet sink. The "
    "oracle is the full-table aggregate: one lost or doubled day "
    "across the restart boundary breaks the hash, so offset algebra + "
    "checkpoint resume + sink idempotence are all on the hook. This "
    "is the restart contract every 100 TB ingest leans on, pinned "
    "end-to-end through a pluggable source rather than assumed from "
    "the built-in file source.",
)
def streaming_pyds_resume_q(spark, sf_dir):
    import shutil

    from .queries_ext import _sink_dir
    from .sources.pyds import register_events_stream_source

    register_events_stream_source(spark)
    out = _sink_dir("pyds_stream_out", sf_dir)
    ckpt = _sink_dir("pyds_stream_ckpt", sf_dir)
    shutil.rmtree(out, ignore_errors=True)
    shutil.rmtree(ckpt, ignore_errors=True)

    for upto in (15, 31):
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

    back = spark.read.parquet(out)
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("value").cast(_DEC6)).cast("double").alias("sum_value"),
    )


# ------------------------------------------------------------------
# 19. Cross-engine-verifiable SimHash (md5-60bit variant)
# ------------------------------------------------------------------


@defquery(
    "dedup_simhash_md5",
    r"""
    WITH toks AS (
        -- mirror Spark simhash()'s 65535-token cap (F.slice) so a
        -- pathologically long doc cannot diverge the two engines
        SELECT doc_id,
               unnest((string_split_regex(trim(lower(text)), '\s+'))[1:65535]) AS tok
        FROM documents),
    h AS (
        SELECT doc_id,
               CAST(('0x' || substr(md5(tok), 1, 15)) AS UBIGINT) AS h
        FROM toks),
    votes AS (
        SELECT doc_id, b.b AS b,
               SUM(CAST((h >> b.b) & 1 AS INT)) AS ones, count(*) AS n
        FROM h CROSS JOIN (SELECT unnest(range(0, 60)) AS b) b
        GROUP BY 1, 2),
    sig AS (
        SELECT doc_id,
               CAST(SUM(CASE WHEN 2 * ones > n
                             THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS BIGINT)
                   AS simhash64
        FROM votes GROUP BY doc_id),
    chunks AS (
        SELECT doc_id, simhash64, c.c AS c,
               (simhash64 >> (c.c * 15)) & 32767 AS val
        FROM sig CROSS JOIN (SELECT unnest(range(0, 4)) AS c) c),
    pairs AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(bit_count(xor(a.simhash64, b.simhash64)) AS INT)
                   AS hamming
        FROM chunks a JOIN chunks b
          ON a.c = b.c AND a.val = b.val AND a.doc_id < b.doc_id)
    SELECT id_a, id_b, hamming FROM pairs WHERE hamming <= 3
    """,
    "SimHash near-dup pairs in the cross-engine-VERIFIABLE form: the "
    "default simhash hashes tokens with xxhash64, which no other "
    "engine reproduces, so its gate row is rows-only; this variant "
    "hashes conv(substr(md5(tok),1,15),16,10) — a 60-bit value both "
    "Spark and DuckDB compute bit-identically — so the ENTIRE "
    "pipeline (per-token hash, packed-lane majority vote, 4x15-bit "
    "pigeonhole banding, bit_count(xor) verify) is hash-matched "
    "against an independent SQL formulation, upgrading the SimHash "
    "family from pytest-only to oracle-proven. Same plan shape and "
    "banding guarantee as dedup_simhash (any pair within hamming <= 3 "
    "shares an exact band); md5-per-token costs ~2x xxhash64 — the "
    "verifiability tax, worth paying once in the gate while "
    "production keeps the xxhash64 default.",
)
def dedup_simhash_md5_q(spark, sf_dir):
    from .operators import dedup as DD

    d = _t(spark, sf_dir, "documents")
    return DD.simhash_pairs(
        d,
        max_hamming=3,
        hash_fn=lambda c: F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long"),
        bits=60,
    )


# ------------------------------------------------------------------
# 20. Streaming pluggable sink (per-epoch two-phase commit)
# ------------------------------------------------------------------


@defquery(
    "streaming_kv_sink",
    """
    SELECT event_type, CAST(count(*) AS BIGINT) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
    FROM events GROUP BY event_type
    """,
    "streaming pluggable SINK (Spark-4 DataSourceStreamWriter): the "
    "events stream drains through the kv sink's per-micro-batch "
    "two-phase commit — tasks stage files, the driver's commit("
    "messages, batchId) publishes them atomically under epoch="
    "batchId with a per-epoch manifest, and a re-attempted batchId "
    "REPLACES its epoch (append_idempotent's batchId-keyed overwrite "
    "at the sink-protocol layer), so the table holds each row exactly "
    "once however many times an epoch is attempted. The oracle is the "
    "full-table aggregate over everything the manifest-honoring "
    "reader sees: a torn, lost, or doubled epoch breaks the hash. "
    "Completes the pluggable quadrilogy (batch read/write, stream "
    "read/write).",
)
def streaming_kv_sink_q(spark, sf_dir):
    import shutil

    from .queries_ext import _sink_dir
    from .sources.pyds import read_kv_stream_sink, register_kv_datasource
    from .sources.readers import events_stream

    register_kv_datasource(spark)
    out = _sink_dir("kv_stream_out", sf_dir)
    ckpt = _sink_dir("kv_stream_ckpt", sf_dir)
    shutil.rmtree(out, ignore_errors=True)
    shutil.rmtree(ckpt, ignore_errors=True)
    sdf = events_stream(spark, sf_dir).select("event_id", "event_type", "value")
    q = (
        sdf.writeStream.format("libmr_kv")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    back = read_kv_stream_sink(
        spark, out, "event_id bigint, event_type string, value double"
    )
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("value").cast(_DEC6)).cast("double").alias("sum_value"),
    )


# ------------------------------------------------------------------
# 21. VARIANT semi-structured extraction (Spark 4 open schema path)
# ------------------------------------------------------------------


@defquery(
    "variant_extract_props",
    """
    SELECT event_type,
           CAST(CAST(json_extract(props, '$.k') AS INT) // 10 AS INT) AS k_decile,
           CAST(count(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN json_extract(props, '$.missing') IS NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_missing
    FROM events
    GROUP BY 1, 2
    """,
    "semi-structured extraction through Spark 4's VARIANT type: "
    "parse_json once into a binary variant, then variant_get typed "
    "paths — the schema-on-read path for payloads whose shape is not "
    "declared up front, which at 100 TB beats re-parsing JSON text "
    "per extraction (variant decode is a binary field walk, and "
    "shredded variant columns get parquet-level pushdown in newer "
    "readers) and beats a rigid from_json schema that silently nulls "
    "evolving fields. try_variant_get covers the absent-path case "
    "NULL-safely (counted in n_missing = all rows). The oracle walks "
    "the same paths with DuckDB's JSON extraction; integer division "
    "for the decile boundary keeps the bucket edges engine-exact.",
)
def variant_extract_props_q(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    v = e.select("event_type", F.parse_json("props").alias("v"))
    k = F.expr("variant_get(v, '$.k', 'int')")
    missing = F.expr("try_variant_get(v, '$.missing', 'string')")
    return (
        v.select(
            "event_type",
            F.expr("variant_get(v, '$.k', 'int') div 10").cast("int").alias("k_decile"),
            missing.alias("m"),
        )
        .groupBy("event_type", "k_decile")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.col("m").isNull().cast("int")).cast("bigint").alias("n_missing"),
        )
    )


# ------------------------------------------------------------------
# 22. Incremental dedup against persisted fingerprint history
# ------------------------------------------------------------------


@defquery(
    "dedup_incremental_exact",
    """
    WITH fp AS (
        SELECT doc_id, source,
               md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp
        FROM documents),
    corpus AS (SELECT * FROM fp WHERE CAST(substr(source, 4) AS INT) < 15),
    batch AS (SELECT * FROM fp WHERE CAST(substr(source, 4) AS INT) >= 15),
    batch_dedup AS (
        SELECT fp, min(doc_id) AS doc_id FROM batch GROUP BY fp)
    SELECT b.doc_id, b.fp FROM batch_dedup b
    WHERE NOT EXISTS (SELECT 1 FROM corpus c WHERE c.fp = b.fp)
    """,
    "incremental exact dedup — the form corpus dedup runs in "
    "PRODUCTION: an existing corpus (sources src0-src14) has its "
    "fingerprint "
    "history persisted once; a new ingest batch (src15-src19) is "
    "deduped within itself (min-id survivor) and then anti-joined "
    "against the HISTORY TABLE — one agg over the batch plus one "
    "16-byte-hash anti-join, never a recompute over accumulated "
    "corpus text — and admitted fingerprints append to the history. "
    "At 100 TB the history is bucketed by fp prefix so the anti-join "
    "is co-located; the same admission shape serves MinHash/SimHash "
    "signature histories (persist signatures, swap the anti-join for "
    "the banding join). The oracle replays corpus+batch arithmetic "
    "from scratch: the incremental path must admit exactly the rows "
    "the from-scratch path would.",
)
def dedup_incremental_exact_q(spark, sf_dir):
    import shutil

    from .operators import dedup as DD
    from .queries_ext import _sink_dir

    path = _sink_dir("fp_history", sf_dir)
    shutil.rmtree(path, ignore_errors=True)
    d = _t(spark, sf_dir, "documents")
    src_num = F.substring("source", 4, 10).cast("int")
    corpus = d.filter(src_num < 15)
    batch = d.filter(src_num >= 15)
    # bootstrap history from the existing corpus (one-time load)
    DD.dedup_incremental_exact(spark, path, corpus)
    return DD.dedup_incremental_exact(spark, path, batch).select("doc_id", "fp")


# ------------------------------------------------------------------
# 23. End-to-end training-data pipeline (compose: gate -> dedup -> pack)
# ------------------------------------------------------------------


@defquery(
    "train_pipeline_e2e",
    """
    WITH RECURSIVE q AS (
        SELECT doc_id, source, text, {_qs} AS quality FROM documents),
    gated AS (SELECT * FROM q WHERE quality >= 0.5),
    fp AS (
        SELECT doc_id, source, text,
               md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp
        FROM gated),
    admitted AS (
        SELECT f.* FROM fp f
        JOIN (SELECT fp, min(doc_id) AS keep FROM fp GROUP BY fp) s
          ON s.fp = f.fp AND s.keep = f.doc_id),
    docs AS (
        SELECT source, doc_id,
               CAST(len(string_split_regex(trim(text), '\\s+')) AS INT) AS n_tokens,
               row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
        FROM admitted),
    pack AS (
        SELECT source, doc_id, n_tokens, rn,
               CAST(0 AS BIGINT) AS pack_id, n_tokens AS fill
        FROM docs WHERE rn = 1
        UNION ALL
        SELECT d.source, d.doc_id, d.n_tokens, d.rn,
               CASE WHEN p.fill + d.n_tokens <= 512
                    THEN p.pack_id ELSE p.pack_id + 1 END,
               CASE WHEN p.fill + d.n_tokens <= 512
                    THEN p.fill + d.n_tokens ELSE d.n_tokens END
        FROM pack p JOIN docs d ON d.source = p.source AND d.rn = p.rn + 1
    )
    SELECT source,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(max(pack_id) + 1 AS BIGINT) AS n_packs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
    FROM pack GROUP BY source
    """.format(_qs=_quality_sql()),
    "END-TO-END pipeline composition — the claim a query inventory "
    "can't make one operator at a time: quality gate (>= 0.5, the "
    "shared _quality_sql), exact dedup (min-id survivor on the "
    "normalized-text fingerprint), and greedy 512-token sequence "
    "packing run as ONE lazy DAG — Catalyst sees the whole pipeline, "
    "so the text column is read once, the quality filter prunes "
    "before fingerprinting, and nothing materializes between stages "
    "(one plan, not three jobs with parquet handoffs). Per-source "
    "output: docs admitted, packs produced, tokens kept. The oracle "
    "replays the same three stages as chained CTEs ending in the "
    "packing recursion — every stage boundary must agree exactly for "
    "the final per-source triple to hash-match.",
)
def train_pipeline_e2e_q(spark, sf_dir):
    from .functions import text as TX
    from .functions.text import token_count

    d = _t(spark, sf_dir, "documents").select("doc_id", "source", "text")
    gated = d.filter(TX.quality_score(F.col("text")) >= 0.5)
    fp = gated.withColumn("fp", TX.fingerprint(F.col("text")))
    keep = fp.groupBy("fp").agg(F.min("doc_id").alias("doc_id"))
    admitted = fp.join(keep, ["fp", "doc_id"], "left_semi")
    toks = admitted.select(
        "source", "doc_id", token_count(F.col("text")).alias("n_tokens")
    )

    import pandas as pd

    def pack_group(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        out, pack, fill = [], 0, 0
        for i, t in enumerate(pdf["n_tokens"]):
            if i > 0 and fill + t > 512:
                pack += 1
                fill = 0
            fill += int(t)
            out.append(pack)
        pdf["pack_id"] = pd.Series(out, dtype="int64")
        return pdf[["source", "doc_id", "n_tokens", "pack_id"]]

    n = d.sparkSession.sparkContext.defaultParallelism
    packed = (
        toks.repartition(n, "source")
        .groupBy("source")
        .applyInPandas(
            pack_group,
            schema="source string, doc_id bigint, n_tokens int, pack_id bigint",
        )
    )
    return packed.groupBy("source").agg(
        F.count_distinct("doc_id").cast("bigint").alias("n_docs"),
        (F.max("pack_id") + 1).cast("bigint").alias("n_packs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
    )


# ------------------------------------------------------------------
# 24. Recursive CTE reachability (Spark 4 WITH RECURSIVE)
# ------------------------------------------------------------------

_REACH_SQL = """
WITH RECURSIVE e AS (
    SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
    FROM {li} a JOIN {li} b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey),
reach(part, dist) AS (
    SELECT CAST(l_partkey AS BIGINT), 0
    FROM (SELECT DISTINCT l_partkey FROM {li} WHERE l_partkey <= 3) s
    UNION ALL
    SELECT e.v, r.dist + 1 FROM reach r JOIN e ON e.u = r.part WHERE r.dist < 2)
SELECT CAST(min_dist AS INT) AS dist, CAST(count(*) AS BIGINT) AS n_parts
FROM (SELECT part, min(dist) AS min_dist FROM reach GROUP BY part)
GROUP BY 1
"""


@defquery(
    "reachability_recursive_cte",
    _REACH_SQL.format(li="lineitem"),
    "graph reachability via WITH RECURSIVE — Spark 4's recursive CTE "
    "run NATIVELY on both engines (the one query in the inventory "
    "where the oracle is the character-for-character same SQL): BFS "
    "over the co-purchase graph from seed parts 1-3, per-hop frontier "
    "expansion with an explicit depth guard (dist < 2) and min-dist "
    "dedup at the end. The depth guard is the scale contract: an "
    "unguarded UNION ALL recursion on a graph with cycles never "
    "terminates, and frontier size grows with the product of degrees "
    "per hop — the iterative-DataFrame form (dedup_clusters' "
    "large-star/small-star, pagerank's power iteration) remains the "
    "100 TB path for unbounded-depth traversal because it dedups the "
    "frontier EVERY round and truncates lineage; recursive CTEs are "
    "the right tool for bounded-hop queries exactly like this one.",
)
def reachability_recursive_cte_q(spark, sf_dir):
    from .core.layout import fan_out

    # lineitem at bench SF is one parquet split, so the edge-building
    # self-join's map side runs on a single task; fan_out by the join
    # key spreads it AND lets the self-join reuse the partitioning
    # (both sides of `e` scan this same view).  No-op for any
    # multi-split input; DISTINCT/GROUP BY downstream make the result
    # partitioning-independent.
    fan_out(
        _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey"),
        "l_orderkey",
    ).createOrReplaceTempView("__reach_li__")
    return spark.sql(_REACH_SQL.format(li="__reach_li__"))


# ------------------------------------------------------------------
# 25. LATERAL correlated subquery (top-k per row, planner-decorrelated)
# ------------------------------------------------------------------

_LATERAL_SQL = """
SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
FROM {c} c, LATERAL (
    SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS o_totalprice
    FROM {o}
    WHERE o_custkey = c.c_custkey
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
WHERE c.c_custkey <= 100
"""


@defquery(
    "lateral_topk_per_customer",
    _LATERAL_SQL.format(c="customer", o="orders"),
    "correlated LATERAL subquery — top-2 orders per customer written "
    "the way an analyst writes it (per-row subquery with ORDER BY "
    "LIMIT), run natively on both engines with character-identical "
    "SQL. The scale point is what Catalyst does to it: the naive "
    "reading is one subquery execution PER outer row; "
    "DecorrelateInnerQuery + RewriteLateralSubquery turn it into a "
    "single join + per-key WindowGroupLimit — same physical shape as "
    "window_topk_per_group's explicit formulation, so the declarative "
    "form costs nothing at 100 TB. Unique tie-break (o_orderkey) "
    "makes the LIMIT boundary engine-exact.",
)
def lateral_topk_q(spark, sf_dir):
    _t(spark, sf_dir, "customer").createOrReplaceTempView("__lat_c__")
    _t(spark, sf_dir, "orders").createOrReplaceTempView("__lat_o__")
    return spark.sql(_LATERAL_SQL.format(c="__lat_c__", o="__lat_o__"))


# ------------------------------------------------------------------
# 26. Two-sample Welch t statistic from mergeable moments
# ------------------------------------------------------------------


@defquery(
    "ab_welch_t_by_type",
    """
    WITH m AS (
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n,
               SUM(CAST(value AS DECIMAL(18,6))) AS s1,
               SUM(CAST(value AS DECIMAL(18,6)) * CAST(value AS DECIMAL(18,6)))
                   AS s2
        FROM events GROUP BY 1 HAVING count(*) > 1),
    d AS (
        SELECT event_type, n,
               CAST(s1 AS DOUBLE) AS s1, CAST(s2 AS DOUBLE) AS s2
        FROM m),
    pairs AS (
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               a.n AS na, b.n AS nb,
               a.s1 / a.n AS ma, b.s1 / b.n AS mb,
               (a.s2 - a.s1 * a.s1 / a.n) / (a.n - 1) AS va,
               (b.s2 - b.s1 * b.s1 / b.n) / (b.n - 1) AS vb
        FROM d a JOIN d b ON a.event_type < b.event_type)
    SELECT type_a, type_b, CAST(na AS BIGINT) AS na, CAST(nb AS BIGINT) AS nb,
           round((ma - mb) / sqrt(va / na + vb / nb), 6) AS t_stat
    FROM pairs
    """,
    "two-sample Welch t statistic for every event-type pair, computed "
    "ENTIRELY from three mergeable moment partials per group (n, "
    "sum, sum-of-squares in DECIMAL — exact under any partial-agg "
    "order): the experimentation-analytics shape where a 100 TB "
    "event log answers 'is variant A's metric different from B's' "
    "from kilobytes of maintained partials, never a re-scan — the "
    "same incremental discipline as incremental_agg_refresh and "
    "trend_slope_by_type. All divisions and the sqrt run in IEEE "
    "doubles over exactly-cast sums with one final round; the "
    "pair join is |types| x |types| post-aggregate rows, "
    "driver-trivial. (Degrees-of-freedom / p-value lookup is a "
    "driver-side scalar step on these same partials — the statistic "
    "is the distributed part.)",
)
def ab_welch_t_q(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    dec = F.col("value").cast("decimal(18,6)")
    m = e.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(dec).alias("s1d"),
        F.sum(dec * dec).alias("s2d"),
    ).filter(F.col("n") > 1).select(
        "event_type",
        "n",
        F.col("s1d").cast("double").alias("s1"),
        F.col("s2d").cast("double").alias("s2"),
    )
    a, b = m.alias("a"), m.alias("b")
    ma = F.col("a.s1") / F.col("a.n")
    mb = F.col("b.s1") / F.col("b.n")
    va = (F.col("a.s2") - F.col("a.s1") * F.col("a.s1") / F.col("a.n")) / (
        F.col("a.n") - 1
    )
    vb = (F.col("b.s2") - F.col("b.s1") * F.col("b.s1") / F.col("b.n")) / (
        F.col("b.n") - 1
    )
    return (
        a.join(b, F.col("a.event_type") < F.col("b.event_type"))
        .select(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
            F.col("a.n").cast("bigint").alias("na"),
            F.col("b.n").cast("bigint").alias("nb"),
            F.round(
                (ma - mb) / F.sqrt(va / F.col("a.n") + vb / F.col("b.n")), 6
            ).alias("t_stat"),
        )
    )


# ------------------------------------------------------------------
# 27. Streaming CDC apply (foreachBatch + partition-scoped MERGE)
# ------------------------------------------------------------------


@defquery(
    "streaming_merge_apply",
    """
    WITH latest AS (
        SELECT user_id, CAST(user_id % 16 AS INT) AS b,
               CAST(day(ts) AS INT) AS d, value,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE event_type = 'purchase')
    SELECT user_id, b, d, CAST(value AS DOUBLE) AS last_value
    FROM latest WHERE rn = 1
    """,
    "streaming CDC apply — the upsert consumer every change feed "
    "needs: the purchase stream drains through foreachBatch into "
    "merge_upsert_latest, which keeps per key the row with the "
    "greatest (ts, event_id) across the EXISTING STATE and the batch "
    "(matched state rows pulled back via an O(batch) semi-join) "
    "before the partition-scoped copy-on-write MERGE. Retaining the "
    "recency columns in the state and re-competing on match is what "
    "makes last-write-wins hold under ANY micro-batch ordering — a "
    "bare replace-on-match MERGE silently depends on files replaying "
    "in event-time order, which file mtimes do not guarantee. The "
    "state table partitions on a KEY-DERIVED bucket (user_id % 16), "
    "never on an attribute like day: a key whose latest row moved "
    "day-partitions would strand its stale row outside MERGE's "
    "touched-partition scope (both pinned by the two-batch test, "
    "which replays batches with a tie and a moved day). Empty "
    "micro-batches are no-ops by contract. The oracle is the latest "
    "purchase per user over ALL events: batch-boundary placement "
    "must not change the final table.",
)
def streaming_merge_apply_q(spark, sf_dir):
    import shutil
    import tempfile

    from .queries_ext import _sink_dir
    from .sources.readers import events_stream
    from .sources.sinks import merge_upsert_latest

    path = _sink_dir("merge_apply_state", sf_dir)
    shutil.rmtree(path, ignore_errors=True)

    def apply_batch(bdf, batch_id):
        merge_upsert_latest(
            bdf.sparkSession,
            path,
            bdf.select(
                "user_id",
                (F.col("user_id") % 16).cast("int").alias("b"),
                F.dayofmonth("ts").cast("int").alias("d"),
                F.col("ts"),
                F.col("event_id"),
                F.col("value").cast("double").alias("last_value"),
            ),
            keys=["user_id"],
            partition_col="b",
            recency_cols=["ts", "event_id"],
            payload_cols=["d", "last_value"],
        )

    q = (
        events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select("event_id", "ts", "user_id", "value")
        .writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="libmr_ma_ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(path).select(
        "user_id",
        F.col("b").cast("int").alias("b"),
        F.col("d").cast("int").alias("d"),
        "last_value",
    )


# ------------------------------------------------------------------
# 28. Order-free content audit hash (cross-system integrity check)
# ------------------------------------------------------------------


@defquery(
    "table_audit_hash",
    """
    SELECT CAST(day(ts) AS INT) AS d,
           CAST(count(*) AS BIGINT) AS n,
           CAST(bit_xor(CAST(('0x' || substr(md5(
               concat_ws('|',
                         coalesce(CAST(event_id AS VARCHAR), '<null>'),
                         coalesce(CAST(epoch_us(ts) AS VARCHAR), '<null>'),
                         coalesce(CAST(user_id AS VARCHAR), '<null>'),
                         coalesce(event_type, '<null>'),
                         coalesce(CAST(value AS VARCHAR), '<null>'))),
               1, 15)) AS UBIGINT)) AS BIGINT) AS content_hash
    FROM events GROUP BY 1
    """,
    "per-partition content audit hash: XOR-fold of a 60-bit md5 over "
    "each row's canonical string — XOR is commutative/associative, so "
    "the hash is identical under ANY row order, partitioning, or "
    "merge tree, which is precisely what a cross-system integrity "
    "check needs (compare per-day hashes after a migration, a "
    "replication hop, or a rewrite like compaction/Z-ordering: equal "
    "hash + equal count => content equality up to 60-bit collision). "
    "Contrast with a hash of sorted concatenation, which costs a "
    "global sort per check. Caveat stated plainly: XOR-folding means "
    "a row appearing TWICE cancels out — the row count column closes "
    "that hole for even-multiplicity corruption. The canonical string "
    "covers EVERY content column (ts as unix micros — integer, hence "
    "engine-identical where timestamp string renderings are not) with "
    "an explicit NULL sentinel per field, because concat_ws silently "
    "drops nulls and would hash field-shifted corruption identically. "
    "The oracle computes the same fold.",
)
def table_audit_hash_q(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    # canonical row encoding: EVERY content column (ts as unix micros —
    # engine string renderings of timestamps differ, integers do not),
    # and an explicit NULL sentinel per field — concat_ws silently
    # DROPS nulls, so without sentinels a field-shifted corruption
    # hashes identically to the original
    null = F.lit("<null>")
    row_str = F.concat_ws(
        "|",
        F.coalesce(F.col("event_id").cast("string"), null),
        F.coalesce(F.unix_micros("ts").cast("string"), null),
        F.coalesce(F.col("user_id").cast("string"), null),
        F.coalesce(F.col("event_type"), null),
        F.coalesce(F.col("value").cast("string"), null),
    )
    h60 = F.conv(F.substring(F.md5(row_str), 1, 15), 16, 10).cast("long")
    return e.groupBy(F.dayofmonth("ts").cast("int").alias("d")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.bit_xor(h60).cast("bigint").alias("content_hash"),
    )


# ------------------------------------------------------------------
# 29. Canonical-survivor selection (quality-aware keep-best dedup)
# ------------------------------------------------------------------


@defquery(
    "dedup_keep_best",
    """
    WITH q AS (
        SELECT doc_id, source,
               md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp,
               {_qs} AS quality
        FROM documents),
    ranked AS (
        SELECT doc_id, source, fp, quality,
               row_number() OVER (PARTITION BY fp
                                  ORDER BY quality DESC, doc_id) AS rn,
               count(*) OVER (PARTITION BY fp) AS n_dups
        FROM q)
    SELECT fp, doc_id AS survivor_id, source, quality,
           CAST(n_dups AS BIGINT) AS n_dups
    FROM ranked WHERE rn = 1
    """.format(_qs=_quality_sql()),
    "canonical-survivor selection: exact-duplicate groups keep their "
    "BEST document (max quality score, doc_id tie-break) instead of "
    "dedup_exact's arbitrary min-id — the policy question every "
    "production dedup actually has to answer, since near-identical "
    "crawl copies differ in boilerplate/truncation and the kept copy "
    "is what trains. One window over fp groups (group size = dup "
    "multiplicity, bounded in practice; the pathological all-"
    "duplicates corpus degrades the PARTITION, not the shuffle — "
    "same profile as dedup_exact's groupBy). Survivor choice is "
    "deterministic cross-engine because quality is the shared "
    "_quality_sql and ties break on doc_id.",
)
def dedup_keep_best_q(spark, sf_dir):
    from pyspark.sql.window import Window as W

    from .functions import text as TX

    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        TX.fingerprint(F.col("text")).alias("fp"),
        TX.quality_score(F.col("text")).alias("quality"),
    )
    w = W.partitionBy("fp").orderBy(F.desc("quality"), F.asc("doc_id"))
    return (
        d.withColumn("rn", F.row_number().over(w))
        .withColumn("n_dups", F.count(F.lit(1)).over(W.partitionBy("fp")))
        .filter(F.col("rn") == 1)
        .select(
            "fp",
            F.col("doc_id").alias("survivor_id"),
            "source",
            "quality",
            F.col("n_dups").cast("bigint").alias("n_dups"),
        )
    )
