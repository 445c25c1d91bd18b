"""Round-5 scale-pattern operators: the distributed-algorithm shapes a
100 TB deployment leans on when the naive plan stops fitting —
mergeable-sketch heavy hitters (Misra-Gries two-pass), mergeable
histogram percentiles (the no-global-sort quantile path), time-bucketed
interval overlap join (the blocking answer to an unbounded range
self-join), and degree-oriented triangle counting (the classic
skew-proof graph pattern).

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

from .queries import QUERIES, _t, defquery  # noqa: F401

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

_MAX_OCC = 256  # hot-group defense: a (type, hour) cell with more
                # co-occurring users than this is dropped from edge
                # generation (its pair fan-out is quadratic in cell size)


@defquery(
    "triangle_count_cooccurrence",
    f"""
    WITH occ AS (
        SELECT DISTINCT user_id, event_type, date_trunc('hour', ts) AS h
        FROM events),
    cell AS (
        SELECT event_type, h FROM occ GROUP BY 1, 2
        HAVING count(*) <= {_MAX_OCC}),
    edges AS (
        SELECT DISTINCT a.user_id AS u, b.user_id AS v
        FROM occ a JOIN occ b
          ON a.event_type = b.event_type AND a.h = b.h
         AND a.user_id < b.user_id
        JOIN cell c ON c.event_type = a.event_type AND c.h = a.h)
    SELECT CAST((SELECT count(DISTINCT user_id) FROM occ) AS BIGINT) AS n_vertices,
           CAST((SELECT count(*) FROM edges) AS BIGINT) AS n_edges,
           CAST((SELECT count(*)
                 FROM edges e1
                 JOIN edges e2 ON e2.u = e1.u AND e1.v < e2.v
                 JOIN edges e3 ON e3.u = e1.v AND e3.v = e2.v) AS BIGINT)
               AS n_triangles
    """,
    "triangle counting on the user co-occurrence graph (edge = two "
    "users active in the same (event_type, hour) cell, cells capped at "
    "256 users — the hot-group defense that keeps edge generation "
    "linear, mirroring dedup's max_df contract). The count itself uses "
    "DEGREE ORIENTATION: each undirected edge is directed from its "
    "lower-degree endpoint (ties by id), every triangle is then "
    "counted exactly once as a wedge at its lowest-degree vertex, and "
    "per-vertex wedge fan-out is bounded by out-degree <= O(sqrt(m)) "
    "— the standard bound that makes triangle counting survive "
    "power-law degree skew, where the naive wedge join explodes "
    "quadratically at the hub vertices. The oracle counts the same "
    "triangles with an unoriented 3-way self-join: orientation must "
    "be count-preserving.",
)
def triangle_count_q(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    occ = e.select(
        "user_id", "event_type", F.date_trunc("hour", "ts").alias("h")
    ).distinct()
    cell_ok = (
        occ.groupBy("event_type", "h")
        .agg(F.count(F.lit(1)).alias("cs"))
        .filter(F.col("cs") <= _MAX_OCC)
        .drop("cs")
    )
    occ_ok = occ.join(cell_ok, ["event_type", "h"], "left_semi")
    a, b = occ_ok.alias("a"), occ_ok.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.event_type") == F.col("b.event_type"))
            & (F.col("a.h") == F.col("b.h"))
            & (F.col("a.user_id") < F.col("b.user_id")),
        )
        .select(F.col("a.user_id").alias("u"), F.col("b.user_id").alias("v"))
        .distinct()
    )
    from .operators.graph import triangle_count

    counts = triangle_count(edges, "u", "v")
    n_vert = occ.agg(
        F.count_distinct("user_id").cast("bigint").alias("n_vertices")
    )
    return n_vert.crossJoin(counts)
