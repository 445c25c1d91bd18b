"""Relational operator surface — the capability categories the brief
requires that are absent from the reference (SURVEY §2.2: the step enum
``/root/reference/src/mr.c:181-189`` has no join/window/sort/set-op).
Each operator is a thin, scale-aware composition of Spark built-ins:
declarative plans so Catalyst applies pushdown/pruning/join selection,
explicit broadcast for dimension tables, deterministic tie-breaks on
every top-k so results are reproducible across cluster sizes.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def broadcast_join(fact: DataFrame, dim: DataFrame, on, how: str = "inner") -> DataFrame:
    """Join with an explicit broadcast of the (small) dimension side —
    at 100 TB the fact table never shuffles for a dim join."""
    return fact.join(F.broadcast(dim), on, how)


def semi_join(left: DataFrame, right: DataFrame, on) -> DataFrame:
    """EXISTS: rows of ``left`` with a match in ``right``."""
    return left.join(right, on, "left_semi")


def anti_join(left: DataFrame, right: DataFrame, on) -> DataFrame:
    """NOT EXISTS: rows of ``left`` without a match in ``right``."""
    return left.join(right, on, "left_anti")


def top_k(df: DataFrame, order_by: Sequence[Column], k: int) -> DataFrame:
    """Global top-k. Spark turns orderBy+limit into TakeOrderedAndProject
    (per-partition heap + driver merge of k rows) — no global sort, so
    it scales to arbitrary input size. Callers must include a unique
    tie-break column for determinism."""
    return df.orderBy(*order_by).limit(k)


def top_k_per_group(
    df: DataFrame, partition_by: Sequence[str], order_by: Sequence[Column], k: int, rank_col: str = "rn"
) -> DataFrame:
    """Top-k within each group via row_number — one shuffle on the
    group key, no global sort."""
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return df.withColumn(rank_col, F.row_number().over(w)).filter(F.col(rank_col) <= k)


def running_agg(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[Column],
    agg_col: Column,
    out_name: str,
    fn=F.sum,
) -> DataFrame:
    """Running aggregate (unbounded-preceding → current row)."""
    w = Window.partitionBy(*partition_by).orderBy(*order_by).rowsBetween(Window.unboundedPreceding, 0)
    return df.withColumn(out_name, fn(agg_col).over(w))


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: Sequence[str],
    right_cols: Sequence[str],
    tolerance: Column | None = None,
    direction: str = "backward",
) -> DataFrame:
    """As-of join: for every left row, the single right row with the
    greatest ``on`` ≤ left.on (direction='backward'), matching on the
    ``by`` equi-keys.

    The reference has no join at all (SURVEY §2.2); this is built
    Spark-first as union + window ``last(ignorenulls)`` — ONE shuffle on
    (by, on), no range-explosion, no broadcast requirement, so it holds
    at 100 TB where a naive range join would quadratically blow up:

    1. tag both sides, union on the (by, on) spine,
    2. per ``by`` group ordered by (on, right-first), carry the last
       seen right values forward,
    3. keep left rows; optionally null out matches older than
       ``tolerance`` (seconds).
    """
    if direction != "backward":
        raise NotImplementedError("only backward as-of is implemented")
    by = list(by)
    lcols = [c for c in left.columns]
    tag = "__asof_side__"
    rv_prefix = "__asof_r_"

    l_tagged = left.select(
        *[F.col(c) for c in lcols],
        F.lit(1).alias(tag),
        *[F.lit(None).cast(right.schema[rc].dataType).alias(rv_prefix + rc) for rc in right_cols],
    )
    # align right onto the left schema: shared (by, on) columns pass
    # through, every other left column becomes a typed null
    r_full = right.select(
        *[
            F.col(c) if (c in by or c == on) else F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in lcols
        ],
        F.lit(0).alias(tag),
        *[F.col(rc).alias(rv_prefix + rc) for rc in right_cols],
    )

    unioned = l_tagged.unionByName(r_full)
    # right rows (tag=0) sort before left rows at the same timestamp, so
    # an exact-timestamp right row IS visible to the left row (<=).
    w = Window.partitionBy(*by).orderBy(F.col(on).asc(), F.col(tag).asc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    carried = unioned
    for rc in right_cols:
        carried = carried.withColumn(rv_prefix + rc, F.last(rv_prefix + rc, ignorenulls=True).over(w))
    if tolerance is not None:
        on_carry = "__asof_r_on__"
        carried = carried.withColumn(
            on_carry,
            F.last(F.when(F.col(tag) == 0, F.col(on)), ignorenulls=True).over(w),
        )
        stale = F.col(on).cast("double") - F.col(on_carry).cast("double") > tolerance
        for rc in right_cols:
            carried = carried.withColumn(
                rv_prefix + rc, F.when(stale, F.lit(None)).otherwise(F.col(rv_prefix + rc))
            )
        carried = carried.drop(on_carry)
    out = carried.filter(F.col(tag) == 1).drop(tag)
    for rc in right_cols:
        out = out.withColumnRenamed(rv_prefix + rc, rc)
    return out


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_val: str,
    lo: str,
    hi: str,
    bucket_width: float | None = None,
) -> DataFrame:
    """Join rows of ``left`` to interval rows of ``right`` where
    ``left.left_val ∈ [right.lo, right.hi)``.

    Naive theta-join is a broadcast nested loop — fine for small
    interval tables, quadratic at scale. With ``bucket_width`` set,
    both sides are bucketed into fixed-width bins first (intervals
    explode into the bins they overlap) so the join becomes an
    equi-join on the bin id + residual predicate: one hash shuffle,
    no nested loop.
    """
    pred = (F.col(left_val) >= F.col(lo)) & (F.col(left_val) < F.col(hi))
    if bucket_width is None:
        return left.join(F.broadcast(right), pred)
    b = float(bucket_width)
    lb = left.withColumn("__bin__", F.floor(F.col(left_val) / b))
    rb = right.withColumn(
        "__bin__",
        F.explode(F.sequence(F.floor(F.col(lo) / b), F.floor((F.col(hi) - F.lit(1e-9)) / b))),
    )
    return lb.join(rb, "__bin__").filter(pred).drop("__bin__")


def grouping_sets(df: DataFrame, view_name: str, sets_sql: str, agg_sql: str, group_cols: str) -> DataFrame:
    """GROUPING SETS via SQL (Catalyst expands to a single Expand node —
    one pass over the data regardless of set count)."""
    df.createOrReplaceTempView(view_name)
    return df.sparkSession.sql(
        f"SELECT {group_cols}, {agg_sql} FROM {view_name} GROUP BY GROUPING SETS {sets_sql}"
    )


def write_bucketed(df: DataFrame, table_name: str, key: str, num_buckets: int) -> None:
    """Persist ``df`` hash-bucketed (and sorted) by ``key``: the
    pre-shuffle that makes every later equi-join/agg on ``key``
    exchange-free. ``repartition`` first so each bucket is one sorted
    file — then a join of two co-bucketed tables needs neither Exchange
    nor Sort (verified in test_bucketed_join_is_exchange_free).

    This is the durable analog of the reference's keyspace partitioning:
    LibMR data is permanently hash-sliced across shards
    (``/root/reference/src/cluster.c:1820-1843``), so its reshuffle step
    is a no-op for already-owned records (``src/mr.c:745-749``);
    bucketing gives Spark the same "already co-located" property.
    """
    (
        df.repartition(num_buckets, F.col(key))
        .write.mode("overwrite")
        .bucketBy(num_buckets, key)
        .sortBy(key)
        .saveAsTable(table_name)
    )


def co_located_join(spark, left_table: str, right_table: str, on, how: str = "inner") -> DataFrame:
    """Join two tables previously written with ``write_bucketed`` on
    their bucket key: scan-local merge join, zero shuffle of either
    side. ``hint('merge')`` pins sort-merge so a small side doesn't
    broadcast away the demonstration at test scale."""
    return spark.table(left_table).hint("merge").join(spark.table(right_table), on, how)


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    num_salts: int = 8,
    how: str = "inner",
    salt_col: str = "__salt__",
) -> DataFrame:
    """Skew-mitigating equi-join: spread each (possibly hot) fact key
    across ``num_salts`` sub-keys and replicate the dim side that many
    times, so one pathological key occupies ``num_salts`` reducers
    instead of one. Complements AQE's runtime skew splitting (enabled in
    session.py) when skew is known ahead of time.

    The salt value only balances rows — any assignment yields the same
    join result — so it's derived from ``monotonically_increasing_id``
    (cheap, no extra hash of row content).
    """
    fact_s = fact.withColumn(salt_col, F.pmod(F.monotonically_increasing_id(), F.lit(num_salts)).cast("int"))
    rep = dim.crossJoin(
        F.broadcast(
            dim.sparkSession.range(num_salts).select(F.col("id").cast("int").alias(salt_col))
        )
    )
    return fact_s.join(rep, [on, salt_col], how).drop(salt_col)
