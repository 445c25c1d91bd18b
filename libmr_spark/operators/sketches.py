"""Mergeable-sketch operators: bounded-memory summaries whose partials
combine associatively, so they survive any partitioning — the property
that separates "works on local[32]" from "works on 1000 executors".

Misra-Gries heavy hitters here; the mergeable histogram-percentile
shape lives as pure Column algebra in queries_scale.py (its partial IS
a groupBy count, no custom code needed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mg_candidates(df: DataFrame, col: str, capacity: int) -> DataFrame:
    """Per-partition Misra-Gries summaries of ``df[col]``, unioned.

    Each partition holds at most ``capacity`` keys at any moment: every
    Arrow batch's value_counts is added to the summary, and when the
    summary exceeds capacity the (capacity+1)-st largest count is
    subtracted from all entries and non-positive ones dropped — the
    batch-merge form of the classic decrement step, O(capacity) memory
    regardless of the partition's distinct count (a plain groupBy's
    hash table is unbounded, which is what dies first on a 100 TB
    high-cardinality column).

    Guarantee: a key with GLOBAL frequency > n/(capacity+1) appears in
    at least one partition's summary — each partial undercounts any key
    by at most n_part/(capacity+1) and the bounds sum across
    partitions. Output is the distinct candidate set (<= capacity *
    num_partitions rows, driver-trivial).
    """
    import pandas as pd

    field = df.schema[col]

    def partial(batches):
        summary = pd.Series(dtype="int64")
        for pdf in batches:
            summary = summary.add(pdf[col].value_counts(), fill_value=0)
            if len(summary) > capacity:
                cut = summary.nlargest(capacity + 1).iloc[-1]
                summary = (summary - cut)[lambda s: s > 0]
        if len(summary):
            yield pd.DataFrame({col: summary.index})

    return df.select(col).mapInPandas(
        partial, schema=f"{col} {field.dataType.simpleString()}"
    ).distinct()


def heavy_hitters(df: DataFrame, col: str, k: int, capacity: int) -> DataFrame:
    """Exact top-``k`` of ``df[col]`` by frequency via two passes:
    Misra-Gries candidate generation (bounded memory), then an exact
    count restricted to the broadcast candidate set. Identical to the
    full groupBy top-k whenever the k-th frequency exceeds
    n/(capacity+1) — size ``capacity`` to that bound. Ties broken on
    the key so the boundary row is unique."""
    candidates = mg_candidates(df, col, capacity)
    return (
        df.join(F.broadcast(candidates), col, "left_semi")
        .groupBy(col)
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .orderBy(F.desc("n"), F.asc(col))
        .limit(k)
    )
