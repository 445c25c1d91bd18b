"""Iterative graph algorithms over pair/edge DataFrames.

Complements the connected-components clustering in
:mod:`..operators.dedup` (the other iterative operator): PageRank-style
scoring of the near-duplicate graph ranks the "template" documents that
many near-copies orbit — useful for choosing canonical survivors and
for spotting boilerplate hubs in a crawl.

Scale design mirrors connected_components: per-iteration work is one
join + one aggregate over the EDGE list (never the corpus), lineage is
truncated every iteration (iterative DataFrame plans grow exponentially
in Catalyst otherwise), and iteration count is fixed — power iteration
converges geometrically at rate = damping, so ~20 rounds give ~1e-3
relative error regardless of graph size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    nodes: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    id_col: str = "doc_id",
    damping: float = 0.85,
    iterations: int = 20,
    undirected: bool = True,
    checkpoint_every: int = 3,
) -> DataFrame:
    """PageRank over an edge list; returns ``(id_col, rank)``.

    Dangling nodes (no out-edges) redistribute their mass uniformly —
    handled as a 1-row aggregate broadcast-cross-joined into the update
    (stays lazy: one job per iteration, no driver round-trip) rather
    than materializing virtual edges to every node (which would be
    |dangling|×|V| rows).

    ``rank`` sums to 1.0 over nodes (probability interpretation);
    everything stays distributed.
    """
    n_nodes = nodes.count()
    if undirected:
        e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).unionByName(
            edges.select(F.col(dst).alias("u"), F.col(src).alias("v"))
        )
    else:
        e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    e = e.distinct()
    deg = e.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
    # edge table annotated with source out-degree, reused every round
    ed = e.join(deg, "u").localCheckpoint(eager=True)
    # the dangling node SET is rank-independent — compute once
    dangling_ids = (
        nodes.select(F.col(id_col).alias("u")).join(deg, "u", "left_anti").localCheckpoint(eager=True)
    )

    # ranks carries every node from round 0, so each update is a LEFT
    # join of inflow onto the running rank table — no per-round join
    # back to the corpus node list
    ranks = nodes.select(F.col(id_col).alias("u")).withColumn(
        "rank", F.lit(1.0 / n_nodes)
    )
    base = (1.0 - damping) / n_nodes
    for it in range(iterations):
        # mass flowing along edges: rank(u)/deg(u) to each neighbor v
        contrib = (
            ed.join(ranks, "u")
            .select(F.col("v").alias("u"), (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("u")
            .agg(F.sum("c").alias("inflow"))
        )
        # dangling mass spreads uniformly — 1-row lazy aggregate,
        # broadcast into the update
        dangling = ranks.join(dangling_ids, "u", "left_semi").agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("__dm__")
        )
        ranks = (
            ranks.select("u")
            .join(contrib, "u", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "u",
                (
                    F.lit(base)
                    + F.lit(damping)
                    * (F.coalesce(F.col("inflow"), F.lit(0.0)) + F.col("__dm__") / n_nodes)
                ).alias("rank"),
            )
        )
        # truncate lineage periodically — every round doubles the plan,
        # but a checkpoint costs a full materialization; every
        # checkpoint_every rounds balances plan growth vs job count
        if (it + 1) % checkpoint_every == 0 or it == iterations - 1:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks.select(F.col("u").alias(id_col), F.round("rank", 8).alias("rank"))


def triangle_count(edges: DataFrame, u: str = "u", v: str = "v") -> DataFrame:
    """Count triangles in an undirected graph via DEGREE ORIENTATION.

    ``edges`` must be the canonical undirected edge set (one row per
    edge, ``u < v``, no self-loops). Each edge is directed from its
    (degree, id)-lexicographically smaller endpoint; every triangle is
    then generated exactly once as a wedge at its smallest vertex in
    that total order, and per-vertex wedge fan-out is bounded by
    out-degree = O(sqrt(m)) — the standard bound that keeps the wedge
    join alive under power-law skew, where the unoriented wedge join is
    quadratic in the hub vertex's degree. Returns one row
    ``(n_edges bigint, n_triangles bigint)``.
    """
    deg = (
        edges.select(F.col(u).alias("x"))
        .unionAll(edges.select(F.col(v).alias("x")))
        .groupBy("x")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    du = deg.select(F.col("x").alias(u), F.col("deg").alias("du"))
    dv = deg.select(F.col("x").alias(v), F.col("deg").alias("dv"))
    oriented = (
        edges.join(du, u)
        .join(dv, v)
        .select(
            F.when(
                (F.col("du") < F.col("dv"))
                | ((F.col("du") == F.col("dv")) & (F.col(u) < F.col(v))),
                F.struct(F.col(u).alias("s"), F.col(v).alias("d")),
            )
            .otherwise(F.struct(F.col(v).alias("s"), F.col(u).alias("d")))
            .alias("e")
        )
        .select("e.s", "e.d")
    )
    w1 = oriented.select("s", F.col("d").alias("d1"))
    w2 = oriented.select("s", F.col("d").alias("d2"))
    wedges = w1.join(w2, "s").filter(F.col("d1") < F.col("d2"))
    closing = edges.select(F.col(u).alias("cu"), F.col(v).alias("cv"))
    tri = wedges.join(
        closing,
        (F.least("d1", "d2") == F.col("cu"))
        & (F.greatest("d1", "d2") == F.col("cv")),
        "left_semi",
    )
    n_tri = tri.agg(F.count(F.lit(1)).cast("bigint").alias("n_triangles"))
    n_edges = edges.agg(F.count(F.lit(1)).cast("bigint").alias("n_edges"))
    return n_edges.crossJoin(n_tri)
