"""Similarity search over embedding columns (``array<float>``).

* ``knn_bruteforce`` — exact top-k: broadcast the (small) query set
  against the corpus, cosine via JVM higher-order functions, top-k per
  query via one window shuffle. The exact baseline every ANN variant is
  measured against.
* ``random_hyperplane_buckets`` / ``knn_lsh`` — signed-random-projection
  LSH: deterministic hyperplanes (seeded), corpus bucketed once;
  queries probe only their bucket(s). The scale path: candidate volume
  ∝ bucket size, not corpus size.
* ``knn_ivf`` — IVF-style coarse quantizer: deterministic centroid
  seed + Lloyd refinement entirely in DataFrame ops; queries probe the
  ``nprobe`` nearest centroids' inverted lists.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vector import cosine_similarity, dot, to_double_array


def knn_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact cosine top-k. ``queries`` must have (query_id, vec).
    One broadcast (queries), one window shuffle (per-query top-k);
    the corpus is scanned exactly once, so this scales with corpus
    size regardless of query count."""
    from ..functions.vector import norm

    # norms are per-vector, not per-pair: compute each side's norm ONCE
    # (corpus: one pass; queries: in the broadcast) so the per-pair work
    # is a single fused dot product instead of three array traversals
    q = queries.select(
        F.col(query_id_col), F.col(vec_col).alias("__qvec__"), norm(F.col(vec_col)).alias("__qnorm__")
    )
    c = corpus.withColumn("__cnorm__", norm(F.col(vec_col)))
    cos = F.round(dot(F.col(vec_col), F.col("__qvec__")) / (F.col("__cnorm__") * F.col("__qnorm__")), 6)
    scored = c.crossJoin(F.broadcast(q)).select(
        F.col(query_id_col),
        F.col(id_col),
        cos.alias("cosine"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("cosine").desc(), F.col(id_col).asc())
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def _hyperplanes(dim: int, num_planes: int, seed: int = 42) -> list[list[float]]:
    rng = np.random.RandomState(seed)
    return rng.randn(num_planes, dim).tolist()


def random_hyperplane_buckets(
    df: DataFrame,
    dim: int,
    num_planes: int = 12,
    seed: int = 42,
    vec_col: str = "embedding",
) -> DataFrame:
    """Append a signed-random-projection bucket id (one of
    2^num_planes). Hyperplanes are literal arrays baked into the plan —
    identical on every executor, no side channel needed."""
    planes = _hyperplanes(dim, num_planes, seed)
    bucket = F.lit(0).cast("long")
    v = to_double_array(F.col(vec_col))
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        d = F.aggregate(F.zip_with(v, plane, lambda a, b: a * b), F.lit(0.0), lambda acc, x: acc + x)
        bucket = bucket + F.when(d >= 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(F.lit(0).cast("long"))
    return df.withColumn("bucket", bucket)


def knn_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    num_planes: int = 8,
    seed: int = 42,
    probes: int = 1,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
) -> DataFrame:
    """ANN top-k: equi-join corpus and queries on the LSH bucket, exact
    cosine within the bucket. Approximate — recall is tuned by
    ``num_planes`` (bucket granularity) and ``probes`` (multi-probe:
    also search buckets within hamming ``probes`` of the query's
    bucket, the standard recall boost that avoids re-hashing the
    corpus)."""
    cb = random_hyperplane_buckets(corpus, dim, num_planes, seed, vec_col)
    from ..functions.vector import norm

    qb0 = random_hyperplane_buckets(
        queries.select(F.col(query_id_col), F.col(vec_col)), dim, num_planes, seed, vec_col
    ).select(
        query_id_col,
        F.col(vec_col).alias("__qvec__"),
        norm(F.col(vec_col)).alias("__qnorm__"),
        "bucket",
    )
    probe_masks = [0]
    if probes >= 1:
        probe_masks += [1 << i for i in range(num_planes)]
    if probes >= 2:
        probe_masks += [
            (1 << i) | (1 << j) for i in range(num_planes) for j in range(i + 1, num_planes)
        ]
    qb = qb0.select(
        query_id_col,
        "__qvec__",
        "__qnorm__",
        F.explode(F.array(*[F.col("bucket").bitwiseXOR(F.lit(m)) for m in probe_masks])).alias("bucket"),
    )
    # per-side norms computed once (see knn_bruteforce); per-candidate
    # work is one fused dot product
    cbn = cb.withColumn("__cnorm__", norm(F.col(vec_col)))
    cos = F.round(dot(F.col(vec_col), F.col("__qvec__")) / (F.col("__cnorm__") * F.col("__qnorm__")), 6)
    scored = cbn.join(F.broadcast(qb), "bucket").select(
        F.col(query_id_col), F.col(id_col), cos.alias("cosine")
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("cosine").desc(), F.col(id_col).asc())
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def knn_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    nlist: int = 16,
    nprobe: int = 4,
    lloyd_iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
) -> DataFrame:
    """IVF ANN: coarse-quantize the corpus into ``nlist`` cells
    (deterministic init = lowest ids; Lloyd refinement as DataFrame
    aggregations), then score queries only against their ``nprobe``
    nearest cells. Everything stays distributed; centroids (tiny) are
    the only broadcast."""
    spark = corpus.sparkSession

    # deterministic init: the nlist lowest-id vectors
    cents = (
        corpus.orderBy(id_col)
        .limit(nlist)
        .select(F.monotonically_increasing_id().alias("cid"), to_double_array(F.col(vec_col)).alias("cvec"))
    )
    for _ in range(lloyd_iters):
        assigned = _assign_to_centroid(corpus, cents, vec_col, id_col)
        # new centroid = elementwise mean of member vectors
        dim_idx = F.sequence(F.lit(0), F.size(F.col(vec_col)) - 1)
        exploded = assigned.select(
            "cid", F.explode(F.arrays_zip(to_double_array(F.col(vec_col)).alias("v"), dim_idx.alias("i"))).alias("z")
        ).select("cid", F.col("z.v").alias("v"), F.col("z.i").alias("i"))
        cents = (
            exploded.groupBy("cid", "i")
            .agg(F.avg("v").alias("m"))
            .groupBy("cid")
            .agg(F.array_sort(F.collect_list(F.struct("i", "m"))).alias("ims"))
            .select("cid", F.transform(F.col("ims"), lambda s: s["m"]).alias("cvec"))
        )

    assigned = _assign_to_centroid(corpus, cents, vec_col, id_col)

    q = queries.select(F.col(query_id_col), F.col(vec_col).alias("__qvec__"))
    qc = q.crossJoin(F.broadcast(cents)).select(
        query_id_col,
        "__qvec__",
        "cid",
        cosine_similarity(F.col("__qvec__"), F.col("cvec")).alias("csim"),
    )
    wq = Window.partitionBy(query_id_col).orderBy(F.col("csim").desc(), F.col("cid").asc())
    probes = qc.withColumn("r", F.row_number().over(wq)).filter(F.col("r") <= nprobe).select(query_id_col, "__qvec__", "cid")

    cos = F.round(cosine_similarity(F.col(vec_col), F.col("__qvec__")), 6)
    scored = assigned.join(F.broadcast(probes), "cid").select(
        F.col(query_id_col), F.col(id_col), cos.alias("cosine")
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("cosine").desc(), F.col(id_col).asc())
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def _assign_to_centroid(corpus: DataFrame, cents: DataFrame, vec_col: str, id_col: str) -> DataFrame:
    scored = corpus.crossJoin(F.broadcast(cents)).select(
        F.col(id_col),
        F.col(vec_col),
        F.col("cid"),
        cosine_similarity(F.col(vec_col), F.col("cvec")).alias("csim"),
    )
    w = Window.partitionBy(id_col).orderBy(F.col("csim").desc(), F.col("cid").asc())
    return scored.withColumn("r", F.row_number().over(w)).filter(F.col("r") == 1).drop("r", "csim")
