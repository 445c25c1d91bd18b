"""BM25 lexical retrieval over a PERSISTED, incrementally-maintained
inverted index.

``bm25_topk``'s batch formulation rebuilds tf/dl from the corpus on
every call; a serving layer cannot afford that at 100 TB, so the index
(postings = the tf table, doclen = the per-doc length table) lives as
a store under the SAME atomic ``_BATCHES`` manifest contract as the
incremental dedup stores (``operators/dedup.py`` — two-phase commit:
write ``<table>/batch=<tag>`` directories, then one ``os.replace``
manifest swap under the flock; a torn ingest is invisible, replay is
idempotent because already-indexed doc_ids are anti-joined out). That
also makes the store lifecycle operators work on it unchanged:
``compact_incremental_store(tables=("postings", "doclen"),
cluster_by={"postings": ["token"]})`` restores token co-location that
per-batch appends erode, ``delete_from_incremental_store`` serves
takedown, ``read_incremental_store_asof`` time travel.

Scoring is shared with the batch query (:func:`bm25_rank`) and keeps
its cross-engine-exactness contract: the single ``ln`` washed at 6dp,
per-(query, doc) contributions rounded then DECIMAL(38,6)-summed
(order-free), every float expression in the identical IEEE op order
as the SQL oracle, unique (score DESC, doc_id) tie-break.

Because documents are never split across ingest batches, the union of
the store's postings/doclen equals the from-scratch tables for ANY
batch slicing — so the store-served top-k hash-matches the SAME
oracle as ``bm25_topk`` (batch placement provably irrelevant, the
``streaming_incremental_dedup`` argument applied to retrieval).
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import _manifest_publish, _manifest_read

_PARAMS = {"kind": "bm25", "tokenizer": "ws-lower", "k1": "1.2", "b": "0.75"}


def tokenize_ws(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Whitespace tokenization, lowercased — the exact split the SQL
    oracle replays (``string_split_regex(trim(lower(text)), '\\s+')``)."""
    return df.select(
        F.col(id_col),
        F.explode(F.split(F.trim(F.lower(F.col(text_col))), r"\s+")).alias("token"),
    )


def bm25_rank(tf: DataFrame, dl: DataFrame, queries: DataFrame, k: int = 10) -> DataFrame:
    """Rank documents by BM25 (Lucene +1 idf, k1=1.2, b=0.75) given the
    index tables: ``tf`` (doc_id, token, tf), ``dl`` (doc_id, dl), and
    ``queries`` (query_id, token). Candidates are docs sharing >= 1
    query term — posting-list-bounded, never corpus-bounded; corpus
    scalars (N, total tokens) ride a 1-row broadcast."""
    stats = dl.agg(F.count(F.lit(1)).alias("n"), F.sum("dl").alias("s"))
    dfreq = tf.join(F.broadcast(queries.select("token").distinct()), "token").groupBy(
        "token"
    ).agg(F.count(F.lit(1)).alias("df"))
    cand = (
        tf.join(F.broadcast(queries), "token")
        .join(F.broadcast(dfreq), "token")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
    )
    nd = F.col("n").cast("double")
    dfd = F.col("df").cast("double")
    idf = F.round(F.log(((nd - dfd + F.lit(0.5)) / (dfd + F.lit(0.5))) + F.lit(1.0)), 6)
    tfd = F.col("tf").cast("double")
    tfn = (tfd * F.lit(2.2)) / (
        tfd
        + F.lit(1.2)
        * (
            F.lit(0.25)
            + F.lit(0.75)
            * ((F.col("dl") * F.col("n")).cast("double") / F.col("s").cast("double"))
        )
    )
    contrib = F.round(idf * tfn, 6).cast("decimal(38,6)")
    scores = (
        cand.select("query_id", "doc_id", contrib.alias("c"))
        .groupBy("query_id", "doc_id")
        .agg(F.sum("c").alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("doc_id").asc())
    return (
        scores.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            F.col("rank").cast("int").alias("rank"),
            "doc_id",
            F.col("score").cast("double").alias("score"),
        )
    )


def bm25_index_ingest(
    spark,
    index_path: str,
    batch: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Add a batch of documents to the persisted inverted index:
    tokenize only the docs whose ``doc_id`` is NEW (anti-join against
    the store's doclen — replaying a crashed or duplicated ingest
    admits nothing twice), write their postings and doclen under
    ``batch=<tag>``, publish the tag atomically. Within a batch a
    duplicated doc_id keeps the lexicographically-least text
    (deterministic under any partitioning). Cost is O(batch tokens) +
    one doc_id anti-join — never a re-scan of indexed text, the same
    admission contract as ``dedup_incremental_exact``. Returns the
    admitted (doc_id, dl) rows."""
    manifest_path = os.path.join(index_path, "_BATCHES")
    uniq = batch.groupBy(id_col).agg(F.min(text_col).alias(text_col))
    tags = _manifest_read(manifest_path, _PARAMS)
    if tags:
        hist_ids = spark.read.parquet(
            *[os.path.join(index_path, "doclen", f"batch={t}") for t in tags]
        ).select(id_col)
        uniq = uniq.join(hist_ids, id_col, "left_anti")
    toks = tokenize_ws(uniq, text_col, id_col)
    tf = toks.groupBy(id_col, "token").agg(F.count(F.lit(1)).alias("tf"))
    dl = toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("dl"))
    # materialize before the append (no lazy re-run of the anti-join
    # after the store gains this batch's own doc_ids)
    dl = dl.localCheckpoint(eager=True)
    tag = uuid.uuid4().hex
    tf.write.mode("overwrite").parquet(os.path.join(index_path, "postings", f"batch={tag}"))
    dl.write.mode("overwrite").parquet(os.path.join(index_path, "doclen", f"batch={tag}"))
    _manifest_publish(manifest_path, _PARAMS, add_tags=[tag])
    return dl


def bm25_index_topk(spark, index_path: str, queries: DataFrame, k: int = 10) -> DataFrame:
    """Serve BM25 top-k from the persisted index — the read path a
    retrieval layer runs per query batch: open the manifest-listed
    postings/doclen directories and rank. At 100 TB the postings are
    token-clustered by compaction so each query term touches one file
    group; df/N/S come from the store, not the corpus."""
    manifest_path = os.path.join(index_path, "_BATCHES")
    tags = _manifest_read(manifest_path, _PARAMS)
    if not tags:
        raise ValueError(f"empty bm25 index at {index_path} (no committed batches)")
    tf = spark.read.parquet(
        *[os.path.join(index_path, "postings", f"batch={t}") for t in tags]
    )
    dl = spark.read.parquet(
        *[os.path.join(index_path, "doclen", f"batch={t}") for t in tags]
    )
    return bm25_rank(tf, dl, queries, k=k)
