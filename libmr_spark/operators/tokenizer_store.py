"""Tokenizer ARTIFACT store: BPE merges as a versioned, manifest-
committed table — the missing link between training a tokenizer
(``bpe_train_merges``) and using one (``token_id_encoding``). A
production pipeline trains merges rarely and encodes petabytes against
a PINNED merge list; what needs to be durable, versioned and
reproducible is the merge table itself:

- ``merges/batch=<tag>`` — (rnd, l, r, n) rows, committed under the
  standard ``_BATCHES`` manifest (publish-last, crash-invisible).
  Each training call CONTINUES from the stored list: BPE training is
  sequentially greedy, so training 3 rounds then 2 more commits the
  identical table as training 5 in one sitting — which is exactly the
  oracle the gate query holds it to.
- encoding serves against the stored list (optionally pinned
  ``as_of_batches`` — the fleet-snapshot contract), segmenting the
  DISTINCT words (Heaps-bounded) and joining back to documents, so
  the corpus pays one tokenize pass and the merge machinery runs over
  vocabulary-sized state only.

Reference parity: none to match (the reference has no tokenizer
surface); SURVEY §7.2a round-10 #3.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import _manifest_publish, _manifest_read

_PARAMS = {"kind": "bpe-merges", "tokenizer": "ws-lower"}


def _word_syms(words: DataFrame) -> DataFrame:
    """(word, freq?) → + syms: the character-split start state."""
    return words.withColumn(
        "syms",
        F.transform(
            F.sequence(F.lit(1), F.length("word")),
            lambda i: F.substring(F.col("word"), i, 1),
        ),
    )


def apply_merge(syms_col, left: str, right: str):
    """One-pass left-to-right greedy application of merge (l, r) to a
    symbol array — provably equal to iterate-first-occurrence (merging
    can never create a new occurrence adjacent to its own site; see
    bpe_train_merges). A Column expression: runs JVM-side."""
    return F.aggregate(
        syms_col,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(left + right))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def top_pair(vocab: DataFrame):
    """The round's winning adjacent symbol pair over a (word, freq,
    syms) vocabulary: max summed frequency, (n DESC, l ASC, r ASC)
    tie-break — the ONE copy of the selection both the store trainer
    and the bpe_train_merges gate query run, so the cross-query
    hash-equivalence contract can't silently fork. Returns
    (l, r, n) or None when the vocabulary is exhausted."""
    rows = (
        vocab.filter(F.size("syms") >= 2)
        .select(
            "freq",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("syms") - 1),
                    lambda i: F.struct(
                        F.element_at("syms", i).alias("l"),
                        F.element_at("syms", i + 1).alias("r"),
                    ),
                )
            ).alias("p"),
        )
        .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
        .agg(F.sum("freq").alias("n"))
        .orderBy(F.col("n").desc(), F.col("l").asc(), F.col("r").asc())
        .limit(1)
        .collect()
    )
    if not rows:
        return None
    return rows[0].l, rows[0].r, int(rows[0].n)


def _corpus_vocab(docs: DataFrame, text_col: str) -> DataFrame:
    tok = docs.select(
        F.explode(
            F.filter(
                F.split(F.trim(F.lower(F.col(text_col))), r"\s+"), lambda w: w != ""
            )
        ).alias("word")
    )
    return _word_syms(tok.groupBy("word").agg(F.count(F.lit(1)).alias("freq")))


def bpe_store_merges(
    spark, store_path: str, as_of_batches: int | None = None
) -> list:
    """The stored merge list in training order: [(rnd, l, r, n), ...].
    Driver-side rows by design — the merge table is the tokenizer
    artifact (vocab-scale, ~10⁴-10⁵ rows at production size), and
    encode needs it sequentially."""
    manifest_path = os.path.join(store_path, "_BATCHES")
    tags = _manifest_read(manifest_path, _PARAMS)
    if not tags:
        return []
    if as_of_batches is not None:
        if not 0 < as_of_batches <= len(tags):
            raise ValueError(
                f"as_of_batches={as_of_batches} out of range for store "
                f"{store_path} with {len(tags)} committed batches"
            )
        tags = tags[:as_of_batches]
    rows = (
        spark.read.parquet(
            *[os.path.join(store_path, "merges", f"batch={t}") for t in tags]
        )
        .orderBy("rnd")
        .collect()
    )
    return [(r.rnd, r.l, r.r, r.n) for r in rows]


def bpe_store_train(
    spark, store_path: str, docs: DataFrame, rounds: int, text_col: str = "text"
) -> list:
    """Learn ``rounds`` MORE merges continuing from the stored list and
    commit them as one batch. Returns the newly learned merges.

    Continuation = replay the stored merges onto the fresh vocabulary,
    then keep training; because greedy BPE is sequential, the store
    after train(3)+train(2) is bit-identical to train(5) — the
    versioning is free. Cost per round: one pair-count aggregate over
    the VOCABULARY (the corpus is touched once, by the word count)."""
    stored = bpe_store_merges(spark, store_path)
    vocab = _corpus_vocab(docs, text_col)
    for _rnd, l, r, _n in stored:
        vocab = vocab.select("word", "freq", apply_merge("syms", l, r).alias("syms"))
    vocab = vocab.localCheckpoint()

    new_merges: list = []
    next_rnd = (stored[-1][0] + 1) if stored else 1
    for rnd in range(next_rnd, next_rnd + rounds):
        top = top_pair(vocab)
        if top is None:
            break  # vocabulary exhausted: commit what was learned
        l, r, n = top
        new_merges.append((rnd, l, r, n))
        vocab = vocab.select(
            "word", "freq", apply_merge("syms", l, r).alias("syms")
        ).localCheckpoint()

    tag = uuid.uuid4().hex
    spark.createDataFrame(
        new_merges, "rnd int, l string, r string, n bigint"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(store_path, "merges", f"batch={tag}")
    )
    _manifest_publish(os.path.join(store_path, "_BATCHES"), _PARAMS, add_tags=[tag])
    return new_merges


def bpe_store_encode(
    spark,
    store_path: str,
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    as_of_batches: int | None = None,
) -> DataFrame:
    """Encode ``docs`` under the PINNED stored merge list: returns
    (id, syms) with each document's full symbol sequence after greedy
    BPE. Segmentation is computed once per DISTINCT word
    (Heaps-bounded) and joined back positionally, so document order is
    exact and the corpus never re-enters the merge machinery."""
    merges = bpe_store_merges(spark, store_path, as_of_batches=as_of_batches)
    if not merges:
        raise ValueError(f"empty bpe store at {store_path} (no committed merges)")

    words = docs.select(
        F.col(id_col),
        F.posexplode(
            F.filter(
                F.split(F.trim(F.lower(F.col(text_col))), r"\s+"), lambda w: w != ""
            )
        ).alias("pos", "word"),
    )
    seg = _word_syms(words.select("word").distinct())
    for _rnd, l, r, _n in merges:
        seg = seg.select("word", apply_merge("syms", l, r).alias("syms"))
    seg = seg.localCheckpoint()

    # no broadcast hint: the segmentation map is vocabulary-sized
    # (Heaps-bounded) — AQE broadcasts it while it fits and falls back
    # to a shuffle join past the bound (the r7 vocab-broadcast rule)
    return (
        words.join(seg, "word")
        .groupBy(id_col)
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "syms"))),
                    lambda s: s.syms,
                )
            ).alias("syms")
        )
    )


def min_piece_segmentation(
    spark,
    words: "DataFrame",
    pieces: "DataFrame",
    max_iter: int = 32,
) -> "DataFrame":
    """Minimal-piece subword segmentation — the DP at the core of the
    WordPiece/SentencePiece tokenizer family, as BFS over character
    positions: a word's states are (pos, k-pieces-consumed); each
    round extends every frontier state by every vocabulary piece that
    matches at its position; the FIRST round in which a word reaches
    its end is, by BFS, its minimal piece count.  No tie-break is
    needed because only the minimal COUNT is emitted — the property
    that makes the result exactly provable cross-engine (a specific
    argmin segmentation would need a total order over equal-cost
    paths; the count does not).

    ``words``: one column ``word`` (distinct, non-empty).  ``pieces``:
    one column ``piece`` — must include every single character of the
    corpus or un-segmentable words never finish (they surface as
    absent rows; callers building the vocab from corpus chars get
    totality by construction).  Emits ``(word, n_pieces)``.

    Scale shape: the state space is distinct-words-bounded (positions
    × rounds, never corpus-bounded), the pieces side is a
    vocabulary-bounded broadcast, and each BFS round is one
    substring-equality join — O(max word length) rounds of
    Heaps-law-sized work, the same envelope as the BPE training loop
    (`bpe_store_train`)."""
    from pyspark.sql import functions as F

    pieces = pieces.select("piece", F.length("piece").alias("plen"))
    words = words.select("word", F.length("word").alias("wlen"))
    frontier = words.select("word", "wlen", F.lit(0).alias("pos"))
    seen = frontier.select("word", "pos").localCheckpoint(eager=True)
    done_parts = []
    for step in range(1, max_iter + 1):
        expanded = (
            frontier.join(
                F.broadcast(pieces),
                F.substring(F.col("word"), F.col("pos") + 1, F.col("plen"))
                == F.col("piece"),
            )
            .select("word", "wlen", (F.col("pos") + F.col("plen")).alias("pos"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        finished = expanded.filter(F.col("pos") == F.col("wlen")).select(
            "word", F.lit(step).alias("n_pieces")
        )
        done_parts.append(finished)
        frontier = (
            expanded.filter(F.col("pos") < F.col("wlen"))
            .join(finished.select("word"), "word", "left_anti")
            .join(seen, ["word", "pos"], "left_anti")
            .localCheckpoint(eager=True)
        )
        if frontier.isEmpty():
            break
        seen = (
            seen.unionByName(frontier.select("word", "pos"))
            .localCheckpoint(eager=True)
        )
    out = done_parts[0]
    for d in done_parts[1:]:
        out = out.unionByName(d)
    # BFS emits a word exactly once (finished words leave the
    # frontier), so this is a disjoint union — one row per word
    return out
