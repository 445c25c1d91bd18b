"""Cross-store referential takedown: one call that removes a set of
doc ids from EVERY store kind that knows them — the operational shape
a right-to-be-forgotten request actually has (the requester hands you
ids, not a list of your internal stores). Each store family keeps its
own proven delete semantics; this operator only routes and audits:

- ``table``-style stores (exact fps, BM25 index, ANN cells, the
  four-table hybrid store) → :func:`dedup.delete_from_incremental_store`
  (one crash-safe rewrite spanning the named tables).
- cluster stores → :func:`dedup.delete_from_cluster_store` (scoped
  connected-components recompute — deletes can SPLIT components).
- span stores → :func:`dedup.delete_from_span_store` (survivors'
  spans can SHRINK; cut list recomputed, revisions folded).
- join-MV stores → :func:`matview.matview_takedown` (rewrite of the
  inputs AND every joined row derived from them, one manifest swap).
- vocab stores → :func:`vocab.pmi_store_ingest` with sign = -1 CDC
  events. Token statistics are aggregates, so deletion is COUNT
  SUBTRACTION, which needs the victims' old rows — the standard CDC
  delete shape; callers pass the content alongside the ids (a
  takedown request for text you indexed has that text by
  definition). The net-sign admission makes re-delivered takedowns
  no-ops.

Every store's delete is individually crash-safe and idempotent, so
the fleet-level call is safely re-runnable after a crash mid-fleet:
completed stores no-op, the interrupted one re-runs its own protocol.
(True all-or-nothing across INDEPENDENT stores would need a
coordinator log; within one store the hybrid layout already gives
multi-table atomicity — put tables in one store when you need that.)

Returns a per-store audit dict {name: deleted-count} — the record a
compliance log wants."""

from __future__ import annotations

from pyspark.sql import DataFrame

from . import dedup as DD


def takedown_everywhere(
    spark,
    victims: DataFrame,
    table_stores: dict | None = None,
    cluster_stores: list | None = None,
    span_stores: list | None = None,
    matview_stores: list | None = None,
    vocab_stores: list | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> dict:
    """Delete the ``victims`` rows' ids from every listed store.

    ``victims`` must carry ``id_col``; if any ``vocab_stores`` are
    listed it must also carry ``text_col`` (the CDC old rows whose
    counts get subtracted). ``table_stores`` maps store name →
    (path, tables tuple); the other families are lists of
    (name, path) pairs."""
    from pyspark.sql import functions as F

    from .vocab import pmi_store_ingest

    # pass the victim set as a DataFrame: each family delete
    # anti-joins it (today with a broadcast hint, so the set still
    # transits the driver sized by the TAKEDOWN BATCH — bounded by the
    # request, never by the corpus; a deployment whose single takedown
    # batches outgrow broadcast would drop the hint to a shuffle
    # anti-join inside the family deletes)
    ids = victims.select(id_col).distinct()
    audit: dict = {}
    for name, (path, tables) in (table_stores or {}).items():
        audit[name] = DD.delete_from_incremental_store(
            spark, path, ids, id_col=id_col, tables=tables
        )
    for name, path in cluster_stores or []:
        audit[name] = DD.delete_from_cluster_store(spark, path, ids, id_col=id_col)
    for name, path in span_stores or []:
        audit[name] = DD.delete_from_span_store(spark, path, ids, id_col=id_col)
    for name, path in matview_stores or []:
        from .matview import matview_takedown

        audit[name] = matview_takedown(spark, path, ids, id_col=id_col)
    for name, path in vocab_stores or []:
        ev = victims.select(id_col, text_col).withColumn("sign", F.lit(-1))
        audit[name] = pmi_store_ingest(
            spark, path, ev, text_col=text_col, id_col=id_col
        ).count()
    return audit
