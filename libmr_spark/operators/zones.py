"""Shared zone-map layer for the manifest store families (matview,
exact-dedup/BM25/ANN signature stores): per-FILE min/max of a chosen
column harvested from the parquet footers at compaction time, so a
point/range serve opens only the files whose range covers the probe.

Contract (identical for every family):

- ``write_zones`` runs AFTER the manifest publish — a crash in
  between leaves a compacted dir without zones and lookups fall back
  to the full read: pruning is an optimization layer, never a
  correctness dependency.
- a statless file is recorded with a NULL zone (never omitted), and
  ``pruned_paths`` serves any file without a usable zone entry
  unconditionally — pruning only ever removes files PROVEN empty for
  the probe.
- dirs with no ``_ZONES.json`` at all (fresh ingest batches since the
  last zoned compaction) contribute whole.

At 100 TB this is the standard lakehouse data-skipping shape (file
statistics + range-clustered layout); the manifest protocol is
unchanged by the layout choice.
"""

from __future__ import annotations

import json
import os


def write_zones(store_path: str, table: str, tag: str, zone_col: str) -> dict:
    """Per-file min/max of ``zone_col`` from the parquet footers
    (driver-side pyarrow metadata reads — no Spark jobs), persisted as
    ``_ZONES.json`` inside the batch directory."""
    import pyarrow.parquet as pq

    d = os.path.join(store_path, table, f"batch={tag}")
    zones = {}
    for fn in sorted(os.listdir(d)):
        if not fn.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(d, fn)).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}[
            zone_col
        ]
        lo = hi = None
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            if st is None or not st.has_min_max:
                lo = hi = None  # a statless row group disables the file's zone
                break
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
        # a statless file is recorded with a NULL zone (never omitted):
        # the lookup must keep serving it unpruned
        zones[fn] = [lo, hi] if lo is not None else None
    tmp = os.path.join(d, "_ZONES.json.tmp")
    with open(tmp, "w") as f:
        json.dump({"column": zone_col, "files": zones}, f)
    os.replace(tmp, os.path.join(d, "_ZONES.json"))
    return zones


def write_zones_if_col(store_path: str, table: str, tag: str, zone_col: str) -> None:
    """:func:`write_zones` guarded: a table whose schema lacks the zone
    column stays zoneless (serves unpruned) rather than failing the
    compaction — the multi-view-projection case."""
    import pyarrow.parquet as pq

    d = os.path.join(store_path, table, f"batch={tag}")
    for fn in sorted(os.listdir(d)):
        if fn.endswith(".parquet"):
            schema = pq.ParquetFile(os.path.join(d, fn)).schema_arrow
            if zone_col in schema.names:
                write_zones(store_path, table, tag, zone_col)
            return


def pruned_paths(
    store_path: str, table: str, tags: list, zone_col: str, lo, hi
) -> list:
    """The read list for a ``[lo, hi]`` probe: per manifest-listed
    batch dir, the part files NOT proven empty by their zone — files
    with a null/absent zone entry, and whole dirs without (readable,
    matching) zones, serve unconditionally."""
    paths = []
    for t in tags:
        d = os.path.join(store_path, table, f"batch={t}")
        zpath = os.path.join(d, "_ZONES.json")
        zones = None
        if os.path.exists(zpath):
            try:
                with open(zpath) as f:
                    z = json.load(f)
                if z.get("column") == zone_col:
                    zones = z["files"]
            except (OSError, ValueError):
                zones = None  # unreadable zones: serve unpruned
        if zones is None:
            paths.append(d)
            continue
        for fn in sorted(os.listdir(d)):
            if not fn.endswith(".parquet"):
                continue
            zone = zones.get(fn)
            if zone is not None:
                zlo, zhi = zone
                if zhi < lo or zlo > hi:
                    continue
            paths.append(os.path.join(d, fn))
    return paths
