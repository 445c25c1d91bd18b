"""Grouped-aggregate pandas UDAFs (Arrow-batched Series → scalar).

NOTE: no ``from __future__ import annotations`` here — pandas_udf
resolves the real type hints to infer the UDF kind, and stringified
annotations referencing module aliases break that resolution.

Determinism rule (see SCALING.md): Python aggregates must be exact
under any partitioning/order — integer arithmetic (or Decimal), never
float summation, or the oracle hash comparison fails intermittently.
"""

import pandas as pd
from pyspark.sql.functions import pandas_udf


@pandas_udf("bigint")
def sum_squares(v: pd.Series) -> int:
    """Integer-exact sum of squares — the UDAF demo shape: int64 in,
    int64 out, deterministic under any row order."""
    x = v.astype("int64")
    return int((x * x).sum())


@pandas_udf("bigint")
def count_rows(v: pd.Series) -> int:
    """Spark disallows mixing grouped-agg pandas UDFs with built-in
    aggregates in one agg(); a pandas count keeps multi-metric UDAF
    queries in a single pass."""
    return int(len(v))
