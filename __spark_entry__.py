"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001;
``queries()`` exposes every implemented operator from SURVEY.md §2 as
(spark, sf_dir) -> DataFrame; ``oracle_sql()`` gives the DuckDB oracle
for each (omitted only for genuinely non-SQL-expressible ops, which get
the weaker rows-only check).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from libmr_spark import queries as Q  # noqa: E402
from libmr_spark.session import ensure_package_shipped, ensure_protobuf  # noqa: E402

# At IMPORT time, before any harness-built JVM starts: adopt a vendored
# google.protobuf (PYTHONPATH + version-check escape hatch) so forked
# Python workers can speak the transformWithStateInPandas state
# protocol — harmless no-op when the pip package exists.
ensure_protobuf()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: TPC-H Q1-style pricing summary at sf0.001."""
    ensure_package_shipped(spark)
    return Q.QUERIES["q1_pricing_summary"].fn(spark, "/root/testdata/sf0.001")


def _shipping(fn: Callable[[SparkSession, str], DataFrame]) -> Callable[[SparkSession, str], DataFrame]:
    # the harness may hand us a session it built itself — executors then
    # need the package zip before any registered-step pipeline runs
    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        ensure_package_shipped(spark)
        return fn(spark, sf_dir)

    return wrapped


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: _shipping(fn) for name, fn in Q.queries().items()}


def oracle_sql() -> dict[str, str]:
    return Q.oracle_sql()
