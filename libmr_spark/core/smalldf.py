"""Driver-local bounded rows → single-slice DataFrame.

``spark.createDataFrame(rows, schema)`` splits even a 3-row list into
``defaultParallelism`` slices (32 on the bench box), and each slice's
compute is a separate Python-runner round-trip (~200 ms apiece,
SERIALIZED when a downstream ``coalesce(1)`` folds them into one task,
and serialized through the single worker-daemon fork lock on first
touch otherwise). Measured on the store-commit path: a 3-row merge
batch cost ~6 s PER ACTION via ``coalesce(1)`` and ~6 s on the first
action via the Arrow local-relation path — pure fixed overhead, paid by
every manifest commit in the fleet (guide §4: control how much crosses
the Python boundary; §2.4: remove work the operation never needed).

Every caller of this helper holds rows that are DRIVER-BOUNDED by
contract (vocab-scale artifacts, probe/query sets, audit rows) — one
slice is the right layout at any corpus scale: these frames are either
broadcast into joins or written as single-file store artifacts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def local_df(spark: SparkSession, rows, schema) -> DataFrame:
    """1-slice DataFrame from a bounded driver-local row list.

    Equivalent to ``spark.createDataFrame(rows, schema)`` (same pickle
    row-verification path, same schema handling) but parallelized as a
    SINGLE slice, so any action over it is one task and one Python
    round-trip instead of ``defaultParallelism`` of them.
    """
    rows = rows if isinstance(rows, list) else list(rows)
    if not rows:
        # empty → LocalTableScan (zero tasks); parallelize([], 1) would
        # instead schedule a real no-op task
        return spark.createDataFrame([], schema)
    return spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
