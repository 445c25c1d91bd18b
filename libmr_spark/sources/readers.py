"""Sources: parquet/csv/json table readers + the kv-keyspace view.

The reference's canonical source is a Redis keyspace scan with an
optional key-prefix filter (KeysReader,
``/root/reference/tests/mr_test_module/src/lib.rs:822-916``). The
engine-level equivalent is a scan of a ``kv(key, value, type)`` table
(FIXTURES.md §1) — here projected deterministically from the driver's
``orders`` table so every kv pipeline has a DuckDB-expressible oracle.

All readers return lazy DataFrames: filters/projections applied later
reach the parquet scan via Catalyst pushdown (verify with
``plans.explain.scan_info``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..core.registry import reader

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, name: str, sf_dir: str | None = None) -> DataFrame:
    sf_dir = sf_dir or DEFAULT_SF_DIR
    if name == "events":
        return events_table(spark, sf_dir)
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def events_table(spark: SparkSession, sf_dir: str | None = None) -> DataFrame:
    """events with a usable timestamp column.

    The driver writes ``ts`` as parquet TIMESTAMP(NANOS), which Spark's
    vectorized reader rejects outright. Read nanos as a raw long
    (``spark.sql.legacy.parquet.nanosAsLong``) and truncate to
    microseconds — Spark's native timestamp precision. Truncation is a
    floor, matching DuckDB's ns→ms flooring in ``epoch_ms``.
    """
    sf_dir = sf_dir or DEFAULT_SF_DIR
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def load_tables(spark: SparkSession, sf_dir: str | None = None) -> dict[str, DataFrame]:
    return {n: load_table(spark, n, sf_dir) for n in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str | None = None) -> None:
    """Register every table as a temp view so ``spark.sql`` works on the
    same names the DuckDB oracle uses."""
    for n, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(n)


# SQL used by BOTH the Spark kv view and the DuckDB oracle (FIXTURES.md
# notes the kv shape "can be projected from any driver table").
KV_PROJECTION_SQL = (
    "SELECT concat('key', CAST(o_orderkey AS VARCHAR)) AS key, "
    "CAST(o_totalprice AS VARCHAR) AS value, "
    "CASE WHEN o_orderstatus = 'O' THEN 'string' ELSE 'hash' END AS type "
    "FROM orders"
)


def kv_table(spark: SparkSession, sf_dir: str | None = None) -> DataFrame:
    """The Redis-keyspace-shaped table: kv(key, value, type)."""
    o = load_table(spark, "orders", sf_dir)
    return o.select(
        F.concat(F.lit("key"), F.col("o_orderkey").cast("string")).alias("key"),
        F.col("o_totalprice").cast("string").alias("value"),
        F.when(F.col("o_orderstatus") == "O", "string").otherwise("hash").alias("type"),
    )


@reader("KeysReader")
def keys_reader(spark: SparkSession, args) -> DataFrame:
    """Keyspace scan with optional key-prefix filter, parity with the
    reference KeysReader (``tests/mr_test_module/src/lib.rs:822-916``).

    args: {"sf_dir": str | None, "prefix": str | None}
    The prefix filter is a relational ``startswith`` so it compiles to a
    pushed-down predicate, not a per-record Python call.
    """
    args = args or {}
    df = kv_table(spark, args.get("sf_dir"))
    prefix = args.get("prefix")
    if prefix:
        df = df.filter(F.col("key").startswith(prefix))
    return df


@reader("ParquetReader")
def parquet_reader(spark: SparkSession, args) -> DataFrame:
    """args: {"path": str} or {"table": str, "sf_dir": str|None}"""
    if "path" in args:
        return spark.read.parquet(args["path"])
    return load_table(spark, args["table"], args.get("sf_dir"))


@reader("CsvReader")
def csv_reader(spark: SparkSession, args) -> DataFrame:
    return spark.read.options(**args.get("options", {"header": "true", "inferSchema": "true"})).csv(args["path"])


@reader("JsonReader")
def json_reader(spark: SparkSession, args) -> DataFrame:
    return spark.read.options(**args.get("options", {})).json(args["path"])
