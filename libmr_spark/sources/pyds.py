"""Custom Python DataSource (Spark 4 ``pyspark.sql.datasource``): the
kv keyspace exposed as a real pluggable source, ``spark.read.format
("libmr_kv")``.

This is the Spark-native rendering of the reference's sharded keyspace
scan: LibMR's KeysReader runs once per shard, each shard owning a CRC16
slot range (``/root/reference/tests/mr_test_module/src/lib.rs:822-916``;
slot routing ``/root/reference/src/cluster.c:1820-1843``). Here each
``InputPartition`` IS a slot range — Spark schedules one read task per
"shard", and every emitted key verifiably belongs to its partition's
range (pinned in ``test_sources_sinks.py::test_kv_datasource``).

Options: ``sf_dir`` (testdata dir), ``prefix`` (key-prefix filter,
applied inside the source exactly like KeysReader's prefix argument),
``numPartitions`` (shard count, default 4).

At 100 TB the backing table would be stored bucketed by slot so each
shard-partition reads only its bucket; this demo filters a shared
parquet file per partition, which preserves the semantics (and the
API surface) at test scale. The per-row Python loop is the cost of a
Python source — the parquet readers in ``readers.py`` remain the fast
path; this pins the pluggable-source API.
"""

from __future__ import annotations

import os
from typing import Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from ..core.partitioner import NUM_SLOTS, key_slot

KV_SCHEMA = "key string, value string, type string"


class SlotRange(InputPartition):
    def __init__(self, lo: int, hi: int):
        self.lo = lo
        self.hi = hi


class KvDataSourceReader(DataSourceReader):
    def __init__(self, options: dict):
        self.sf_dir = options.get("sf_dir", os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
        self.prefix = options.get("prefix", "")
        self.n = int(options.get("numPartitions", "4"))

    def partitions(self):
        step = NUM_SLOTS // self.n
        bounds = [i * step for i in range(self.n)] + [NUM_SLOTS]
        return [SlotRange(bounds[i], bounds[i + 1]) for i in range(self.n)]

    def read(self, partition: SlotRange) -> Iterator[tuple]:
        import pyarrow.parquet as pq

        t = pq.read_table(
            os.path.join(self.sf_dir, "orders.parquet"),
            columns=["o_orderkey", "o_totalprice", "o_orderstatus"],
        )
        for ok, price, status in zip(
            t.column("o_orderkey").to_pylist(),
            t.column("o_totalprice").to_pylist(),
            t.column("o_orderstatus").to_pylist(),
        ):
            key = f"key{ok}"
            if self.prefix and not key.startswith(self.prefix):
                continue
            if partition.lo <= key_slot(key) < partition.hi:
                yield (key, str(price), "string" if status == "O" else "hash")


class KvDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "libmr_kv"

    def schema(self) -> str:
        return KV_SCHEMA

    def reader(self, schema) -> KvDataSourceReader:
        return KvDataSourceReader(self.options)


def register_kv_datasource(spark) -> None:
    spark.dataSource.register(KvDataSource)
