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

from ..core.partitioner import NUM_SLOTS

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

    def read(self, partition: SlotRange) -> Iterator:
        """Emit Arrow RecordBatches (Spark 4 Python DataSources accept
        them directly): key synthesis, slot routing (vectorized CRC16
        byte-sweep, ``core.partitioner.key_slots_np``) and filtering all
        run as batch ops — the original per-row tuple loop measured
        ~7s at sf0.1, this form ~1s. ``str(price)`` stays a Python
        call per kept row: Arrow's float→string cast formats doubles
        differently from Python/DuckDB ``str``, and the value column's
        contract is the reference's string rendering."""
        import numpy as np
        import pyarrow as pa
        import pyarrow.parquet as pq

        from ..core.partitioner import key_slots_np

        t = pq.read_table(
            os.path.join(self.sf_dir, "orders.parquet"),
            columns=["o_orderkey", "o_totalprice", "o_orderstatus"],
        )
        for rb in t.to_batches(max_chunksize=65536):
            oks = rb.column(0).to_numpy(zero_copy_only=False)
            keys = np.char.mod("key%d", oks)
            slots = key_slots_np(keys)
            mask = (slots >= partition.lo) & (slots < partition.hi)
            if self.prefix:
                mask &= np.char.startswith(keys, self.prefix)
            if not mask.any():
                continue
            prices = rb.column(1).to_numpy(zero_copy_only=False)[mask]
            status = rb.column(2).to_numpy(zero_copy_only=False)[mask]
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(keys[mask]),
                    pa.array([str(p) for p in prices]),
                    pa.array(np.where(status == "O", "string", "hash")),
                ],
                names=["key", "value", "type"],
            )


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
