"""Redis-cluster-compatible partitioning: CRC16 key slots + {hashtag}.

The reference routes every reshuffled record to the shard owning
``CRC16(hashtag(key)) & 0x3FFF`` over 16384 slots
(``/root/reference/src/cluster.c:34,1820-1843``). Spark's Murmur3 hash
partitioning is semantics-equivalent for co-location (SURVEY §1.4);
this module exists for *slot fidelity* when interoperating with a real
Redis keyspace layout: ``slot_col`` computes the exact Redis slot as a
Column so ``df.repartition(N, slot_col(key))`` co-locates records the
way the reference's reshuffle does.

CRC16 here is the public CCITT/XMODEM polynomial (0x1021) that Redis
cluster specifies; implemented from the published algorithm, not
copied from the reference.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

NUM_SLOTS = 16384  # /root/reference/src/cluster.c:34

_XMODEM_TABLE = []


def _build_table() -> list[int]:
    table = []
    for byte in range(256):
        crc = byte << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x1021) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
        table.append(crc)
    return table


def crc16(data: bytes) -> int:
    """CRC16-CCITT (XMODEM), the Redis cluster key-hash function."""
    global _XMODEM_TABLE
    if not _XMODEM_TABLE:
        _XMODEM_TABLE = _build_table()
    crc = 0
    for b in data:
        crc = ((crc << 8) & 0xFFFF) ^ _XMODEM_TABLE[((crc >> 8) ^ b) & 0xFF]
    return crc


def extract_hashtag(key: str) -> str:
    """Redis ``{hashtag}`` rule: if the key contains a non-empty
    ``{...}`` section, only that section is hashed
    (``/root/reference/src/cluster.c:1820-1843`` implements the same
    published rule)."""
    start = key.find("{")
    if start == -1:
        return key
    end = key.find("}", start + 1)
    if end == -1 or end == start + 1:
        return key
    return key[start + 1 : end]


def key_slot(key: str) -> int:
    """The Redis cluster slot of ``key``."""
    return crc16(extract_hashtag(key).encode("utf-8")) & (NUM_SLOTS - 1)


def slot_col(key: Column | str) -> Column:
    """``key_slot`` as a vectorized Column (Arrow-batched pandas UDF —
    the Python is unavoidable here, so it is batched, never per-row)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("int")
    def _slot(s: pd.Series) -> pd.Series:
        return s.map(lambda k: key_slot(k) if k is not None else None).astype("Int32")

    return _slot(F.col(key) if isinstance(key, str) else key)
