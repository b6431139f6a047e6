"""Deterministic hash parity functions.

The reference relies on three hash families whose exact bit output matters
for routed-row / partition-key equality:

- ``mapHash16``: SHA-256 over sorted (key, AsString(value)) pairs with 0xF4
  key-marker and 0xF7 value-marker bytes, first 16 bytes — the
  resource_hash partition key
  (/root/reference/exporter/glassflowexporter/internal/messenger/messenger.go:34-57).
- FNV-1a (32/64-bit): the probabilistic sampler's hash_seed mode
  (/root/reference/processor/probabilisticsamplerprocessor/fnvhasher.go).
- xxhash/murmur3 converters in OTTL (approximated by Spark's builtins
  where parity is not required; exact via the pandas UDFs here when it is).

All Python implementations are vectorized pandas UDFs (Arrow batches) —
never per-row Python UDFs (north rule).
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

FNV1A32_OFFSET = 0x811C9DC5
FNV1A32_PRIME = 0x01000193
FNV1A64_OFFSET = 0xCBF29CE484222325
FNV1A64_PRIME = 0x100000001B3
_M32 = 0xFFFFFFFF
_M64 = 0xFFFFFFFFFFFFFFFF


def fnv1a32_bytes(data: bytes, h: int = FNV1A32_OFFSET) -> int:
    for b in data:
        h = ((h ^ b) * FNV1A32_PRIME) & _M32
    return h


def fnv1a64_bytes(data: bytes, h: int = FNV1A64_OFFSET) -> int:
    for b in data:
        h = ((h ^ b) * FNV1A64_PRIME) & _M64
    return h


def _fnv64_signed(v) -> int | None:
    if v is None:
        return None
    h = fnv1a64_bytes(str(v).encode())
    return h - (1 << 64) if h >= (1 << 63) else h


@pandas_udf(T.LongType())
def fnv1a64(s: pd.Series) -> pd.Series:
    """FNV-1a 64 of the UTF-8 bytes of a string column (as signed int64)."""
    return s.map(_fnv64_signed).astype("Int64")


@pandas_udf(T.LongType())
def fnv1a32(s: pd.Series) -> pd.Series:
    """FNV-1a 32 of the UTF-8 bytes of a string column."""
    return s.map(lambda v: None if v is None else fnv1a32_bytes(str(v).encode())).astype("Int64")


def _map_hash16_one(m: dict | None) -> bytes | None:
    # Bit-parity with messenger.go mapHash16: sorted keys, 0xF4+key,
    # 0xF7+AsString(value), sha256, first 16 bytes; empty map -> 16 zero bytes.
    if m is None:
        return None
    if len(m) == 0:
        return bytes(16)
    h = hashlib.sha256()
    for k in sorted(m.keys()):
        v = m[k]
        h.update(b"\xf4")
        h.update(str(k).encode())
        h.update(b"\xf7")
        h.update(("" if v is None else str(v)).encode())
    return h.digest()[:16]


@pandas_udf(T.BinaryType())
def map_hash16(maps: pd.Series) -> pd.Series:
    """16-byte deterministic hash of a map<string,string> column
    (resource_hash partition strategy parity)."""
    return maps.map(_map_hash16_one)


def map_hash16_hex(col: Column) -> Column:
    return F.lower(F.hex(map_hash16(col)))


def sampling_hash(col: Column) -> Column:
    """Deterministic sampling hash usable by both Spark and an ANSI-SQL
    oracle: first 8 hex chars of md5 as an integer in [0, 2^32).

    The reference's hash_seed sampler uses FNV-1a over the sampling key and
    compares against ``uint32(2^32 * pct/100)``
    (/root/reference/processor/probabilisticsamplerprocessor/logsprocessor.go:115-130);
    we keep the identical threshold-compare shape with an md5-derived
    uniform hash (fnv1a32 above is available when bit parity with the
    collector is required)."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10).cast("long")


def sample_predicate(col: Column, percent: float, seed: str = "") -> Column:
    """Keep rows where hash(key) < 2^32 * percent/100 — deterministic,
    no rand()."""
    threshold = int((1 << 32) * percent / 100.0)
    key = F.concat(F.lit(seed), col.cast("string")) if seed else col.cast("string")
    return sampling_hash(key) < F.lit(threshold)
