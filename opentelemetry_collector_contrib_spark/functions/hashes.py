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


def _fnv_np(s: pd.Series, offset: int, prime: int, mask32: bool) -> pd.Series:
    """Vectorized FNV-1a over a string Series: position-wise numpy loop on
    a zero-padded byte matrix — O(n·maxlen) vectorized ops instead of
    per-row Python. Exact bit parity: uint64 multiply wraps mod 2^64
    (the FNV-64 modulus); the 32-bit variant masks after each step.
    Falls back to the per-row path for batches with non-ASCII keys or
    keys longer than 64 bytes (rare for partition/sampling keys, and the
    padded matrix would go quadratic on pathological lengths)."""
    import numpy as np

    vals = s.astype(object).where(s.notna(), None)
    strs = [str(v) for v in vals if v is not None]
    a = None
    if strs:
        # python len == byte len only for pure-ASCII keys; S-dtype encode
        # raises on anything else, punting the batch to the exact slow path
        pylens = [len(x) for x in strs]
        if max(pylens) <= 64:
            try:
                a = np.asarray(strs, dtype=f"S{max(max(pylens), 1)}")
            except UnicodeEncodeError:
                a = None
    if a is None:
        f = fnv1a32_bytes if mask32 else fnv1a64_bytes
        # pd.array, NOT Series.map: map infers float64 for an int+None
        # result batch and silently rounds 64-bit hashes below 2^-11
        # relative precision (latent in the original map-based impl —
        # only NULL-bearing batches hit it)
        return pd.Series(
            pd.array(
                [None if v is None else _signed64(f(str(v).encode())) for v in vals],
                dtype="Int64",
            ),
            index=vals.index,
        )
    n = len(a)
    m = a.dtype.itemsize
    mat = a.view(np.uint8).reshape(n, m)
    # lengths from python (len is O(1) C) — np.char.str_len would
    # miscount keys with a trailing NUL byte as shorter than they are
    lens = np.asarray(pylens, dtype=np.int64)
    # np.uint64(offset) BEFORE np.full: a python-int fill_value detours
    # through float64 and silently rounds (offset 0xCBF29CE484222325 is
    # above 2^53 — measured off-by-219)
    h = np.full(n, np.uint64(offset), dtype=np.uint64)
    p = np.uint64(prime)
    m32 = np.uint64(0xFFFFFFFF)
    maxlen = int(lens.max(initial=0))
    # contiguous full-width ops + np.where, not boolean gather/scatter:
    # h[live] fancy indexing costs 2 copies per position and erases the
    # vectorization win for short keys
    for i in range(maxlen):
        hv = (h ^ mat[:, i].astype(np.uint64)) * p
        if mask32:
            hv &= m32
        h = np.where(lens > i, hv, h)
    signed = h.astype(np.int64)  # two's-complement reinterpret, not a clamp
    out = pd.Series([None] * len(vals), index=vals.index, dtype=object)
    out[vals.notna()] = list(signed)
    return out.astype("Int64")


def _signed64(h: int) -> int:
    return h - (1 << 64) if h >= (1 << 63) else h


@pandas_udf(T.LongType())
def fnv1a64(s: pd.Series) -> pd.Series:
    """FNV-1a 64 of the UTF-8 bytes of a string column (as signed int64)."""
    return _fnv_np(s, FNV1A64_OFFSET, FNV1A64_PRIME, mask32=False)


@pandas_udf(T.LongType())
def fnv1a32(s: pd.Series) -> pd.Series:
    """FNV-1a 32 of the UTF-8 bytes of a string column."""
    return _fnv_np(s, FNV1A32_OFFSET, FNV1A32_PRIME, mask32=True)


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


# ---------------------------------------------------------------------------
# Murmur3 (exact, seed 0) — OTTL Murmur3Hash / Murmur3Hash128 emit the
# LITTLE-ENDIAN hex of the sum (func_murmur3_hash.go:35-48,
# func_murmur3_hash128.go:35-48; vectors in the *_test.go files)
# ---------------------------------------------------------------------------


def murmur3_32(data: bytes, seed: int = 0) -> int:
    """MurmurHash3 x86 32-bit (public domain algorithm, Appleby)."""
    c1, c2 = 0xCC9E2D51, 0x1B873593
    h = seed & _M32
    n = len(data)
    full = n - (n % 4)
    for i in range(0, full, 4):
        k = int.from_bytes(data[i : i + 4], "little")
        k = (k * c1) & _M32
        k = ((k << 15) | (k >> 17)) & _M32
        k = (k * c2) & _M32
        h ^= k
        h = ((h << 13) | (h >> 19)) & _M32
        h = (h * 5 + 0xE6546B64) & _M32
    k = 0
    tail = data[full:]
    if len(tail) >= 3:
        k ^= tail[2] << 16
    if len(tail) >= 2:
        k ^= tail[1] << 8
    if len(tail) >= 1:
        k ^= tail[0]
        k = (k * c1) & _M32
        k = ((k << 15) | (k >> 17)) & _M32
        k = (k * c2) & _M32
        h ^= k
    h ^= n
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & _M32
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & _M32
    h ^= h >> 16
    return h


def _fmix64(k: int) -> int:
    k ^= k >> 33
    k = (k * 0xFF51AFD7ED558CCD) & _M64
    k ^= k >> 33
    k = (k * 0xC4CEB9FE1A85EC53) & _M64
    k ^= k >> 33
    return k


def murmur3_x64_128(data: bytes, seed: int = 0) -> tuple[int, int]:
    """MurmurHash3 x64 128-bit -> (h1, h2)."""
    c1, c2 = 0x87C37B91114253D5, 0x4CF5AD432745937F
    h1 = h2 = seed & _M64
    n = len(data)
    full = n - (n % 16)
    for i in range(0, full, 16):
        k1 = int.from_bytes(data[i : i + 8], "little")
        k2 = int.from_bytes(data[i + 8 : i + 16], "little")
        k1 = (k1 * c1) & _M64
        k1 = ((k1 << 31) | (k1 >> 33)) & _M64
        k1 = (k1 * c2) & _M64
        h1 ^= k1
        h1 = ((h1 << 27) | (h1 >> 37)) & _M64
        h1 = (h1 + h2) & _M64
        h1 = (h1 * 5 + 0x52DCE729) & _M64
        k2 = (k2 * c2) & _M64
        k2 = ((k2 << 33) | (k2 >> 31)) & _M64
        k2 = (k2 * c1) & _M64
        h2 ^= k2
        h2 = ((h2 << 31) | (h2 >> 33)) & _M64
        h2 = (h2 + h1) & _M64
        h2 = (h2 * 5 + 0x38495AB5) & _M64
    tail = data[full:]
    k1 = k2 = 0
    for j in range(min(len(tail), 16) - 1, 7, -1):
        k2 |= tail[j] << (8 * (j - 8))
    for j in range(min(len(tail), 8) - 1, -1, -1):
        k1 |= tail[j] << (8 * j)
    if len(tail) > 8:
        k2 = (k2 * c2) & _M64
        k2 = ((k2 << 33) | (k2 >> 31)) & _M64
        k2 = (k2 * c1) & _M64
        h2 ^= k2
    if len(tail) > 0:
        k1 = (k1 * c1) & _M64
        k1 = ((k1 << 31) | (k1 >> 33)) & _M64
        k1 = (k1 * c2) & _M64
        h1 ^= k1
    h1 ^= n
    h2 ^= n
    h1 = (h1 + h2) & _M64
    h2 = (h2 + h1) & _M64
    h1 = _fmix64(h1)
    h2 = _fmix64(h2)
    h1 = (h1 + h2) & _M64
    h2 = (h2 + h1) & _M64
    return h1, h2


def murmur3_hash_hex(col: Column) -> Column:
    """Murmur3Hash: little-endian hex of Sum32, seed 0 (8 hex chars)."""

    @pandas_udf(T.StringType())
    def _m3(s: pd.Series) -> pd.Series:
        return s.map(
            lambda v: None
            if v is None
            else murmur3_32(v.encode("utf-8")).to_bytes(4, "little").hex()
        )

    return _m3(col)


def murmur3_hash128_hex(col: Column) -> Column:
    """Murmur3Hash128: little-endian hex of Sum128 (h1 then h2, 32 hex)."""

    @pandas_udf(T.StringType())
    def _m3128(s: pd.Series) -> pd.Series:
        def one(v):
            if v is None:
                return None
            h1, h2 = murmur3_x64_128(v.encode("utf-8"))
            return h1.to_bytes(8, "little").hex() + h2.to_bytes(8, "little").hex()

        return s.map(one)

    return _m3128(col)
