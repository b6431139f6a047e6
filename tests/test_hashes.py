"""Hash parity: FNV-1a known vectors + mapHash16 reference semantics
(/root/reference/exporter/glassflowexporter/internal/messenger/messenger.go:34-57)."""

import hashlib

from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.functions import hashes


def test_fnv1a_known_vectors():
    # canonical FNV-1a test vectors
    assert hashes.fnv1a32_bytes(b"") == 0x811C9DC5
    assert hashes.fnv1a32_bytes(b"a") == 0xE40C292C
    assert hashes.fnv1a32_bytes(b"foobar") == 0xBF9CF968
    assert hashes.fnv1a64_bytes(b"a") == 0xAF63DC4C8601EC8C
    assert hashes.fnv1a64_bytes(b"foobar") == 0x85944171F73967E8


def test_fnv_udfs(spark):
    df = spark.createDataFrame([{"s": "a"}, {"s": "foobar"}])
    got = {r["s"]: r["h"] for r in df.select("s", hashes.fnv1a32(F.col("s")).alias("h")).collect()}
    assert got["a"] == 0xE40C292C
    assert got["foobar"] == 0xBF9CF968


def test_map_hash16_matches_reference_algorithm(spark):
    m = {"service.name": "svc-a", "env": "prod"}
    # independent reimplementation of the documented algorithm
    h = hashlib.sha256()
    for k in sorted(m):
        h.update(b"\xf4" + k.encode() + b"\xf7" + m[k].encode())
    expected = h.digest()[:16]
    df = spark.createDataFrame([{"m": m}])
    got = df.select(hashes.map_hash16(F.col("m")).alias("h")).first()["h"]
    assert bytes(got) == expected
    # empty map -> 16 zero bytes (messenger.go early return)
    df2 = spark.createDataFrame([{"m": {}}], "m map<string,string>")
    assert bytes(df2.select(hashes.map_hash16(F.col("m")).alias("h")).first()["h"]) == bytes(16)


def test_sampling_is_deterministic_and_unbiased(spark):
    df = spark.range(4000).withColumn("k", F.col("id").cast("string"))
    kept = df.filter(hashes.sample_predicate(F.col("k"), 25.0)).count()
    kept2 = df.filter(hashes.sample_predicate(F.col("k"), 25.0)).count()
    assert kept == kept2  # deterministic
    assert abs(kept - 1000) < 120  # ~25%


def test_xxh3_reference_vectors():
    """Byte parity with the reference's own test vectors
    (func_xxh3_test.go:24-30, func_xxh128_test.go:24-30): the two vectors
    cover the len==0 and len 9..16 paths and, through them, secret bytes
    24..95 of the published default secret."""
    from opentelemetry_collector_contrib_spark.functions.xxh3 import (
        xxh3_64,
        xxh3_128,
    )

    assert f"{xxh3_64(b''):016x}" == "2d06800538d394c2"
    assert f"{xxh3_64(b'hello world'):016x}" == "d447b1ea40e6988b"
    hi, lo = xxh3_128(b"")
    assert f"{hi:016x}{lo:016x}" == "99aa06d3014798d86001c324468d497f"
    hi, lo = xxh3_128(b"hello world")
    assert f"{hi:016x}{lo:016x}" == "df8d09e93f874900a99b8775cc15b6c7"


def test_xxh3_all_length_paths_stable():
    """Every length-dispatch path (0/1-3/4-8/9-16/17-128/129-240/long,
    incl. multi-block long inputs) runs, is deterministic, and produces
    distinct values across neighboring lengths (avalanche sanity)."""
    from opentelemetry_collector_contrib_spark.functions.xxh3 import (
        xxh3_64,
        xxh3_128,
    )

    base = (bytes(range(256)) * 41)[: 256 * 40 + 1]  # > 9 blocks of 1024
    lengths = [0, 1, 2, 3, 4, 7, 8, 9, 15, 16, 17, 32, 33, 64, 96, 97,
               128, 129, 160, 240, 241, 500, 1024, 1025, 2048, 5000, 10241]
    seen64 = set()
    seen128 = set()
    for n in lengths:
        d = base[:n]
        h1 = xxh3_64(d)
        assert h1 == xxh3_64(d)
        assert 0 <= h1 <= 0xFFFFFFFFFFFFFFFF
        seen64.add(h1)
        hi, lo = xxh3_128(d)
        assert (hi, lo) == xxh3_128(d)
        seen128.add((hi, lo))
    assert len(seen64) == len(lengths)
    assert len(seen128) == len(lengths)


def test_fnv_vectorized_batch_parity_and_null_precision():
    """The numpy-vectorized FNV batch path is bit-exact against the
    per-byte reference on every envelope edge (empty, 64/65-byte
    boundary, interior NUL, non-ASCII punt, None), and — regression —
    a NULL-bearing batch keeps full 64-bit precision (Series.map used
    to infer float64 for int+None results, silently rounding hashes:
    b'' mapped to ...895360 instead of ...895579)."""
    import pandas as pd

    from opentelemetry_collector_contrib_spark.functions import hashes as H

    cases = ["", "12345", "a" * 64, "a" * 65, "x\x00y", "naïve", None, "9" * 12]
    s = pd.Series(cases, dtype=object)
    g32 = H._fnv_np(s, H.FNV1A32_OFFSET, H.FNV1A32_PRIME, mask32=True)
    g64 = H._fnv_np(s, H.FNV1A64_OFFSET, H.FNV1A64_PRIME, mask32=False)
    for i, c in enumerate(cases):
        if c is None:
            assert pd.isna(g32[i]) and pd.isna(g64[i])
            continue
        assert g32[i] == H.fnv1a32_bytes(c.encode()), c
        assert g64[i] == H._signed64(H.fnv1a64_bytes(c.encode())), c
    # the exact rounding victim from the float64 detour
    s2 = pd.Series(["", None], dtype=object)
    g = H._fnv_np(s2, H.FNV1A64_OFFSET, H.FNV1A64_PRIME, mask32=False)
    assert g[0] == -3750763034362895579  # NOT ...360
