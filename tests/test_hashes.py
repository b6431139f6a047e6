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
