"""Deterministic, distributed synthetic data generators.

Generates the north-rule input table (BASELINE.json input_hint):
    sequences(doc_id: string, tokens: array<int>, n_tok: int, source: string)
plus the serialized-payload table raw_logs and the broadcast enrichment
lookup source_meta (FIXTURES.md §1-3).

Everything is a pure column expression over ``spark.range(n)`` — seeded by
xxhash64 of (seed, id) — so generation is fully distributed, reproducible,
and scales to 10^12 rows with no driver-side loops (no Python RNG, no
collect). The same (seed, i) always yields the same row at any parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

VOCAB = 50257  # GPT-2-ish vocab size; token values in [0, VOCAB)

# Skewed categorical: svc-a is the hot key (~55%) — the skew the salted
# repartition / AQE skew handling must absorb (FIXTURES.md §1).
_SOURCE_BUCKETS = [
    (55, "svc-a"), (80, "svc-b"), (90, "svc-c"), (92, "svc-d"), (94, "svc-e"),
    (96, "svc-f"), (97, "svc-g"), (98, "svc-h"), (99, "svc-i"), (100, "svc-j"),
]


def _h(seed: str, *cols) -> F.Column:
    """Deterministic non-negative 63-bit hash of (seed, cols)."""
    return F.abs(F.xxhash64(F.lit(seed), *cols))


def _source_col(h: F.Column) -> F.Column:
    pct = h % 100
    expr = F.lit(_SOURCE_BUCKETS[-1][1])
    col = None
    for bound, name in _SOURCE_BUCKETS:
        cond = pct < bound
        col = F.when(cond, name) if col is None else col.when(cond, name)
    return col.otherwise(expr)


def sequences(spark: SparkSession, n: int, seed: int = 42, max_tok: int = 256) -> DataFrame:
    """The tokenized-sequence input table, `n` rows, deterministic."""
    df = spark.range(n).withColumn("doc_id", F.format_string("doc-%012d", F.col("id")))
    h1 = _h(f"ntok-{seed}", "doc_id")
    # Zipf-ish length in [1, max_tok]: exponential in a uniform hash.
    n_tok = F.least(
        F.lit(max_tok),
        (F.pow(F.lit(2.0), (h1 % 1000) / F.lit(1000.0 / 8.0))).cast("int") + 1,
    ).cast("int")
    df = df.withColumn("n_tok", n_tok)
    # tokens[i] = hash(seed, doc_id, i) % VOCAB — element-wise deterministic.
    tok = F.transform(
        F.sequence(F.lit(0), F.col("n_tok") - 1),
        lambda i: (F.abs(F.xxhash64(F.lit(f"tok-{seed}"), F.col("doc_id"), i)) % VOCAB).cast("int"),
    )
    df = df.withColumn("tokens", tok)
    df = df.withColumn("source", _source_col(_h(f"src-{seed}", "doc_id")))
    return df.select("doc_id", "tokens", "n_tok", "source")


def raw_logs(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """Serialized log payloads, one per doc_id: the 4 body shapes of
    FIXTURES.md §2 (apache common-log, JSON, key=value, containerd),
    chosen by seeded hash. ingest_ts is monotone epoch-nanos."""
    df = spark.range(n).withColumn("doc_id", F.format_string("doc-%012d", F.col("id")))
    df = df.withColumn("source", _source_col(_h(f"src-{seed}", "doc_id")))
    h = _h(f"body-{seed}", "doc_id")
    # status/level/fmt come from DISJOINT hash bits (h>>2, h>>4, h&3):
    # deriving all three from h % 4 made body format, HTTP status, and log
    # level perfectly correlated — every apache line was 200/INFO, every
    # JSON line WARN — degenerating severity-routing selectivity in every
    # fixture built on this table. shiftright keeps the arithmetic exact
    # on the 63-bit hash (a double division would round above 2^53).
    status = F.element_at(
        F.array(F.lit(200), F.lit(404), F.lit(429), F.lit(500)),
        ((F.shiftright(h, 2) % 4) + 1).cast("int"),
    )
    size = (h % 9000) + 100
    level = F.element_at(
        F.array(F.lit("INFO"), F.lit("WARN"), F.lit("ERROR"), F.lit("DEBUG")),
        ((F.shiftright(h, 4) % 4) + 1).cast("int"),
    )
    base_ns = F.lit(1760104536_000000000)  # 2025-10-10T13:55:36Z, pinned (no wall clock)
    ts_ns = base_ns + F.col("id") * 1_000_000 + (h % 1000)
    ts_s = (ts_ns / 1e9).cast("timestamp")
    apache = F.format_string(
        '10.0.%d.%d - user%d [%s +0000] "GET /api/v1/items/%d HTTP/1.1" %d %d',
        (h % 256).cast("int"),
        ((h / 256) % 256).cast("int"),
        (h % 1000).cast("int"),
        F.date_format(ts_s, "dd/MMM/yyyy:HH:mm:ss"),
        (h % 100).cast("int"),
        status,
        size.cast("int"),
    )
    jsonb = F.format_string(
        '{"ts":"%s","level":"%s","msg":"event %d","svc":"%s","attempt":%d}',
        F.date_format(ts_s, "yyyy-MM-dd'T'HH:mm:ss'Z'"),
        level,
        (h % 10000).cast("int"),
        F.col("source"),
        (h % 5).cast("int"),
    )
    kv = F.format_string(
        "ts=%d level=%s svc=%s code=%d path=/api/v1/items/%d",
        (ts_ns / 1e9).cast("long"),
        F.lower(level),
        F.col("source"),
        status,
        (h % 100).cast("int"),
    )
    containerd = F.format_string(
        '%s stdout F {"msg":"line %d","n":%d}',
        F.date_format(ts_s, "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'"),
        (h % 10000).cast("int"),
        (h % 7).cast("int"),
    )
    fmt = h % 4
    body = (
        F.when(fmt == 0, apache).when(fmt == 1, jsonb).when(fmt == 2, kv).otherwise(containerd)
    )
    return df.select(
        "doc_id",
        body.alias("body"),
        "source",
        ts_ns.cast("long").alias("ingest_ts"),
        fmt.cast("int").alias("fmt"),
    )


def input_table(spark: SparkSession, n: int, seed: int = 42, max_tok: int = 256) -> DataFrame:
    """The fused north-rule input table: tokenized sequences WITH their
    serialized payload column in one row —
    (doc_id, tokens, n_tok, source, body, ingest_ts, fmt).

    Storing payload and tokens together is the scale-correct layout: the
    pipeline stays entirely narrow (scan -> parse -> broadcast-enrich ->
    route -> write) with zero shuffles, instead of a 10^12 x 10^12 doc_id
    join of separate sequence/payload tables."""
    seqs = sequences(spark, n, seed, max_tok)
    logs = raw_logs(spark, n, seed).drop("source")
    # both generators derive every column deterministically from doc_id, so
    # this join is only a generation-time convenience at bench scales; the
    # benched job reads the materialized fused table
    return seqs.join(logs, "doc_id")


def source_meta(spark: SparkSession) -> DataFrame:
    """Broadcast enrichment lookup (FIXTURES.md §3): the k8sattributes /
    resourcedetection enrichment shape
    (/root/reference/processor/k8sattributesprocessor/processor.go:101-147)."""
    rows = []
    tenants = {"svc-a": "acme", "svc-b": "ecorp", "svc-c": "acme"}
    regions = ["us-east-1", "eu-west-1", "ap-south-1"]
    for i, (_, name) in enumerate(_SOURCE_BUCKETS):
        rows.append(
            (
                name,
                f"service-{name[4:]}",
                f"ns-{i % 3}",
                regions[i % 3],
                tenants.get(name, "other"),
            )
        )
    return spark.createDataFrame(
        rows, "source string, service_name string, namespace string, region string, tenant string"
    )
