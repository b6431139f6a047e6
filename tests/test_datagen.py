"""Synthetic generator invariants: deterministic, correct shape, skewed."""

from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark import datagen


def test_sequences_schema_and_determinism(spark):
    a = datagen.sequences(spark, 100).collect()
    b = datagen.sequences(spark, 100).collect()
    assert [r.asDict() for r in a] == [r.asDict() for r in b]
    r = a[0]
    assert r.doc_id == "doc-000000000000"
    assert len(r.tokens) == r.n_tok
    assert all(0 <= t < datagen.VOCAB for t in r.tokens)


def test_sequences_source_skew(spark):
    rows = datagen.sequences(spark, 2000).groupBy("source").count().collect()
    dist = {r["source"]: r["count"] for r in rows}
    assert dist["svc-a"] > 0.45 * 2000  # hot key really is hot
    assert len(dist) >= 8


def test_raw_logs_formats(spark):
    logs = datagen.raw_logs(spark, 400)
    fmts = {r["fmt"] for r in logs.select("fmt").distinct().collect()}
    assert fmts == {0, 1, 2, 3}
    # ingest_ts strictly increasing in id
    rows = logs.orderBy("doc_id").limit(10).collect()
    assert all(rows[i].ingest_ts < rows[i + 1].ingest_ts for i in range(9))


def test_source_meta_covers_all_sources(spark):
    seq_sources = {r["source"] for r in datagen.sequences(spark, 500).select("source").distinct().collect()}
    meta_sources = {r["source"] for r in datagen.source_meta(spark).collect()}
    assert seq_sources <= meta_sources
    tenants = {r["tenant"] for r in datagen.source_meta(spark).collect()}
    assert tenants == {"acme", "ecorp", "other"}


def test_generation_is_parallelism_invariant(spark):
    one = datagen.sequences(spark, 64).repartition(1).orderBy("doc_id").collect()
    many = datagen.sequences(spark, 64).repartition(8).orderBy("doc_id").collect()
    assert [r.tokens for r in one] == [r.tokens for r in many]
