"""Fused (zero-shuffle) north-rule pipeline: routing totals, token-array
invariant, Observation-counts consistency, and plan shape (no Exchange)."""

from __future__ import annotations

from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark import datagen
from opentelemetry_collector_contrib_spark.plans.pipeline import (
    DEFAULT_ROUTES,
    log_pipeline,
    log_pipeline_fused,
)
from opentelemetry_collector_contrib_spark.sinks.fanout import write_fanout_with_counts

N = 3000


def test_fused_matches_join_variant(spark):
    meta = datagen.source_meta(spark)
    fused_out = log_pipeline_fused(datagen.input_table(spark, N), meta)
    join_out = log_pipeline(
        datagen.sequences(spark, N), datagen.raw_logs(spark, N), meta
    )
    f = {r["sink"]: r["records_out"] for r in fused_out["counts"].collect()}
    j = {r["sink"]: r["records_out"] for r in join_out["counts"].collect()}
    assert f == j and sum(f.values()) == N


def test_parse_impls_agree(spark):
    """pandas-UDF parse and JVM-expression parse produce identical
    attribute maps on all four payload formats."""
    from opentelemetry_collector_contrib_spark.plans.pipeline import parse_records

    logs = datagen.raw_logs(spark, 500)
    a = parse_records(logs, impl="jvm").select("doc_id", "attributes")
    b = parse_records(logs, impl="pandas").select("doc_id", "attributes")
    rows_a = {r["doc_id"]: r["attributes"] for r in a.collect()}
    rows_b = {r["doc_id"]: r["attributes"] for r in b.collect()}
    assert rows_a == rows_b


def test_fused_token_invariant_and_observed_counts(spark, tmp_path):
    meta = datagen.source_meta(spark)
    out = log_pipeline_fused(datagen.input_table(spark, N), meta)
    counts = write_fanout_with_counts(out["routed"], str(tmp_path / "s"), DEFAULT_ROUTES)
    assert sum(counts.values()) == N
    back = spark.read.parquet(str(tmp_path / "s"))
    ref = datagen.sequences(spark, N).select("doc_id", F.col("tokens").alias("ref"))
    mism = back.join(ref, "doc_id").filter(F.col("tokens") != F.col("ref")).count()
    assert mism == 0
    disk = {r["route"]: r["n"] for r in back.groupBy("route").agg(F.count("*").alias("n")).collect()}
    assert disk == counts


def test_fused_plan_has_no_shuffle(spark, tmp_path):
    """The fused pipeline must stay narrow: reading the input from parquet,
    the routed frame's physical plan contains no Exchange (the broadcast
    exchange for the meta lookup is allowed)."""
    path = str(tmp_path / "fused")
    datagen.input_table(spark, 1000).write.parquet(path)
    fused = spark.read.parquet(path)
    routed = log_pipeline_fused(fused, datagen.source_meta(spark))["routed"]
    plan = routed._jdf.queryExecution().executedPlan().toString()
    shuffles = [
        ln for ln in plan.splitlines()
        if "Exchange" in ln and "BroadcastExchange" not in ln
    ]
    assert not shuffles, f"unexpected shuffle in fused plan:\n{plan}"
