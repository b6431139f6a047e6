"""End-to-end pipeline invariants (north rule): routed-row token equality,
per-sink counts, first-match routing, resumable lineage."""

import os

from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark import datagen
from opentelemetry_collector_contrib_spark.operators import connectors
from opentelemetry_collector_contrib_spark.plans import pipeline
from opentelemetry_collector_contrib_spark.sinks import fanout
from opentelemetry_collector_contrib_spark.sinks.lineage import LineageLog, run_resumable, slice_fingerprint

N = 300


def _run(spark):
    seq = datagen.sequences(spark, N)
    logs = datagen.raw_logs(spark, N)
    meta = datagen.source_meta(spark)
    return seq, pipeline.log_pipeline(seq, logs, meta)


def test_every_record_routed_exactly_once(spark):
    _, out = _run(spark)
    counts = {r["sink"]: r["records_out"] for r in out["counts"].collect()}
    assert sum(counts.values()) == N
    assert set(counts) <= {"errors", "acme", "ecorp", "default"}


def test_token_array_equality_through_pipeline(spark):
    # north-rule per-row invariant: tokens byte-equal in every routed row
    seq, out = _run(spark)
    routed = out["routed"]
    cmp = routed.select("doc_id", "tokens").join(
        seq.select("doc_id", F.col("tokens").alias("expected")), "doc_id"
    )
    bad = cmp.filter(F.col("tokens") != F.col("expected")).count()
    assert bad == 0
    assert cmp.count() == N


def test_first_match_wins(spark):
    # a record matching both route 1 and route 2 must land in route 1 only
    # (/root/reference/connector/routingconnector/logs.go:62-107)
    df = spark.createDataFrame([{"x": 5}, {"x": 15}, {"x": -1}])
    routed = connectors.routing_connector(
        df, [("gt0", F.col("x") > 0), ("gt10", F.col("x") > 10)]
    )
    got = {r["x"]: r["route"] for r in routed.collect()}
    assert got == {5: "gt0", 15: "gt0", -1: "default"}


def test_fanout_write_and_counts(spark, tmp_path):
    _, out = _run(spark)
    routed = out["routed"]
    base = str(tmp_path / "sinks")
    fanout.write_fanout(routed, base)
    total = 0
    for r in out["counts"].collect():
        on_disk = fanout.read_sink(spark, base, r["sink"]).count()
        assert on_disk == r["records_out"]
        total += on_disk
    assert total == N
    # idempotent re-run (persistent-queue semantics)
    fanout.write_fanout(routed, base)
    assert spark.read.parquet(base).count() == N


def test_lineage_resume_skips_done_slices(spark, tmp_path):
    seq = datagen.sequences(spark, 100)
    slices = {
        "s0": seq.filter(F.col("doc_id") < "doc-000000000050"),
        "s1": seq.filter(F.col("doc_id") >= "doc-000000000050"),
    }
    calls = []

    def process(df):
        return df.withColumn("n2", F.col("n_tok") * 2)

    def write(sid, df):
        calls.append(sid)
        return df.count()

    lp = str(tmp_path / "lineage")
    r1 = run_resumable(spark, slices, process, write, lp)
    assert all(not v["skipped"] for v in r1.values())
    assert sorted(calls) == ["s0", "s1"]
    r2 = run_resumable(spark, slices, process, write, lp)
    assert all(v["skipped"] for v in r2.values())
    assert sorted(calls) == ["s0", "s1"]  # no reprocessing
    # fingerprint changes -> reprocess
    log = LineageLog(spark, lp)
    fp = slice_fingerprint(slices["s0"], "doc_id")
    assert log.done("s0", fp)
    assert not log.done("s0", fp + "x")


def test_events_pipeline_smoke(spark, sf_dir):
    out = pipeline.events_pipeline(spark, sf_dir)
    rows = out.collect()
    assert len(rows) >= 2
    assert {"route", "records_out", "total_value"} <= set(out.columns)
