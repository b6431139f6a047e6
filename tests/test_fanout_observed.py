"""Single-pass fan-out + Observation-based per-sink counts."""

from __future__ import annotations

from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.operators.connectors import routing_connector
from opentelemetry_collector_contrib_spark.sinks.fanout import write_fanout_with_counts


def test_write_fanout_with_counts_single_pass(spark, tmp_path):
    df = spark.range(100).select(
        F.col("id"),
        F.when(F.col("id") % 10 == 0, "a").when(F.col("id") % 3 == 0, "b").alias("tag"),
    )
    routed = routing_connector(
        df, [("tens", F.col("tag") == "a"), ("threes", F.col("tag") == "b")]
    )
    counts = write_fanout_with_counts(
        routed, str(tmp_path / "sinks"), ["tens", "threes"]
    )
    assert counts == {"tens": 10, "threes": 30, "default": 60}
    back = spark.read.parquet(str(tmp_path / "sinks"))
    disk = {r["route"]: r["n"] for r in back.groupBy("route").agg(F.count("*").alias("n")).collect()}
    assert disk == counts


def test_clickhouse_export_jsoneachrow(spark, tmp_path):
    import json

    from pyspark.sql import functions as F

    from opentelemetry_collector_contrib_spark.sinks.fanout import clickhouse_export
    from opentelemetry_collector_contrib_spark.sinks.formatter import format_log_rows

    df = spark.createDataFrame(
        [("b1", 9, "INFO", 1700000000000000, {"k": "v"}, {"r": "x"}, "t" * 32, "s" * 16, "src")],
        "body string, severity_number int, severity_text string, ingest_ts long, "
        "attributes map<string,string>, resource_attributes map<string,string>, "
        "trace_id string, span_id string, source string",
    ).withColumn("time_unix_nano", F.col("ingest_ts") * 1000)
    rows = format_log_rows(df)
    out = str(tmp_path / "ch")
    clickhouse_export(rows, out)
    import glob as _glob

    lines = []
    for f in _glob.glob(f"{out}/*.json"):
        with open(f) as fh:
            lines += [json.loads(ln) for ln in fh if ln.strip()]
    assert len(lines) == 1
    rec = lines[0]
    # JSONEachRow object with the CH log-table column names
    assert rec["Body"] == "b1" and rec["SeverityNumber"] == 9
    assert "TimestampTime" in rec or "Timestamp" in rec
    # idempotent re-run: same row count
    clickhouse_export(rows, out)
    lines2 = sum(1 for f in _glob.glob(f"{out}/*.json") for _ in open(f))
    assert lines2 == 1


def test_tap_processor_passthrough_and_bounded_sample(spark, tmp_path):
    import json

    from opentelemetry_collector_contrib_spark.sinks.fanout import tap_processor

    df = spark.createDataFrame(
        [(i, f"msg-{i}") for i in range(50)], "id long, body string"
    )
    out = tap_processor(df, str(tmp_path / "tap"), limit=5, id_cols=["id"])
    # pass-through: the returned frame is the input, untouched
    assert out.count() == 50 and out.columns == ["id", "body"]
    lines = [
        json.loads(line)
        for f in (tmp_path / "tap").glob("part-*")
        for line in f.read_text().splitlines()
    ]
    assert len(lines) == 5
    assert all(set(x) == {"id", "body"} for x in lines)
    # deterministic: rerun taps the identical sample
    tap_processor(df.repartition(7), str(tmp_path / "tap2"), limit=5, id_cols=["id"])
    lines2 = [
        json.loads(line)
        for f in (tmp_path / "tap2").glob("part-*")
        for line in f.read_text().splitlines()
    ]
    assert {x["id"] for x in lines} == {x["id"] for x in lines2}


def test_write_fanout_null_routes_counted_as_unlisted(spark, tmp_path):
    """NULL routes (a routing expression that itself yields NULL) must be
    counted in the '__unlisted' catch-all — ~NULL.isin(names) is NULL,
    which when() treats as false, the original silent-undercount hole."""
    df = spark.range(10).select(
        F.col("id"),
        F.when(F.col("id") < 4, "a")
        .when(F.col("id") < 7, F.lit(None).cast("string"))
        .otherwise("rogue")
        .alias("route"),
    )
    counts = write_fanout_with_counts(df, str(tmp_path / "sinks2"), ["a"])
    assert counts["a"] == 4
    assert counts["__unlisted"] == 6  # 3 NULL + 3 rogue
    total_accounted = sum(v for k, v in counts.items())
    assert total_accounted == 10
