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
