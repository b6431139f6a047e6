"""Formatter golden tests ported from
/root/reference/exporter/glassflowexporter/internal/formatter/formatter_golden_test.go
(asserting semantics, not Go code): exact column set, timestamp fallback,
ClickHouse time format, empty-maps-not-null, float sanitation, partition keys."""

import json
import math

from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.functions.timefmt import clickhouse_ts
from opentelemetry_collector_contrib_spark.sinks import formatter

EXPECTED_COLS = [
    "Timestamp", "TraceId", "SpanId", "TraceFlags", "SeverityText", "SeverityNumber",
    "ServiceName", "Body", "ResourceSchemaUrl", "ResourceAttributes", "ScopeSchemaUrl",
    "ScopeName", "ScopeVersion", "ScopeAttributes", "LogAttributes",
]


def _minimal(spark, **over):
    row = {
        "time_unix_nano": 1_000_000_000,  # time.Unix(1, 0)
        "observed_time_unix_nano": 2_000_000_000,
        "severity_number": 9,
        "severity_text": "INFO",
        "body": "hello",
        "attributes": {"k": "v"},
        "resource_attributes": {"service.name": "svc"},
        "trace_id": "0" * 32,
        "span_id": "0" * 16,
        "flags": 0,
    }
    row.update(over)
    return spark.createDataFrame(
        [row],
        "time_unix_nano long, observed_time_unix_nano long, severity_number int, "
        "severity_text string, body string, attributes map<string,string>, "
        "resource_attributes map<string,string>, trace_id string, span_id string, flags int",
    )


def test_minimal_record_exact_row(spark):
    # golden: body "hello", service.name svc -> 1 row (formatter_golden_test.go:15-37)
    out = formatter.format_log_rows(_minimal(spark))
    assert out.columns == EXPECTED_COLS
    r = out.first()
    assert r["Body"] == "hello"
    assert r["ServiceName"] == "svc"
    assert r["Timestamp"] == "1970-01-01 00:00:01.000000000"
    assert r["SeverityNumber"] == 9
    assert r["LogAttributes"] == {"k": "v"}


def test_zero_timestamp_falls_back_to_observed(spark):
    # formatter.go:64-67
    out = formatter.format_log_rows(_minimal(spark, time_unix_nano=0))
    assert out.first()["Timestamp"] == "1970-01-01 00:00:02.000000000"


def test_clickhouse_nanosecond_padding(spark):
    df = spark.createDataFrame([{"ns": 1760104536_123456789}])
    got = df.select(clickhouse_ts(F.col("ns")).alias("t")).first()["t"]
    assert got == "2025-10-10 13:55:36.123456789"
    df2 = spark.createDataFrame([{"ns": 1760104536_000000007}])
    assert df2.select(clickhouse_ts(F.col("ns")).alias("t")).first()["t"] == "2025-10-10 13:55:36.000000007"


def test_empty_maps_are_empty_not_null(spark):
    # formatter_golden_test.go:62-108 — {} not null
    df = _minimal(spark, attributes=None, resource_attributes=None)
    r = formatter.format_log_rows(df).first()
    assert r["LogAttributes"] == {}
    assert r["ResourceAttributes"] == {}
    assert r["ServiceName"] == ""
    payload = formatter.to_json_messages(formatter.format_log_rows(df)).first()["Value"]
    obj = json.loads(payload)
    assert obj["LogAttributes"] == {}


def test_float_sanitation(spark):
    # formatter.go:27-38: NaN->null, +Inf->MaxFloat64, -Inf->-MaxFloat64
    df = spark.createDataFrame(
        [(float("nan"),), (float("inf"),), (float("-inf"),), (1.5,)], "v double"
    )
    got = [r["s"] for r in df.select(formatter.sanitize_float(F.col("v")).alias("s")).collect()]
    assert got[0] is None
    assert got[1] == formatter.MAX_FLOAT64
    assert got[2] == -formatter.MAX_FLOAT64
    assert got[3] == 1.5
    assert not any(isinstance(v, float) and math.isnan(v) for v in got if v is not None)


def test_partition_keys(spark):
    df = formatter.format_log_rows(
        _minimal(spark, trace_id="4bf92f3577b34da6a3ce929d0e0e4736")
    )
    # service_name strategy: key = utf-8 service name (messenger.go:95-99)
    msg = formatter.to_json_messages(df, partition_by="service_name").first()
    assert bytes(msg["Key"]) == b"svc"
    # trace_id strategy: key = the 32-byte ASCII hex string
    # (messenger.go:126-127 hex.Encode), not the 16 raw trace bytes
    msg2 = formatter.to_json_messages(df, partition_by="trace_id").first()
    assert bytes(msg2["Key"]) == b"4bf92f3577b34da6a3ce929d0e0e4736"
    # resource_hash: 16 bytes
    msg3 = formatter.to_json_messages(df, partition_by="resource_hash").first()
    assert len(bytes(msg3["Key"])) == 16
    # none
    msg4 = formatter.to_json_messages(df, partition_by="none").first()
    assert msg4["Key"] is None


def test_histogram_rows_arrays_never_null(spark):
    df = spark.createDataFrame(
        [
            {
                "time_unix_nano": 1_000_000_000,
                "count": 10,
                "sum": 100.0,
                "bucket_counts": None,
                "explicit_bounds": None,
                "min": 1.0,
                "max": 20.0,
                "svc": "a",
            }
        ],
        "time_unix_nano long, count long, sum double, bucket_counts array<long>, "
        "explicit_bounds array<double>, min double, max double, svc string",
    )
    r = formatter.format_histogram_rows(df, ["svc"]).first()
    assert r["BucketCounts"] == []
    assert r["ExplicitBounds"] == []
    assert r["Count"] == 10


def test_exp_histogram_and_summary_rows(spark):
    from opentelemetry_collector_contrib_spark.sinks.formatter import (
        format_exp_histogram_rows,
        format_summary_rows,
    )

    df = spark.createDataFrame(
        [("m1", 1760104536_000000000, 10, 5.5, 2, 1, 0, [1, 2], 0, None, 0.1, 4.2)],
        "metric_name string, time_unix_nano long, count long, sum double, scale int, "
        "zero_count long, positive_offset int, positive_bucket_counts array<long>, "
        "negative_offset int, negative_bucket_counts array<long>, min double, max double",
    )
    row = format_exp_histogram_rows(df, ["metric_name"]).first()
    assert row["Scale"] == 2 and row["PositiveBucketCounts"] == [1, 2]
    assert row["NegativeBucketCounts"] == []  # never null
    assert row["AggregationTemporality"] == 2

    sdf = spark.createDataFrame(
        [("m2", 1760104536_000000000, 4, 10.0, [0.5, 0.99], [1.0, 3.0])],
        "metric_name string, time_unix_nano long, count long, sum double, "
        "quantiles array<double>, quantile_values array<double>",
    )
    srow = format_summary_rows(sdf, ["metric_name"]).first()
    assert srow["ValueAtQuantiles"]["Quantile"] == [0.5, 0.99]
    assert srow["ValueAtQuantiles"]["Value"] == [1.0, 3.0]


def test_span_rows_duration_and_empty_arrays(spark):
    from opentelemetry_collector_contrib_spark.sinks.formatter import format_span_rows

    df = spark.createDataFrame(
        [
            (
                "ab" * 16, "cd" * 8, "", "op", "SPAN_KIND_SERVER", "svc",
                1760104536_000000000, 1760104536_500000000, "STATUS_CODE_OK",
            )
        ],
        "trace_id string, span_id string, parent_span_id string, span_name string, "
        "span_kind string, service_name string, start_time_unix_nano long, "
        "end_time_unix_nano long, status_code string",
    )
    row = format_span_rows(df).first()
    assert row["Duration"] == 500000000
    assert row["Events.Timestamp"] == [] and row["Links.TraceId"] == []  # empty, not null
    assert row["TraceId"] == "ab" * 16 and row["StatusCode"] == "STATUS_CODE_OK"
