"""The glassflow exporter's flat-row formatter as Spark expressions.

Reproduces the exact ClickHouse-shaped row of
/root/reference/exporter/glassflowexporter/internal/formatter/formatter.go:
- one flat object per LogRecord (:68-84), column set & names pinned;
- Timestamp: "yyyy-MM-dd HH:mm:ss.%09d" UTC, falling back to
  observed_time when time==0 (:64-67, :599-607);
- Trace/SpanId as 32/16-char lowercase hex (:242-252);
- attribute maps stringified: bool->true/false, numbers->JSON, bytes->hex
  (:213-240) — our canonical model already carries map<string,string>;
- float sanitation: NaN->null, +Inf->MaxFloat64, -Inf->-MaxFloat64 (:27-38);
- empty maps/arrays must be {} / [], never null (formatter_golden_test.go:62-108).

Partition key strategies mirror internal/messenger/messenger.go:20-176:
none | trace_id | service_name | resource_hash (mapHash16 parity UDF).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashes import map_hash16
from ..functions.timefmt import clickhouse_ts

MAX_FLOAT64 = 1.7976931348623157e308


def sanitize_float(col: Column) -> Column:
    """sanitizeFloat64 (formatter.go:27-38)."""
    return (
        F.when(F.isnan(col), F.lit(None).cast("double"))
        .when(col == F.lit(float("inf")), F.lit(MAX_FLOAT64))
        .when(col == F.lit(float("-inf")), F.lit(-MAX_FLOAT64))
        .otherwise(col)
    )


def _empty_map(col: Column) -> Column:
    return F.coalesce(col, F.create_map().cast("map<string,string>"))


def format_log_rows(df: DataFrame) -> DataFrame:
    """Canonical flat LogRecord columns -> the exporter's exact output
    columns (formatter.go:68-84). Input columns follow model.LOG_RECORD_SCHEMA
    (missing optional ones default to empty)."""
    cols = set(df.columns)

    def get(name: str, default: Column) -> Column:
        return F.col(name) if name in cols else default

    zero = F.lit(0).cast("long")
    time_ns = get("time_unix_nano", zero)
    obs_ns = get("observed_time_unix_nano", zero)
    # formatter.go:64-67; NULL must fall back like 0 (when(NULL == 0) is
    # NULL-false and would emit a NULL Timestamp instead of observed time)
    eff_ns = F.when(time_ns.isNull() | (time_ns == 0), obs_ns).otherwise(time_ns)
    service = F.coalesce(
        F.element_at(_empty_map(get("resource_attributes", F.lit(None))), "service.name"), F.lit("")
    )  # formatter.go:286-291
    return df.select(
        clickhouse_ts(eff_ns).alias("Timestamp"),
        F.lower(F.coalesce(get("trace_id", F.lit("")), F.lit(""))).alias("TraceId"),
        F.lower(F.coalesce(get("span_id", F.lit("")), F.lit(""))).alias("SpanId"),
        # uint8 truncation: formatter.go casts uint8(lr.Flags()) — pdata
        # flags are uint32, so values > 255 must wrap, not pass through
        F.pmod(F.coalesce(get("flags", F.lit(0)), F.lit(0)).cast("int"), F.lit(256)).alias("TraceFlags"),
        F.coalesce(get("severity_text", F.lit("")), F.lit("")).alias("SeverityText"),
        F.coalesce(get("severity_number", F.lit(0)), F.lit(0)).cast("int").alias("SeverityNumber"),
        service.alias("ServiceName"),
        F.coalesce(get("body", F.lit("")), F.lit("")).alias("Body"),
        F.coalesce(get("resource_schema_url", F.lit("")), F.lit("")).alias("ResourceSchemaUrl"),
        _empty_map(get("resource_attributes", F.lit(None))).alias("ResourceAttributes"),
        F.coalesce(get("scope_schema_url", F.lit("")), F.lit("")).alias("ScopeSchemaUrl"),
        F.coalesce(get("scope_name", F.lit("")), F.lit("")).alias("ScopeName"),
        F.coalesce(get("scope_version", F.lit("")), F.lit("")).alias("ScopeVersion"),
        _empty_map(get("scope_attributes", F.lit(None))).alias("ScopeAttributes"),
        _empty_map(get("attributes", F.lit(None))).alias("LogAttributes"),
        *[F.col(c) for c in ("route", "tokens", "doc_id") if c in cols],
    )


def to_json_messages(df: DataFrame, partition_by: str = "none") -> DataFrame:
    """Formatted rows -> (Key, Value) JSON messages
    (messenger.go Logs: key strategy none/trace_id/service_name/
    resource_hash; LogsToJSON)."""
    carry = [c for c in ("route", "tokens", "doc_id") if c in df.columns]
    # backtick-quote column references: span rows carry DOTTED names
    # (Events.Timestamp, ...) which a bare string would resolve as nested
    # field paths and fail analysis — alias back so the JSON keys keep
    # the dots
    payload = F.to_json(
        F.struct(
            *[F.col(f"`{c}`").alias(c) for c in df.columns if c not in carry]
        )
    )
    if partition_by == "none":
        key = F.lit(None).cast("binary")
    elif partition_by == "trace_id":
        # messenger.go:126-127: hex.Encode(buf, tid) — the key is the
        # 32-byte ASCII hex string, NOT the 16 raw trace bytes (raw bytes
        # would hash every span to a different partition than the
        # collector)
        key = F.encode(F.col("TraceId"), "UTF-8")
    elif partition_by == "service_name":
        key = F.when(F.col("ServiceName") != "", F.encode(F.col("ServiceName"), "UTF-8"))
    elif partition_by == "resource_hash":
        key = map_hash16(F.col("ResourceAttributes"))
    else:
        raise ValueError(partition_by)
    return df.select(key.alias("Key"), payload.alias("Value"), *carry)


# --- metrics rows (formatter.go per-type schemas) -------------------------


def format_gauge_rows(df: DataFrame, dims: list[str]) -> DataFrame:
    """Gauge datapoint rows (formatter.go:295-335): Value sanitized."""
    return df.select(
        *dims,
        clickhouse_ts(F.col("time_unix_nano")).alias("TimeUnix"),
        sanitize_float(F.col("value").cast("double")).alias("Value"),
    )


def format_sum_rows(df: DataFrame, dims: list[str], is_monotonic: bool = True, temporality: int = 2) -> DataFrame:
    """Sum datapoint rows (formatter.go:337-379): adds
    AggregationTemporality + IsMonotonic."""
    return df.select(
        *dims,
        clickhouse_ts(F.col("time_unix_nano")).alias("TimeUnix"),
        sanitize_float(F.col("value").cast("double")).alias("Value"),
        F.lit(temporality).alias("AggregationTemporality"),
        F.lit(is_monotonic).alias("IsMonotonic"),
    )


def format_histogram_rows(df: DataFrame, dims: list[str]) -> DataFrame:
    """Histogram datapoint rows (formatter.go:381-427): Count/Sum/
    BucketCounts/ExplicitBounds/Min/Max; arrays never null."""
    return df.select(
        *dims,
        clickhouse_ts(F.col("time_unix_nano")).alias("TimeUnix"),
        F.col("count").cast("long").alias("Count"),
        sanitize_float(F.col("sum").cast("double")).alias("Sum"),
        F.coalesce(F.col("bucket_counts"), F.array().cast("array<long>")).alias("BucketCounts"),
        F.coalesce(F.col("explicit_bounds"), F.array().cast("array<double>")).alias("ExplicitBounds"),
        sanitize_float(F.col("min").cast("double")).alias("Min"),
        sanitize_float(F.col("max").cast("double")).alias("Max"),
    )


def format_exp_histogram_rows(df: DataFrame, dims: list[str]) -> DataFrame:
    """Exponential-histogram datapoint rows (formatter.go:429-479):
    Scale/ZeroCount/Positive+Negative offset & bucket counts (arrays never
    null), Min/Max sanitized, AggregationTemporality."""
    longs = "array<long>"
    return df.select(
        *dims,
        clickhouse_ts(F.col("time_unix_nano")).alias("TimeUnix"),
        F.col("count").cast("long").alias("Count"),
        sanitize_float(F.col("sum").cast("double")).alias("Sum"),
        F.coalesce(F.col("scale"), F.lit(0)).cast("int").alias("Scale"),
        F.coalesce(F.col("zero_count"), F.lit(0)).cast("long").alias("ZeroCount"),
        F.coalesce(F.col("positive_offset"), F.lit(0)).cast("int").alias("PositiveOffset"),
        F.coalesce(F.col("positive_bucket_counts"), F.array().cast(longs)).alias("PositiveBucketCounts"),
        F.coalesce(F.col("negative_offset"), F.lit(0)).cast("int").alias("NegativeOffset"),
        F.coalesce(F.col("negative_bucket_counts"), F.array().cast(longs)).alias("NegativeBucketCounts"),
        sanitize_float(F.col("min").cast("double")).alias("Min"),
        sanitize_float(F.col("max").cast("double")).alias("Max"),
        F.lit(2).alias("AggregationTemporality"),
    )


def format_summary_rows(df: DataFrame, dims: list[str]) -> DataFrame:
    """Summary datapoint rows (formatter.go:481-519): Count/Sum +
    ValueAtQuantiles parallel arrays (never null)."""
    return df.select(
        *dims,
        clickhouse_ts(F.col("time_unix_nano")).alias("TimeUnix"),
        F.col("count").cast("long").alias("Count"),
        sanitize_float(F.col("sum").cast("double")).alias("Sum"),
        F.struct(
            F.coalesce(F.col("quantiles"), F.array().cast("array<double>")).alias("Quantile"),
            F.coalesce(F.col("quantile_values"), F.array().cast("array<double>")).alias("Value"),
        ).alias("ValueAtQuantiles"),
    )


def format_span_rows(df: DataFrame) -> DataFrame:
    """Trace/span rows (formatter.go:114-137): Duration = end-start ns,
    Events.* / Links.* parallel arrays that must be EMPTY ARRAYS, never
    null (formatter_golden_test.go:62-108)."""
    cols = set(df.columns)

    def get(name: str, default: Column) -> Column:
        return F.col(name) if name in cols else default

    strs = "array<string>"
    maps = "array<map<string,string>>"
    empty_s = F.array().cast(strs)
    empty_m = F.array().cast(maps)
    return df.select(
        clickhouse_ts(F.col("start_time_unix_nano")).alias("Timestamp"),
        F.lower(F.coalesce(get("trace_id", F.lit("")), F.lit(""))).alias("TraceId"),
        F.lower(F.coalesce(get("span_id", F.lit("")), F.lit(""))).alias("SpanId"),
        F.lower(F.coalesce(get("parent_span_id", F.lit("")), F.lit(""))).alias("ParentSpanId"),
        F.coalesce(get("trace_state", F.lit("")), F.lit("")).alias("TraceState"),
        F.coalesce(get("span_name", F.lit("")), F.lit("")).alias("SpanName"),
        F.coalesce(get("span_kind", F.lit("")), F.lit("")).alias("SpanKind"),
        F.coalesce(get("service_name", F.lit("")), F.lit("")).alias("ServiceName"),
        _empty_map(get("resource_attributes", F.lit(None))).alias("ResourceAttributes"),
        F.coalesce(get("scope_name", F.lit("")), F.lit("")).alias("ScopeName"),
        F.coalesce(get("scope_version", F.lit("")), F.lit("")).alias("ScopeVersion"),
        _empty_map(get("attributes", F.lit(None))).alias("SpanAttributes"),
        (F.col("end_time_unix_nano") - F.col("start_time_unix_nano")).cast("long").alias("Duration"),
        F.coalesce(get("status_code", F.lit("Unset")), F.lit("Unset")).alias("StatusCode"),
        F.coalesce(get("status_message", F.lit("")), F.lit("")).alias("StatusMessage"),
        F.coalesce(get("event_timestamps", F.lit(None)), empty_s).alias("Events.Timestamp"),
        F.coalesce(get("event_names", F.lit(None)), empty_s).alias("Events.Name"),
        F.coalesce(get("event_attributes", F.lit(None)), empty_m).alias("Events.Attributes"),
        F.coalesce(get("link_trace_ids", F.lit(None)), empty_s).alias("Links.TraceId"),
        F.coalesce(get("link_span_ids", F.lit(None)), empty_s).alias("Links.SpanId"),
        F.coalesce(get("link_trace_states", F.lit(None)), empty_s).alias("Links.TraceState"),
        F.coalesce(get("link_attributes", F.lit(None)), empty_m).alias("Links.Attributes"),
    )
