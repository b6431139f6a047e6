"""Connectors (§2.7): route + aggregate between pipelines.

References under /root/reference/connector/*.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def routing_connector(
    df: DataFrame,
    routes: list[tuple[str, Column]],
    default: str = "default",
    route_col: str = "route",
) -> DataFrame:
    """routingconnector (/root/reference/connector/routingconnector/
    logs.go:62-107): ordered route table, FIRST-MATCH-WINS — matched data is
    moved out before the next route is evaluated, leftovers go to
    default_pipelines.

    A when/when/otherwise chain evaluates conditions in order on the
    disjoint remainders, which is exactly first-match semantics, in one
    narrow pass with no shuffle."""
    expr = None
    for name, cond in routes:
        c = F.coalesce(cond, F.lit(False))
        expr = F.when(c, name) if expr is None else expr.when(c, name)
    expr = expr.otherwise(default) if expr is not None else F.lit(default)
    return df.withColumn(route_col, expr)


def count_connector(
    df: DataFrame,
    conditions: list[Column] | None = None,
    group_by: list[str] | None = None,
    metric_name: str = "log.record.count",
) -> DataFrame:
    """countconnector (/root/reference/connector/countconnector/
    counter.go:39-147): count records matching ORed conditions, grouped by
    attributes. Output one sum-metric row per attribute combination."""
    out = df
    if conditions:
        keep = conditions[0]
        for c in conditions[1:]:
            keep = keep | c
        out = out.filter(F.coalesce(keep, F.lit(False)))
    gb = group_by or []
    return (
        out.groupBy(*gb)
        .agg(F.count(F.lit(1)).alias("value"))
        .withColumn("metric_name", F.lit(metric_name))
    )


def sum_connector(
    df: DataFrame,
    source_attribute: str | Column,
    conditions: list[Column] | None = None,
    group_by: list[str] | None = None,
    metric_name: str = "log.record.sum",
) -> DataFrame:
    """sumconnector (/root/reference/connector/sumconnector/README.md:35-70):
    sum a numeric source attribute per unique attribute combination."""
    out = df
    if conditions:
        keep = conditions[0]
        for c in conditions[1:]:
            keep = keep | c
        out = out.filter(F.coalesce(keep, F.lit(False)))
    src = F.col(source_attribute) if isinstance(source_attribute, str) else source_attribute
    gb = group_by or []
    return (
        out.groupBy(*gb)
        .agg(F.sum(src.cast("double")).alias("value"))
        .withColumn("metric_name", F.lit(metric_name))
    )


def spanmetrics_connector(
    df: DataFrame,
    dims: list[str],
    duration_col: str = "duration_ns",
    bounds_ms: list[float] | None = None,
) -> DataFrame:
    """spanmetricsconnector (/root/reference/connector/spanmetricsconnector/
    connector.go:165-213,253-340): R.E.D. metrics — calls count + explicit
    histogram of duration per (service, span.name, kind, status + dims).

    Histogram via one groupBy: bucket index = width_bucket-style CASE over
    the explicit bounds, then counts pivoted into an array — a single
    shuffle, map-side combinable."""
    bounds_ms = bounds_ms or [2, 4, 6, 8, 10, 50, 100, 200, 400, 800, 1000, 1400, 2000, 5000, 10000, 15000]
    dur_ms = F.col(duration_col) / 1e6
    bucket = None
    for i, b in enumerate(bounds_ms):
        cond = dur_ms <= F.lit(b)
        bucket = F.when(cond, i) if bucket is None else bucket.when(cond, i)
    bucket = bucket.otherwise(len(bounds_ms))
    tagged = df.withColumn("__bucket", bucket)
    per_bucket = [
        F.sum(F.when(F.col("__bucket") == i, 1).otherwise(0)).alias(f"bucket_{i}")
        for i in range(len(bounds_ms) + 1)
    ]
    out = tagged.groupBy(*dims).agg(
        F.count(F.lit(1)).alias("calls"),
        F.sum(dur_ms).alias("duration_sum_ms"),
        F.min(dur_ms).alias("duration_min_ms"),
        F.max(dur_ms).alias("duration_max_ms"),
        *per_bucket,
    )
    return out.withColumn(
        "bucket_counts", F.array(*[F.col(f"bucket_{i}") for i in range(len(bounds_ms) + 1)])
    ).drop(*[f"bucket_{i}" for i in range(len(bounds_ms) + 1)])


def spanmetrics_exponential(
    df: DataFrame,
    dims: list[str],
    duration_col: str = "duration_ns",
    scale: int = 2,
    max_exemplars: int = 3,
    trace_col: str | None = None,
) -> DataFrame:
    """spanmetricsconnector exponential-histogram mode
    (/root/reference/connector/spanmetricsconnector/connector.go histogram
    config `exponential_histogram`, pdata exponential buckets): bucket
    index = ceil(log_base(duration)) - 1 with base = 2^(2^-scale), i.e.
    index = ceil(scale-scaled log2) - 1; zero/negative durations land in
    the zero bucket. Output: one row per (dims, bucket_index) with counts,
    plus per-dim calls/sum and up to `max_exemplars` exemplar trace ids
    (deterministic: lowest ids kept).

    Counts keep the single-shuffle shape of the explicit variant. The
    exemplar path is a separate bounded pipeline — distinct -> ranked
    window -> filter rn<=k -> collect — every stage spillable and the
    final collect_list holds at most max_exemplars ids per group. (A
    slice(sort(collect_set)) would produce the same values but its
    aggregation state buffers EVERY distinct trace id per group before
    the slice — a hot endpoint bucket at 100 TB holds GBs of executor
    heap.)"""
    from pyspark.sql import Window

    dur_ms = F.col(duration_col).cast("double") / 1e6
    # index = ceil(2^scale * log2(d)) - 1  (pdata mapping for positive d)
    idx = F.ceil(F.log2(dur_ms) * F.lit(2**scale)).cast("long") - 1
    bucketed = df.withColumn(
        "bucket_index", F.when(dur_ms > 0, idx).otherwise(F.lit(None))
    )
    per_bucket = bucketed.groupBy(*dims, "bucket_index").agg(
        F.count(F.lit(1)).alias("bucket_count")
    )
    if trace_col and max_exemplars > 0:
        tw = Window.partitionBy(*dims, "bucket_index").orderBy(trace_col)
        ex = (
            bucketed.select(*dims, "bucket_index", trace_col)
            .distinct()
            .withColumn("__rn", F.row_number().over(tw))
            .filter(F.col("__rn") <= max_exemplars)
            .groupBy(*dims, "bucket_index")
            .agg(F.sort_array(F.collect_list(trace_col)).alias("exemplar_traces"))
        )
        pl, pr = per_bucket.alias("pl"), ex.alias("pr")
        jcond = F.col("pl.bucket_index").eqNullSafe(F.col("pr.bucket_index"))
        for d in dims:
            jcond = jcond & F.col(f"pl.{d}").eqNullSafe(F.col(f"pr.{d}"))
        per_bucket = pl.join(pr, jcond, "left").select(
            *[F.col(f"pl.{c}") for c in per_bucket.columns],
            F.col("pr.exemplar_traces"),
        )
    totals = bucketed.groupBy(*dims).agg(
        F.count(F.lit(1)).alias("calls"),
        F.round(F.sum(dur_ms), 4).alias("duration_sum_ms"),
        F.sum(F.when(F.col("bucket_index").isNull(), 1).otherwise(0)).alias("zero_count"),
    )
    # null-safe equality on the dims: a plain equi-join silently drops every
    # group whose dim value is NULL (NULL keys never match)
    l, r = per_bucket.alias("l"), totals.alias("r")
    cond = None
    for d in dims:
        c = F.col(f"l.{d}").eqNullSafe(F.col(f"r.{d}"))
        cond = c if cond is None else (cond & c)
    joined = l.join(r, cond)
    return joined.select(
        *[F.col(f"l.{c}") for c in per_bucket.columns],
        *[F.col(f"r.{c}") for c in totals.columns if c not in dims],
    )


def servicegraph_connector(
    df: DataFrame,
    trace_col: str = "trace_id",
    span_col: str = "span_id",
    parent_col: str = "parent_span_id",
    service_col: str = "service_name",
    kind_col: str = "kind",
) -> DataFrame:
    """servicegraphconnector (/root/reference/connector/servicegraphconnector/):
    pair client spans with the server spans they called (same trace,
    client.span_id == server.parent_span_id) -> caller->callee edge counts.
    Self-join keyed on (trace_id, span linkage); AQE handles skewed traces."""
    client = df.filter(F.col(kind_col) == "client").select(
        F.col(trace_col).alias("t"), F.col(span_col).alias("cs"), F.col(service_col).alias("client")
    )
    server = df.filter(F.col(kind_col) == "server").select(
        F.col(trace_col).alias("t"), F.col(parent_col).alias("ps"), F.col(service_col).alias("server")
    )
    edges = client.join(server, (client["t"] == server["t"]) & (client["cs"] == server["ps"]))
    return edges.groupBy("client", "server").agg(F.count(F.lit(1)).alias("call_count"))


def signaltometrics_connector(
    df: DataFrame,
    dims: list[Column | str],
    value: Column | None = None,
    metric_type: str = "sum",
    metric_name: str = "signal.metric",
) -> DataFrame:
    """signaltometricsconnector (README.md:25-80): generic OTTL-driven
    metric from any signal — groupBy(extracted dims) agg(sum|count|...)."""
    gb = [F.col(d).alias(d) if isinstance(d, str) else d for d in dims]
    if metric_type == "count" or value is None:
        agg = F.count(F.lit(1)).alias("value")
    elif metric_type == "sum":
        agg = F.sum(value).alias("value")
    elif metric_type == "gauge_last":
        raise ValueError("gauge needs an ordering column; use interval_processor")
    else:
        raise ValueError(metric_type)
    return df.groupBy(*gb).agg(agg).withColumn("metric_name", F.lit(metric_name))


def exceptions_connector(
    df: DataFrame,
    event_name_col: str = "event_name",
    dims: list[str] | None = None,
) -> DataFrame:
    """exceptionsconnector (/root/reference/connector/exceptionsconnector/):
    count exception span-events grouped by dims."""
    dims = dims or ["service_name"]
    return (
        df.filter(F.col(event_name_col) == "exception")
        .groupBy(*dims)
        .agg(F.count(F.lit(1)).alias("exception_count"))
    )


def roundrobin_connector(df: DataFrame, n: int, id_col: str, route_col: str = "route") -> DataFrame:
    """roundrobinconnector (connector.go:64-96): distribute across n
    pipelines. Deterministic: pmod of a stable id column (the reference
    round-robins batch arrival order, which has no stable batch analog)."""
    return df.withColumn(route_col, F.concat(F.lit("pipeline_"), F.pmod(F.col(id_col), F.lit(n)).cast("string")))


def otlpjson_connector(df: DataFrame, body_col: str = "body") -> DataFrame:
    """otlpjsonconnector (/root/reference/connector/otlpjsonconnector/):
    log bodies carrying OTLP/JSON -> flattened typed log records."""
    schema = (
        "struct<resourceLogs: array<struct<"
        "resource: struct<attributes: array<struct<key:string, value:struct<stringValue:string>>>>,"
        "scopeLogs: array<struct<"
        "scope: struct<name:string, version:string>,"
        "logRecords: array<struct<timeUnixNano:string, severityNumber:int, severityText:string,"
        "body:struct<stringValue:string>, traceId:string, spanId:string>>"
        ">>>>>"
    )
    parsed = df.withColumn("__otlp", F.from_json(F.col(body_col), schema))
    rl = parsed.select(F.explode("__otlp.resourceLogs").alias("rl"))
    sl = rl.select(
        F.map_from_entries(
            F.transform("rl.resource.attributes", lambda e: F.struct(e["key"], e["value"]["stringValue"]))
        ).alias("resource_attributes"),
        F.explode("rl.scopeLogs").alias("sl"),
    )
    lr = sl.select(
        "resource_attributes",
        F.col("sl.scope.name").alias("scope_name"),
        F.coalesce(F.col("sl.scope.version"), F.lit("")).alias("scope_version"),
        F.explode("sl.logRecords").alias("lr"),
    )
    return lr.select(
        "resource_attributes",
        "scope_name",
        "scope_version",
        # try_cast: OTLP/JSON carries uint64 nanos as a STRING; a
        # value above int64 in one record must not abort the scan
        F.col("lr.timeUnixNano").try_cast("long").alias("time_unix_nano"),
        F.coalesce(F.col("lr.severityNumber"), F.lit(0)).alias("severity_number"),
        F.coalesce(F.col("lr.severityText"), F.lit("")).alias("severity_text"),
        F.col("lr.body.stringValue").alias("body"),
        F.lower(F.coalesce(F.col("lr.traceId"), F.lit(""))).alias("trace_id"),
        F.lower(F.coalesce(F.col("lr.spanId"), F.lit(""))).alias("span_id"),
    )


def slowsql_connector(
    df: DataFrame,
    threshold_ns: int,
    duration_col: str = "duration_ns",
    db_system_key: str = "db.system",
) -> DataFrame:
    """slowsqlconnector (README.md): emit log rows for DB spans slower than
    threshold."""
    return df.filter(
        (F.col(duration_col) > threshold_ns)
        & F.array_contains(F.map_keys(F.col("attributes")), db_system_key)
    )
