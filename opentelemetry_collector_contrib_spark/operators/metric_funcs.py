"""transformprocessor metric-context functions (§2.11,
/root/reference/processor/transformprocessor/internal/metrics/func_*.go)
over the flat metric-row model: one datapoint per row with
(metric, metric_type, labels map, value [, count, sum, temporality,
is_monotonic]) columns.

Each function is a narrow projection/duplication — the Go versions
restructure pmetric trees; here the tree is already flat, so they reduce
to withColumn/filter/union with zero shuffles (copy_metric unions two
scans of the same frame; Catalyst reuses the exchange-free subplan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def convert_sum_to_gauge(df: DataFrame, type_col: str = "metric_type") -> DataFrame:
    """func_convert_sum_to_gauge.go: retype sum datapoints as gauge.
    The Go version's Gauge struct simply has no temporality/monotonicity
    fields; in the flat row model the equivalents must be NULLed on the
    retyped rows, or a downstream filter keyed on is_monotonic /
    aggregation_temporality would still match the now-gauge rows."""
    # tag first: later withColumns rewrite type_col, so the predicate
    # must be materialized before the retype (same trap as gauge_to_sum)
    out = df.withColumn("__was_sum", F.col(type_col) == "sum")
    was = F.col("__was_sum")
    out = out.withColumn(
        type_col, F.when(was, "gauge").otherwise(F.col(type_col))
    )
    for meta in ("aggregation_temporality", "is_monotonic"):
        if meta in df.columns:
            out = out.withColumn(
                meta, F.when(was, F.lit(None)).otherwise(F.col(meta))
            )
    return out.drop("__was_sum")


def convert_gauge_to_sum(
    df: DataFrame,
    aggregation_temporality: str = "cumulative",
    is_monotonic: bool = False,
    type_col: str = "metric_type",
) -> DataFrame:
    """func_convert_gauge_to_sum.go: retype gauges as sums with explicit
    temporality + monotonicity."""
    # tag first: the later withColumns rewrite type_col, so the predicate
    # must be materialized before the retype
    out = df.withColumn("__was_gauge", F.col(type_col) == "gauge")
    was = F.col("__was_gauge")
    out = out.withColumn(type_col, F.when(was, "sum").otherwise(F.col(type_col)))
    out = out.withColumn(
        "aggregation_temporality",
        F.when(was, aggregation_temporality).otherwise(
            F.col("aggregation_temporality")
            if "aggregation_temporality" in df.columns
            else F.lit(None).cast("string")
        ),
    )
    out = out.withColumn(
        "is_monotonic",
        F.when(was, F.lit(is_monotonic)).otherwise(
            F.col("is_monotonic") if "is_monotonic" in df.columns else F.lit(None).cast("boolean")
        ),
    )
    return out.drop("__was_gauge")


def copy_metric(
    df: DataFrame, name: str, new_name: str, metric_col: str = "metric"
) -> DataFrame:
    """func_copy_metric.go: append a copy of one metric under a new name."""
    copy = df.filter(F.col(metric_col) == name).withColumn(metric_col, F.lit(new_name))
    return df.unionByName(copy)


def extract_count_metric(
    df: DataFrame,
    is_monotonic: bool = True,
    metric_col: str = "metric",
    count_col: str = "count",
    suffix: str = "_count",
) -> DataFrame:
    """func_extract_count_metric.go: APPEND a new sum metric
    '<name>_count' carrying the datapoint count — the source metric and
    every other metric stay in the stream (the Go function appends via
    GetMetrics().AppendEmpty() and keeps the input intact)."""
    extracted = (
        df.filter(F.col(count_col).isNotNull())
        .withColumn(metric_col, F.concat(F.col(metric_col), F.lit(suffix)))
        .withColumn("value", F.col(count_col).cast("double"))
        .withColumn("metric_type", F.lit("sum"))
        .withColumn("is_monotonic", F.lit(is_monotonic))
    )
    return df.unionByName(extracted, allowMissingColumns=True)


def extract_sum_metric(
    df: DataFrame,
    is_monotonic: bool = True,
    metric_col: str = "metric",
    sum_col: str = "sum",
    suffix: str = "_sum",
) -> DataFrame:
    """func_extract_sum_metric.go: APPEND '<name>_sum', keeping the input
    stream intact like the reference."""
    extracted = (
        df.filter(F.col(sum_col).isNotNull())
        .withColumn(metric_col, F.concat(F.col(metric_col), F.lit(suffix)))
        .withColumn("value", F.col(sum_col).cast("double"))
        .withColumn("metric_type", F.lit("sum"))
        .withColumn("is_monotonic", F.lit(is_monotonic))
    )
    return df.unionByName(extracted, allowMissingColumns=True)


def convert_summary_count_val_to_sum(df: DataFrame, **kw) -> DataFrame:
    """func_convert_summary_count_val_to_sum.go — summary rows share the
    extract_count_metric shape in the flat model."""
    return extract_count_metric(df, **kw)


def convert_summary_sum_val_to_sum(df: DataFrame, **kw) -> DataFrame:
    """func_convert_summary_sum_val_to_sum.go."""
    return extract_sum_metric(df, **kw)


def aggregate_on_attributes(
    df: DataFrame, label_set: list[str], aggregation: str = "sum", **kw
) -> DataFrame:
    """func_aggregate_on_attributes_metrics.go — identical semantics to
    metricstransform aggregate_labels; delegate."""
    from .processors import metricstransform_processor

    return metricstransform_processor(
        df,
        [{"include": ".*", "match_type": "regexp",
          "operations": [{"action": "aggregate_labels", "label_set": label_set,
                          "aggregation_type": aggregation}]}],
        **kw,
    )
