"""Per-route fan-out writer + obsreport accounting.

The routing connector resolves each route to consumer pipelines at startup
and hands each consumer its moved subset
(/root/reference/connector/routingconnector/logs.go:62-107); the exporter
wraps the push with queue/retry and counts records/bytes per
(outcome, topic, partition)
(/root/reference/exporter/glassflowexporter/internal/metadata/metrics.go:14-79,
factory.go:58-64).

Spark-first fan-out: ONE pass — write the routed DataFrame partitioned by
the route column (`partitionBy('route')`); every sink's rows land under its
own directory/table partition, no N filtered re-scans. Task retries +
idempotent overwrite replace the sending queue; per-sink counts come from
one groupBy over the same routed frame (map-side combinable).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F


def sink_counts(routed: DataFrame, route_col: str = "route") -> DataFrame:
    """Per-sink obsreport counts: records routed per sink (metrics.go
    records-per-topic analog). One aggregate, map-side combined."""
    return (
        routed.groupBy(F.col(route_col).alias("sink"))
        .agg(F.count(F.lit(1)).alias("records_out"))
        .orderBy("sink")
    )


def write_fanout(
    routed: DataFrame,
    base_path: str,
    route_col: str = "route",
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> None:
    """Single-pass multi-sink write: partitionBy(route). At cluster scale
    this is the one-job equivalent of the reference's per-route consumers;
    dynamic partition overwrite keeps re-runs idempotent (persistent-queue
    semantics: at-least-once delivery collapsed to exactly-once by
    overwrite)."""
    (
        routed.write.mode(mode)
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(route_col)
        .format(fmt)
        .save(base_path)
    )


def write_fanout_with_counts(
    routed: DataFrame,
    base_path: str,
    route_names: list[str],
    route_col: str = "route",
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> dict[str, int]:
    """Single-pass fan-out + obsreport counts: per-sink record counts are
    collected by the SAME job that writes the sinks, via an Observation on
    the routed frame (conditional sums over the statically-known route
    set). This mirrors the reference, which counts during export
    (exporterhelper/obsreport, internal/metadata/metrics.go:57-79) rather
    than re-scanning — at 10^12 rows a second counting pass is a full
    extra read of the corpus. Returns {sink: records_out}."""
    obs = Observation("sink_counts")
    names = list(route_names)
    if "default" not in names:
        names.append("default")
    aggs = [
        F.sum(F.when(F.col(route_col) == n, 1).otherwise(0)).alias(n) for n in names
    ]
    # catch-all: routes present in the data but missing from route_names
    # (a stale list) still land on disk — they must also land in the
    # accounting, or per-sink totals silently undercount with no error.
    # NULL routes must be caught explicitly: ~NULL.isin(names) is NULL,
    # which when() treats as false — exactly the silent-undercount hole
    # this bucket exists to close
    aggs.append(
        F.sum(
            F.when(F.col(route_col).isNull() | ~F.col(route_col).isin(names), 1).otherwise(0)
        ).alias("__unlisted")
    )
    observed = routed.observe(obs, *aggs)
    (
        observed.write.mode(mode)
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(route_col)
        .format(fmt)
        .save(base_path)
    )
    got = {k: int(v or 0) for k, v in obs.get.items()}
    if got.get("__unlisted", 0) == 0:
        got.pop("__unlisted", None)
    return got


def read_sink(spark: SparkSession, base_path: str, sink: str, fmt: str = "parquet") -> DataFrame:
    return spark.read.format(fmt).load(os.path.join(base_path, f"route={sink}"))


def failover_write(
    routed: DataFrame, targets: list[str], route_col: str = "route", fmt: str = "parquet"
) -> str:
    """failoverconnector (/root/reference/connector/failoverconnector/
    logs.go:29-66): try sinks in priority order, fall back on failure.
    Driver-side try/except around the write job."""
    last_err: Exception | None = None
    for path in targets:
        try:
            write_fanout(routed, path, route_col, fmt=fmt)
            return path
        except Exception as e:  # noqa: BLE001 — any write failure falls over
            last_err = e
    raise RuntimeError(f"all failover targets failed: {last_err}")


def clickhouse_export(
    formatted: DataFrame,
    path: str,
    partition_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """clickhouseexporter batch-insert analog without a live server
    (/root/reference/exporter/clickhouseexporter/exporter_logs.go batches
    rows into INSERTs): CH-shaped rows (sinks/formatter.py output) land
    as JSONEachRow files — the exact format `clickhouse-client
    --query='INSERT INTO t FORMAT JSONEachRow' < part.json` (or an
    s3/file table function) ingests directly, so the hand-off to a real
    CH cluster is a copy, not a transform. Dynamic partition overwrite
    keeps re-runs idempotent (persistent-queue exactly-once analog)."""
    writer = formatted.write.mode(mode).option("partitionOverwriteMode", "dynamic")
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.json(path)


def tap_processor(
    df: DataFrame,
    path: str,
    *,
    limit: int = 1000,
    id_cols: list[str] | None = None,
    seed: str = "tap",
) -> DataFrame:
    """remotetapprocessor, batch analog (/root/reference/processor/
    remotetapprocessor/processor.go:119-130): pass the data through
    UNCHANGED while a rate-limited sampled copy streams out for live
    inspection. The websocket push is meaningless without a collector
    process; the batch-native tap is a bounded JSON-lines side output —
    `tail -f`/`jq` it the way you'd attach to the websocket.

    The sample is deterministic (hash-ordered first `limit` rows over
    id_cols, or all columns cast to string when omitted — same
    resampling-stability discipline as stratified_sample), so reruns tap
    identical rows. Returns the input df unchanged; the side write is
    eager (like the reference's fire-and-forget push)."""
    key_cols = id_cols or df.columns
    h = F.xxhash64(F.lit(seed), *[F.col(c).cast("string") for c in key_cols])
    # key columns break hash ties: rows with equal key values tie on __h,
    # and an order-by-hash-alone limit boundary would tap a different
    # subset per partitioning (only byte-identical keys still tie — same
    # content either way)
    sample = (
        df.withColumn("__h", h)
        .orderBy("__h", *[F.col(c).cast("string") for c in key_cols])
        .limit(limit)
        .drop("__h")
    )
    sample.selectExpr("to_json(struct(*)) AS line").coalesce(1).write.mode(
        "overwrite"
    ).text(path)
    return df
