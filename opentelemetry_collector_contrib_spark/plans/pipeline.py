"""End-to-end parse -> enrich -> route -> aggregate pipelines.

`log_pipeline` is the north-rule job over the tokenized-sequence input
(doc_id, tokens, n_tok, source) joined with its serialized payloads:
vectorized parse (grok/JSON/kv/containerd by format), broadcast enrichment
with source metadata, first-match routing to per-tenant sinks, per-sink
aggregate counts — one Catalyst plan, one shuffle (the final count), with
the token arrays carried through untouched (per-row invariant).

`events_pipeline` is the same shape over the driver's `events` table
(flagship/smoke query).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import connectors, parsers
from ..operators.enrich import lookup_enrich
from ..sinks.fanout import sink_counts


def _severity_from_attrs(df: DataFrame) -> DataFrame:
    attrs = F.col("attributes")
    # try_cast: an attrs["status"] above int range (crafted JSON body)
    # must yield NULL severity input, not an ANSI CAST_INVALID_INPUT
    # that aborts the whole pipeline job
    status = F.element_at(attrs, "status").try_cast("int")
    text = F.lower(
        F.coalesce(
            F.element_at(attrs, "level"),
            F.when(status >= 500, F.lit("error")).when(status >= 400, F.lit("warn")),
            F.lit("info"),
        )
    )
    return parsers.severity_parser(df.withColumn("__sev_text", text), "__sev_text").drop("__sev_text")


def parse_records(logs: DataFrame, impl: str = "jvm") -> DataFrame:
    """Vectorized parse of the 4 payload shapes (apache common-log / JSON /
    key=value / containerd) + severity + observed-timestamp fallback.

    impl="arrow" (north-rule default): one pyarrow-native UDF (pyspark
    4.1 arrow_udf) — format dispatch, RE2 extraction, and the output
    MapArray assembly all in Arrow C++; only JSON/key=value rows touch
    per-row Python. ~1.6x the pandas path at local[8] and the
    lowest bytes/row through the Python workers (no pandas object
    churn), which is what the 8->32 scaling pair is bound by.
    impl="pandas": the Arrow-batched pandas UDF (pre-4.1 path).
    impl="jvm": pure column expressions (from_json / str_to_map /
    regexp_extract chain) inside whole-stage codegen — zero Python, best
    for low parallelism / small batches. All produce identical maps."""
    from ..functions.ottl import extract_patterns

    # single source of truth for the format patterns — a drifted copy here
    # would silently break the documented jvm/pandas parity
    from ..functions.vparse import (
        APACHE_DETECT_PAT,
        APACHE_PAT,
        CONTAINERD_PAT,
        KV_DETECT_PAT,
        java_pattern,
    )

    body = F.col("body")
    # Java-regex variants of the canonical RE2-semantics patterns (`$`
    # rewritten to \z so a trailing-newline body is rejected exactly
    # like the Arrow/python impls)
    apache_rx = java_pattern(APACHE_PAT)
    containerd_rx = java_pattern(CONTAINERD_PAT)
    kv_detect_rx = java_pattern(KV_DETECT_PAT)

    if impl in ("hybrid", "arrow"):
        from ..functions.vparse import parse_multiformat_arrow as _pma

        if _pma is None:
            impl = "pandas"  # pyspark < 4.1 fallback
    if impl == "hybrid":
        # split the work by where each format parses cheapest: JSON and
        # key=value go to the JVM expressions (from_json/str_to_map —
        # Jackson + codegen, parity-tested against the Python models),
        # and the Python workers receive body BYTES only for the two
        # regex formats (the masked column ships as Arrow nulls for
        # everything else). Halves the bytes/row through the Python
        # workers — the resource the 8->32 scaling pair is bound by.
        from ..functions.vparse import parse_multiformat_arrow

        fmt = F.col("fmt") if "fmt" in logs.columns else F.lit(None).cast("int")
        # eqNullSafe, NOT ==: a NULL fmt makes `fmt == 1` NULL, the NULL
        # propagates through ~(is_json | is_kv), and when() then masks
        # EVERY auto-detect row to NULL — silently dropping the two
        # regex formats whenever fmt is absent
        is_json = fmt.eqNullSafe(1) | (fmt.isNull() & body.startswith("{"))
        is_kv = fmt.eqNullSafe(2) | (
            fmt.isNull()
            & ~body.startswith("{")
            & body.rlike(kv_detect_rx)
        )
        masked = F.when(~(is_json | is_kv), body)
        parsed = (
            F.when(is_json, F.from_json(body, "map<string,string>"))
            .when(is_kv, F.str_to_map(F.trim(body), F.lit(" "), F.lit("=")))
            .otherwise(parse_multiformat_arrow(masked, fmt))
        )
    elif impl in ("pandas", "arrow"):
        from ..functions.vparse import parse_multiformat, parse_multiformat_arrow

        fmt = F.col("fmt") if "fmt" in logs.columns else F.lit(None).cast("int")
        if impl == "arrow" and parse_multiformat_arrow is None:
            impl = "pandas"  # pyspark < 4.1 fallback
        udf = parse_multiformat_arrow if impl == "arrow" else parse_multiformat
        parsed = udf(body, fmt)
    else:
        # auto-detect (no fmt column, or a NULL fmt cell): same dispatch
        # order as vparse._parse_one
        det = (
            F.when(body.startswith("{"), F.from_json(body, "map<string,string>"))
            .when(
                body.rlike(kv_detect_rx),
                F.str_to_map(F.trim(body), F.lit(" "), F.lit("=")),
            )
            .when(
                body.rlike(APACHE_DETECT_PAT),
                extract_patterns(body, apache_rx),
            )
            .otherwise(extract_patterns(body, containerd_rx))
        )
        if "fmt" in logs.columns:
            fmt = F.col("fmt")
            parsed = (
                F.when(fmt == 1, F.from_json(body, "map<string,string>"))
                .when(fmt == 2, F.str_to_map(F.trim(body), F.lit(" "), F.lit("=")))
                .when(fmt == 0, extract_patterns(body, apache_rx))
                # NULL fmt auto-detects (the pandas impl does; without
                # this branch NULL-fmt JSON rows would silently parse as
                # containerd); unknown tags fall through to containerd
                .when(fmt.isNull(), det)
                .otherwise(extract_patterns(body, containerd_rx))
            )
        else:
            parsed = det
    records = logs.withColumn("attributes", parsed)
    records = _severity_from_attrs(records)
    if "ingest_ts" in logs.columns:
        # ingest time is the observed timestamp (stanza entry semantics);
        # the formatter falls back to it when event time is absent
        records = records.withColumn("observed_time_unix_nano", F.col("ingest_ts"))
    return records


def log_pipeline(
    sequences: DataFrame,
    logs: DataFrame,
    meta: DataFrame,
    routes: list[tuple[str, F.Column]] | None = None,
) -> dict[str, DataFrame]:
    """The north-rule pipeline over SEPARATE sequence + payload tables.
    Returns {'routed': ..., 'counts': ...}.

    Shuffle budget: the sequences⨝logs join is keyed on doc_id (bucket both
    tables on doc_id at scale and it is shuffle-free); meta is broadcast;
    routing is narrow. Prefer `log_pipeline_fused` when payloads are stored
    in the sequence table itself — that variant has zero shuffles."""
    records = parse_records(logs)
    # join payloads with their token sequences (doc_id is the row identity)
    joined = records.join(sequences.select("doc_id", "tokens", "n_tok"), "doc_id")
    # broadcast enrichment: source -> service/namespace/region/tenant
    enriched = lookup_enrich(joined, meta, "source")
    enriched = enriched.withColumn(
        "resource_attributes",
        F.map_from_arrays(
            F.array(F.lit("service.name"), F.lit("k8s.namespace.name"), F.lit("cloud.region")),
            F.array(F.col("service_name"), F.col("namespace"), F.col("region")),
        ),
    )
    # first-match routing (routingconnector README's tenant example)
    routes = routes or [
        ("errors", F.col("severity_number") >= 17),
        ("acme", F.col("tenant") == "acme"),
        ("ecorp", F.col("tenant") == "ecorp"),
    ]
    routed = connectors.routing_connector(enriched, routes)
    counts = sink_counts(routed)
    return {"routed": routed, "counts": counts}


DEFAULT_ROUTES = ["errors", "acme", "ecorp"]


def resolve_parse_impl(spark: SparkSession) -> str:
    """Cores-adaptive default for the fused pipeline's parse impl.

    Measured (BASELINE.md r4): `hybrid` (JSON/kv via JVM from_json/
    str_to_map, regex formats via the arrow UDF over a masked body —
    halves bytes/row through the Python workers) wins at low parallelism
    (495k vs 452k seq/s at 8 pinned cores) but loses at 32 (802k vs 892k:
    the Jackson/codegen half contends inside the single executor JVM).
    So: <= 8 task slots per executor -> hybrid, above -> arrow.
    `SPARK_GRAFT_PARSE_IMPL` pins an impl explicitly (anything but
    "auto"); the scaling harness pins `arrow` at both levels so the
    N->4N efficiency pair compares one binary, not two."""
    env = os.environ.get("SPARK_GRAFT_PARSE_IMPL", "auto")
    if env and env != "auto":
        return env
    return "hybrid" if spark.sparkContext.defaultParallelism <= 8 else "arrow"


def log_pipeline_fused(
    fused: DataFrame,
    meta: DataFrame,
    routes: list[tuple[str, F.Column]] | None = None,
    parse_impl: str | None = None,
    keep_payload: bool = False,
) -> dict[str, DataFrame]:
    """North-rule pipeline over the FUSED input table
    (doc_id, tokens, n_tok, source, body, ingest_ts, fmt) — the
    scale-correct layout: payload and tokens co-located, so the whole
    pipeline is one narrow pass (scan -> parse -> broadcast enrich ->
    first-match route) with ZERO shuffles; per-sink counts come from an
    Observation on the write job (sinks/fanout.write_fanout_with_counts),
    not a second scan.

    parse_impl=None resolves adaptively (resolve_parse_impl). By default
    the serialized payload (`body`, `fmt`) is PRUNED right after the
    parse — the extracted attribute map subsumes it, and carrying ~100
    raw bytes/row through enrich -> route -> every per-sink write is pure
    memory-bandwidth burn at 10^12 rows (and 15-20%% of the post-parse
    row width here). keep_payload=True retains them for sinks that
    re-export the raw body (e.g. the glassflow formatter's Body column)."""
    records = parse_records(
        fused, impl=parse_impl or resolve_parse_impl(fused.sparkSession)
    )
    if not keep_payload:
        records = records.drop("body", "fmt", "ingest_ts")
    enriched = lookup_enrich(records, meta, "source")
    enriched = enriched.withColumn(
        "resource_attributes",
        F.map_from_arrays(
            F.array(F.lit("service.name"), F.lit("k8s.namespace.name"), F.lit("cloud.region")),
            F.array(F.col("service_name"), F.col("namespace"), F.col("region")),
        ),
    )
    routes = routes or [
        ("errors", F.col("severity_number") >= 17),
        ("acme", F.col("tenant") == "acme"),
        ("ecorp", F.col("tenant") == "ecorp"),
    ]
    routed = connectors.routing_connector(enriched, routes)
    return {"routed": routed, "counts": sink_counts(routed)}


def events_as_log_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recast the driver's `events` table as flat log records: props is the
    serialized payload (json_parser target), event_type drives severity."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    ev = parsers.json_parser(ev, parse_from="props", parse_to="attributes")
    sev_text = (
        F.when(F.col("event_type") == "error", "error")
        .when(F.col("event_type") == "purchase", "info2")
        .otherwise("info")
    )
    ev = parsers.severity_parser(ev.withColumn("__sev", sev_text), "__sev").drop("__sev")
    return ev


def events_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship smoke query: parse -> enrich -> route -> per-sink counts
    over the events table."""
    ev = events_as_log_records(spark, sf_dir)
    tiers = spark.createDataFrame(
        [("error", "errors"), ("purchase", "revenue"), ("signup", "growth"),
         ("login", "auth"), ("view", "traffic")],
        "event_type string, team string",
    )
    enriched = lookup_enrich(ev, tiers, "event_type")
    routed = connectors.routing_connector(
        enriched,
        [
            ("errors", F.col("severity_number") >= 17),
            ("high_value", F.col("value") > 150.0),
            ("team_revenue", F.col("team") == "revenue"),
        ],
    )
    return (
        routed.groupBy("route")
        .agg(
            F.count(F.lit(1)).alias("records_out"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .orderBy("route")
    )
