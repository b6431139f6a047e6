"""Physical-plan quality gates: filter pushdown reaches the parquet scan,
column pruning shrinks ReadSchema, small lookups broadcast, and narrow
operator chains stay inside whole-stage codegen. These are the properties
that decide 100TB behavior — asserted, not eyeballed."""

from __future__ import annotations

from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.operators import connectors, processors
from opentelemetry_collector_contrib_spark.operators.enrich import lookup_enrich

SF_DIR = "/root/testdata/sf0.01"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_pushdown_reaches_parquet(spark):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    kept = processors.filter_processor(
        ev, [F.col("event_type") == "error"], null_safe=False
    )
    plan = _plan(kept.select("event_id"))
    assert "event_type" in plan.split("PushedFilters:")[1].split("]")[0]
    # the null-safe default trades pushdown for keep-on-null semantics
    safe = processors.filter_processor(ev, [F.col("event_type") == "error"])
    assert kept.count() == safe.count()  # no nulls here: same result


def test_column_pruning_shrinks_read_schema(spark):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    two = ev.select("event_id", "value")
    plan = _plan(two)
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "event_id" in read_schema and "value" in read_schema
    assert "props" not in read_schema and "event_type" not in read_schema


def test_lookup_enrich_is_broadcast(spark):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    lookup = spark.createDataFrame(
        [("error", "high"), ("purchase", "mid")], "event_type string, tier string"
    )
    out = lookup_enrich(ev, lookup, "event_type")
    plan = _plan(out)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_routing_is_narrow_and_codegen(spark):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    routed = connectors.routing_connector(
        ev, [("errors", F.col("event_type") == "error"), ("big", F.col("value") > 100)]
    )
    plan = _plan(routed)
    assert "Exchange" not in plan  # routing adds no shuffle
    assert "*(1)" in plan  # whole-stage codegen stage marker


def test_count_connector_partial_aggregation(spark):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    out = connectors.count_connector(ev, conditions=[F.col("value") > 0], group_by=["event_type"])
    plan = _plan(out)
    # map-side combine: a partial HashAggregate must appear before the Exchange
    pre_exchange = plan.split("Exchange")[-1]
    assert "HashAggregate" in plan.split("Exchange")[0] or "partial" in plan
    assert plan.count("Exchange") <= 2  # one shuffle for the agg (+AQE read)
    del pre_exchange


def test_parser_suites_are_shuffle_free(spark):
    """The three parser suite queries chain 4-5 parsers over one scan —
    pure narrow projections, zero Exchange."""
    from opentelemetry_collector_contrib_spark.plans.queries_suites import (
        q_parsers_structured,
        q_parsers_syslog_time,
        q_parsers_web,
    )

    for q in (q_parsers_structured, q_parsers_web):
        plan = _plan(q(spark, SF_DIR))
        assert "Exchange" not in plan, f"{q.__name__} shuffles"
    # the syslog/time suite folds the framing ROUND-TRIPS in (octet +
    # non-transparent deframe over a reassembled stream): frame
    # reassembly is a collect_list aggregation, so this suite is no
    # longer shuffle-free — assert the shape is the right one instead:
    # every shuffle is a map-side-combined frame aggregation (partial_
    # before the Exchange), joins all broadcast, nothing else wide
    plan = _plan(q_parsers_syslog_time(spark, SF_DIR))
    shuffles = [ln for ln in plan.splitlines() if "Exchange hashpartitioning" in ln]
    assert len(shuffles) <= 2, f"framing adds at most 2 shuffles, saw {len(shuffles)}"
    assert plan.count("partial_collect_list") >= len(shuffles)
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan


def test_enrichment_suite_broadcasts_all_lookups(spark):
    """k8s + geoip + resourcedetection in one pass: every join broadcast,
    exactly one aggregation shuffle at the end."""
    from opentelemetry_collector_contrib_spark.plans.queries_suites import q_enrichment_suite

    plan = _plan(q_enrichment_suite(spark, SF_DIR))
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    import re as _re

    non_broadcast = [
        ln for ln in plan.splitlines()
        if "Exchange" in ln and "BroadcastExchange" not in ln and _re.search(r"\bExchange\b", ln)
    ]
    assert len(non_broadcast) <= 2, non_broadcast  # the final groupBy (+AQE read)


def test_ngram_jaccard_gram_df_join_not_force_broadcast(spark):
    """Round-3 scale fix: the distinct-gram document-frequency table must
    NOT carry a broadcast hint (billions of rows at corpus scale -> driver
    OOM). With auto-broadcast disabled the join must run shuffled and
    still produce the same pairs."""
    from opentelemetry_collector_contrib_spark.dataprep import dedup

    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),
            (2, "the cat sat on the mat"),
            (3, "entirely different content here"),
        ],
        "doc_id long, text string",
    )
    df = dedup.ngram_jaccard_pairs(docs, ngram=2, threshold=0.5, max_df=10)
    analyzed = df._jdf.queryExecution().analyzed().toString()
    assert "hint" not in analyzed.lower(), "gram-DF join must not be hint-forced"
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        rebuilt = dedup.ngram_jaccard_pairs(docs, ngram=2, threshold=0.5, max_df=10)
        phys = rebuilt._jdf.queryExecution().executedPlan().toString()
        assert ("SortMergeJoin" in phys) or ("ShuffledHashJoin" in phys)
        pairs = {(r["id_a"], r["id_b"]): r["jaccard"] for r in rebuilt.collect()}
        assert pairs == {(1, 2): 1.0}
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_registry_wide_no_cartesian_products(spark):
    """Global plan gate: no registry query may contain a CartesianProduct,
    and BroadcastNestedLoopJoin is allowed ONLY in the two documented
    exact-path queries (brute-force ANN with a broadcast 10-row query
    side; the exact all-pairs cosine check that exists to oracle-verify
    the bucketed path). Everything else must be equality joins."""
    from opentelemetry_collector_contrib_spark.plans.queries import REGISTRY

    # text_stats_suite + dataset_split (via curate_corpus): ppl_bucket_hist
    # broadcasts the ONE-row tertile cutoffs frame across the corpus
    # (crossJoin of a 1-row aggregate) — a constant-size broadcast, the
    # correct scale shape
    bnlj_allowed = {
        "ann_cosine_topk",
        "dedup_embedding_cosine",
        "text_stats_suite",
        "dataset_split",
    }
    skip = {"streaming_windowed_counts"}  # executes a stream on build
    offenders = []
    for name, (fn, _sql) in REGISTRY.items():
        if name in skip:
            continue
        df = fn(spark, "/root/testdata/sf0.001")
        plan = df._jdf.queryExecution().executedPlan().toString()
        if "CartesianProduct" in plan:
            offenders.append((name, "CartesianProduct"))
        if "BroadcastNestedLoopJoin" in plan and name not in bnlj_allowed:
            offenders.append((name, "BroadcastNestedLoopJoin"))
    assert not offenders, offenders


def test_registry_wide_no_unpartitioned_window_over_corpus(spark):
    """Round-4 gate (VERDICT r3 #1): an unpartitioned window (NTILE / global
    row_number) shows up physically as `Exchange SinglePartition` — moving
    its whole input to ONE task. That is only acceptable when the input is
    a bounded-cardinality frame (a value histogram, a per-language count
    table, a B-row bucket frame), i.e. the subtree under the exchange is an
    aggregate (HashAggregate/ObjectHashAggregate/SortAggregate) or a
    literal LocalTableScan — never raw corpus rows. This is the gate that
    keeps the CCNet-NTILE scale-killer class of bug out of the registry."""
    from opentelemetry_collector_contrib_spark.plans.queries import REGISTRY

    import re as _re

    skip = {"streaming_windowed_counts"}  # executes a stream on build
    offenders = []
    for name, (fn, _sql) in REGISTRY.items():
        if name in skip:
            continue
        plan = fn(spark, "/root/testdata/sf0.001")._jdf.queryExecution().executedPlan().toString()
        for m in _re.finditer(r"Exchange SinglePartition", plan):
            subtree = plan[m.start() : m.start() + 4000]
            if not _re.search(
                r"HashAggregate|ObjectHashAggregate|SortAggregate|LocalTableScan",
                subtree,
            ):
                offenders.append((name, subtree.splitlines()[:4]))
    assert not offenders, offenders
