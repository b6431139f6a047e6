"""Regression tests for review-pass fixes: parser drop semantics, literal
delimiters, extract-on-match-only, partial-line content, salt spread."""

from __future__ import annotations

from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.operators import parsers, processors, transformers
from opentelemetry_collector_contrib_spark.operators.enrich import salted_repartition


def test_regex_parser_on_error_drop_actually_drops(spark):
    df = spark.createDataFrame(
        [("code=42",), ("garbage line",)], "body string"
    )
    out = parsers.regex_parser(df, r"code=(?P<code>\d+)", on_error="drop")
    rows = out.collect()
    assert len(rows) == 1 and rows[0]["attributes"] == {"code": "42"}
    # send mode keeps both; non-matching row has NULL attributes
    kept = parsers.regex_parser(df, r"code=(?P<code>\d+)", on_error="send")
    got = {r["body"]: r["attributes"] for r in kept.collect()}
    assert got["code=42"] == {"code": "42"} and got["garbage line"] is None


def test_regex_parser_send_does_not_clobber_existing_attrs(spark):
    df = spark.createDataFrame([("nope",)], "body string").withColumn(
        "attributes", F.create_map(F.lit("code"), F.lit("keep-me"))
    )
    out = parsers.regex_parser(df, r"code=(?P<code>\d+)", on_error="send")
    assert out.first()["attributes"] == {"code": "keep-me"}


def test_keyvalue_parser_regex_metachar_delimiters(spark):
    df = spark.createDataFrame([("a=1|b=2",)], "body string")
    out = parsers.keyvalue_parser(df, delimiter="=", pair_delimiter="|")
    assert out.first()["attributes"] == {"a": "1", "b": "2"}
    df2 = spark.createDataFrame([("x.1 y.2",)], "body string")
    out2 = parsers.keyvalue_parser(df2, delimiter=".", pair_delimiter=" ")
    assert out2.first()["attributes"] == {"x": "1", "y": "2"}


def test_attributes_extract_only_on_match(spark):
    df = spark.createDataFrame([(1,), (2,)], "id long").withColumn(
        "attributes",
        F.when(
            F.col("id") == 1, F.create_map(F.lit("msg"), F.lit("code=7"), F.lit("code"), F.lit("old"))
        ).otherwise(F.create_map(F.lit("msg"), F.lit("nope"), F.lit("code"), F.lit("old"))),
    )
    out = processors.attributes_processor(
        df, [processors.AttrAction("extract", "msg", pattern=r"code=(?P<code>\d+)")]
    )
    got = {r["id"]: r["attributes"]["code"] for r in out.collect()}
    assert got == {1: "7", 2: "old"}  # non-matching row keeps old value


def test_logdedup_exclude_fields_default_key(spark):
    df = spark.createDataFrame(
        [(1, "a", "x"), (2, "a", "y"), (3, "b", "x")],
        "ts long, body string, noise string",
    ).withColumn("ts", F.timestamp_seconds("ts"))
    out = processors.logdedup_processor(
        df, interval_seconds=3600, ts_col="ts", exclude_fields=["noise"]
    )
    got = {r["body"]: r["log_count"] for r in out.collect()}
    assert got == {"a": 2, "b": 1}  # 'noise' excluded from the dedup key


def test_partial_line_merge_uses_parsed_log(spark):
    df = spark.createDataFrame(
        [
            ("a", 1, "raw1", {"logtag": "P", "log": "foo"}),
            ("a", 2, "raw2", {"logtag": "F", "log": "bar"}),
        ],
        "source string, ingest_ts long, body string, attributes map<string,string>",
    )
    out = transformers.recombine_partial_lines(df)
    assert out.first()["body"] == "foobar"  # parsed content, not raw lines


def test_salted_repartition_key_is_first_column(spark):
    # key == first column used to degenerate to one salt value
    df = spark.range(1000).select(
        F.when(F.col("id") % 10 < 9, "hot").otherwise("cold").alias("source"),
        F.col("id"),
    )
    out = salted_repartition(df, "source", salt_buckets=8, num_partitions=8)
    parts = (
        out.withColumn("p", F.spark_partition_id())
        .filter(F.col("source") == "hot").select("p").distinct().count()
    )
    assert parts >= 4


def test_assign_keys_short_list_pads_null(spark):
    df = spark.createDataFrame([(["only"],)], "vals array<string>")
    out = transformers.assign_keys(df, "vals", ["a", "b"])
    m = out.first()["attributes"]
    assert m["a"] == "only" and m["b"] is None


# ---------------------------------------------------------------------------
# round-2 ADVICE fixes
# ---------------------------------------------------------------------------


def test_parse_records_pandas_without_fmt_column(spark):
    """Arrow null-int -> NaN broke auto-detect: every payload fell through
    to CONTAINERD_RX and returned {} (vparse.py fmt normalization)."""
    from opentelemetry_collector_contrib_spark.plans.pipeline import parse_records

    df = spark.createDataFrame(
        [
            ('{"a": 1, "ok": true}',),
            ("k=v x=2",),
            ('10.0.0.1 - bob [10/Oct/2025:13:55:36 +0000] "GET /p HTTP/1.1" 200 10',),
        ],
        "body string",
    )
    out = parse_records(df, impl="pandas")
    got = [r["attributes"] for r in out.collect()]
    assert got[0]["a"] == "1" and got[0]["ok"] == "true"
    assert got[1] == {"k": "v", "x": "2"}
    assert got[2]["method"] == "GET" and got[2]["status"] == "200"


def test_parse_pandas_json_value_parity_with_jvm(spark):
    """Booleans/nested objects stringify as JSON text ('true', compact
    object), matching the from_json map<string,string> path."""
    from opentelemetry_collector_contrib_spark.functions.vparse import _parse_one

    got = _parse_one('{"b": false, "o": {"k": 1}, "f": 1.5, "s": "x"}', 1)
    assert got == {"b": "false", "o": '{"k":1}', "f": "1.5", "s": "x"}


def test_salted_repartition_with_map_column(spark):
    """xxhash64 rejects MapType; log frames always carry attributes maps —
    salt must skip/convert them instead of raising DATATYPE_MISMATCH."""
    df = spark.createDataFrame(
        [(i, "hot") for i in range(200)], "id long, source string"
    ).withColumn("attributes", F.create_map(F.lit("k"), F.col("id").cast("string")))
    out = salted_repartition(df, "source", salt_buckets=8, num_partitions=8)
    assert out.count() == 200
    used = out.rdd.glom().map(len).filter(lambda n: n > 0).count()
    assert used >= 4  # hot key spread over several partitions


def test_spanmetrics_exponential_null_dim_groups_survive(spark):
    from opentelemetry_collector_contrib_spark.operators import connectors

    df = spark.createDataFrame(
        [(None, 4_000_000), (None, 8_000_000), ("svc", 4_000_000)],
        "service string, duration_ns long",
    )
    out = connectors.spanmetrics_exponential(df, dims=["service"], scale=1)
    rows = {(r["service"], r["bucket_index"]): r for r in out.collect()}
    null_rows = [k for k in rows if k[0] is None]
    assert null_rows, "NULL dim group was dropped by the totals join"
    assert rows[null_rows[0]]["calls"] == 2


def test_duplicate_clusters_raises_on_non_convergence(spark):
    import pytest as _pytest

    from opentelemetry_collector_contrib_spark.dataprep import dedup

    # a 6-node chain needs >1 round; max_iter=1 must fail loudly
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(6)], "id_a long, id_b long"
    )
    with _pytest.raises(RuntimeError, match="did not converge"):
        dedup.duplicate_clusters(pairs, max_iter=1)


# round-2 second review pass


def test_salted_repartition_map_of_maps(spark):
    df = spark.createDataFrame(
        [(i, "hot") for i in range(20)], "id long, source string"
    ).withColumn(
        "nested",
        F.create_map(
            F.lit("outer"), F.create_map(F.lit("k"), F.col("id").cast("string"))
        ),
    )
    from opentelemetry_collector_contrib_spark.operators.enrich import salted_repartition

    assert salted_repartition(df, "source", salt_buckets=4, num_partitions=4).count() == 20


def test_pack_sequences_null_tokens_do_not_drop_shard(spark):
    from opentelemetry_collector_contrib_spark.dataprep import packing

    docs = spark.createDataFrame(
        [(0, [1, 2, 3]), (3, None), (6, [4, 5]), (1, [7, 8])],
        "doc_id long, tokens array<int>",
    )
    out = packing.pack_sequences(docs, max_len=4, num_shards=3).collect()
    # shard 0 holds docs 0,3,6: the NULL doc must not erase tokens 1..5
    assert sum(r["n_tok"] for r in out) == 7


def test_exponential_zero_count_only_on_null_index_row(spark):
    from opentelemetry_collector_contrib_spark.operators import processors as P

    df = spark.createDataFrame(
        [("m", 5, 10, None), ("m", None, 0, 7)],
        "dim string, bucket_index int, bucket_count long, zero_count long",
    )
    out = P.exponential_to_explicit_histogram(
        df, [0.0, 100.0], dims=["dim"], scale=0
    ).first()
    assert out["bucket_counts"][0] == 17  # 10 (bucket) + 7 (zero), never lost


# round-3 advisor findings


def test_token_span_duplication_short_docs_no_crash(spark):
    from opentelemetry_collector_contrib_spark.dataprep.packing import (
        token_span_duplication,
    )

    docs = spark.createDataFrame(
        [(1, [1, 2, 3, 4, 5]), (2, list(range(100, 120))), (3, list(range(100, 120)))],
        "doc_id long, tokens array<int>",
    )
    out = {r["doc_id"]: r for r in token_span_duplication(docs, span_len=16).collect()}
    assert out[1]["dup_spans"] == 0 and out[1]["span_fraction"] == 0.0
    assert out[2]["dup_spans"] == 5 and out[3]["dup_spans"] == 5


def test_simhash_high_bits_vary(spark):
    from opentelemetry_collector_contrib_spark.dataprep import dedup

    docs = spark.createDataFrame(
        [(i, f"word{i} alpha{i} beta{i} gamma{i} delta{i}") for i in range(40)],
        "doc_id long, text string",
    )
    fps = [r["fp"] for r in docs.select(
        dedup.simhash(F.col("text"), 60).alias("fp")).collect()]
    # the round-2 bug: a 32-bit word hash froze every fingerprint bit >= 32
    high_or = 0
    for fp in fps:
        high_or |= fp >> 32
    assert high_or != 0, "fingerprint bits >= 32 never vary"
    import pytest as _pytest

    with _pytest.raises(ValueError):
        docs.select(dedup.simhash(F.col("text"), 61))


def test_tail_sampling_drop_only_policies_raise(spark):
    import pytest as _pytest

    from opentelemetry_collector_contrib_spark.operators import processors as P

    df = spark.createDataFrame(
        [("t1", "error"), ("t2", "ok")], "trace_id string, status string"
    )
    with _pytest.raises(ValueError, match="non-drop"):
        P.tail_sampling_policies(
            df,
            [P.TailPolicy(name="noise", kind="drop", subpolicies=[
                P.TailPolicy(name="s", kind="agg",
                             cond=F.max(F.col("status") == "ok"))])],
        )


def test_rfc5424_structured_data_escaped_quotes(spark):
    from opentelemetry_collector_contrib_spark.operators import parsers

    line = (
        '<165>1 2024-01-02T03:04:05Z host app 123 ID47 '
        '[ex@32473 msg="say \\"hi\\" now" x="1"] body text'
    )
    df = spark.createDataFrame([(line,)], "body string")
    out = parsers.syslog_parser(df).first()
    attrs = out["attributes"]
    assert attrs["structured_data.ex@32473.msg"] == 'say "hi" now'
    assert attrs["structured_data.ex@32473.x"] == "1"
