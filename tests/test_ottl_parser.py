"""OTTL statement-string parser: reference statement syntax -> Column
pipelines. Statements drawn from the transformprocessor README and the
e2e corpus."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.functions.ottl_parser import (
    apply_statements,
    parse_condition,
    parse_statement,
)


@pytest.fixture(scope="module")
def record(spark):
    return spark.createDataFrame(
        [("operationA", 17, "err-1"), ("operationB", 9, "ok-2")],
        "body string, severity_number int, tag string",
    ).withColumn(
        "attributes",
        F.create_map(
            F.lit("http.method"), F.lit("get"),
            F.lit("http.path"), F.lit("/health"),
            F.lit("secret"), F.lit("hunter2"),
        ),
    )


def _attrs(df, body="operationA"):
    return df.filter(F.col("body") == body).first()["attributes"]


def test_set_literal_and_where(record):
    out = parse_statement(
        'set(attributes["env"], "prod") where severity_number >= 17'
    ).apply(record)
    assert _attrs(out)["env"] == "prod"
    assert "env" not in _attrs(out, "operationB")


def test_set_from_path_and_converter(record):
    out = parse_statement('set(attributes["b"], ToUpperCase(body))').apply(record)
    assert _attrs(out)["b"] == "OPERATIONA"
    out2 = parse_statement('set(attributes["h"], SHA256(attributes["secret"]))').apply(record)
    assert _attrs(out2)["h"].startswith("f52fbd32")  # sha256("hunter2")


def test_delete_and_keep(record):
    out = parse_statement('delete_key(attributes, "secret")').apply(record)
    assert "secret" not in _attrs(out)
    out2 = parse_statement('delete_matching_keys(attributes, "^http")').apply(record)
    assert set(_attrs(out2)) == {"secret"}
    out3 = parse_statement('keep_matching_keys(attributes, "^http")').apply(record)
    assert set(_attrs(out3)) == {"http.method", "http.path"}
    out4 = parse_statement('keep_keys(attributes, ["http.method"])').apply(record)
    assert set(_attrs(out4)) == {"http.method"}


def test_truncate_and_replace(record):
    out = parse_statement("truncate_all(attributes, 3)").apply(record)
    assert _attrs(out)["secret"] == "hun"
    out2 = parse_statement(
        'replace_pattern(attributes["http.path"], "hea.*", "x")'
    ).apply(record)
    assert _attrs(out2)["http.path"] == "/x"
    out3 = parse_statement(
        'replace_all_patterns(attributes, "value", "/", "@")'
    ).apply(record)
    assert _attrs(out3)["http.path"] == "@health"


def test_statement_sequence_order(record):
    out = apply_statements(
        record,
        [
            'set(attributes["a"], "1")',
            'set(attributes["b"], attributes["a"])',  # sees the previous edit
            'delete_key(attributes, "a")',
        ],
    )
    m = _attrs(out)
    assert m["b"] == "1" and "a" not in m


def test_conditions_for_filter_and_routing(record):
    drop = parse_condition('severity_number >= 17 and IsMatch(body, "^operation")')
    kept = record.filter(~drop)
    assert [r["body"] for r in kept.collect()] == ["operationB"]

    route = parse_condition('attributes["http.method"] == "get" or severity_number > 20')
    assert record.filter(route).count() == 2

    math = parse_condition("severity_number * 2 + 1 == 35")
    assert record.filter(math).count() == 1


def test_set_top_level_column(record):
    out = parse_statement('set(severity_text, "ERROR") where severity_number == 17').apply(
        record.withColumn("severity_text", F.lit(""))
    )
    got = {r["body"]: r["severity_text"] for r in out.collect()}
    assert got == {"operationA": "ERROR", "operationB": ""}


def test_concat_list_form(record):
    out = parse_statement(
        'set(attributes["c"], Concat([body, attributes["http.method"]], "-"))'
    ).apply(record)
    assert _attrs(out)["c"] == "operationA-get"
    # dynamic (Column-valued) patterns aren't supported — regexes must be
    # literals so they compile at plan time; the error is raised eagerly
    with pytest.raises(ValueError, match="string literal"):
        parse_statement(
            'keep_matching_keys(attributes, Concat(["^", "http"], ""))'
        ).apply(record)


def test_review_fixes(record, spark):
    # trailing garbage (misspelled where) is an error, not a silent
    # unconditional edit
    with pytest.raises(ValueError):
        parse_statement('set(attributes["env"], "prod") wher severity_number >= 17')
    # 'where' inside a string literal is not a clause boundary
    out = parse_statement('set(attributes["m"], "where did it fail")').apply(record)
    assert _attrs(out)["m"] == "where did it fail"
    # operator precedence: * binds tighter than +
    assert record.filter(parse_condition("1 + 2 * 3 == 7")).count() == 2
    assert record.filter(parse_condition("1 + 2 * 3 == 9")).count() == 0
    # parenthesized arithmetic at the head of a comparison
    assert record.filter(
        parse_condition("(severity_number + 1) * 2 == 36")
    ).count() == 1
    # non-ASCII string literals survive unescaping
    out2 = parse_statement('set(attributes["u"], "café \\"x\\"")').apply(record)
    assert _attrs(out2)["u"] == 'café "x"'
    # append editor wired to ottl.append_list
    df = spark.createDataFrame([(["a"],)], "tags array<string>")
    out3 = parse_statement('append(tags, "b")').apply(df)
    assert out3.first()["tags"] == ["a", "b"]


def test_minhash_band_divisibility(spark):
    from opentelemetry_collector_contrib_spark.dataprep import dedup as D

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError, match="divisible"):
        D.minhash_lsh_pairs(df, num_hashes=16, bands=3)


# round-3 converter additions


def test_duration_family(spark):
    from opentelemetry_collector_contrib_spark.functions import ottl

    df = spark.createDataFrame(
        [("1h30m",), ("300ms",), ("-1.5h",), ("2h45m30s",), ("1.5s",),
         ("0",), ("10",), ("garbage",), ("1h2xm",)],
        "d string",
    )
    out = {r["d"]: r for r in df.select(
        "d",
        ottl.duration_(F.col("d")).alias("ns"),
        ottl.hours_(ottl.duration_(F.col("d"))).alias("h"),
        ottl.milliseconds_(ottl.duration_(F.col("d"))).alias("ms"),
        ottl.seconds_(ottl.duration_(F.col("d"))).alias("s"),
    ).collect()}
    assert out["1h30m"]["ns"] == 5_400_000_000_000
    assert out["1h30m"]["h"] == 1.5
    assert out["300ms"]["ns"] == 300_000_000 and out["300ms"]["ms"] == 300
    assert out["-1.5h"]["ns"] == -5_400_000_000_000
    assert out["2h45m30s"]["ns"] == 9_930_000_000_000
    assert out["1.5s"]["s"] == 1.5
    assert out["0"]["ns"] == 0
    # Go time.ParseDuration: missing unit / garbage are errors -> NULL
    assert out["10"]["ns"] is None
    assert out["garbage"]["ns"] is None
    assert out["1h2xm"]["ns"] is None


def test_parse_int_bases(spark):
    from opentelemetry_collector_contrib_spark.functions import ottl

    df = spark.createDataFrame(
        [("ff",), ("-ff",), ("0x1A",), ("777",), ("101",), ("12",)], "s string"
    )
    got = df.select(
        ottl.parse_int(F.col("s"), 16).alias("h"),
        ottl.parse_int(F.col("s"), 10).alias("d"),
        ottl.parse_int(F.col("s"), 0).alias("auto"),
    ).collect()
    by = {r["h"]: r for r in got}
    vals16 = [r["h"] for r in got]
    assert vals16[0] == 255 and vals16[1] == -255
    assert got[3]["d"] == 777 and got[3]["auto"] == 777  # no leading 0 -> decimal
    del by


def test_parse_int_base0_prefixes(spark):
    from opentelemetry_collector_contrib_spark.functions import ottl

    df = spark.createDataFrame(
        [("0x1A",), ("0b101",), ("0o17",), ("017",), ("42",), ("0",)], "s string"
    )
    got = [r["v"] for r in df.select(ottl.parse_int(F.col("s"), 0).alias("v")).collect()]
    assert got == [26, 5, 15, 15, 42, 0]


def test_grammar_new_converters_end_to_end(spark):
    from opentelemetry_collector_contrib_spark.functions.ottl_parser import (
        apply_statements,
        parse_condition,
    )

    df = spark.createDataFrame(
        [("sess", "1h30m", "HelloWorld", "Hello World",
          {"k": "v"}, [1, 2])],
        "body string, dur string, camel string, text string, "
        "attributes map<string,string>, arr array<int>",
    )
    out = apply_statements(df, [
        'set(attributes["h"], String(Hours(Duration(dur))))',
        'set(attributes["snake"], ConvertCase(camel, "snake"))',
        'set(attributes["pi"], String(ParseInt("0x1A", 0)))',
        'set(attributes["m3"], Murmur3Hash(text))',
        'set(attributes["m3128"], Murmur3Hash128(text))',
        'set(attributes["sid"], SpanID("AABBCCDD11223344"))',
    ]).first()
    a = out["attributes"]
    assert a["h"] == "1.5"
    assert a["snake"] == "hello_world"
    assert a["pi"] == "26"
    # reference vectors: func_murmur3_hash_test.go / _hash128_test.go
    assert a["m3"] == "ce837619"
    assert a["m3128"] == "dbc2a0c1ab26631a27b4c09fcf1fe683"
    assert a["sid"] == "aabbccdd11223344"
    # boolean type predicates fold statically in the typed model
    cond_rows = df.filter(parse_condition("IsMap(attributes) and IsList(arr)")).count()
    assert cond_rows == 1
    assert df.filter(parse_condition("IsInt(body)")).count() == 0


def test_grammar_extract_grok_patterns(spark):
    from opentelemetry_collector_contrib_spark.functions.ottl_parser import (
        apply_statements,
    )

    df = spark.createDataFrame(
        [("user=alice code=503",)], "body string"
    ).withColumn("attributes", F.create_map().cast("map<string,string>"))
    out = apply_statements(df, [
        'set(attributes, ExtractGrokPatterns(body, '
        '"user=%{USERNAME:user} code=%{NUMBER:code}"))',
    ])
    # set(map_col, map_value) replaces the whole map
    row = out.first()
    assert row["attributes"]["user"] == "alice"
    assert row["attributes"]["code"] == "503"


def test_registry_diff_closers(spark):
    """Index / Nanosecond / Unix converters + replace_match /
    replace_all_matches / flatten editors."""
    from opentelemetry_collector_contrib_spark.functions.ottl_parser import (
        apply_statements,
    )

    df = spark.createDataFrame(
        [("hello world", {"u": "http://x/y", "j": '{"a":"1","b":"2"}', "p": "keep"})],
        "body string, attributes map<string,string>",
    )
    out = apply_statements(df, [
        'set(attributes["idx"], String(Index(body, "world")))',
        'set(attributes["ts"], String(UnixSeconds(Unix(1700000000))))',
        'set(attributes["nano"], String(Nanosecond(Unix(1700000000, 123456000))))',
        'replace_match(attributes["u"], "http://*", "<url>")',
        'replace_all_matches(attributes, "value", "<v>")',
        'flatten(attributes)',
    ]).first()
    a = out["attributes"]
    assert a["idx"] == "6"
    assert a["ts"] == "1700000000"
    assert a["nano"] == "123456000"
    assert a["u"] == "<url>"
    # flatten promoted the JSON-object value into dotted keys
    assert a["j.a"] == "1" and a["j.b"] == "2" and "j" not in a
    assert a["p"] == "keep"


def test_xxh3_converters_end_to_end(spark):
    """XXH3/XXH128 through the grammar match the reference's e2e
    statements (pkg/ottl/e2e/e2e_test.go:1375,1381 and the unit vectors
    in func_xxh3_test.go / func_xxh128_test.go)."""
    from opentelemetry_collector_contrib_spark.functions.ottl_parser import (
        apply_statements,
    )

    df = spark.createDataFrame(
        [("hello world", {}), ("", {})],
        "body string, attributes map<string,string>",
    )
    out = {
        r["body"]: r["attributes"]
        for r in apply_statements(df, [
            'set(attributes["x3"], XXH3(body))',
            'set(attributes["x128"], XXH128(body))',
        ]).collect()
    }
    assert out["hello world"]["x3"] == "d447b1ea40e6988b"
    assert out["hello world"]["x128"] == "df8d09e93f874900a99b8775cc15b6c7"
    assert out[""]["x3"] == "2d06800538d394c2"
    assert out[""]["x128"] == "99aa06d3014798d86001c324468d497f"


def test_parser_robustness_fuzz(spark):
    """Arbitrary statement-ish input must either parse or raise ValueError
    — never hang, blow the stack, or leak another exception type (the
    config compiler surfaces ValueError as a config error; anything else
    would kill the job). 300-example slice of the 3000-example sweep run
    in round 4 (zero escapes)."""
    from hypothesis import given, settings, strategies as st

    from opentelemetry_collector_contrib_spark.functions.ottl_parser import (
        parse_statement,
    )

    alphabet = (
        'set(delete_keys attributes body cache ["k"] , . == != and or not '
        "where true false nil 0 1.5 \"s\" 'x' ( ) - + Int Concat %{} \\ \n\té"
    )

    @given(st.text(alphabet=alphabet, max_size=60))
    @settings(max_examples=300, deadline=None)
    def fuzz(src):
        try:
            parse_statement(src)
        except ValueError:
            pass

    fuzz()
