"""OTTL e2e parity corpus — mirrors /root/reference/pkg/ottl/e2e/e2e_test.go
(the reference's closest analog to a SQL logic-test suite). Same input
record shape, same statements re-expressed through our column-function
library, asserting the reference's documented results.

Input record (e2e_test.go constructTransformContext): body "operationA",
attributes {http.method: get, http.path: /health,
http.url: http://localhost/health, flags: A|B|C, total.string: 123456789}.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.functions import ottl


@pytest.fixture(scope="module")
def record(spark):
    return spark.createDataFrame(
        [("operationA",)], "body string"
    ).withColumn(
        "attributes",
        F.create_map(
            F.lit("http.method"), F.lit("get"),
            F.lit("http.path"), F.lit("/health"),
            F.lit("http.url"), F.lit("http://localhost/health"),
            F.lit("flags"), F.lit("A|B|C"),
            F.lit("total.string"), F.lit("123456789"),
        ),
    )


def _attrs(df):
    return df.first()["attributes"]


def one(df, col, name="v"):
    return df.select(col.alias(name)).first()[name]


# --- editors (Test_e2e_editors) -------------------------------------------


def test_delete_key(record):
    out = record.withColumn("attributes", ottl.delete_key(F.col("attributes"), "http.method"))
    m = _attrs(out)
    assert "http.method" not in m and "http.path" in m


def test_delete_matching_keys(record):
    out = record.withColumn("attributes", ottl.delete_matching_keys(F.col("attributes"), "^http"))
    assert set(_attrs(out)) == {"flags", "total.string"}


def test_keep_matching_keys(record):
    out = record.withColumn("attributes", ottl.keep_matching_keys(F.col("attributes"), "^http"))
    assert set(_attrs(out)) == {"http.method", "http.path", "http.url"}


def test_keep_keys(record):
    out = record.withColumn("attributes", ottl.keep_keys(F.col("attributes"), ["flags"]))
    assert _attrs(out) == {"flags": "A|B|C"}


def test_limit(record):
    out = record.withColumn("attributes", ottl.limit_map(F.col("attributes"), 100))
    assert len(_attrs(out)) == 5
    out1 = record.withColumn(
        "attributes", ottl.limit_map(F.col("attributes"), 1, priority_keys=["http.method"])
    )
    assert _attrs(out1) == {"http.method": "get"}


def test_replace_all_matches(record):
    out = record.withColumn(
        "attributes", ottl.replace_all_matches(F.col("attributes"), "/health*", "/path")
    )
    m = _attrs(out)
    assert m["http.path"] == "/path" and m["http.method"] == "get"


def test_replace_all_patterns(record):
    out = record.withColumn(
        "attributes", ottl.replace_all_patterns(F.col("attributes"), "/", "@")
    )
    m = _attrs(out)
    assert m["http.path"] == "@health" and m["http.url"] == "http:@@localhost@health"


def test_set_and_set_where(record):
    # set(attributes["test"], "pass")
    out = record.withColumn("attributes", ottl.set_key(F.col("attributes"), "test", F.lit("pass")))
    assert _attrs(out)["test"] == "pass"
    # where body == "operationB" -> no-op
    cond = F.col("body") == "operationB"
    out2 = record.withColumn(
        "attributes",
        F.when(cond, ottl.set_key(F.col("attributes"), "test", F.lit("pass"))).otherwise(F.col("attributes")),
    )
    assert "test" not in _attrs(out2)


def test_truncate_all(record):
    out = record.withColumn("attributes", ottl.truncate_all(F.col("attributes"), 1))
    m = _attrs(out)
    assert m["http.method"] == "g" and m["flags"] == "A"


# --- converters (Test_e2e_converters) -------------------------------------


def test_string_converters(record, spark):
    a = F.element_at(F.col("attributes"), "http.method")
    assert one(record, ottl.concat_("-", a, F.lit("test"))) == "get-test"
    assert one(record, F.split(F.element_at(F.col("attributes"), "flags"), r"\|")) == ["A", "B", "C"]
    assert one(record, F.substring(F.col("body"), 1, 9)) == "operation"
    assert one(record, ottl.to_upper_case(a)) == "GET"
    assert one(record, ottl.to_snake_case(F.lit("SimpleString"))) == "simple_string"
    assert one(record, ottl.to_camel_case(F.lit("simple_string"))) == "SimpleString"
    assert one(record, ottl.trim_(F.lit(" this is a test "))) == "this is a test"
    assert one(record, ottl.trim_prefix(F.lit("testString"), "test")) == "String"
    assert one(record, ottl.trim_suffix(F.lit("testString"), "String")) == "test"
    assert one(record, ottl.has_prefix(F.col("body"), "operation")) is True
    assert one(record, ottl.is_match(F.col("body"), "^operation")) is True
    assert one(record, ottl.len_(F.col("body"))) == 10
    assert one(record, F.format_string("%s: %d", F.lit("test"), F.lit(1))) == "test: 1"


def test_hash_converters(record):
    # reference vectors from e2e_test.go converter cases
    assert one(record, ottl.sha256_(F.lit("pass"))) == (
        "d74ff0ee8da3b9806b18c877dbf29bbde50b5bd8e4dad7a3a725000feb82e8f1"
    )
    assert one(record, F.md5(F.lit("pass"))) == "1a1dc91c907325c69271ddf0c944bc72"
    assert one(record, F.sha1(F.lit("pass"))) == "9d4e1e23bd5b727046a9e3b4b7db57bd8d6ee684"


def test_parse_converters(record):
    assert one(record, ottl.parse_json_(F.lit('{"id":1}'))) == {"id": "1"}
    kv = one(record, ottl.parse_key_value(F.lit("k1=v1 k2=v2")))
    assert kv == {"k1": "v1", "k2": "v2"}
    csv = one(record, ottl.parse_csv_(F.lit("val1,val2"), ["col1", "col2"]))
    assert csv == {"col1": "val1", "col2": "val2"}
    ex = one(record, ottl.extract_patterns(F.element_at(F.col("attributes"), "http.url"), r"^(?P<scheme>\w+)://"))
    assert ex == {"scheme": "http"}
    url = one(record, ottl.url_(F.element_at(F.col("attributes"), "http.url")))
    assert url["url.scheme"] == "http" and url["url.domain"] == "localhost"
    assert url["url.path"] == "/health"


def test_type_converters(record):
    total = F.element_at(F.col("attributes"), "total.string")
    assert one(record, ottl.int_(total)) == 123456789
    assert one(record, ottl.double_(total)) == 123456789.0
    assert one(record, ottl.string_(F.lit(1.5))) == "1.5"
    assert one(record, ottl.contains_value(F.split(F.element_at(F.col("attributes"), "flags"), r"\|"), "B")) is True


def test_time_converters(record):
    t = ottl.time_(F.lit("2023-04-12"), "%Y-%m-%d")
    assert one(record, ottl.format_time(t, "%Y-%m-%d")) == "2023-04-12"
    assert one(record, F.year(t)) == 2023
    assert one(record, ottl.unix_seconds(ottl.time_(F.lit("1970-01-01 00:01:40"), "%Y-%m-%d %H:%M:%S"))) == 100
    assert one(record, ottl.truncate_time(t, "month").cast("date").cast("string")) == "2023-04-01"


def test_id_converters(record):
    assert one(record, ottl.trace_id_hex(F.unhex(F.lit("0102030405060708090a0b0c0d0e0f10")))) == (
        "0102030405060708090a0b0c0d0e0f10"
    )
    assert one(record, ottl.is_root_span(F.lit("0000000000000000"))) is True
    assert one(record, ottl.is_root_span(F.lit("0102030405060708"))) is False


def test_to_key_value_string(record):
    s = one(record, ottl.to_key_value_string(F.col("attributes")))
    assert s == (
        "flags=A|B|C http.method=get http.path=/health "
        "http.url=http://localhost/health total.string=123456789"
    )
