"""countconnector golden-corpus parity: run OUR count semantics against
the reference's own testdata (connector/countconnector/testdata/logs/
input.yaml) and assert the exact per-resource, per-attribute counts from
its expected-output YAMLs (connector_test.go:540-640 configs)."""

from __future__ import annotations

import os

import pytest
import yaml
from pyspark.sql import functions as F

TESTDATA = "/root/reference/connector/countconnector/testdata/logs"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(TESTDATA), reason="reference testdata not available"
)


def _attr_map(attr_list):
    return {a["key"]: a["value"]["stringValue"] for a in (attr_list or [])}


def _load_input(spark):
    with open(f"{TESTDATA}/input.yaml") as f:
        doc = yaml.safe_load(f)
    rows = []
    for rl in doc["resourceLogs"]:
        res = _attr_map(rl.get("resource", {}).get("attributes"))
        for sl in rl["scopeLogs"]:
            for lr in sl["logRecords"]:
                rows.append((res, _attr_map(lr.get("attributes")), lr["body"]["stringValue"]))
    return spark.createDataFrame(
        rows,
        "resource_attributes map<string,string>, attributes map<string,string>, body string",
    )


def _expected(case: str, metric: str):
    """(frozenset(resource attrs), frozenset(dp attrs)) -> count."""
    with open(f"{TESTDATA}/{case}.yaml") as f:
        doc = yaml.safe_load(f)
    out = {}
    for rm in doc["resourceMetrics"]:
        res = frozenset(_attr_map(rm.get("resource", {}).get("attributes")).items())
        for sm in rm["scopeMetrics"]:
            for m in sm["metrics"]:
                if m["name"] != metric:
                    continue
                for dp in m["sum"]["dataPoints"]:
                    dp_attrs = frozenset(_attr_map(dp.get("attributes")).items())
                    out[(res, dp_attrs)] = int(dp["asInt"])
    return out


def _got(df, dp_attr_cols: list[str]):
    rows = df.collect()
    out = {}
    for r in rows:
        res = frozenset((r["resource_attributes"] or {}).items())
        dp = frozenset((k, r[k.replace(".", "_")]) for k in dp_attr_cols)
        out[(res, dp)] = r["n"]
    return out


def test_one_condition(spark):
    # Config: count.if where resource.attributes["resource.optional"] != nil
    logs = _load_input(spark)
    got_df = (
        logs.filter(F.element_at("resource_attributes", "resource.optional").isNotNull())
        .groupBy("resource_attributes")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert _got(got_df, []) == _expected("one_condition", "count.if")


def test_one_attribute(spark):
    # Config: log.count.by_attr grouped by log.required (absent -> dropped)
    logs = _load_input(spark)
    got_df = (
        logs.withColumn("log_required", F.element_at("attributes", "log.required"))
        .filter(F.col("log_required").isNotNull())
        .groupBy("resource_attributes", "log_required")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert _got(got_df, ["log.required"]) == _expected("one_attribute", "log.count.by_attr")


def test_multiple_attributes(spark):
    logs = _load_input(spark)
    got_df = (
        logs.withColumn("log_required", F.element_at("attributes", "log.required"))
        .withColumn("log_optional", F.element_at("attributes", "log.optional"))
        .filter(F.col("log_required").isNotNull() & F.col("log_optional").isNotNull())
        .groupBy("resource_attributes", "log_required", "log_optional")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert _got(got_df, ["log.required", "log.optional"]) == _expected(
        "multiple_attributes", "log.count.by_attr"
    )


def test_default_attribute_value(spark):
    # log.optional missing -> DefaultValue "other" (README default handling)
    logs = _load_input(spark)
    got_df = (
        logs.withColumn("log_required", F.element_at("attributes", "log.required"))
        .withColumn(
            "log_optional",
            F.coalesce(F.element_at("attributes", "log.optional"), F.lit("other")),
        )
        .filter(F.col("log_required").isNotNull())
        .groupBy("resource_attributes", "log_required", "log_optional")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert _got(got_df, ["log.required", "log.optional"]) == _expected(
        "default_attribute_value", "log.count.by_attr"
    )


# --- sumconnector golden parity (sumconnector/testdata/logs) ---------------

SUM_TESTDATA = "/root/reference/connector/sumconnector/testdata/logs"


def _attr_map_typed(attr_list):
    out = {}
    for a in attr_list or []:
        v = a["value"]
        out[a["key"]] = str(
            v.get("stringValue", v.get("doubleValue", v.get("intValue", "")))
        )
    return out


def _load_sum_input(spark):
    with open(f"{SUM_TESTDATA}/input.yaml") as f:
        doc = yaml.safe_load(f)
    rows = []
    for rl in doc["resourceLogs"]:
        res = _attr_map_typed(rl.get("resource", {}).get("attributes"))
        for sl in rl["scopeLogs"]:
            for lr in sl["logRecords"]:
                rows.append((res, _attr_map_typed(lr.get("attributes"))))
    return spark.createDataFrame(
        rows, "resource_attributes map<string,string>, attributes map<string,string>"
    )


def _expected_sums(case: str, metric: str):
    with open(f"{SUM_TESTDATA}/{case}.yaml") as f:
        doc = yaml.safe_load(f)
    out = {}
    for rm in doc["resourceMetrics"]:
        res = frozenset(_attr_map_typed(rm.get("resource", {}).get("attributes")).items())
        for sm in rm["scopeMetrics"]:
            for m in sm["metrics"]:
                if m["name"] != metric:
                    continue
                for dp in m["sum"]["dataPoints"]:
                    dp_attrs = frozenset(_attr_map_typed(dp.get("attributes")).items())
                    out[(res, dp_attrs)] = round(float(dp["asDouble"]), 6)
    return out


def test_sum_one_condition(spark):
    # sum.if: SourceAttribute beep, where resource.optional != nil;
    # non-numeric beep values are skipped (try_cast -> null)
    logs = _load_sum_input(spark)
    got_df = (
        logs.filter(F.element_at("resource_attributes", "resource.optional").isNotNull())
        .groupBy("resource_attributes")
        .agg(F.round(F.sum(F.element_at("attributes", "beep").try_cast("double")), 6).alias("n"))
    )
    got = {
        (frozenset(r["resource_attributes"].items()), frozenset()): r["n"]
        for r in got_df.collect()
    }
    assert got == _expected_sums("one_condition", "sum.if")


def test_sum_one_attribute(spark):
    logs = _load_sum_input(spark)
    got_df = (
        logs.withColumn("log_required", F.element_at("attributes", "log.required"))
        .filter(F.col("log_required").isNotNull())
        .groupBy("resource_attributes", "log_required")
        .agg(F.round(F.sum(F.element_at("attributes", "beep").try_cast("double")), 6).alias("n"))
        .filter(F.col("n").isNotNull())
    )
    got = {
        (
            frozenset(r["resource_attributes"].items()),
            frozenset({("log.required", r["log_required"])}),
        ): r["n"]
        for r in got_df.collect()
    }
    assert got == _expected_sums("one_attribute", "log.sum.by_attr")
