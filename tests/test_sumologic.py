"""sumologicprocessor sub-processor semantics on hand-built maps
(reference: /root/reference/processor/sumologicprocessor/*_test.go shapes)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.operators import sumologic as S


def _one_map(spark, d):
    return spark.createDataFrame([(d,)], "attributes map<string,string>")


def test_add_cloud_namespace(spark):
    got = _one_map(spark, {"cloud.platform": "aws_ec2"}).select(
        S.add_cloud_namespace(F.col("attributes")).alias("m")
    ).first()["m"]
    assert got["cloud.namespace"] == "aws/ec2"
    # unsupported platform and missing platform: untouched
    for d in ({"cloud.platform": "gcp_compute_engine"}, {"x": "1"}):
        got = _one_map(spark, d).select(
            S.add_cloud_namespace(F.col("attributes")).alias("m")
        ).first()["m"]
        assert "cloud.namespace" not in got


def test_translate_attributes_rename_and_no_overwrite(spark):
    got = _one_map(spark, {
        "cloud.account.id": "42", "host.name": "h1", "unrelated": "x",
    }).select(S.translate_attributes(F.col("attributes")).alias("m")).first()["m"]
    assert got == {"AccountId": "42", "host": "h1", "unrelated": "x"}
    # target already present in the input -> original key kept (Go:92-103)
    got = _one_map(spark, {"cloud.region": "eu", "Region": "us"}).select(
        S.translate_attributes(F.col("attributes")).alias("m")
    ).first()["m"]
    assert got == {"cloud.region": "eu", "Region": "us"}
    # two sources colliding on one target: the first entry in the map's
    # own order wins the rename, the other keeps its original key (the
    # Go code is equally insertion-order-dependent); no value is lost
    got = _one_map(spark, {"host.name": "a", "k8s.pod.hostname": "b"}).select(
        S.translate_attributes(F.col("attributes")).alias("m")
    ).first()["m"]
    assert len(got) == 2 and "host" in got
    assert sorted(got.values()) == ["a", "b"]
    assert set(got) in ({"host", "k8s.pod.hostname"}, {"host", "host.name"})


def test_translate_docker_metrics(spark):
    df = spark.createDataFrame(
        [("container.cpu.percent", {"container.id": "abc"}),
         ("other.metric", {"keep": "1"})],
        "metric string, attributes map<string,string>",
    )
    out = {r["metric"]: r for r in S.translate_docker_metrics(df).collect()}
    assert "cpu_percentage" in out and out["cpu_percentage"]["attributes"] == {
        "container.FullID": "abc"
    }
    assert out["other.metric"]["attributes"] == {"keep": "1"}


def test_nest_attributes(spark):
    got = _one_map(spark, {
        "kubernetes.container.name": "c", "kubernetes.host": "h", "flat": "v",
    }).select(S.nest_attributes(F.col("attributes")).alias("j")).first()["j"]
    assert json.loads(got) == {
        "kubernetes": {"container": {"name": "c"}, "host": "h"}, "flat": "v",
    }
    # non-map collision: scalar moves under ''
    got = _one_map(spark, {"a": "1", "a.b": "2"}).select(
        S.nest_attributes(F.col("attributes")).alias("j")
    ).first()["j"]
    assert json.loads(got) == {"a": {"": "1", "b": "2"}}
    # include/exclude
    got = _one_map(spark, {"a.b": "1", "c.d": "2"}).select(
        S.nest_attributes(F.col("attributes"), include=["a"]).alias("j")
    ).first()["j"]
    assert json.loads(got) == {"a": {"b": "1"}, "c.d": "2"}


def test_aggregate_attributes(spark):
    got = _one_map(spark, {
        "pod_a": "x", "pod_b": "y", "other": "z",
    }).select(
        S.aggregate_attributes(F.col("attributes"), [("pods", ["pod_"])]).alias("m")
    ).first()["m"]
    assert set(got) == {"pods", "other"}
    assert json.loads(got["pods"]) == {"a": "x", "b": "y"}


def test_log_fields_conversion_and_severity_names(spark):
    df = spark.createDataFrame(
        [(17, "ERR", "AABB11", {"k": "v"}), (9, None, None, {})],
        "severity_number int, severity_text string, span_id string, "
        "attributes map<string,string>",
    )
    out = S.log_fields_conversion(df).collect()
    m0, m1 = out[0]["attributes"], out[1]["attributes"]
    assert m0["loglevel"] == "ERROR" and m0["severitytext"] == "ERR"
    assert m0["spanid"] == "aabb11" and m0["k"] == "v"
    assert m1["loglevel"] == "INFO" and m1["severitytext"] == "" and m1["spanid"] == ""
    names = spark.createDataFrame(
        [(i,) for i in [0, 1, 4, 8, 12, 16, 20, 24, 99]], "n int"
    ).select(S.severity_name(F.col("n")).alias("s")).collect()
    assert [r["s"] for r in names] == [
        "UNSPECIFIED", "TRACE", "TRACE4", "DEBUG4", "INFO4", "WARN4",
        "ERROR4", "FATAL4", "UNSPECIFIED",
    ]


def test_composed_processor_order(spark):
    df = _one_map(spark, {
        "cloud.platform": "aws_ecs", "k8s.pod.name": "p1",
    })
    out = S.sumologic_processor(df).first()["attributes"]
    # cloud.namespace added BEFORE translation; cloud.platform then
    # renamed to aws_service (reference order)
    assert out["cloud.namespace"] == "ecs"
    assert out["aws_service"] == "aws_ecs"
    assert out["pod"] == "p1"
    assert "cloud.platform" not in out
