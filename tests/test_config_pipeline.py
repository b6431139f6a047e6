"""Config-driven pipeline: collector-style YAML -> one Spark plan."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.plans.config import build_pipeline, routed_counts

YAML_CONFIG = """
operators:
  - type: json_parser
    parse_from: body
  - type: severity_parser
    parse_from: attributes[level]
  - type: transform
    statements:
      - set(attributes["env"], "prod") where severity_number >= 17
      - delete_key(attributes, "password")
  - type: filter
    conditions:
      - attributes["drop_me"] == "yes"
  - type: router
    routes:
      - name: errors
        condition: severity_number >= 17
      - name: audit
        condition: 'attributes["env"] == "prod"'
"""


def test_yaml_pipeline_end_to_end(spark):
    rows = [
        {"level": "error", "password": "x", "msg": "boom"},
        {"level": "info", "msg": "fine"},
        {"level": "info", "drop_me": "yes", "msg": "noise"},
        {"level": "warn", "msg": "meh"},
    ]
    df = spark.createDataFrame([(json.dumps(r),) for r in rows], "body string")
    run = build_pipeline(YAML_CONFIG)
    out = run(df)

    got = {r["route"]: r["records_out"] for r in routed_counts(out).collect()}
    # error -> errors route; info+warn stay default; drop_me filtered out
    assert got == {"errors": 1, "default": 2}

    err = out.filter(F.col("route") == "errors").first()
    assert err["attributes"]["env"] == "prod"
    assert "password" not in err["attributes"]
    assert err["severity_number"] == 17


def test_dict_config_with_stanza_parsers(spark):
    cfg = {
        "operators": [
            {"type": "regex_parser", "regex": r"^(?P<lvl>\w+) (?P<msg>.*)$"},
            {"type": "severity_parser", "parse_from": "attributes[lvl]"},
            {"type": "add", "field": "attributes.seen", "value": "1"},
            {"type": "retain", "fields": ["attributes", "severity_number"]},
        ]
    }
    df = spark.createDataFrame([("ERROR disk full",), ("INFO ok",)], "body string")
    out = build_pipeline(cfg)(df)
    rows = {r["attributes"]["msg"]: r for r in out.collect()}
    assert rows["disk full"]["severity_number"] == 17
    assert rows["ok"]["severity_number"] == 9
    assert rows["ok"]["attributes"]["seen"] == "1"
    assert out.columns == ["attributes", "severity_number"]
