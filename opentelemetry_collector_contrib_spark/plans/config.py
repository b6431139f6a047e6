"""Config-driven pipeline assembly: the collector's YAML surface compiled
to a Spark DataFrame plan.

The reference wires receivers -> processors -> connectors -> exporters
from YAML (stanza operator DAG: /root/reference/pkg/stanza/pipeline/
directed.go:29-124; processor configs: transformprocessor/config.go:38-50,
filterprocessor, routingconnector/config.go:25-41). `build_pipeline`
accepts the same shapes — operator `type` + its config keys, OTTL
statements/conditions as strings — and returns a DataFrame -> DataFrame
function whose body is one Catalyst plan.

Example (YAML or dict):

    operators:
      - type: json_parser
        parse_from: body
      - type: severity_parser
        parse_from: attributes[level]
      - type: transform
        statements:
          - set(attributes["env"], "prod") where severity_number >= 17
      - type: filter
        conditions:
          - severity_number < 5
      - type: router
        routes:
          - name: errors
            condition: severity_number >= 17
          - name: audit
            condition: 'attributes["env"] == "prod"'
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.ottl_parser import apply_statements, parse_condition
from ..operators import parsers, processors, transformers


def _stage(cfg: dict) -> Callable[[DataFrame], DataFrame]:
    t = cfg["type"]
    if t == "regex_parser":
        return lambda df: parsers.regex_parser(
            df, cfg["regex"], cfg.get("parse_from", "body"), cfg.get("parse_to", "attributes"),
            cfg.get("on_error", "send"),
        )
    if t == "grok_parser":
        return lambda df: parsers.grok_parser(
            df, cfg["pattern"], cfg.get("custom"), cfg.get("parse_from", "body"),
        )
    if t == "json_parser":
        return lambda df: parsers.json_parser(
            df, cfg.get("parse_from", "body"), cfg.get("parse_to", "attributes")
        )
    if t == "csv_parser":
        return lambda df: parsers.csv_parser(
            df, cfg["header"], cfg.get("delimiter", ","), cfg.get("parse_from", "body")
        )
    if t == "key_value_parser":
        return lambda df: parsers.keyvalue_parser(
            df, cfg.get("delimiter", "="), cfg.get("pair_delimiter", " "),
            cfg.get("parse_from", "body"),
        )
    if t == "syslog_parser":
        return lambda df: parsers.syslog_parser(df, cfg.get("protocol", "rfc5424"))
    if t == "container":
        return lambda df: parsers.container_parser(
            df, add_metadata_from_filepath=cfg.get("add_metadata_from_filepath", False)
        )
    if t == "time_parser":
        return lambda df: parsers.time_parser(
            df, cfg["parse_from"], cfg["layout"], cfg.get("layout_type", "strptime")
        )
    if t == "severity_parser":
        return lambda df: parsers.severity_parser(df, cfg["parse_from"], cfg.get("mapping"))
    if t in ("add", "remove", "copy", "move", "retain", "unquote", "regex_replace"):
        fn = getattr(transformers, t)
        if t == "add":
            return lambda df: fn(df, cfg["field"], cfg["value"])
        if t == "remove":
            return lambda df: fn(df, cfg["field"])
        if t in ("copy", "move"):
            return lambda df: fn(df, cfg["from"], cfg["to"])
        if t == "retain":
            return lambda df: fn(df, cfg["fields"])
        if t == "unquote":
            return lambda df: fn(df, cfg["field"])
        return lambda df: fn(df, cfg["field"], cfg["pattern"], cfg["replacement"])
    if t == "transform":
        # transformprocessor log_statements (OTTL strings)
        return lambda df: apply_statements(df, cfg["statements"])
    if t == "filter":
        conds = [parse_condition(c) for c in cfg["conditions"]]
        return lambda df: processors.filter_processor(df, conds)
    if t == "attributes":
        actions = [processors.AttrAction(**a) for a in cfg["actions"]]
        return lambda df: processors.attributes_processor(df, actions)
    if t == "redaction":
        return lambda df: processors.redaction_processor(
            df, cfg.get("allowed_keys"), cfg.get("blocked_values", []), cfg.get("mask", "*")
        )
    if t == "router":
        routes = [(r["name"], parse_condition(r["condition"])) for r in cfg["routes"]]
        default = cfg.get("default", "default")
        return lambda df: transformers.router(df, routes, default)
    if t == "logdedup":
        return lambda df: processors.logdedup_processor(
            df, cfg.get("interval", 10), cfg.get("timestamp", "ts"), key_cols=cfg["keys"]
        )
    raise ValueError(f"unknown operator type {t!r}")


def build_pipeline(config: dict | str) -> Callable[[DataFrame], DataFrame]:
    """Compile an operator-chain config (dict, or YAML string) into a
    single DataFrame transformation."""
    if isinstance(config, str):
        import yaml

        config = yaml.safe_load(config)
    stages = [_stage(c) for c in config["operators"]]

    def run(df: DataFrame) -> DataFrame:
        for s in stages:
            df = s(df)
        return df

    return run


def routed_counts(df: DataFrame) -> DataFrame:
    """Convenience: per-route obsreport counts after a router stage."""
    return df.groupBy("route").agg(F.count(F.lit(1)).alias("records_out"))
