"""sumologicprocessor: vendor attribute/metric shaping
(/root/reference/processor/sumologicprocessor/) over the flat model.

Five sub-processors, applied in the reference's fixed order
(processor.go): add_cloud_namespace -> translate_attributes ->
translate_docker_metrics -> nesting -> aggregate_attributes ->
log_fields_conversion. All but `nest_attributes` are pure column
expressions over map<string,string>; nesting produces arbitrary-depth
objects, so its flat-model output is a JSON string built in an
Arrow-batched pandas UDF (the flat analog of pcommon's nested map).
"""

from __future__ import annotations

import json
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

# translate_attributes_processor.go:19-42
ATTRIBUTE_TRANSLATIONS = {
    "cloud.account.id": "AccountId",
    "cloud.availability_zone": "AvailabilityZone",
    "cloud.platform": "aws_service",
    "cloud.region": "Region",
    "host.id": "InstanceId",
    "host.name": "host",
    "host.type": "InstanceType",
    "k8s.cluster.name": "Cluster",
    "k8s.container.name": "container",
    "k8s.daemonset.name": "daemonset",
    "k8s.deployment.name": "deployment",
    "k8s.namespace.name": "namespace",
    "k8s.node.name": "node",
    "k8s.service.name": "service",
    "k8s.pod.hostname": "host",
    "k8s.pod.name": "pod",
    "k8s.pod.uid": "pod_id",
    "k8s.replicaset.name": "replicaset",
    "k8s.statefulset.name": "statefulset",
    "service.name": "service",
    "log.file.path_resolved": "_sourceName",
}

# cloud_namespace_processor.go:19-24 + addCloudNamespaceAttribute
CLOUD_NAMESPACES = {
    "aws_ec2": "aws/ec2",
    "aws_ecs": "ecs",
    "aws_elastic_beanstalk": "ElasticBeanstalk",
}

# translate_docker_metrics_processor.go:19-75 (metric-name subset + resource)
DOCKER_METRIC_TRANSLATIONS = {
    "container.cpu.percent": "cpu_percentage",
    "container.cpu.usage.system": "system_cpu_usage",
    "container.cpu.usage.percpu": "cpu_usage.percpu_usage",
    "container.cpu.usage.total": "cpu_usage.total_usage",
    "container.cpu.usage.kernelmode": "cpu_usage.usage_in_kernelmode",
    "container.cpu.usage.usermode": "cpu_usage.usage_in_usermode",
    "container.cpu.throttling_data.periods": "throttling_data.periods",
    "container.cpu.throttling_data.throttled_periods": "throttling_data.throttled_periods",
    "container.cpu.throttling_data.throttled_time": "throttling_data.throttled_time",
    "container.memory.usage.limit": "limit",
    "container.memory.usage.max": "max_usage",
    "container.memory.percent": "memory_percentage",
}
DOCKER_RESOURCE_TRANSLATIONS = {
    "container.id": "container.FullID",
    "container.image.name": "container.ImageName",
    "container.name": "container.Name",
}

# log_fields_conversion_processor.go severity table: OTel number -> name
_SEV_BASES = [
    (1, "TRACE"), (5, "DEBUG"), (9, "INFO"), (13, "WARN"),
    (17, "ERROR"), (21, "FATAL"),
]


def severity_name(num: Column) -> Column:
    """'loglevel' value for an OTel severity number (TRACE..FATAL4,
    UNSPECIFIED for 0/NULL-out-of-range)."""
    expr = None
    for base, name in _SEV_BASES:
        for off in range(4):
            label = name if off == 0 else f"{name}{off + 1}"
            c = num == (base + off)
            expr = F.when(c, label) if expr is None else expr.when(c, label)
    return expr.otherwise("UNSPECIFIED")


def add_cloud_namespace(m: Column) -> Column:
    """Set cloud.namespace from cloud.platform for the AWS trio; other
    platforms (and missing platform) leave the map untouched."""
    platform = F.element_at(m, "cloud.platform")
    ns = None
    for plat, namespace in CLOUD_NAMESPACES.items():
        c = platform == plat
        ns = F.when(c, namespace) if ns is None else ns.when(c, namespace)
    ns = ns.otherwise(F.lit(None).cast("string"))
    with_ns = F.map_concat(
        F.map_filter(m, lambda k, _: k != F.lit("cloud.namespace")),
        F.map_from_arrays(F.array(F.lit("cloud.namespace")), F.array(ns)),
    )
    return F.when(ns.isNotNull(), with_ns).otherwise(m)


def translate_attributes(m: Column) -> Column:
    """OTel -> Sumo key renames (translate_attributes_processor.go:86-111):
    a key is renamed only when the Sumo name is not already present in the
    input map and no earlier entry already produced it (Go iterates the
    map in insertion order; map_entries preserves the same order)."""
    def target(k: Column) -> Column:
        expr = None
        for ot, sumo in ATTRIBUTE_TRANSLATIONS.items():
            c = k == ot
            expr = F.when(c, sumo) if expr is None else expr.when(c, sumo)
        return expr.otherwise(F.lit(None).cast("string"))

    entries = F.map_entries(m)

    def step(acc, e):
        sumo = target(e["key"])
        # rename unless the sumo name exists in the input or was already
        # emitted by an earlier entry; never emit a duplicate key
        renamed = F.when(
            sumo.isNotNull()
            & ~F.map_contains_key(m, sumo)
            & ~F.exists(acc, lambda a: a["key"] == sumo),
            sumo,
        ).otherwise(e["key"])
        dup = F.exists(acc, lambda a: a["key"] == renamed)
        new_e = F.struct(renamed.alias("key"), e["value"].alias("value"))
        return F.when(dup, acc).otherwise(F.concat(acc, F.array(new_e)))

    folded = F.aggregate(
        entries,
        F.array().cast("array<struct<key:string,value:string>>"),
        step,
    )
    return F.map_from_entries(folded)


def _map_from_entries_last_wins(entries: Column) -> Column:
    """map_from_entries with Go pdata Put semantics: a later entry with
    the same key OVERWRITES the earlier one, instead of Spark's default
    DUPLICATED_MAP_KEY runtime error (mapKeyDedupPolicy=EXCEPTION)."""
    folded = F.aggregate(
        entries,
        F.array().cast("array<struct<key:string,value:string>>"),
        lambda acc, e: F.concat(
            F.filter(acc, lambda a: a["key"] != e["key"]), F.array(e)
        ),
    )
    return F.map_from_entries(folded)


def translate_docker_metrics(
    df: DataFrame, metric_col: str = "metric", attrs_col: str | None = "attributes"
) -> DataFrame:
    """Docker metric-name + resource-attribute renames."""
    name = F.col(metric_col)
    expr = None
    for src, dst in DOCKER_METRIC_TRANSLATIONS.items():
        c = name == src
        expr = F.when(c, dst) if expr is None else expr.when(c, dst)
    out = df.withColumn(metric_col, expr.otherwise(name))
    if attrs_col and attrs_col in df.columns:
        m = F.col(attrs_col)

        def rk(k: Column) -> Column:
            e = None
            for src, dst in DOCKER_RESOURCE_TRANSLATIONS.items():
                c = k == src
                e = F.when(c, dst) if e is None else e.when(c, dst)
            return e.otherwise(k)

        out = out.withColumn(
            attrs_col,
            # last-wins: an input carrying both the OTel key and its Sumo
            # target must not raise DUPLICATED_MAP_KEY; the rename (later
            # entry) overwrites, matching pdata Put
            _map_from_entries_last_wins(
                F.transform(
                    F.map_entries(m),
                    lambda x: F.struct(rk(x["key"]).alias("key"), x["value"].alias("value")),
                )
            ),
        )
    return out


def nest_attributes(
    m: Column,
    separator: str = ".",
    include: list[str] | None = None,
    exclude: list[str] | None = None,
    squash_single_values: bool = False,
) -> Column:
    """Flat dotted keys -> nested object, emitted as a JSON string (the
    flat-model stand-in for pcommon's nested map). Mirrors
    nesting_processor.go:121-180 including the non-map collision rule
    (the previous scalar moves under the '' key) and squash of
    single-child chains."""
    inc = list(include or [])
    exc = list(exclude or [])

    def should(k: str) -> bool:
        ok = not inc or any(k.startswith(p) for p in inc)
        return ok and not any(k.startswith(p) for p in exc)

    def nest_one(items):
        root: dict = {}
        for k, v in items:
            if not should(k):
                root[k] = v
                continue
            keys = k.split(separator)
            cur = root
            for i, part in enumerate(keys):
                nxt = cur.get(part)
                if i == len(keys) - 1:
                    if isinstance(nxt, dict):
                        nxt[""] = v
                    else:
                        cur[part] = v
                else:
                    if not isinstance(nxt, dict):
                        cur[part] = {"": nxt} if nxt is not None else {}
                    cur = cur[part]

        def squash(d):
            if not isinstance(d, dict):
                return d
            d = {k: squash(v) for k, v in d.items()}
            while len(d) == 1:
                (k, v), = d.items()
                if isinstance(v, dict) and k != "":
                    d = {f"{k}{separator}{ck}": cv for ck, cv in v.items()}
                else:
                    break
            return d

        if squash_single_values:
            root = {k: squash(v) for k, v in root.items()}
        return json.dumps(root, sort_keys=True, separators=(",", ":"))

    @pandas_udf("string")
    def _nest(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in batches:
            yield s.map(
                lambda mm: None if mm is None else nest_one(list(mm.items()))
            )

    return _nest(m)


def aggregate_attributes(
    m: Column, pairs: list[tuple[str, list[str]]]
) -> Column:
    """aggregate_attributes_processor.go: for each (target_key, prefixes)
    pair, keys matching a prefix are collected under target_key as an
    object (JSON string value in the flat map) with the prefix stripped;
    everything else passes through. Pure column expressions (map_filter +
    to_json)."""
    out = m
    for target_key, prefixes in pairs:
        def has_prefix(k: Column) -> Column:
            c = F.lit(False)
            for p in prefixes:
                c = c | k.startswith(p)
            return c

        def strip(k: Column) -> Column:
            e = k
            for p in prefixes:
                e = F.when(k.startswith(p), F.substring(k, len(p) + 1, 1 << 20)).otherwise(e)
            return e

        matched = F.map_filter(out, lambda k, _: has_prefix(k))
        # two keys can strip to the same name (e.g. prefixes a./b. both
        # yielding x): last wins like pdata Put, never DUPLICATED_MAP_KEY
        stripped = _map_from_entries_last_wins(
            F.transform(
                F.map_entries(matched),
                lambda x: F.struct(strip(x["key"]).alias("key"), x["value"].alias("value")),
            )
        )
        # a pre-existing non-matching attribute named target_key is
        # overwritten by the aggregate (PutEmptyMap semantics)
        rest = F.map_filter(
            out, lambda k, _: ~has_prefix(k) & (k != F.lit(target_key))
        )
        agg = F.map_from_arrays(
            F.array(F.lit(target_key)), F.array(F.to_json(stripped))
        )
        out = F.when(F.size(F.map_keys(matched)) > 0, F.map_concat(rest, agg)).otherwise(out)
    return out


def log_fields_conversion(
    df: DataFrame,
    attrs_col: str = "attributes",
    severity_number_col: str = "severity_number",
    severity_text_col: str | None = "severity_text",
    span_id_col: str | None = "span_id",
    trace_id_col: str | None = "trace_id",
) -> DataFrame:
    """Adds loglevel / severitytext / spanid / traceid attributes from the
    record fields (log_fields_conversion_processor.go; hex ids, empty
    string for missing ids like spanIDToHexOrEmptyString)."""
    adds: list[tuple[str, Column]] = [
        ("loglevel", severity_name(F.col(severity_number_col).cast("int")))
    ]
    if severity_text_col and severity_text_col in df.columns:
        adds.append(("severitytext", F.coalesce(F.col(severity_text_col), F.lit(""))))
    if span_id_col and span_id_col in df.columns:
        adds.append(("spanid", F.coalesce(F.lower(F.col(span_id_col)), F.lit(""))))
    if trace_id_col and trace_id_col in df.columns:
        adds.append(("traceid", F.coalesce(F.lower(F.col(trace_id_col)), F.lit(""))))
    new = F.map_from_arrays(
        F.array(*[F.lit(k) for k, _ in adds]),
        F.array(*[v.cast("string") for _, v in adds]),
    )
    keys = [k for k, _ in adds]
    base = F.map_filter(F.col(attrs_col), lambda k, _: ~k.isin(keys))
    return df.withColumn(attrs_col, F.map_concat(base, new))


def sumologic_processor(
    df: DataFrame,
    *,
    attrs_col: str = "attributes",
    add_cloud_namespace_enabled: bool = True,
    translate_attributes_enabled: bool = True,
    nest_attributes_enabled: bool = False,
    nesting_separator: str = ".",
    aggregate: list[tuple[str, list[str]]] | None = None,
    log_fields: bool = False,
    **log_fields_kw,
) -> DataFrame:
    """The composed processor in the reference's sub-processor order
    (processor.go:47-55), with one documented flat-model deviation: the
    reference nests attributes in place and then aggregates over the
    nested map; the flat model emits nesting into a separate JSON column,
    so aggregation here runs over the FLAT attributes and nesting renders
    last. Observable only when both options are enabled together."""
    m = F.col(attrs_col)
    if add_cloud_namespace_enabled:
        m = add_cloud_namespace(m)
    if translate_attributes_enabled:
        m = translate_attributes(m)
    if aggregate:
        m = aggregate_attributes(m, aggregate)
    out = df.withColumn(attrs_col, m)
    if nest_attributes_enabled:
        out = out.withColumn(
            f"{attrs_col}_nested",
            nest_attributes(F.col(attrs_col), nesting_separator),
        )
    if log_fields:
        out = log_fields_conversion(out, attrs_col=attrs_col, **log_fields_kw)
    return out
