"""Enrichment processors — broadcast hash-join lookups (§2.8).

The reference's only join shapes are enrichment lookups against driver-side
caches: k8sattributes (pod metadata by IP/UID,
/root/reference/processor/k8sattributesprocessor/processor.go:101-147),
geoip (MaxMind block ranges, geoip_processor.go:57-118), dnslookup.

Spark-first: the lookup side is small (pods, CIDR blocks, hostnames) — it
is ALWAYS broadcast, so enrichment is a map-side join with zero shuffle of
the fact table at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def lookup_enrich(
    df: DataFrame,
    lookup: DataFrame,
    on: str,
    how: str = "left",
    prefix: str = "",
) -> DataFrame:
    """Generic broadcast enrichment (k8sattributes / dnslookup / source
    metadata shape). Adds every non-key lookup column, optionally prefixed."""
    cols = [c for c in lookup.columns if c != on]
    sel = [F.col(on)] + [F.col(c).alias(f"{prefix}{c}") for c in cols]
    return df.join(F.broadcast(lookup.select(*sel)), on, how)


def k8sattributes_enrich(df: DataFrame, pod_meta: DataFrame, association_col: str = "pod_ip") -> DataFrame:
    """k8sattributesprocessor: upsert pod/namespace/node resource attributes
    joined by pod association. pod_meta columns: (pod_ip, pod_name,
    namespace, node_name, ...)."""
    joined = lookup_enrich(df, pod_meta, association_col, prefix="k8s_")
    # NULL-safe base: map_filter(NULL) and map_concat(NULL, x) are both
    # NULL, so a row with a matching pod but NULL resource_attributes
    # would silently lose its enrichment — the reference upserts
    # (creates) the attribute map in that case
    m = F.coalesce(
        F.col("resource_attributes"),
        F.create_map().cast("map<string,string>"),
    )
    for meta_col, attr_key in [
        ("k8s_pod_name", "k8s.pod.name"),
        ("k8s_namespace", "k8s.namespace.name"),
        ("k8s_node_name", "k8s.node.name"),
    ]:
        if meta_col in joined.columns:
            def key_filter(key: str):
                return lambda k, _: k != F.lit(key)

            m = F.when(
                F.col(meta_col).isNotNull(),
                F.map_concat(
                    F.map_filter(m, key_filter(attr_key)),
                    F.map_from_arrays(F.array(F.lit(attr_key)), F.array(F.col(meta_col))),
                ),
            ).otherwise(m)
    out = joined.withColumn("resource_attributes", m)
    return out.drop(*[c for c in joined.columns if c.startswith("k8s_")])


def ip_to_long(col):
    """Dotted-quad IPv4 -> uint32 as long (for range joins). NULL for
    anything that is not a dotted quad — the reference's geoip/dns
    providers error per-record on an unparsable IP (net.ParseIP nil),
    and an unguarded ANSI cast on 'not.an.ip' would abort the job."""
    quad = col.rlike(r"^\d{1,3}(\.\d{1,3}){3}$")
    parts = F.split(col, r"\.")
    return F.when(
        quad,
        F.element_at(parts, 1).cast("long") * 16777216
        + F.element_at(parts, 2).cast("long") * 65536
        + F.element_at(parts, 3).cast("long") * 256
        + F.element_at(parts, 4).cast("long"),
    )


def geoip_enrich(
    df: DataFrame,
    blocks: DataFrame,
    ip_col: str = "ip",
    start_col: str = "ip_start",
    end_col: str = "ip_end",
) -> DataFrame:
    """geoipprocessor: range-join IP against CIDR blocks
    (geoip_processor.go:57-118). blocks: (ip_start:long, ip_end:long,
    country, city, ...) — small, broadcast; the range predicate becomes a
    broadcast nested-loop that Catalyst keeps map-side. For very large
    block tables, pre-bucket by /16 prefix to make it an equi+range join."""
    ipv = ip_to_long(F.col(ip_col))
    b = F.broadcast(blocks)
    pref = (ipv / 65536).cast("long")
    if "prefix16" in blocks.columns:
        joined = df.withColumn("__ipv", ipv).withColumn("__p16", pref).join(
            b, (F.col("__p16") == b["prefix16"]) & (F.col("__ipv") >= b[start_col]) & (F.col("__ipv") <= b[end_col]), "left"
        ).drop("__ipv", "__p16", "prefix16")
    else:
        joined = df.withColumn("__ipv", ipv).join(
            b, (F.col("__ipv") >= b[start_col]) & (F.col("__ipv") <= b[end_col]), "left"
        ).drop("__ipv")
    return joined.drop(start_col, end_col)


def dns_enrich(df: DataFrame, host_table: DataFrame, on: str = "hostname") -> DataFrame:
    """dnslookupprocessor: hostname<->IP broadcast lookup."""
    return lookup_enrich(df, host_table, on)


def salted_repartition(
    df: DataFrame, key: str, salt_buckets: int = 16, num_partitions: int | None = None
) -> DataFrame:
    """Skew helper: repartition on (key, salt) so one hot key spreads over
    salt_buckets partitions. Salt is derived from a stable row hash — not
    rand() — so repeated runs place rows identically. Use before per-key
    heavy work when AQE alone can't split (e.g. a hot `source` at 55% of
    all rows; FIXTURES.md §1)."""
    # salt over ALL hashable columns: hashing just one column + the key
    # degenerates to a constant salt when that column IS the key (or is
    # constant within the hot key), silently defeating the spread.
    # xxhash64 rejects MapType anywhere in the type (HASH_MAP_TYPE) — log
    # frames always carry an attributes map; top-level maps become their
    # sorted entry list, and any DEEPER map (array<map>, struct with a map
    # field) hashes its canonical JSON text instead.
    def _contains_map(dt) -> bool:
        from pyspark.sql import types as T

        if isinstance(dt, T.MapType):
            return True
        if isinstance(dt, T.ArrayType):
            return _contains_map(dt.elementType)
        if isinstance(dt, T.StructType):
            return any(_contains_map(f.dataType) for f in dt.fields)
        return False

    def hashable(f):
        from pyspark.sql import types as T

        if isinstance(f.dataType, T.MapType) and not (
            _contains_map(f.dataType.keyType) or _contains_map(f.dataType.valueType)
        ):
            return F.array_sort(F.map_entries(F.col(f.name)))
        if _contains_map(f.dataType):
            # map-of-maps / array<map> / struct-with-map: entries of a
            # nested map can't be sorted either — canonical JSON text is
            # the hashable form
            return F.to_json(F.col(f.name))
        return F.col(f.name)

    salt = F.pmod(F.xxhash64(*[hashable(f) for f in df.schema.fields]), F.lit(salt_buckets))
    salted = df.withColumn("__salt", salt)
    # explicit num_partitions opts out of AQE coalescing (which would fold
    # small shuffles back into few partitions and defeat the spread)
    parted = (
        salted.repartition(num_partitions, key, "__salt")
        if num_partitions
        else salted.repartition(key, "__salt")
    )
    return parted.drop("__salt")
