"""OTTL profile context over a flat pprofile model.

The reference models profiles as pdata `pprofile.Profile` rows plus a
shared `ProfilesDictionary` (string table + attribute table), and exposes
them to OTTL through path accessors
(`pkg/ottl/contexts/internal/ctxprofile/profile.go:22-72` — sample_type,
sample, time[_unix_nano], duration[_unix_nano], period_type, period,
profile_id[.string], attribute_indices, dropped_attributes_count,
original_payload[_format], attributes) with ValueType sub-paths `.type` /
`.unit` resolved through the dictionary string table
(`ctxprofile/value_type.go:17-100`) and the attributes map materialized
from attribute indices (`ctxprofilecommon/attributes.go:22-27`,
`pprofile.FromAttributeIndices`).

Spark-first translation:
- a profile is ONE ROW of a DataFrame with the flat columns below — the
  same flat-row strategy every other signal (log/span/metric) uses here;
- the dictionary is driver-side state (`ProfilesDict`), exactly like the
  reference, where the dictionary lives per-batch in memory next to the
  profile slice. String/attribute lookups compile to `element_at` over
  ARRAY LITERALS — whole-stage-codegen JVM expressions, zero Python, no
  join (the dictionary is bounded by construction: it indexes the
  distinct strings of a batch, not the corpus);
- at 100 TB the per-batch dictionaries ride along in their file's rows
  (or a broadcast dim keyed by batch_id); nothing here shuffles.

Flat schema (column <-> pprofile field):
  profile_id binary(16)            Profile.ProfileID
  time_unix_nano long              Profile.Time (epoch ns)
  duration_unix_nano long          Profile.Duration (epoch-ns convention,
                                   matching accessDurationUnixNano which
                                   reads it via AsTime().UnixNano())
  sample_type_strindex int         Profile.SampleType().TypeStrindex
  sample_type_unit_strindex int    Profile.SampleType().UnitStrindex
  period_type_strindex int         Profile.PeriodType().TypeStrindex
  period_type_unit_strindex int    Profile.PeriodType().UnitStrindex
  period long                      Profile.Period
  sample array<struct<             Profile.Samples():
    location_indices array<int>,     Sample.LocationIndices
    value array<long>,               Sample.Value
    attribute_indices array<int>,    Sample.AttributeIndices
    timestamps_unix_nano array<long>>> Sample.TimestampsUnixNano
  attribute_indices array<int>     Profile.AttributeIndices
  dropped_attributes_count int     Profile.DroppedAttributesCount
  original_payload_format string   Profile.OriginalPayloadFormat
  original_payload binary          Profile.OriginalPayload

Divergence (documented): out-of-range string/attribute indices return
NULL instead of erroring the statement — the repo-wide "one bad row must
never abort a 100 TB batch" posture (the reference returns an error from
getValueTypeString, which fails that single statement).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SAMPLE_TYPE = (
    "array<struct<location_indices:array<int>,value:array<bigint>,"
    "attribute_indices:array<int>,timestamps_unix_nano:array<bigint>>>"
)


@dataclass(frozen=True)
class ProfilesDict:
    """Driver-side ProfilesDictionary: string table + attribute table.

    attribute_table rows are (key_strindex, value) pairs — the flat
    analog of pprofile.KeyValueAndUnit (unit indices elided: the synth
    fixtures don't use per-attribute units, and the accessor contract
    only reads key + value, see FromAttributeIndices)."""

    string_table: tuple[str, ...] = ("",)
    attribute_table: tuple[tuple[int, str], ...] = field(default_factory=tuple)

    def string_at(self, idx: Column) -> Column:
        """strindex -> string via an array literal (NULL when out of
        range: element_at on a 1-based index, guarded)."""
        arr = F.array(*[F.lit(s) for s in self.string_table])
        return F.when(
            (idx >= 0) & (idx < F.lit(len(self.string_table))),
            F.element_at(arr, idx.cast("int") + 1),
        )

    def attr_entry(self, idx: Column) -> Column:
        """attribute index -> struct<key,value> (NULL when out of range)."""
        keys = F.array(
            *[F.lit(self.string_table[k]) for k, _ in self.attribute_table]
        )
        vals = F.array(*[F.lit(v) for _, v in self.attribute_table])
        i = idx.cast("int")
        ok = (i >= 0) & (i < F.lit(len(self.attribute_table)))
        return F.when(
            ok,
            F.struct(
                F.element_at(keys, i + 1).alias("key"),
                F.element_at(vals, i + 1).alias("value"),
            ),
        )


def profile_path(path: str, d: ProfilesDict) -> Column:
    """OTTL `profile.` path -> Column (the Getter half of the reference's
    PathGetSetter, ctxprofile/profile.go:22).

    Supported paths: every case of the reference switch, with ValueType
    sub-paths (`sample_type.type`, `period_type.unit`, ...) resolved
    through the string table and `attributes` / `attributes[key]`
    materialized from attribute_indices via the attribute table."""
    key = None
    if path.endswith("]") and "[" in path:
        # bracketed map key (attributes[host.name]) — split on the bracket
        # FIRST so dots inside the key don't look like sub-paths
        name, _, k = path[:-1].partition("[")
        rest = ""
        key = k.strip("\"'")
    else:
        name, _, rest = path.partition(".")
    c = F.col(name) if name in (
        "time_unix_nano",
        "duration_unix_nano",
        "period",
        "attribute_indices",
        "dropped_attributes_count",
        "original_payload_format",
        "original_payload",
        "sample",
        "profile_id",
    ) else None

    def bad() -> Column:
        # every branch rejects unknown remainders — the reference's
        # switch errors on e.g. period.bogus / profile_id.sting
        # (ctxerror.New), so don't silently return the base column
        raise ValueError(f"unknown profile context path: {path!r}")

    if key is not None and name != "attributes":
        # bracketed keys only exist on the map path (attributes[k]); the
        # reference errors on keyed non-map paths (ctxerror.New), so
        # `period[x]` must not silently return the base column
        bad()
    if name in ("time", "duration"):
        if rest:
            bad()
        # integer ns->us division: a double round-trip flips the last
        # microsecond above 2^53 ns (any current epoch time)
        src = "time_unix_nano" if name == "time" else "duration_unix_nano"
        return F.timestamp_micros(F.expr(f"{src} div 1000"))
    if name == "profile_id":
        if rest == "string":
            return F.lower(F.hex(F.col("profile_id")))
        if rest:
            bad()
        return c
    if name in ("sample_type", "period_type"):
        if rest == "type":
            return d.string_at(F.col(f"{name}_strindex"))
        if rest == "unit":
            return d.string_at(F.col(f"{name}_unit_strindex"))
        if rest:
            bad()
        # bare value-type: struct of resolved (type, unit)
        return F.struct(
            d.string_at(F.col(f"{name}_strindex")).alias("type"),
            d.string_at(F.col(f"{name}_unit_strindex")).alias("unit"),
        )
    if name == "attributes":
        if rest:
            bad()
        entries = F.filter(
            F.transform(F.col("attribute_indices"), d.attr_entry),
            lambda e: e.isNotNull(),
        )
        # last-wins on duplicate keys like the reference's Map.Put
        # (FromAttributeIndices overwrites); map_from_entries would
        # otherwise ABORT the job under the default EXCEPTION dedup
        # policy — one bad row must never kill a 100 TB batch. O(k^2)
        # lookahead over a bounded attribute list.
        sz = F.size(entries)
        deduped = F.filter(
            entries,
            lambda e, i: F.size(
                F.filter(
                    F.slice(entries, i + 2, sz),
                    lambda e2: e2["key"] == e["key"],
                )
            )
            == 0,
        )
        m = F.map_from_entries(deduped)
        if key is not None:
            return F.element_at(m, key)
        return m
    if c is not None:
        if rest:
            bad()
        return c
    return bad()


def profile_path_set(df: DataFrame, path: str, value: Column) -> DataFrame:
    """The Setter half for the scalar/slice paths whose flat column the
    value maps onto 1:1 (time[_unix_nano], duration[_unix_nano], period,
    original_payload[_format], dropped_attributes_count,
    attribute_indices, sample, profile_id). Dictionary-mediated setters
    (attributes, value-type strings) rebuild indices against the
    driver-side dict — see set_attributes below."""
    direct = {
        "time_unix_nano",
        "duration_unix_nano",
        "period",
        "attribute_indices",
        "dropped_attributes_count",
        "original_payload_format",
        "original_payload",
        "sample",
        "profile_id",
    }
    if path in direct:
        return df.withColumn(path, value)
    if path == "time":
        return df.withColumn(
            "time_unix_nano", F.unix_micros(value) * F.lit(1000)
        )
    if path == "duration":
        return df.withColumn(
            "duration_unix_nano", F.unix_micros(value) * F.lit(1000)
        )
    raise ValueError(f"profile path not settable in the flat model: {path!r}")


def set_attributes(
    df: DataFrame, d: ProfilesDict, mapping: dict[str, str]
) -> tuple[DataFrame, ProfilesDict]:
    """Setter for `profile.attributes` with a literal map: mirrors
    ctxprofilecommon/attributes.go:28-50 — clears the index slice, then
    appends (interning new strings/pairs into the dictionary like
    pprofile.SetString / PutAttribute). Returns the updated frame AND the
    (possibly grown) dictionary, since the dictionary is driver state."""
    strings = list(d.string_table)
    attrs = list(d.attribute_table)
    idxs = []
    for k, v in mapping.items():
        if k not in strings:
            strings.append(k)
        pair = (strings.index(k), v)
        if pair not in attrs:
            attrs.append(pair)
        idxs.append(attrs.index(pair))
    nd = ProfilesDict(tuple(strings), tuple(attrs))
    out = df.withColumn(
        "attribute_indices", F.array(*[F.lit(i) for i in idxs]).cast("array<int>")
    )
    return out, nd


# ---------------------------------------------------------------------------
# deterministic pprofile-shaped frame over the driver's events table


EVENTS_DICT = ProfilesDict(
    string_table=(
        "",
        "samples",
        "count",
        "cpu",
        "nanoseconds",
        "alloc_space",
        "bytes",
        "host.name",
        "profiler.version",
        "host-0",
        "host-1",
        "host-2",
        "v1.2.3",
    ),
    # (key_strindex, value): 3 host.name values + one profiler.version
    attribute_table=((7, "host-0"), (7, "host-1"), (7, "host-2"), (8, "v1.2.3")),
)


def events_as_profiles(events: DataFrame, keep: tuple[str, ...] = ()) -> DataFrame:
    """Recast the driver's `events` table as flat pprofile rows (one
    profile per event, everything a pure function of the row):
    cpu/nanoseconds profiles for even event_ids, alloc_space/bytes for
    odd; two samples whose values derive from the event's `value`
    measure; host.name attribute from user_id; the raw props JSON kept
    as original_payload. `keep` passes extra source columns through so a
    caller can project profile paths next to other derived columns
    without re-joining on event_id (narrow plan, zero shuffle)."""
    ev = events
    eid = F.col("event_id")
    # parquet timestamps arrive as TIMESTAMP_NTZ; treat as UTC wall time
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    v100 = F.floor(F.col("value") * 100).cast("long")
    sample = F.array(
        F.struct(
            F.array((eid % 8).cast("int"), ((eid * 7 + 1) % 8).cast("int")).alias(
                "location_indices"
            ),
            F.array(v100, F.lit(1).cast("long")).alias("value"),
            F.array().cast("array<int>").alias("attribute_indices"),
            F.array(ts_us * 1000).alias("timestamps_unix_nano"),
        ),
        F.struct(
            F.array(((eid + 3) % 8).cast("int")).alias("location_indices"),
            F.array(F.floor(v100 / 2).cast("long")).alias("value"),
            F.array().cast("array<int>").alias("attribute_indices"),
            F.array(ts_us * 1000 + 500).alias("timestamps_unix_nano"),
        ),
    ).cast(SAMPLE_TYPE)
    return ev.select(
        eid.alias("event_id"),
        F.unhex(F.md5(F.concat(F.lit("prof-"), eid.cast("string")))).alias(
            "profile_id"
        ),
        (ts_us * 1000).alias("time_unix_nano"),
        (v100 * 1_000_000).alias("duration_unix_nano"),
        F.when(eid % 2 == 0, 3).otherwise(5).cast("int").alias("sample_type_strindex"),
        F.when(eid % 2 == 0, 4).otherwise(6)
        .cast("int")
        .alias("sample_type_unit_strindex"),
        F.lit(3).cast("int").alias("period_type_strindex"),
        F.lit(4).cast("int").alias("period_type_unit_strindex"),
        (F.lit(10_000_000) + (eid % 3) * 1_000_000).alias("period"),
        sample.alias("sample"),
        F.array((F.col("user_id") % 3).cast("int"), F.lit(3).cast("int")).alias(
            "attribute_indices"
        ),
        F.lit(0).cast("int").alias("dropped_attributes_count"),
        F.lit("synthetic.events.v1").alias("original_payload_format"),
        F.col("props").cast("binary").alias("original_payload"),
        *[F.col(k) for k in keep],
    )


def sample_total() -> Column:
    """Total of every sample value in the row's sample slice — a pure
    nested-array fold (no explode, no shuffle)."""
    return F.aggregate(
        F.col("sample"),
        F.lit(0).cast("long"),
        lambda acc, s: acc
        + F.aggregate(s["value"], F.lit(0).cast("long"), lambda a, v: a + v),
    )


def profile_samples_rollup(profiles: DataFrame, d: ProfilesDict) -> DataFrame:
    """Per (sample_type.type, sample_type.unit): profile count + total of
    every sample value — the scale shape is a pure column fold (aggregate
    over the nested arrays, zero explode) into one bounded groupBy."""
    total = sample_total()
    return (
        profiles.select(
            profile_path("sample_type.type", d).alias("type"),
            profile_path("sample_type.unit", d).alias("unit"),
            total.alias("total"),
        )
        .groupBy("type", "unit")
        .agg(
            F.count(F.lit(1)).alias("n_profiles"),
            F.sum("total").alias("total_value"),
        )
    )
