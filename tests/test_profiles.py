"""OTTL profile context over the flat pprofile model: path accessor
parity with ctxprofile/profile.go + value_type.go + the attributes
materialization of ctxprofilecommon/attributes.go."""

from __future__ import annotations

import datetime as dt
import hashlib

from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.operators import profiles as P


def _fixture(spark):
    events = spark.createDataFrame(
        [
            (0, dt.datetime(2024, 1, 1, 0, 0, 7), 8, "error", 6.55, '{"k": 69}'),
            (1, dt.datetime(2024, 1, 1, 0, 3, 52), 46, "click", 12.31, '{"k": 89}'),
            (2, dt.datetime(2024, 1, 1, 0, 6, 29), 7, "view", 1.63, '{"k": 29}'),
        ],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    return P.events_as_profiles(events)


def test_scalar_and_id_paths(spark):
    prof = _fixture(spark)
    d = P.EVENTS_DICT
    row = prof.select(
        P.profile_path("profile_id.string", d).alias("pid"),
        P.profile_path("time_unix_nano", d).alias("tns"),
        # compare the two time getters IN-PLAN: collect() renders
        # timestamps in the driver's local tz, so a python-side
        # comparison would only pass on a UTC machine
        (
            F.unix_micros(P.profile_path("time", d)) * F.lit(1000)
            == P.profile_path("time_unix_nano", d)
        ).alias("t_eq"),
        P.profile_path("duration_unix_nano", d).alias("dns"),
        P.profile_path("period", d).alias("period"),
        P.profile_path("original_payload_format", d).alias("fmt"),
        P.profile_path("original_payload", d).cast("string").alias("payload"),
        P.profile_path("dropped_attributes_count", d).alias("dac"),
    ).first()
    # profile_id.string = lowercase hex of the 16-byte id (accessStringProfileID
    # hex-encodes, profile.go:188)
    assert row["pid"] == hashlib.md5(b"prof-0").hexdigest()
    # time getters agree: time == time_unix_nano as a timestamp (profile.go:87,101)
    assert row["t_eq"] is True
    assert row["dns"] == 655 * 1_000_000
    assert row["period"] == 10_000_000
    assert row["fmt"] == "synthetic.events.v1"
    assert row["payload"] == '{"k": 69}'
    assert row["dac"] == 0


def test_value_type_paths_resolve_via_string_table(spark):
    prof = _fixture(spark)
    d = P.EVENTS_DICT
    rows = prof.orderBy("event_id").select(
        P.profile_path("sample_type.type", d).alias("t"),
        P.profile_path("sample_type.unit", d).alias("u"),
        P.profile_path("period_type.type", d).alias("pt"),
        P.profile_path("period_type", d).alias("pt_struct"),
    ).collect()
    # even event_id -> cpu/nanoseconds, odd -> alloc_space/bytes
    assert [(r["t"], r["u"]) for r in rows] == [
        ("cpu", "nanoseconds"),
        ("alloc_space", "bytes"),
        ("cpu", "nanoseconds"),
    ]
    assert rows[0]["pt"] == "cpu"
    assert rows[0]["pt_struct"].asDict() == {"type": "cpu", "unit": "nanoseconds"}


def test_out_of_range_strindex_yields_null_not_abort(spark):
    # divergence documented in the module docstring: the reference errors
    # the statement (value_type.go getValueTypeString); the flat model
    # NULLs the cell so one bad row cannot abort a batch
    prof = _fixture(spark).withColumn("sample_type_strindex", F.lit(99).cast("int"))
    got = prof.select(
        P.profile_path("sample_type.type", P.EVENTS_DICT).alias("t")
    ).first()
    assert got["t"] is None


def test_attributes_materialize_from_indices(spark):
    prof = _fixture(spark)
    d = P.EVENTS_DICT
    rows = prof.orderBy("event_id").select(
        P.profile_path("attributes", d).alias("m"),
        P.profile_path("attributes[host.name]", d).alias("host"),
    ).collect()
    # user_id 8 -> host-2, 46 -> host-1, 7 -> host-1; profiler.version on all
    assert rows[0]["m"] == {"host.name": "host-2", "profiler.version": "v1.2.3"}
    assert [r["host"] for r in rows] == ["host-2", "host-1", "host-1"]


def test_sample_slice_shape_and_rollup(spark):
    prof = _fixture(spark)
    d = P.EVENTS_DICT
    s = prof.orderBy("event_id").select(P.profile_path("sample", d).alias("s")).first()["s"]
    assert len(s) == 2
    assert s[0]["value"] == [655, 1]  # floor(6.55*100), constant 1
    assert s[1]["value"] == [327]
    assert s[0]["timestamps_unix_nano"][0] % 1000 == 0

    roll = {
        (r["type"], r["unit"]): (r["n_profiles"], r["total_value"])
        for r in P.profile_samples_rollup(prof, d).collect()
    }
    # event 0: 655+1+327=983; event 2: 163+1+81=245 -> cpu total 1228 over 2
    # event 1: 1231+1+615=1847 -> alloc_space total 1847 over 1
    assert roll[("cpu", "nanoseconds")] == (2, 1228)
    assert roll[("alloc_space", "bytes")] == (1, 1847)


def test_setters_roundtrip(spark):
    prof = _fixture(spark)
    d = P.EVENTS_DICT
    out = P.profile_path_set(prof, "period", F.lit(42).cast("long"))
    # a string literal parses in the UTC session tz JVM-side, so the
    # expected epoch value is tz-independent (F.lit(naive datetime)
    # would convert through the driver's local tz)
    out = P.profile_path_set(
        out, "time", F.to_timestamp(F.lit("2030-01-02 03:04:05"))
    )
    row = out.select("period", "time_unix_nano").first()
    assert row["period"] == 42
    assert (
        row["time_unix_nano"]
        == int(dt.datetime(2030, 1, 2, 3, 4, 5, tzinfo=dt.timezone.utc).timestamp())
        * 1_000_000_000
    )

    # attributes setter: clears indices, interns new pairs (dictionary
    # grows, mirroring pprofile.PutAttribute)
    out2, nd = P.set_attributes(prof, d, {"host.name": "host-9", "env": "prod"})
    m = out2.select(P.profile_path("attributes", nd).alias("m")).first()["m"]
    assert m == {"host.name": "host-9", "env": "prod"}
    assert "env" in nd.string_table
    assert len(nd.attribute_table) == len(d.attribute_table) + 2


def test_unknown_path_raises(spark):
    try:
        P.profile_path("no_such_field", P.EVENTS_DICT)
    except ValueError as e:
        assert "no_such_field" in str(e)
    else:
        raise AssertionError("expected ValueError")


def test_scalar_subpath_rejected(spark):
    # period.bogus must error like the reference's ctxerror, not silently
    # return the base column
    try:
        P.profile_path("period.bogus", P.EVENTS_DICT)
    except ValueError as e:
        assert "period.bogus" in str(e)
    else:
        raise AssertionError("expected ValueError")


def test_duplicate_attribute_keys_last_wins_not_abort(spark):
    # indices [0, 1] both resolve key 'host.name' — the reference's
    # FromAttributeIndices overwrites via Map.Put (last wins); default
    # Spark map_from_entries would ABORT with DUPLICATED_MAP_KEY
    prof = _fixture(spark).withColumn(
        "attribute_indices", F.array(F.lit(0), F.lit(1)).cast("array<int>")
    )
    m = prof.select(P.profile_path("attributes", P.EVENTS_DICT).alias("m")).first()["m"]
    assert m == {"host.name": "host-1"}


def test_all_branches_reject_unknown_subpaths(spark):
    for p in (
        "time.bogus",
        "duration.x",
        "profile_id.sting",
        "sample_type.bogus",
        "period_type.bogus",
        "attributes.bogus",
        "period.bogus",
        # bracketed key on a non-map path — the reference's ctxerror on
        # keyed non-map paths; must not silently return the base column
        "period[x]",
        "sample_type[k]",
        "profile_id[0]",
    ):
        try:
            P.profile_path(p, P.EVENTS_DICT)
        except ValueError:
            pass
        else:
            raise AssertionError(f"expected ValueError for {p}")


def test_time_getter_exact_above_2_53_ns(spark):
    # double division loses the last microsecond above 2^53 ns; the
    # getter must use integer division (reference reads exact int nanos)
    big = 2305843009213693951  # 2^61 - 1
    prof = _fixture(spark).withColumn("time_unix_nano", F.lit(big).cast("long"))
    got = prof.select(
        F.unix_micros(P.profile_path("time", P.EVENTS_DICT)).alias("us")
    ).first()["us"]
    assert got == big // 1000
