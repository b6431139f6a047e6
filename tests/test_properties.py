"""Hypothesis property tests for the invariants unit fixtures can miss.

Each example is a small Spark roundtrip, so example counts are kept low;
the properties cover arbitrary-shape inputs (empty docs, NULLs, weird
durations) rather than more samples of one shape."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

SET = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(
    docs=st.lists(
        st.one_of(st.none(), st.lists(st.integers(0, 999), max_size=25)),
        min_size=1,
        max_size=8,
    ),
    max_len=st.integers(2, 12),
    shards=st.integers(1, 4),
)
@SET
def test_pack_sequences_properties(spark, docs, max_len, shards):
    from opentelemetry_collector_contrib_spark.dataprep import packing

    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], "doc_id long, tokens array<int>"
    )
    out = packing.pack_sequences(df, max_len, num_shards=shards).collect()
    # conservation: every token lands exactly once, in shard order
    expect_total = sum(len(d) for d in docs if d)
    assert sum(r["n_tok"] for r in out) == expect_total
    for r in out:
        assert 1 <= r["n_tok"] <= max_len
    # per-shard stream equals docs concatenated in id order
    for s in {r["shard"] for r in out}:
        rows = sorted((r for r in out if r["shard"] == s), key=lambda r: r["seq_index"])
        stream = [t for r in rows for t in r["tokens"]]
        want = [
            t
            for i, d in sorted(enumerate(docs))
            if d and i % shards == s
            for t in d
        ]
        assert stream == want


_UNITS = {"ns": 1, "us": 1e3, "µs": 1e3, "ms": 1e6, "s": 1e9, "m": 6e10, "h": 3.6e12}


def _go_parse_duration(s: str):
    """Python model of Go time.ParseDuration for the generated grammar."""
    import re as _re

    if s == "0":
        return 0
    m = _re.fullmatch(
        r"[+-]?(?:(?:\d+(?:\.\d*)?|\.\d+)(?:ns|us|µs|μs|ms|s|m|h))+", s
    )
    if not m:
        return None
    total = 0.0
    for v, u in _re.findall(r"(\d+(?:\.\d*)?|\.\d+)(ns|us|µs|μs|ms|s|m|h)", s):
        total += float(v) * _UNITS.get(u, 1e3)
    if s.startswith("-"):
        total = -total
    return int(total)


@given(
    segs=st.lists(
        st.tuples(
            st.floats(0, 999, allow_nan=False).map(lambda x: round(x, 3)),
            st.sampled_from(list(_UNITS)),
        ),
        min_size=1,
        max_size=3,
    ),
    sign=st.sampled_from(["", "-", "+"]),
)
@SET
def test_duration_matches_go_model(spark, segs, sign):
    from opentelemetry_collector_contrib_spark.functions import ottl

    s = sign + "".join(f"{v:g}{u}" for v, u in segs)
    got = spark.createDataFrame([(s,)], "d string").select(
        ottl.duration_(F.col("d")).alias("ns")
    ).first()["ns"]
    want = _go_parse_duration(s)
    assert (got is None) == (want is None)
    if want is not None:
        # double fold vs python float accumulation: identical operations
        assert abs(got - want) <= 1


@given(
    words=st.lists(
        st.text(alphabet="abcxyz", min_size=1, max_size=4), min_size=1, max_size=12
    ),
    k=st.integers(2, 4),
)
@SET
def test_word_shingles_match_naive_model(spark, words, k):
    from opentelemetry_collector_contrib_spark.dataprep import dedup

    text = " ".join(words)
    got = spark.createDataFrame([(text,)], "t string").select(
        dedup.word_shingles(F.col("t"), k).alias("sh")
    ).first()["sh"]
    if len(words) >= k:
        naive = [" ".join(words[i : i + k]) for i in range(len(words) - k + 1)]
    else:
        naive = [" ".join(words)]
    seen = []
    for g in naive:
        if g not in seen:
            seen.append(g)
    assert got == seen


@given(
    ids=st.lists(st.integers(0, 10_000), min_size=1, max_size=40, unique=True),
    w_train=st.floats(0.1, 0.9),
)
@SET
def test_hash_split_total_and_stability(spark, ids, w_train):
    from opentelemetry_collector_contrib_spark.dataprep.split import hash_split

    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    weights = {"train": w_train, "rest": 1.0 - w_train}
    a = {r["doc_id"]: r["split"] for r in hash_split(df, "doc_id", weights).collect()}
    b = {
        r["doc_id"]: r["split"]
        for r in hash_split(df.repartition(5), "doc_id", weights).collect()
    }
    assert a == b  # partitioning-independent
    assert set(a) == set(ids)  # every row assigned exactly once
