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


@given(
    docs=st.lists(
        st.lists(st.integers(0, 9), min_size=0, max_size=30),
        min_size=1,
        max_size=8,
    ),
    span_len=st.integers(2, 6),
    keep_first=st.booleans(),
)
@SET
def test_exact_substring_removal_properties(spark, docs, span_len, keep_first):
    from opentelemetry_collector_contrib_spark.dataprep.packing import (
        exact_substring_removal,
    )

    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], "doc_id long, tokens array<int>"
    )
    out = {
        r["doc_id"]: r
        for r in exact_substring_removal(
            df, span_len=span_len, keep_first=keep_first
        ).collect()
    }
    # one row per doc; removal accounting closes; kept tokens are a
    # subsequence of the original
    assert set(out) == set(range(len(docs)))
    for i, d in enumerate(docs):
        r = out[i]
        assert r["n_tok"] + r["n_removed"] == len(d)
        it = iter(d)
        assert all(t in it for t in r["tokens"])  # subsequence check
    # python model: windows whose hash-free VALUE repeats, minus the
    # first occurrence when keep_first
    from collections import defaultdict

    occs = defaultdict(list)
    for i, d in enumerate(docs):
        for p in range(len(d) - span_len + 1):
            occs[tuple(d[p : p + span_len])].append((i, p))
    covered = {i: set() for i in range(len(docs))}
    for w, lst in occs.items():
        if len(lst) < 2:
            continue
        removable = lst[1:] if keep_first else lst
        for i, p in removable:
            covered[i].update(range(p, p + span_len))
    for i, d in enumerate(docs):
        want = [t for j, t in enumerate(d) if j not in covered[i]]
        assert out[i]["tokens"] == want, (i, d)


@given(
    n_per_dom=st.lists(st.integers(0, 40), min_size=1, max_size=4),
    weights=st.lists(st.floats(0.05, 1.0), min_size=1, max_size=4),
)
@SET
def test_mixture_sample_quota_properties(spark, n_per_dom, weights):
    from opentelemetry_collector_contrib_spark.dataprep.split import (
        mixture_quotas,
        mixture_sample,
    )

    import math

    doms = [f"d{j}" for j in range(len(n_per_dom))]
    rows, nid = [], 0
    for j, n in enumerate(n_per_dom):
        for _ in range(n):
            rows.append((nid, doms[j]))
            nid += 1
    if not rows:
        return
    df = spark.createDataFrame(rows, "doc_id long, dom string")
    # weights may cover only a prefix of the domains: the rest are
    # "unlisted" and must come back with quota 0
    wts = {d: w for d, w in zip(doms, weights)}
    total = sum(wts.values())
    norm = {d: w / total for d, w in wts.items()}
    counts = {d: n for d, n in zip(doms, n_per_dom)}
    N = min(math.floor(counts[d] / norm[d]) for d in wts)
    quotas = {
        r["dom"]: r["quota"] for r in mixture_quotas(df, "dom", wts).collect()
    }
    kept = {
        r["dom"]: r["count"]
        for r in mixture_sample(df, "dom", wts)
        .filter("mix_keep")
        .groupBy("dom")
        .count()
        .collect()
    }
    for d in doms:
        if counts[d] == 0:
            assert d not in quotas  # domain absent from the corpus
            continue
        want = math.floor(norm[d] * N) if d in wts else 0
        assert quotas[d] == want, (d, quotas, N)
        assert kept.get(d, 0) == want
        assert want <= counts[d]  # never upsamples
