"""CCNet-style perplexity filter tests: hand-model parity for the hashed
bigram LM, backoff behavior, short-doc safety, discrimination, and
tertile determinism."""

import hashlib
import math
from collections import Counter

import pyspark.sql.functions as F
import pytest

from opentelemetry_collector_contrib_spark.dataprep import ccnet

B = 64
A = 0.5

TARGETY = "the cat sat on the mat with the dog and the cat"
RAWY = "kernel panic at boot sector zero dump trace register overflow"


def h(wd: str) -> int:
    return int(hashlib.md5(wd.encode()).hexdigest()[:8], 16) % B


def model_logppl(doc: str, lm_corpus: list[str]) -> float:
    """Reference python model of the hashed bigram LM + backoff."""
    c12, c1 = Counter(), Counter()
    for t in lm_corpus:
        ws = [w for w in t.split(" ") if w]
        for a, b in zip(ws, ws[1:]):
            c12[(h(a), h(b))] += 1
            c1[h(a)] += 1
    ws = [w for w in doc.split(" ") if w]
    pairs = [(h(a), h(b)) for a, b in zip(ws, ws[1:])]
    if not pairs:
        return 0.0
    lps = []
    for b1, b2 in pairs:
        if (b1, b2) in c12:
            lp = math.log((c12[(b1, b2)] + A) / (c1[b1] + A * B))
        else:
            lp = math.log(A / (c1.get(b1, 0) + A * B))
        lps.append(round(lp, 4))
    return round(-sum(lps) / len(lps), 4)


@pytest.fixture(scope="module")
def corpora(spark):
    target = spark.createDataFrame(
        [(i, TARGETY + f" v{i % 3}") for i in range(20)], ["doc_id", "text"]
    )
    raw = spark.createDataFrame(
        [(i, (TARGETY if i % 4 == 0 else RAWY) + f" x{i % 5}") for i in range(40)]
        + [(100, "solo"), (101, ""), (102, "  ")],
        ["doc_id", "text"],
    )
    return target, raw


def test_logppl_matches_hand_model(spark, corpora):
    target, raw = corpora
    lm, ctx = ccnet.bigram_lm(target, buckets=B, smoothing=A)
    got = {
        r["doc_id"]: r["logppl"]
        for r in ccnet.score_logppl(raw, lm, ctx, buckets=B, smoothing=A).collect()
    }
    lm_corpus = [TARGETY + f" v{i % 3}" for i in range(20)]
    for i in range(40):
        doc = (TARGETY if i % 4 == 0 else RAWY) + f" x{i % 5}"
        assert got[i] == pytest.approx(model_logppl(doc, lm_corpus), abs=2e-4), i


def test_short_docs_get_rows_not_crashes(spark, corpora):
    target, raw = corpora
    lm, ctx = ccnet.bigram_lm(target, buckets=B)
    rows = {r["doc_id"]: r for r in ccnet.score_logppl(raw, lm, ctx, buckets=B).collect()}
    assert len(rows) == 43
    for d in (100, 101, 102):
        assert rows[d]["n_bigrams"] == 0
        assert rows[d]["logppl"] == 0.0


def test_target_like_docs_score_lower_ppl(spark, corpora):
    target, raw = corpora
    lm, ctx = ccnet.bigram_lm(target, buckets=B)
    rows = ccnet.score_logppl(raw, lm, ctx, buckets=B).filter("n_bigrams > 0").collect()
    targety = [r["logppl"] for r in rows if r["doc_id"] < 100 and r["doc_id"] % 4 == 0]
    rawy = [r["logppl"] for r in rows if r["doc_id"] < 100 and r["doc_id"] % 4 != 0]
    assert max(targety) < min(rawy)


def test_tertiles_equal_thirds_and_deterministic(spark, corpora):
    target, raw = corpora
    lm, ctx = ccnet.bigram_lm(target, buckets=B)
    scored = ccnet.score_logppl(raw, lm, ctx, buckets=B)
    b1 = {r["doc_id"]: r["ppl_bucket"] for r in ccnet.ppl_tertiles(scored).collect()}
    b2 = {r["doc_id"]: r["ppl_bucket"] for r in ccnet.ppl_tertiles(scored).collect()}
    assert b1 == b2
    counts = Counter(b1.values())
    assert counts["head"] == 15 and counts["middle"] == 14 and counts["tail"] == 14
    # target-like docs all land in the head (43 docs: zero-bigram docs score
    # 0.0 which is *below* every real logppl, but there are only 3 of them)
    targety_buckets = {b1[i] for i in range(40) if i % 4 == 0}
    assert targety_buckets == {"head"}


def test_cutoff_buckets_match_tertiles_on_exact_quantiles(spark, corpora):
    target, raw = corpora
    lm, ctx = ccnet.bigram_lm(target, buckets=B)
    scored = ccnet.score_logppl(raw, lm, ctx, buckets=B)
    ppl = {r["doc_id"]: r["logppl"] for r in scored.collect()}
    vals = sorted(ppl.values())
    lo, hi = vals[14], vals[28]  # 43 rows -> tertile boundaries at 15/29
    by_cut = {
        r["doc_id"]: r["ppl_bucket"] for r in ccnet.ppl_buckets(scored, lo, hi).collect()
    }
    by_ntile = {
        r["doc_id"]: r["ppl_bucket"] for r in ccnet.ppl_tertiles(scored).collect()
    }
    # NTILE splits tie groups at the boundary values arbitrarily (by id);
    # away from the boundaries the two bucketings must agree exactly
    checked = 0
    for d, v in ppl.items():
        if v not in (lo, hi):
            assert by_cut[d] == by_ntile[d], (d, v, by_cut[d], by_ntile[d])
            checked += 1
    assert checked >= 10


def test_ppl_bucket_hist_matches_manual_cutoffs_and_has_no_corpus_sort(spark, corpora):
    """The scale-safe default: histogram-exact cutoffs must equal the
    hand-computed ties-low tertile cutoffs, bucketing must agree with the
    explicit ppl_buckets(lo, hi) call on every row, and the physical plan
    must not sort the scored frame into a single partition (the NTILE
    scale-killer this path replaces)."""
    target, raw = corpora
    lm, ctx = ccnet.bigram_lm(target, buckets=B)
    scored = ccnet.score_logppl(raw, lm, ctx, buckets=B)
    ppl = {r["doc_id"]: r["logppl"] for r in scored.collect()}
    n = len(ppl)
    vals = sorted(ppl.values())

    def ties_low_cut(frac_num: int) -> float:
        # smallest grid value whose cumulative count reaches frac_num * n / 3
        seen = 0
        for v in vals:
            seen += 1
            if seen * 3 >= frac_num * n:
                # advance through the rest of the tie group: cutoffs are
                # per-value, so the first index inside the group qualifies
                return v
        raise AssertionError("unreachable")

    lo, hi = ties_low_cut(1), ties_low_cut(2)
    cuts = ccnet.ppl_cutoffs(scored).collect()[0]
    assert cuts["ppl_lo"] == lo and cuts["ppl_hi"] == hi

    by_hist = {
        r["doc_id"]: r["ppl_bucket"] for r in ccnet.ppl_bucket_hist(scored).collect()
    }
    by_cut = {
        r["doc_id"]: r["ppl_bucket"] for r in ccnet.ppl_buckets(scored, lo, hi).collect()
    }
    assert by_hist == by_cut
    # this fixture is deliberately tie-heavy (30/43 docs share one value), so
    # whole-group bucketing collapses it — assert the tie-group invariant here
    for d, v in ppl.items():
        for d2, v2 in ppl.items():
            if v == v2:
                assert by_hist[d] == by_hist[d2]

    # on a spread distribution the histogram path yields near-thirds
    spread = spark.createDataFrame(
        [(i, round(i * 0.01, 4)) for i in range(90)], ["doc_id", "logppl"]
    )
    sb = Counter(
        r["ppl_bucket"] for r in ccnet.ppl_bucket_hist(spread).collect()
    )
    assert sb == {"head": 30, "middle": 30, "tail": 30}

    # plan gate: the only single-partition exchange feeds the bounded value
    # histogram (post-groupBy), never the raw scored rows — assert the
    # SinglePartition exchange consumes an aggregate, not the score join
    plan = ccnet.ppl_bucket_hist(scored)._jdf.queryExecution().executedPlan().toString()
    import re

    for m in re.finditer(r"Exchange SinglePartition", plan):
        tail = plan[m.start() : m.start() + 2000]
        assert "HashAggregate" in tail, tail[:400]
