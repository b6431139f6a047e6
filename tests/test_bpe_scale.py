"""BPE training job-count bound (VERDICT r4 ask #4) + trainer parity.

train_bpe now collects the deterministic top-K of the distinct
word-frequency table and runs the merge loop in-memory (lazy max-heap,
incremental pair counts) — O(1) Spark jobs regardless of num_merges.
train_bpe_distributed (round-per-merge) stays as the parity oracle; on
any corpus whose distinct table fits the cap, both must produce the
IDENTICAL merge list (same overlapping pair counting, same
count-desc/(a,b)-asc tie-break, same min_freq stop).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.dataprep import tokenize


def _lcg_words(n: int, alpha: str = "abc", lo: int = 1, hi: int = 9) -> list[str]:
    """Deterministic pseudo-random words (no RNG imports needed)."""
    out, x = [], 42
    for _ in range(n):
        x = (x * 1103515245 + 12345) % (1 << 31)
        ln = lo + x % (hi - lo + 1)
        w = []
        for _ in range(ln):
            x = (x * 1103515245 + 12345) % (1 << 31)
            w.append(alpha[x % len(alpha)])
        out.append("".join(w))
    return out


def test_inmemory_trainer_matches_distributed(spark):
    """60 zipf-ish pseudo-random words over {a,b,c}, deep merge budget,
    min_freq=1 so the loop runs into the sparse tail where tie-breaks and
    incremental-count correctness actually matter."""
    words = _lcg_words(60)
    text = " ".join(words)
    corpus = spark.createDataFrame([(0, text), (1, text)], "doc_id long, text string")
    got = tokenize.train_bpe(corpus, num_merges=25, min_freq=1)
    want = tokenize.train_bpe_distributed(corpus, num_merges=25, min_freq=1)
    assert got == want
    assert len(got) >= 15  # the budget was actually exercised


def test_inmemory_trainer_min_freq_stop_matches(spark):
    corpus = spark.createDataFrame(
        [(0, "ab ab ab cd xy")], "doc_id long, text string"
    )
    for mf in (2, 3, 4):
        got = tokenize.train_bpe(corpus, num_merges=10, min_freq=mf)
        want = tokenize.train_bpe_distributed(corpus, num_merges=10, min_freq=mf)
        assert got == want, mf


def test_train_bpe_words_overlapping_pairs():
    """'aaaa' x5 holds THREE (a,a) pairs per occurrence (overlapping count,
    like the distributed zip_with), but one merge pass leaves [aa, aa]."""
    merges = tokenize.train_bpe_words([("aaaa", 5), ("ab", 3)], num_merges=2, min_freq=2)
    assert merges == [("a", "a"), ("aa", "aa")]


def test_train_bpe_1m_words_1k_merges_bounded_jobs(spark):
    """VERDICT r4 ask #4 acceptance: a 1M-distinct-word table, 1000
    merges, and the whole fit launches <= 50 Spark jobs (the old trainer
    launched one aggregation + one cache-materialize per merge: ~2000)."""
    sc = spark.sparkContext
    n = 1_000_000
    # 1M distinct words over an 8-letter alphabet: id in base 8, digits ->
    # a..h, zero-padded to 7 chars — rich shared substructure for merging
    corpus = spark.range(n).select(
        F.translate(
            F.lpad(F.conv(F.col("id"), 10, 8), 7, "0"), "01234567", "abcdefgh"
        ).alias("text")
    )
    sc.setJobGroup("bpe-train-scale", "bpe 1M-word fit")
    try:
        merges = tokenize.train_bpe(corpus, num_merges=1000, min_freq=2)
        jobs = sc.statusTracker().getJobIdsForGroup("bpe-train-scale")
    finally:
        sc.setJobGroup("", "")
    assert len(merges) == 1000
    assert 0 < len(jobs) <= 50, f"{len(jobs)} jobs for a 1000-merge fit"
    # the fit is real: early merges come from the uniform head where every
    # 2-gram has equal count and the lexicographic tie-break decides
    assert merges[0] == ("a", "a")
