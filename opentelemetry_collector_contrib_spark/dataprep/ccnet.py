"""CCNet-style perplexity filtering (Wenzek et al. 2020, arXiv:1911.00359):
score every document with a language-model perplexity fit on a clean
target corpus, then split the corpus into head / middle / tail quality
buckets — the standard web-crawl curation step beside dedup and the
Gopher heuristics (CCNet uses a KenLM 5-gram; the public recipe's point
is the *relative* ppl ranking, which a bigram LM preserves).

The LM here is a **hashed-vocabulary bigram model**: words map to
`hash32(w) % B` buckets, so the vocabulary size is the constant B (no
corpus-wide vocab scan, no driver collect), OOV handling is automatic
(every word has a bucket), and the fitted table is bounded by
min(observed bigrams, B^2) rows regardless of corpus size. Additive
smoothing: p(b2|b1) = (c(b1,b2) + a) / (c(b1) + a*B).

Spark shapes:
- fit: one explode + map-side-combined groupBy(b1,b2) shuffle; the
  context totals c(b1) are a window sum partitioned by b1 over the
  already-shuffled count table (no second corpus pass).
- score: explode + two broadcast joins (pair table, context table) +
  one groupBy(doc_id) shuffle. Per-bigram log-probs are rounded to a
  fixed 4-decimal grid (like dsir) so per-doc aggregates agree across
  engines and fold orders.
- bucket: the DEFAULT path is `ppl_bucket_hist` — exact tertile
  cutoffs from the value histogram of the (4-decimal-rounded) logppl
  grid. The groupBy(logppl) is bounded by the grid cardinality (tens of
  thousands of distinct values at most), the cumsum window runs over
  that small table, and the bucketing itself is a broadcast-join
  comparison: no corpus-sized sort anywhere, same plan shape at 10^3 or
  10^12 docs. `ppl_tertiles` (unpartitioned NTILE(3) — single-partition
  sort of every score) is kept ONLY as a small-data exactly-equal-thirds
  variant; never use it in a production recipe.

Everything is built on the md5-prefix hash32 (dedup.hash32) so DuckDB
mirrors the bucket assignment bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .dedup import hash32, q4, scale4, words


def word_buckets(text: Column, buckets: int) -> Column:
    """array<bigint>: hashed-vocab bucket per non-empty word."""
    w = F.filter(words(text), lambda x: x != F.lit(""))
    return F.transform(w, lambda x: hash32(x) % buckets)


def _pair_array(text: Column, buckets: int) -> Column:
    # zip_with over shifted slices, NOT element_at(b, i) inside a
    # transform lambda: b is a computed expression (md5 per word), and
    # Catalyst re-evaluates captured expressions per lambda call, which
    # turns per-row cost quadratic (2n^2 md5s). The slices evaluate b
    # once each; zip_with binds its inputs as values.
    b = word_buckets(text, buckets)
    n = F.size(b)
    empty = F.array().cast("array<struct<b1:bigint,b2:bigint>>")
    return F.when(
        n >= 2,
        F.zip_with(
            F.slice(b, 1, n - 1),
            F.slice(b, 2, n - 1),
            lambda x, y: F.struct(x.alias("b1"), y.alias("b2")),
        ),
    ).otherwise(empty)


def doc_bigram_buckets(
    df: DataFrame, id_cols: list[str], text_col: str, buckets: int
) -> DataFrame:
    """(id_cols..., b1, b2) — one exploded row per adjacent word pair.
    Docs with fewer than 2 words contribute no rows (callers left-join
    the scores back; see score_logppl)."""
    return df.select(
        *id_cols, F.explode(_pair_array(F.col(text_col), buckets)).alias("p")
    ).select(*id_cols, F.col("p.b1").alias("b1"), F.col("p.b2").alias("b2"))


def bigram_lm(
    target: DataFrame,
    text_col: str = "text",
    buckets: int = 512,
    smoothing: float = 0.5,
) -> tuple[DataFrame, DataFrame]:
    """Fit on the target corpus. Returns (pair_logp, ctx):
    pair_logp = (b1, b2, logp) for observed pairs, ctx = (b1, c1)
    context totals — both bounded by B^2 / B rows, both broadcast-sized
    for any sane B. logp is rounded to the 4-decimal grid."""
    counts = (
        doc_bigram_buckets(target, [], text_col, buckets)
        .groupBy("b1", "b2")
        .agg(F.count(F.lit(1)).alias("c12"))
    )
    w = Window.partitionBy("b1")
    pair_logp = counts.select(
        "b1",
        "b2",
        q4(
            F.log((F.col("c12") + smoothing) / (F.sum("c12").over(w) + smoothing * buckets))
        ).alias("logp"),
    )
    ctx = counts.groupBy("b1").agg(F.sum("c12").alias("c1"))
    return pair_logp, ctx


def score_logppl(
    raw: DataFrame,
    pair_logp: DataFrame,
    ctx: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 512,
    smoothing: float = 0.5,
) -> DataFrame:
    """(doc_id, n_bigrams, logppl): logppl = -mean per-bigram log-prob
    under the fitted LM (monotone in perplexity = exp(logppl)). Unseen
    pairs back off to the smoothed floor a/(c1 + a*B); unseen contexts
    to a/(a*B). Every doc in `raw` gets a row — docs with <2 words come
    back with n_bigrams=0 and logppl=0.0."""
    exploded = doc_bigram_buckets(raw, [id_col], text_col, buckets)
    floor = q4(
        F.log(F.lit(smoothing) / (F.coalesce(F.col("c1"), F.lit(0)) + smoothing * buckets))
    )
    # AVG over grid doubles is order-dependent in the last ulp and flips
    # the 4-decimal rounding exactly at .5 boundaries (sf1 evidence: 17
    # logppl cells + 1 bucket flip) — sum exact scaled longs instead,
    # then quantize one double division of identical integers
    scored = (
        exploded.join(F.broadcast(pair_logp), ["b1", "b2"], "left")
        .join(F.broadcast(ctx), ["b1"], "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum(scale4(F.coalesce(F.col("logp"), floor))).alias("__s"),
        )
        .select(
            id_col,
            "n_bigrams",
            q4(
                -(F.col("__s").cast("double"))
                / (F.col("n_bigrams") * F.lit(10000.0))
            ).alias("logppl"),
        )
    )
    return (
        raw.select(id_col)
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_bigrams"), F.lit(0)).cast("long").alias("n_bigrams"),
            F.coalesce(F.col("logppl"), F.lit(0.0)).alias("logppl"),
        )
    )


def ppl_cutoffs(scored: DataFrame, ppl_col: str = "logppl") -> DataFrame:
    """One-row (ppl_lo, ppl_hi) frame: EXACT tertile cutoffs computed
    from the value histogram. Because score_logppl rounds to a 4-decimal
    grid, ``groupBy(logppl)`` is bounded-cardinality no matter how big
    the corpus is, so the cumulative-sum window here runs over a small
    value table — never the corpus. lo = smallest value whose cumulative
    count reaches n/3 (ties-low, integer arithmetic: cum*3 >= tot), hi
    likewise at 2n/3. Lazy: no action, composes into one plan."""
    hist = scored.groupBy(ppl_col).agg(F.count(F.lit(1)).alias("cnt"))
    cum_w = Window.orderBy(F.col(ppl_col).asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    tot_w = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = hist.select(
        F.col(ppl_col).alias("__v"),
        F.sum("cnt").over(cum_w).alias("__cum"),
        F.sum("cnt").over(tot_w).alias("__tot"),
    )
    return cum.agg(
        F.min(F.when(F.col("__cum") * 3 >= F.col("__tot"), F.col("__v"))).alias("ppl_lo"),
        F.min(F.when(F.col("__cum") * 3 >= 2 * F.col("__tot"), F.col("__v"))).alias("ppl_hi"),
    )


def ppl_bucket_hist(scored: DataFrame, ppl_col: str = "logppl") -> DataFrame:
    """Scale-safe default bucketing: histogram-exact tertile cutoffs
    (ppl_cutoffs) broadcast back onto the scored frame — head if
    logppl <= lo, middle if <= hi, else tail. Embarrassingly parallel;
    the only shuffle is the bounded histogram groupBy. Differs from
    ppl_tertiles only in tie handling at the two boundary values (whole
    value-groups stay together instead of being split mid-value), which
    is the semantics CCNet actually needs — the buckets are quality
    bands, not exact thirds."""
    cuts = ppl_cutoffs(scored, ppl_col)
    c = F.col(ppl_col)
    return (
        scored.crossJoin(F.broadcast(cuts))
        .withColumn(
            "ppl_bucket",
            F.when(c <= F.col("ppl_lo"), "head")
            .when(c <= F.col("ppl_hi"), "middle")
            .otherwise("tail"),
        )
        .drop("ppl_lo", "ppl_hi")
    )


def ppl_tertiles(
    scored: DataFrame, ppl_col: str = "logppl", id_col: str = "doc_id"
) -> DataFrame:
    """head/middle/tail by NTILE(3) over (logppl, id) — CCNet's
    equal-thirds split, deterministic under ties. Unpartitioned window =
    single-partition sort of EVERY score row: small-data variant only
    (<~10^8 rows). Production recipes (curate_corpus) and the driver
    suite use ppl_bucket_hist instead."""
    t = F.ntile(3).over(Window.orderBy(F.col(ppl_col).asc(), F.col(id_col).asc()))
    return scored.withColumn(
        "ppl_bucket",
        F.when(t == 1, "head").when(t == 2, "middle").otherwise("tail"),
    )


def ppl_buckets(scored: DataFrame, lo: float, hi: float, ppl_col: str = "logppl") -> DataFrame:
    """Scale path: bucket by fixed cutoffs (e.g. from
    df.approxQuantile(ppl_col, [1/3, 2/3], 0.001)) — embarrassingly
    parallel, no global sort."""
    c = F.col(ppl_col)
    return scored.withColumn(
        "ppl_bucket",
        F.when(c <= lo, "head").when(c <= hi, "middle").otherwise("tail"),
    )
