"""DSIR: Data Selection via Importance Resampling (Xie et al. 2023,
arXiv:2302.03169) — select raw-corpus documents whose hashed-n-gram
distribution looks like a target corpus.

The standard pretraining-data selection recipe beside dedup/quality
filters: featurize every document as a bag of hashed word {1,2}-grams
over B buckets, fit two bucket unigram distributions (target p, raw q)
with additive smoothing, score each raw document with the log importance
weight sum_g log p[b(g)] - log q[b(g)], and resample the top-k under
seeded Gumbel noise.

Spark shapes:
- fit: one explode + map-side-combined groupBy per corpus — two bounded
  aggregations producing B-row count tables (B ~ 10^4 in the paper, tiny
  vs the corpus).
- score: the B-row log-ratio table folds into a LITERAL map and the
  per-doc weight is a zero-shuffle fold over the document's gram array
  (order-deterministic on both engines, which is what makes the oracle
  hash-match; per-bucket ratios are rounded to a fixed grid first so the
  fold is also order-robust). For B beyond a few thousand, score via
  dsir_weights_join (explode + broadcast join + one groupBy shuffle)
  instead of a giant literal.
- select: deterministic Gumbel-top-k — the Gumbel draw is derived from
  hash32(seed:doc_id), never rand(), so a resumed run selects the same
  documents.

Hashing uses the shared md5-prefix hash32 (dedup.hash32) so DuckDB can
mirror the bucket assignment bit-for-bit.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import hash32, q4, scale4, words


def doc_ngrams(text: Column) -> Column:
    """Non-distinct word unigrams + bigrams (DSIR counts repeats: the
    feature is a BAG of hashed n-grams)."""
    w = F.filter(words(text), lambda x: x != F.lit(""))
    n = F.size(w)
    # zip_with over shifted slices, not element_at(w, i) in a transform
    # lambda — captured expressions re-evaluate per lambda call, making
    # the per-row cost quadratic in doc length (see ccnet._pair_array)
    bigrams = F.when(
        n >= 2,
        F.zip_with(
            F.slice(w, 1, n - 1),
            F.slice(w, 2, n - 1),
            lambda a, b: F.concat(a, F.lit(" "), b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.concat(w, bigrams)


def gram_buckets(text: Column, buckets: int) -> Column:
    """array<bigint> of hashed feature buckets for a document."""
    return F.transform(doc_ngrams(text), lambda g: hash32(g) % buckets)


def bucket_counts(
    df: DataFrame, text_col: str = "text", buckets: int = 64
) -> DataFrame:
    """(bucket, cnt) over a corpus — one explode + map-side-combined
    aggregation; output is at most `buckets` rows."""
    return (
        df.select(F.explode(gram_buckets(F.col(text_col), buckets)).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def dsir_log_ratios(
    target: DataFrame,
    raw: DataFrame,
    text_col: str = "text",
    buckets: int = 64,
    smoothing: float = 0.5,
) -> dict[int, float]:
    """Per-bucket log(p_target / q_raw) with additive smoothing, ROUNDED
    to 4 decimals. The rounding pins every ratio to a fixed grid so that
    per-document sums agree across engines regardless of fold order.
    Driver holds B floats — the 'index' that ships as a literal map."""
    tc = {r["bucket"]: r["cnt"] for r in bucket_counts(target, text_col, buckets).collect()}
    rc = {r["bucket"]: r["cnt"] for r in bucket_counts(raw, text_col, buckets).collect()}
    t_total = sum(tc.values()) + smoothing * buckets
    r_total = sum(rc.values()) + smoothing * buckets
    out = {}
    for b in range(buckets):
        p = (tc.get(b, 0) + smoothing) / t_total
        q = (rc.get(b, 0) + smoothing) / r_total
        # floor(x*1e4+0.5)/1e4, NOT round(x, 4): python round is
        # banker's on the decimal repr; this matches dedup.q4 / the SQL
        # FLOOR mirror bit-for-bit (see dedup.q4 docstring)
        out[b] = math.floor((math.log(p) - math.log(q)) * 10000.0 + 0.5) / 10000.0
    return out


def dsir_weight(
    text: Column, ratios: dict[int, float], buckets: int
) -> Column:
    """Per-document log importance weight: fold over the gram array with
    a literal bucket->ratio map (zero shuffles; use dsir_weights_join for
    B large enough to strain a literal plan)."""
    m = F.create_map(
        *[x for b, r in ratios.items() for x in (F.lit(b), F.lit(float(r)))]
    )
    # fold EXACT scaled-long contributions, not doubles: the fold order
    # is the array order here but SUM order in the dsir_weights_join /
    # oracle mirrors — integer sums make all of them agree bit-for-bit
    contribs = F.transform(
        gram_buckets(text, buckets), lambda b: scale4(F.element_at(m, b))
    )
    return (
        F.aggregate(contribs, F.lit(0).cast("long"), lambda acc, v: acc + v)
        / F.lit(10000.0)
    )


def dsir_log_ratio_table(
    spark,
    target_counts: DataFrame,
    raw_counts: DataFrame,
    buckets: int,
    smoothing: float = 0.5,
) -> DataFrame:
    """Fully-declarative fit: (bucket, log_ratio) over the complete
    0..B-1 spine from two bucket_counts() outputs. No driver collect —
    the corpus totals are unpartitioned window sums over the B-row
    joined spine (a single-partition exchange of B tiny rows, never a
    cartesian/BNLJ), so the whole fit+score graph is one lazy plan
    (resume/AQE friendly at 10^12 docs, where even the B-row collect of
    dsir_log_ratios is a barrier you don't want)."""
    from pyspark.sql import Window

    spine = spark.range(buckets).select(F.col("id").alias("bucket"))
    joined = spine.join(
        target_counts.withColumnRenamed("cnt", "tc"), "bucket", "left"
    ).join(raw_counts.withColumnRenamed("cnt", "rc"), "bucket", "left")
    w = Window.partitionBy()
    tc = F.coalesce(F.col("tc"), F.lit(0))
    rc = F.coalesce(F.col("rc"), F.lit(0))
    tt = F.sum(tc).over(w) + F.lit(smoothing * buckets)
    rt = F.sum(rc).over(w) + F.lit(smoothing * buckets)
    return joined.select(
        "bucket",
        q4(
            F.log((tc + smoothing) / tt) - F.log((rc + smoothing) / rt)
        ).alias("log_ratio"),
    )


def dsir_weights_from_exploded(
    exploded: DataFrame,
    ratios_df: DataFrame,
    id_col: str = "doc_id",
    docs: DataFrame | None = None,
) -> DataFrame:
    """(id, logw) from a pre-exploded (id, bucket) table: broadcast join
    on the B-row ratio table + one groupBy(id) shuffle. Use this when
    one corpus explode should feed BOTH the fit (bucket counts) and the
    score — tokenizing/hashing the corpus once instead of three times.

    Mirrors dsir_weight exactly: a gram whose bucket is absent from
    ratios_df NULLs the whole document's logw (left join + miss count —
    an inner join would silently sum a SUBSET of the doc's grams, i.e.
    plausible-but-wrong weights when fit and score disagree on B), and a
    document with zero grams scores 0.0 — pass `docs` (any frame with
    id_col covering all documents) to keep such rows; without it the
    explode has nothing to emit for them and they are absent from the
    output."""
    per_doc = (
        exploded.join(F.broadcast(ratios_df), "bucket", "left")
        .groupBy(id_col)
        .agg(
            # exact scaled-long sum: grid doubles summed as doubles are
            # order-dependent in the last ulp, which flips a downstream
            # 4-decimal rounding exactly at .5 boundaries (sf1 evidence)
            (F.sum(scale4(F.col("log_ratio"))) / F.lit(10000.0)).alias("__s"),
            F.sum(
                F.when(F.col("log_ratio").isNull(), 1).otherwise(0)
            ).alias("__miss"),
        )
        .select(
            id_col,
            F.when(F.col("__miss") > 0, F.lit(None).cast("double"))
            .otherwise(F.col("__s"))
            .alias("logw"),
            F.lit(True).alias("__present"),
        )
    )
    if docs is None:
        return per_doc.drop("__present")
    # absent from per_doc = zero grams -> 0.0; present with NULL logw =
    # missing bucket -> stays NULL (coalesce would wrongly zero it)
    return (
        docs.select(F.col(id_col))
        .join(per_doc, id_col, "left")
        .withColumn(
            "logw",
            F.when(F.col("__present").isNull(), F.lit(0.0)).otherwise(
                F.col("logw")
            ),
        )
        .drop("__present")
    )


def dsir_weights_join(
    raw: DataFrame,
    ratios_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 10_000,
) -> DataFrame:
    """Scale path: (doc_id, logw) via explode + broadcast join on the
    B-row ratio table (columns bucket, log_ratio) + one groupBy(doc_id)
    shuffle. Identical values to dsir_weight when the ratio table holds
    the same rounded ratios — including zero-gram docs (logw 0.0, kept
    via the raw-side spine) and NULL on ratio-table bucket misses."""
    exploded = raw.select(
        F.col(id_col), F.explode(gram_buckets(F.col(text_col), buckets)).alias("bucket")
    )
    return dsir_weights_from_exploded(exploded, ratios_df, id_col, docs=raw)


def gumbel_noise(id_col: Column, seed: int = 7) -> Column:
    """Deterministic standard-Gumbel draw per id: u = hash32(seed:id)
    mapped into (0,1), g = -ln(-ln(u)). Never rand() — resumed runs
    select identical documents."""
    u = (hash32(F.concat(F.lit(f"{seed}:"), id_col.cast("string"))) + 1) / F.lit(
        float(2**32 + 1)
    )
    return -F.log(-F.log(u))


def dsir_select(
    weights: DataFrame,
    k: int,
    id_col: str = "doc_id",
    weight_col: str = "logw",
    seed: int = 7,
) -> DataFrame:
    """Gumbel-top-k resampling (the paper's sampling-without-replacement
    trick): rank by logw + Gumbel(id) and keep k. Returns the input plus
    (gumbel_key, selected). The global rank is a single
    ORDER BY LIMIT k at B-bounded cost only over the candidate set —
    at 10^12 docs pre-filter with an approximate logw quantile first."""
    keyed = weights.withColumn(
        "gumbel_key", F.col(weight_col) + gumbel_noise(F.col(id_col), seed)
    )
    topk = (
        keyed.orderBy(F.col("gumbel_key").desc(), F.col(id_col).asc())
        .limit(k)
        .select(F.col(id_col).alias("__sel_id"))
    )
    return keyed.join(
        topk, keyed[id_col] == topk["__sel_id"], "left"
    ).select(
        *[F.col(c) for c in keyed.columns],
        F.col("__sel_id").isNotNull().alias("selected"),
    )
