"""Deterministic dataset splitting (train/val/test) by key hash.

The standard training-data-pipeline operation: assign each document to a
split by a uniform hash of its key — stable across runs, machines, and
partitionings (never rand()), and SQL-expressible for oracle checks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import hash32

U32 = float(1 << 32)


def split_column(key: Column, weights: dict[str, float], seed: str = "split") -> Column:
    """Column assigning a split name by cumulative hash ranges.
    weights need not sum to 1 — they are normalized.

    NULL keys hash as the empty string, so they all land together in
    whichever split that one hash picks — deterministic and independent
    of the weights dict's ordering. (Without the coalesce, hash32(NULL)
    is NULL, every range test is NULL, and ALL NULL-key rows would
    silently fall through to the LAST-listed split — an eval split
    quietly contaminated by dict order.) Same-key-same-split is the
    design contract; id-less rows share one key."""
    total = sum(weights.values())
    h = hash32(F.coalesce(key.cast("string"), F.lit("")), f"{seed}:")
    expr = None
    acc = 0.0
    items = list(weights.items())
    for name, w in items[:-1]:
        acc += w / total
        cond = h < F.lit(int(U32 * acc))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = items[-1][0]
    return expr.otherwise(last) if expr is not None else F.lit(last)


def hash_split(
    df: DataFrame,
    key_col: str,
    weights: dict[str, float],
    seed: str = "split",
    out_col: str = "split",
) -> DataFrame:
    """Add a deterministic split column. Narrow (no shuffle); to write
    per-split tables use sinks.fanout.write_fanout(routed, route_col=out_col)."""
    return df.withColumn(out_col, split_column(F.col(key_col), weights, seed))


def mixture_quotas(
    df: DataFrame, domain_col: str, weights: dict[str, float]
) -> DataFrame:
    """(domain, n_d, quota): the largest achievable corpus size N under
    target mixture `weights` with no upsampling is min_d floor(n_d/w_d)
    (the binding domain runs out first); each domain then contributes
    quota = floor(w_d * N) documents. Domains absent from `weights` (or
    NULL) get quota 0. A weighted domain with ZERO corpus rows clamps N
    to 0 (its share cannot be met without upsampling) but is dropped from
    the output — only observed domains come back. One groupBy(domain)
    agg (D rows) + a D-row spine outer join + an unpartitioned window
    min over those D rows — never a corpus-wide sort."""
    total = sum(weights.values())
    wmap = F.create_map(
        *[x for d, w in weights.items() for x in (F.lit(d), F.lit(w / total))]
    )
    counts = df.groupBy(domain_col).agg(F.count(F.lit(1)).alias("n_d"))
    spark = df.sparkSession
    spine = spark.createDataFrame(
        [(d,) for d in weights], f"{domain_col} string"
    )
    # weighted-but-absent domains join in with n_d NULL -> counted as 0 in
    # the min; `observed` marks rows that exist in the corpus
    full = counts.withColumn("observed", F.lit(True)).join(
        spine, domain_col, "full_outer"
    )
    wd = F.element_at(wmap, F.col(domain_col))
    cap = F.when(  # NULL for unlisted (never binds)
        wd > 0, F.floor(F.coalesce(F.col("n_d"), F.lit(0)) / wd)
    )
    from pyspark.sql import Window

    n_total = F.min(cap).over(Window.partitionBy())  # min skips NULLs
    return (
        full.withColumn("quota", F.coalesce(F.floor(wd * n_total), F.lit(0)).cast("long"))
        .filter(F.col("observed"))
        .select(domain_col, "n_d", "quota")
    )


def mixture_sample(
    df: DataFrame,
    domain_col: str,
    weights: dict[str, float],
    id_col: str = "doc_id",
    seed: str = "mix",
    exact: bool = True,
    out_col: str = "mix_keep",
) -> DataFrame:
    """Subsample to a target domain mixture (the Pile/Llama-style data
    mixture reweighting: given per-domain weights, keep the largest
    corpus whose composition matches them, never upsampling). Adds a
    boolean `out_col`; filter on it to materialize the mixed corpus.

    exact=True: rank docs within each domain by (hash(seed:id), id) and
    keep the first `quota` — exact counts, deterministic under
    repartition/resume. Costs one shuffle on the domain; at 10^12 rows
    with few giant domains that partition-sort is the bottleneck, so use
    exact=False there: keep iff hash < (quota/n_d) * 2^32 — zero
    corpus shuffle (D-row quota table broadcast), counts correct to
    binomial noise (~sqrt(n_d), negligible at scale)."""
    from pyspark.sql import Window

    quotas = mixture_quotas(df, domain_col, weights)
    h = hash32(F.col(id_col).cast("string"), f"{seed}:")
    joined = df.join(F.broadcast(quotas), domain_col, "left")
    if exact:
        rn = F.row_number().over(
            Window.partitionBy(domain_col).orderBy(h.asc(), F.col(id_col).asc())
        )
        out = joined.withColumn(out_col, rn <= F.col("quota"))
    else:
        out = joined.withColumn(
            out_col, h < F.floor(F.col("quota") / F.col("n_d") * U32)
        )
    return out.drop("n_d", "quota").withColumn(
        out_col, F.coalesce(F.col(out_col), F.lit(False))
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    id_col: str = "doc_id",
    seed: str = "strata",
    default_fraction: float = 0.0,
) -> DataFrame:
    """Deterministic per-stratum downsampling (training-mix shaping: e.g.
    keep 100% of high-quality docs, 10% of low): keep a row iff
    hash(seed:id) < fraction * 2^32 for its stratum.

    Unlike DataFrame.sampleBy (seeded rand(), partition-order dependent),
    the hash predicate is a pure function of the row id — resampling after
    a repartition, filter, or resume keeps the SAME rows, which is what a
    resumable corpus pipeline needs. Pure column expression, no shuffle."""
    h = hash32(F.col(id_col).cast("string"), f"{seed}:")
    pred = None
    for stratum, frac in fractions.items():
        cond = (F.col(strata_col) == stratum) & (h < int(frac * (1 << 32)))
        pred = cond if pred is None else (pred | cond)
    # NULL-safe "not a listed stratum": (NULL == x) and NULL.isin(...) are
    # both NULL under three-valued logic, which would silently drop
    # NULL-strata rows regardless of default_fraction
    in_listed = F.coalesce(F.col(strata_col).isin(list(fractions)), F.lit(False))
    other = ~in_listed & (h < int(default_fraction * (1 << 32)))
    pred = other if pred is None else (pred | other)
    return df.filter(F.coalesce(pred, F.lit(False)))
