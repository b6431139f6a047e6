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
    weights need not sum to 1 — they are normalized."""
    total = sum(weights.values())
    h = hash32(key.cast("string"), f"{seed}:")
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
