"""Benchmark decontamination + PII scrubbing for training corpora.

Standard LLM-data hygiene (the n-gram-overlap method popularized by the
GPT-3/PaLM/Llama data cards: a training document is contaminated if it
shares any length-n word n-gram with a benchmark/eval set):

- `ngram_contamination`: inverted-index join of document n-grams against
  the benchmark n-gram set. The benchmark side is small by construction
  (eval sets are thousands of docs, not billions) -> broadcast, so the
  check is a map-side join + one aggregation at any corpus scale.
- `pii_scrub`: email / phone / IPv4 / SSN-shaped redaction as pure
  regexp_replace chains (JVM, no UDF) with per-kind hit counts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import word_shingles


def benchmark_ngrams(benchmark: DataFrame, text_col: str = "text", n: int = 8) -> DataFrame:
    """Distinct word n-grams of the benchmark set -> one `gram` column."""
    return (
        benchmark.select(F.explode(word_shingles(F.col(text_col), n)).alias("gram"))
        .distinct()
    )


def ngram_contamination(
    docs: DataFrame,
    benchmark: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    min_hits: int = 1,
) -> DataFrame:
    """Documents sharing >= min_hits n-grams with the benchmark set.
    Returns (doc_id, n_hits) for contaminated docs.

    Plan: docs explode their n-grams (narrow), inner-join the BROADCAST
    benchmark gram set, count per doc — the corpus is never shuffled on
    anything wider than (doc_id, count) partials."""
    grams = benchmark_ngrams(benchmark, text_col, n)
    doc_grams = docs.select(
        F.col(id_col), F.explode(word_shingles(F.col(text_col), n)).alias("gram")
    )
    hits = doc_grams.join(F.broadcast(grams), "gram")
    out = hits.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_hits"))
    return out.filter(F.col("n_hits") >= min_hits)


PII_PATTERNS: dict[str, str] = {
    # order matters: scrub emails before bare domains, phones before ints
    "email": r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}",
    # (?<!\d) instead of a leading \b: \b can't match before '(' or '+',
    # which left those prefix characters unredacted in the scrubbed text
    "phone": r"(?<!\d)(?:\+?\d{1,2}[ .\-]?)?\(?\d{3}\)?[ .\-]?\d{3}[ .\-]?\d{4}\b",
    "ipv4": r"\b(?:(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)\.){3}(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)\b",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
}


def pii_scrub(
    df: DataFrame,
    text_col: str = "text",
    out_col: str | None = None,
    kinds: list[str] | None = None,
    mask: str = "<{kind}>",
) -> DataFrame:
    """Redact PII-shaped spans, adding `pii_<kind>_count` columns and the
    scrubbed text. Pure column expressions (regexp_count/regexp_replace)."""
    kinds = kinds or list(PII_PATTERNS)
    scrubbed: Column = F.col(text_col)
    out = df
    for kind in kinds:
        rx = PII_PATTERNS[kind]
        out = out.withColumn(f"pii_{kind}_count", F.regexp_count(scrubbed, F.lit(rx)))
        scrubbed = F.regexp_replace(scrubbed, rx, mask.format(kind=kind))
    return out.withColumn(out_col or f"{text_col}_scrubbed", scrubbed)
