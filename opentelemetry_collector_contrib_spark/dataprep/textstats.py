"""Text analysis operators: language ID, quality scoring, token counting,
document fingerprinting. All pure column expressions (narrow, no shuffle,
whole-stage-codegen friendly) so they compose with the parse/route
pipeline at zero extra cost.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .dedup import MOD31, hash32, words

# Minimal function-word lists for the n-gram-free language heuristic.
# (A real deployment swaps in per-language character-n-gram profiles; the
# operator shape — broadcast list, ratio, argmax — is identical.)
EN_STOPWORDS = [
    "the", "a", "an", "of", "to", "and", "in", "is", "it", "that",
    "for", "on", "with", "as", "by", "at", "or", "be",
]


def _ratio_in(ws: Column, wordlist: list[str]) -> Column:
    """Fraction of tokens that appear in `wordlist` (computed narrow via
    array_intersect-free aggregate so duplicates count)."""
    lit_set = F.array(*[F.lit(w) for w in wordlist])
    hits = F.aggregate(
        ws,
        F.lit(0),
        lambda acc, w: acc + F.when(F.array_contains(lit_set, w), 1).otherwise(0),
    )
    return hits.cast("double") / F.size(ws).cast("double")


def language_id(text: Column, min_ratio: float = 0.02) -> Column:
    """Heuristic language ID: stopword-hit ratio against per-language
    function-word lists; 'und' when no list clears min_ratio."""
    en = _ratio_in(words(text), EN_STOPWORDS)
    return F.when(en >= min_ratio, F.lit("en")).otherwise(F.lit("und"))


def english_ratio(text: Column) -> Column:
    return _ratio_in(words(text), EN_STOPWORDS)


def quality_score(text: Column) -> Column:
    """Composite document-quality score in [0, 1]:
    0.4 * length_score (saturates at 100 words)
    + 0.3 * lexical diversity (distinct/total words)
    + 0.3 * stopword presence (saturates at ratio 0.1).
    Deterministic double arithmetic, same evaluation order as the oracle."""
    ws = words(text)
    n = F.size(ws).cast("double")
    length_score = F.least(n / F.lit(100.0), F.lit(1.0))
    diversity = F.size(F.array_distinct(ws)).cast("double") / n
    stop = F.least(english_ratio(text) / F.lit(0.1), F.lit(1.0))
    return F.round(
        F.lit(0.4) * length_score + F.lit(0.3) * diversity + F.lit(0.3) * stop, 4
    )


# BPE-ish pre-tokenizer: letter runs, single digits, or single
# non-alphanumeric marks (GPT-2 pre-tokenization shape, ASCII-only).
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"


def token_counts(text: Column) -> tuple[Column, Column]:
    """(whitespace_tokens, bpe_ish_tokens) for a text column."""
    ws_count = F.size(words(text))
    bpe_count = F.regexp_count(text, F.lit(BPE_ISH_PATTERN))
    return ws_count, bpe_count


def fingerprint(text: Column) -> Column:
    """Order-sensitive rolling polynomial fingerprint of the word stream:
    fold (acc * 31 + hash32(word)) mod (2^31 - 1) left-to-right, seeded by
    the first word's hash. Used for cheap shift-robust doc identity."""
    hs = F.transform(words(text), lambda w: hash32(w))
    rest = F.slice(hs, 2, F.greatest(F.size(hs) - 1, F.lit(0)))
    return F.aggregate(
        rest,
        F.element_at(hs, 1),
        lambda acc, h: (acc * 31 + h) % MOD31,
    )
