"""Text analysis operators: language ID, quality scoring, token counting,
document fingerprinting. All pure column expressions (narrow, no shuffle,
whole-stage-codegen friendly) so they compose with the parse/route
pipeline at zero extra cost.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .dedup import MOD31, hash32, q4, words

# Minimal function-word lists for the n-gram-free language heuristic.
# (A real deployment swaps in per-language character-n-gram profiles; the
# operator shape — broadcast list, ratio, argmax — is identical.)
EN_STOPWORDS = [
    "the", "a", "an", "of", "to", "and", "in", "is", "it", "that",
    "for", "on", "with", "as", "by", "at", "or", "be",
]


def _ratio_in(ws: Column, wordlist: list[str]) -> Column:
    """Fraction of tokens that appear in `wordlist` (computed narrow via
    array_intersect-free aggregate so duplicates count). Empty arrays
    ratio 0.0, not NaN."""
    lit_set = F.array(*[F.lit(w) for w in wordlist])
    hits = F.aggregate(
        ws,
        F.lit(0),
        lambda acc, w: acc + F.when(F.array_contains(lit_set, w), 1).otherwise(0),
    )
    return hits.cast("double") / F.greatest(F.size(ws), F.lit(1)).cast("double")


def language_id(text: Column, min_ratio: float = 0.02) -> Column:
    """Heuristic language ID: stopword-hit ratio against per-language
    function-word lists; 'und' when no list clears min_ratio."""
    en = _ratio_in(_nonempty_words(text), EN_STOPWORDS)
    return F.when(en >= min_ratio, F.lit("en")).otherwise(F.lit("und"))


def english_ratio(text: Column) -> Column:
    # non-empty words: a doubled space would otherwise add a "" token to
    # the denominator and deflate the ratio ("the  cat  sat" would read
    # 1/5 English instead of 1/3, flipping near-threshold docs to 'und')
    return _ratio_in(_nonempty_words(text), EN_STOPWORDS)


def quality_score(text: Column) -> Column:
    """Composite document-quality score in [0, 1]:
    0.4 * length_score (saturates at 100 words)
    + 0.3 * lexical diversity (distinct/total words)
    + 0.3 * stopword presence (saturates at ratio 0.1).
    Deterministic double arithmetic, same evaluation order as the oracle.
    Word counts ignore the empty tokens a bare split-on-space emits for
    consecutive/leading/trailing spaces (see _nonempty_words)."""
    ws = _nonempty_words(text)
    n = F.size(ws).cast("double")
    length_score = F.least(n / F.lit(100.0), F.lit(1.0))
    diversity = F.size(F.array_distinct(ws)).cast("double") / F.greatest(
        n, F.lit(1.0)
    )
    stop = F.least(english_ratio(text) / F.lit(0.1), F.lit(1.0))
    return q4(
        F.lit(0.4) * length_score + F.lit(0.3) * diversity + F.lit(0.3) * stop
    )


# BPE-ish pre-tokenizer: letter runs, single digits, or single
# non-alphanumeric marks (GPT-2 pre-tokenization shape, ASCII-only).
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"


def token_counts(text: Column) -> tuple[Column, Column]:
    """(whitespace_tokens, bpe_ish_tokens) for a text column. Whitespace
    tokens are NON-EMPTY words ("the  cat" is 2 tokens, not 3)."""
    ws_count = F.size(_nonempty_words(text))
    bpe_count = F.regexp_count(text, F.lit(BPE_ISH_PATTERN))
    return ws_count, bpe_count


def fingerprint(text: Column) -> Column:
    """Order-sensitive rolling polynomial fingerprint of the word stream:
    fold (acc * 31 + hash32(word)) mod (2^31 - 1) left-to-right, seeded by
    the first word's hash. Used for cheap shift-robust doc identity.
    Empty tokens are excluded (a trailing space must not change the doc's
    identity); a document with no words fingerprints NULL."""
    hs = F.transform(_nonempty_words(text), lambda w: hash32(w))
    rest = F.slice(hs, 2, F.greatest(F.size(hs) - 1, F.lit(0)))
    return F.aggregate(
        rest,
        # get(), not element_at(): a no-word doc has an empty hash array
        # and element_at(.., 1) errors under ANSI mode — get returns NULL
        F.get(hs, 0),
        lambda acc, h: (acc * 31 + h) % MOD31,
    )


# ---------------------------------------------------------------------------
# Gopher-style repetition / shape signals (Rae et al. 2021, "Scaling
# Language Models", Table A1 quality filters — the standard pretraining
# corpus filters beside the composite quality score above). All pure
# column expressions; the DuckDB oracle mirrors the arithmetic.
# ---------------------------------------------------------------------------


def _nonempty_words(text: Column) -> Column:
    """Word array with the empty tokens a bare split-on-space produces
    for consecutive/leading/trailing spaces removed. The Gopher signals
    use this — otherwise 8 aligned spaces read as a 7-long repeated-word
    run and gopher_quality_filter drops a clean document."""
    return F.filter(words(text), lambda x: x != F.lit(""))


def distinct_ngram_fraction(text: Column, n: int = 2) -> Column:
    """distinct n-grams / total n-grams (low values = templated or
    repeated boilerplate; Gopher drops docs below per-n thresholds)."""
    from .dedup import array_shingles

    w = _nonempty_words(text)
    total = F.greatest(F.size(w) - F.lit(n - 1), F.lit(1)).cast("double")
    return q4(F.size(array_shingles(w, n)).cast("double") / total)


def max_word_run(text: Column) -> Column:
    """Longest run of the SAME word repeated consecutively (catches
    'buy buy buy buy ...' spam). One fold over the word array carrying
    (previous word, current run, best run) in a struct accumulator."""
    w = _nonempty_words(text)
    init = F.struct(
        F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
    )

    def step(acc, x):
        run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
        return F.struct(
            x.alias("prev"), run.alias("run"),
            F.greatest(acc["best"], run).alias("best"),
        )

    return F.aggregate(w, init, step, lambda acc: acc["best"])


def symbol_word_ratio(text: Column) -> Column:
    """Gopher's symbol-to-word ratio: occurrences of the hash symbol or
    an ellipsis ('…' or '...') per word — the paper's actual targets
    (Rae et al. 2021, Table A1). Counting EVERY non-alphanumeric char
    here would read each accented letter in clean French/Spanish text as
    a symbol and silently drop virtually all non-ASCII documents at the
    0.1 threshold."""
    symbols = F.regexp_count(text, F.lit(r"#|…|\.\.\."))
    return q4(
        symbols.cast("double")
        / F.greatest(F.size(_nonempty_words(text)), F.lit(1)).cast("double")
    )


def mean_word_length(text: Column) -> Column:
    """Mean characters per word (Gopher keeps 3..10)."""
    w = _nonempty_words(text)
    total_chars = F.aggregate(w, F.lit(0), lambda acc, x: acc + F.length(x))
    return q4(
        total_chars.cast("double") / F.greatest(F.size(w), F.lit(1)).cast("double")
    )


def gopher_quality_filter(
    text: Column,
    *,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_word_ratio: float = 0.1,
    min_distinct_2gram_fraction: float = 0.2,
    max_word_run_len: int = 6,
) -> Column:
    """Boolean keep/drop combining the individual signals with the
    Gopher-paper default thresholds (tunable per corpus)."""
    n = F.size(_nonempty_words(text))
    return (
        (n >= min_words)
        & (n <= max_words)
        & mean_word_length(text).between(min_mean_word_len, max_mean_word_len)
        & (symbol_word_ratio(text) <= max_symbol_word_ratio)
        & (distinct_ngram_fraction(text, 2) >= min_distinct_2gram_fraction)
        & (max_word_run(text) <= max_word_run_len)
    )
