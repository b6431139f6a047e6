"""Byte-pair-encoding tokenizer: distributed training + vectorized apply.

The `tokens` payload axis end-to-end: the rest of the repo consumes
pre-tokenized `(doc_id, tokens array<int>)` tables; this module produces
them from raw text with a BPE tokenizer (Sennrich et al. 2016, the
standard LLM pretraining tokenizer family) built Spark-first:

- train_bpe: the pair-count step is the canonical MapReduce job — one
  corpus pass builds the DISTINCT word-frequency table (tiny vs the
  corpus; the classic BPE training optimization), then each merge round
  is one weighted adjacent-pair aggregation over that table plus one
  Arrow-batched merge apply. num_merges rounds = num_merges small Spark
  jobs; the corpus is never rescanned.
- bpe_encode: applies the learned merge ranks per word in an
  Arrow-batched pandas UDF with a per-batch word cache (natural-language
  batches repeat most words, so amortized cost per row is near the
  dictionary-lookup floor).
- build_vocab / encode_ids: deterministic id assignment (sorted alphabet
  first, then merge products in merge order — the GPT-2 convention), so
  two runs over differently-partitioned corpora emit identical ids.

Scale shape: train touches the word-frequency table only (one corpus
shuffle total); encode is embarrassingly parallel with zero shuffles.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def word_frequencies(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) over the corpus — the single corpus-wide shuffle in
    BPE training, map-side combined."""
    return (
        df.select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _chars(word: Column) -> Column:
    # sequence(1, 0) DESCENDS to [1, 0] for the empty word, fabricating
    # two '' pieces — one blank doc would then inject '' into the vocab
    # at id 0 and silently shift every other token id
    n = F.length(word)
    idxs = F.when(n > 0, F.sequence(F.lit(1), n)).otherwise(
        F.array().cast("array<int>")
    )
    return F.transform(idxs, lambda i: F.substring(word, i, 1))


def _merge_pair_udf(a: str, b: str):
    @pandas_udf("array<string>")
    def _merge(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in batches:
            def one(toks):
                out = []
                i = 0
                n = len(toks)
                while i < n:
                    if i + 1 < n and toks[i] == a and toks[i + 1] == b:
                        out.append(a + b)
                        i += 2
                    else:
                        out.append(toks[i])
                        i += 1
                return out

            yield s.map(one)

    return _merge


def train_bpe(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 100,
    min_freq: int = 2,
) -> list[tuple[str, str]]:
    """Learn `num_merges` merges: each round takes the corpus-weighted
    most frequent adjacent token pair (ties broken lexicographically so
    training is partitioning-independent) and merges it everywhere.
    Stops early when no pair clears min_freq."""
    wf = (
        word_frequencies(df, text_col)
        .select("freq", _chars(F.col("word")).alias("toks"))
        .persist()
    )
    merges: list[tuple[str, str]] = []
    cur = wf
    try:
        for _ in range(num_merges):
            pairs = cur.select(
                "freq",
                F.explode(
                    F.zip_with(
                        F.col("toks"),
                        F.slice(F.col("toks"), 2, F.greatest(F.size("toks") - 1, F.lit(1))),
                        lambda x, y: F.struct(x.alias("a"), y.alias("b")),
                    )
                ).alias("p"),
            ).filter(F.col("p.b").isNotNull())
            best = (
                pairs.groupBy("p")
                .agg(F.sum("freq").alias("n"))
                .orderBy(F.col("n").desc(), F.col("p.a").asc(), F.col("p.b").asc())
                .first()
            )
            if best is None or best["n"] < min_freq:
                break
            a, b = best["p"]["a"], best["p"]["b"]
            merges.append((a, b))
            nxt = cur.withColumn("toks", _merge_pair_udf(a, b)(F.col("toks"))).persist()
            # materialize the new cache BEFORE dropping the old one —
            # unpersisting first would make every later round re-execute
            # the whole merge-UDF chain from the shuffle (quadratic work)
            nxt.count()
            cur.unpersist()
            cur = nxt
    finally:
        cur.unpersist()
    return merges


def bpe_encode(
    text: Column, merges: list[tuple[str, str]]
) -> Column:
    """array<string> of BPE pieces for a text column (space-separated
    words, merges applied per word by learned rank). Per-batch word cache
    keeps the per-row cost near a dict lookup for natural text."""
    ranks = {pair: i for i, pair in enumerate(merges)}

    def encode_word(word: str) -> list[str]:
        toks = list(word)
        while len(toks) > 1:
            best_rank = None
            best_i = -1
            for i in range(len(toks) - 1):
                r = ranks.get((toks[i], toks[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_i = r, i
            if best_rank is None:
                break
            toks[best_i : best_i + 2] = [toks[best_i] + toks[best_i + 1]]
        return toks

    @pandas_udf("array<string>")
    def _enc(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        # the cache lives for the TASK (all Arrow batches of a partition),
        # so it must be bounded: a high-cardinality partition (urls, ids)
        # would otherwise grow the Python worker without limit. Cleared
        # wholesale at the cap — natural-language word frequency is
        # zipfian, so the hot head repopulates within one batch.
        cache: dict[str, list[str]] = {}
        CACHE_CAP = 500_000

        def one(t):
            if t is None:
                return None
            out: list[str] = []
            for w in t.split(" "):
                if not w:
                    continue
                hit = cache.get(w)
                if hit is None:
                    if len(cache) >= CACHE_CAP:
                        cache.clear()
                    hit = cache[w] = encode_word(w)
                out.extend(hit)
            return out

        for s in batches:
            yield s.map(one)

    return _enc(text)


def build_vocab(
    df: DataFrame, text_col: str, merges: list[tuple[str, str]]
) -> dict[str, int]:
    """Deterministic piece -> id map: the corpus alphabet sorted, then
    merge products in merge order (GPT-2 convention). One small distinct
    aggregation for the alphabet."""
    alphabet = sorted(
        r["c"]
        for r in df.select(
            F.explode(_chars(F.regexp_replace(F.col(text_col), " ", ""))).alias("c")
        )
        .distinct()
        .collect()
    )
    vocab = {c: i for i, c in enumerate(alphabet)}
    for a, b in merges:
        piece = a + b
        if piece not in vocab:
            vocab[piece] = len(vocab)
    return vocab


def encode_ids(
    text: Column, merges: list[tuple[str, str]], vocab: dict[str, int]
) -> Column:
    """array<int> token ids (unknown pieces -> NULL element, surfaced
    rather than silently dropped)."""
    pieces = bpe_encode(text, merges)
    m = F.map_from_arrays(
        F.array(*[F.lit(k) for k in vocab]),
        F.array(*[F.lit(v) for v in vocab.values()]),
    )
    return F.transform(pieces, lambda p: F.element_at(m, p))


def decode_ids(ids: Column, vocab: dict[str, int]) -> Column:
    """array<string> pieces for an id-array column — the inverse of
    encode_ids (unknown ids -> NULL element, surfaced not dropped).
    Word boundaries are not part of the piece stream (standard BPE
    without a boundary marker), so joining the pieces reconstructs the
    space-stripped text: concat_ws('', decode_ids(encode_ids(t))) ==
    replace(t, ' ', ''). Pure column op: one literal id->piece map."""
    m = F.map_from_arrays(
        F.array(*[F.lit(v) for v in vocab.values()]),
        F.array(*[F.lit(k) for k in vocab]),
    )
    return F.transform(ids, lambda i: F.element_at(m, i))
