"""End-to-end pretraining-corpus curation: the full recipe a
training-data run executes, composed from the building blocks in this
package — the pipeline shape of the public data cards (GPT-3 appendix A,
Gopher §A.1.1, Llama, RefinedWeb):

    exact dedup -> near-dup removal (MinHash+LSH + connected components)
    -> Gopher heuristic quality filter -> CCNet perplexity bucket filter
    -> optional mixture/DSIR selection -> deterministic split
    -> tokenize -> ExactSubstr duplicate-span removal -> pack

Every stage is a lazy DataFrame -> DataFrame transform built on hash
determinism (no rand() anywhere), so a resumed or repartitioned run
produces byte-identical output. `curate_corpus` returns the named
intermediate frames so callers can count/inspect/persist any stage
without re-deriving it.

Scale notes are on the building blocks themselves; this module adds no
shuffle beyond what each stage documents.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import ccnet, dedup, packing, split, textstats


def default_tokenizer(text_col: str = "text"):
    """Deterministic hashed-vocab word tokenizer (the suite's stand-in
    for a trained BPE; swap in tokenize.bpe_encode for a real one)."""
    return F.transform(
        F.split(F.col(text_col), " "), lambda w: (dedup.hash32(w) % 50257).cast("int")
    )


def curate_corpus(
    spark: SparkSession,
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    target_lang: str = "en",
    gopher_kw: dict | None = None,
    neardup_threshold: float = 0.8,
    ppl_buckets: int = 512,
    ppl_keep: tuple[str, ...] = ("head", "middle"),
    mixture_weights: dict[str, float] | None = None,
    split_weights: dict[str, float] | None = None,
    tokens_fn: Callable[[], F.Column] | None = None,
    span_len: int = 16,
    max_len: int = 1024,
    num_shards: int = 8,
    minhash_kw: dict | None = None,
) -> dict[str, DataFrame]:
    """Run the curation recipe; returns the named stages:

    - ``deduped``:  exact + near-dup removal survivors
    - ``filtered``: after the Gopher heuristic filter
    - ``scored``:   filtered + (logppl, ppl_bucket) columns
    - ``selected``: after perplexity-bucket + optional mixture selection
    - ``assigned``: selected + deterministic ``split`` column
    - ``tokens``:   (id, split, tokens) after tokenize + ExactSubstr
                    duplicate-span removal (adds ``n_removed``)
    - ``packed``:   fixed-length training rows for the train split

    The perplexity LM is fit on the *filtered* target-language slice —
    fitting after the heuristic filter keeps boilerplate out of the
    reference distribution (CCNet fits on Wikipedia for the same
    reason)."""
    # 1. exact dedup on a 128-bit digest of the normalized text (the
    # groupBy shuffle then carries 16 bytes per doc, not the document
    # body — the difference between a metadata shuffle and re-shuffling
    # the corpus at 10^12 docs), then near-dup removal
    key = F.md5(F.lower(F.trim(F.col(text_col))))
    keepers = dedup.exact_dedup(docs, key, id_col=id_col).select(
        F.col("keeper_id").alias(id_col)
    )
    exact_kept = docs.join(keepers, id_col)
    # minhash_kw passes through to dedupe_corpus/minhash_lsh_pairs
    # (e.g. hash_impl='md5' for the DuckDB-mirrorable oracle path;
    # production default stays the ~10x-cheaper xxhash)
    deduped = dedup.dedupe_corpus(
        exact_kept, text_col, id_col, threshold=neardup_threshold,
        **(minhash_kw or {}),
    )

    # 2. heuristic quality filter
    filtered = deduped.filter(
        textstats.gopher_quality_filter(F.col(text_col), **(gopher_kw or {}))
    )

    # 3. perplexity filter: LM on the filtered target-lang slice
    lm, ctx = ccnet.bigram_lm(
        filtered.filter(F.col(lang_col) == target_lang),
        text_col=text_col,
        buckets=ppl_buckets,
    )
    # histogram-exact tertile cutoffs, broadcast back — never the NTILE
    # path (an unpartitioned window = single-partition sort of every
    # post-filter score; a hard scale-killer at 10^12 docs)
    ppl = ccnet.ppl_bucket_hist(
        ccnet.score_logppl(
            filtered, lm, ctx, id_col=id_col, text_col=text_col, buckets=ppl_buckets
        )
    )
    scored = filtered.join(
        ppl.select(id_col, "logppl", "ppl_bucket"), id_col
    )
    selected = scored.filter(F.col("ppl_bucket").isin(list(ppl_keep)))

    # 4. optional mixture selection
    if mixture_weights:
        selected = split.mixture_sample(
            selected, lang_col, mixture_weights, id_col=id_col
        ).filter("mix_keep").drop("mix_keep")

    # 5. deterministic split
    assigned = split.hash_split(
        selected, id_col, split_weights or {"train": 0.9, "val": 0.05, "test": 0.05}
    )

    # 6. tokenize + ExactSubstr duplicate-span removal
    toks = assigned.select(
        id_col, "split", (tokens_fn() if tokens_fn else default_tokenizer(text_col)).alias("tokens")
    )
    clean = packing.exact_substring_removal(
        toks, span_len=span_len, id_col=id_col
    ).join(toks.select(id_col, "split"), id_col)

    # 7. pack the train split
    packed = packing.pack_sequences(
        clean.filter(F.col("split") == "train"),
        max_len=max_len,
        id_col=id_col,
        num_shards=num_shards,
    )

    return {
        "deduped": deduped,
        "filtered": filtered,
        "scored": scored,
        "selected": selected,
        "assigned": assigned,
        "tokens": clean,
        "packed": packed,
    }
