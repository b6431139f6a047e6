"""Sequence packing: tokenized documents -> fixed-length training rows.

The standard concat-and-chunk packing used for LLM pretraining batches
(documents concatenated in a deterministic order, the token stream sliced
into max_len windows; the tail shorter than max_len is kept or dropped).

Spark-first shape for 10^12 tokens:
- the corpus is SHARDED by a deterministic key (doc_id % num_shards) and
  packed within shards — the same thing a distributed data loader does
  per worker. Cross-shard boundaries lose at most (num_shards - 1) tail
  windows, and sharding is what makes the op scale: each shard's token
  stream must fit one task, so num_shards is sized to
  corpus_tokens / (tokens per task you want).
- within a shard everything is JVM higher-order functions: one
  groupBy(shard) shuffle carrying (doc_id, tokens), an ordered flatten,
  then slice() windows exploded back out. No Python in the path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    max_len: int,
    *,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    num_shards: int = 8,
    drop_tail: bool = False,
) -> DataFrame:
    """-> (shard, seq_index, tokens, n_tok): deterministic fixed-length
    training sequences. Documents are ordered by id within their shard;
    a document may span two adjacent output rows (concat-and-chunk, no
    padding inserted)."""
    shard = (F.col(id_col) % num_shards).alias("shard")
    # one NULL tokens array would NULL the whole shard's flatten() and
    # silently drop every other document in it — normalize to empty
    safe_tokens = F.coalesce(F.col(tokens_col), F.array().cast(df.schema[tokens_col].dataType))
    per_shard = (
        df.select(shard, F.struct(F.col(id_col).alias("id"), safe_tokens.alias("t")).alias("e"))
        .groupBy("shard")
        .agg(F.array_sort(F.collect_list("e")).alias("docs"))
        .withColumn("stream", F.flatten(F.transform(F.col("docs"), lambda d: d["t"])))
        .drop("docs")
        # a shard whose every doc tokenized to [] has an empty stream:
        # sequence(0, -1) would emit the DESCENDING [0, -1] and fabricate
        # two zero-length training rows — emit nothing instead
        .filter(F.size("stream") > 0)
    )
    n_chunks = F.ceil(F.size("stream") / F.lit(max_len)).cast("int")
    chunks = per_shard.select(
        "shard",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), n_chunks - 1),
                lambda i: F.slice(F.col("stream"), i * max_len + 1, max_len),
            )
        ).alias("seq_index", "tokens"),
    ).withColumn("n_tok", F.size("tokens"))
    if drop_tail:
        chunks = chunks.filter(F.col("n_tok") == max_len)
    return chunks


def token_span_duplication(
    df: DataFrame,
    span_len: int = 16,
    *,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    min_count: int = 2,
) -> DataFrame:
    """Exact-substring duplication signal over TOKEN sequences (the
    dedup-training-data measure of Lee et al. 2022: spans of >= span_len
    tokens repeated across the corpus): every length-span_len token
    window is hashed (one xxhash64 per window, JVM-side), window hashes
    are counted corpus-wide, and each document gets the fraction of its
    token positions covered by a window that appears >= min_count times.

    Returns (doc_id, n_tok, dup_spans, span_fraction). Shape at scale:
    explode to (hash) -> count (one map-side-combined shuffle) ->
    broadcast-ish join back on the hash; skew on ultra-common spans is
    AQE-split like every other hot-key join here."""
    w = F.col(tokens_col)
    n = F.size(w)
    # docs shorter than span_len have zero windows; sequence(1, 0) would
    # emit the DESCENDING [1, 0] and slice(..., 0, _) then raises
    # INVALID_PARAMETER_VALUE.START — mask them to an empty index array
    idxs = F.when(
        n >= span_len, F.sequence(F.lit(1), n - span_len + 1)
    ).otherwise(F.array().cast("array<int>"))
    span_hash = lambda i: F.xxhash64(  # noqa: E731
        F.concat_ws(",", F.transform(F.slice(w, i, span_len), lambda t: t.cast("string")))
    )
    spans = df.select(
        F.col(id_col),
        n.alias("n_tok"),
        F.explode(F.transform(idxs, span_hash)).alias("h"),
    )
    counts = spans.groupBy("h").agg(F.count(F.lit(1)).alias("c"))
    dup = (
        spans.join(counts.filter(F.col("c") >= min_count), "h")
        .groupBy(id_col, "n_tok")
        .agg(F.count(F.lit(1)).alias("dup_spans"))
    )
    all_docs = df.select(F.col(id_col), F.size(w).alias("n_tok"))
    out = all_docs.join(dup, [id_col, "n_tok"], "left").withColumn(
        "dup_spans", F.coalesce("dup_spans", F.lit(0))
    )
    denom = F.greatest(F.col("n_tok") - span_len + 1, F.lit(1))
    return out.withColumn(
        "span_fraction", F.round(F.col("dup_spans") / denom, 4)
    )
