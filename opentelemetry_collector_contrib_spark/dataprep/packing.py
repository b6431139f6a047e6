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


def _window_index_hashes(w, span_len: int):
    """(idxs, span_hash): the 1-based start positions of every
    length-span_len window in token array `w`, and a hash expression per
    start. Shared by token_span_duplication and exact_substring_removal —
    the measure and removal halves of ExactSubstr MUST hash windows
    identically or their duplicated-span sets silently diverge.

    Docs shorter than span_len have zero windows; sequence(1, 0) would
    emit the DESCENDING [1, 0] and slice(..., 0, _) then raises
    INVALID_PARAMETER_VALUE.START — mask them to an empty index array."""
    n = F.size(w)
    idxs = F.when(
        n >= span_len, F.sequence(F.lit(1), n - span_len + 1)
    ).otherwise(F.array().cast("array<int>"))

    def span_hash(i):
        return F.xxhash64(
            F.concat_ws(
                ",", F.transform(F.slice(w, i, span_len), lambda t: t.cast("string"))
            )
        )

    return idxs, span_hash


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
    WINDOWS that appear >= min_count times corpus-wide
    (dup_spans / (n_tok - span_len + 1) — a window fraction, NOT the
    fraction of token positions covered: overlapping duplicated windows
    cover more positions than they count as windows; use
    exact_substring_removal's n_removed / n_tok when position coverage
    is the quantity you filter on).

    Returns (doc_id, n_tok, dup_spans, span_fraction). Shape at scale:
    explode to (hash) -> count (one map-side-combined shuffle) ->
    broadcast-ish join back on the hash; skew on ultra-common spans is
    AQE-split like every other hot-key join here."""
    w = F.col(tokens_col)
    n = F.size(w)
    idxs, span_hash = _window_index_hashes(w, span_len)
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


def pack_sequences_with_spans(
    df: DataFrame,
    max_len: int,
    *,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    num_shards: int = 8,
    drop_tail: bool = False,
) -> DataFrame:
    """pack_sequences + per-sequence document-boundary metadata: adds
    ``doc_spans array<struct<start:int, doc_id:long, len:int>>`` (sorted
    by start, 0-based within the sequence) — what a training loader
    needs to build block-diagonal attention masks over concat-and-chunk
    sequences (a doc crossing a chunk boundary contributes a span to
    both chunks).

    Scale shape: the spans side never re-shuffles the token arrays —
    offsets come from a window over (shard, id, n_tok) ONLY (a few
    longs per doc), each doc explodes to its 1 + n_tok/max_len touched
    chunks, and one groupBy(shard, chunk) collects the per-sequence
    span list, joined back to the packed output on (shard, seq_index)."""
    from pyspark.sql import Window

    packed = pack_sequences(
        df,
        max_len,
        id_col=id_col,
        tokens_col=tokens_col,
        num_shards=num_shards,
        drop_tail=drop_tail,
    )
    L = max_len
    shard = (F.col(id_col) % num_shards).alias("shard")
    lens = df.select(
        shard,
        F.col(id_col).alias("__id"),
        F.coalesce(F.size(tokens_col), F.lit(0)).alias("__n"),
    ).filter(F.col("__n") > 0)
    w = (
        Window.partitionBy("shard")
        .orderBy("__id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = lens.withColumn("__off", F.coalesce(F.sum("__n").over(w), F.lit(0)))
    first_c = (F.col("__off") / L).cast("int")
    last_c = ((F.col("__off") + F.col("__n") - 1) / L).cast("int")
    spans = (
        offs.select(
            "shard",
            "__id",
            "__off",
            "__n",
            F.explode(F.sequence(first_c, last_c)).alias("seq_index"),
        )
        .select(
            "shard",
            "seq_index",
            F.struct(
                F.greatest(F.col("__off") - F.col("seq_index") * L, F.lit(0))
                .cast("int")
                .alias("start"),
                F.col("__id").alias("doc_id"),
                (
                    F.least(F.col("__off") + F.col("__n"), (F.col("seq_index") + 1) * F.lit(L))
                    - F.greatest(F.col("__off"), F.col("seq_index") * F.lit(L))
                )
                .cast("int")
                .alias("len"),
            ).alias("span"),
        )
        .groupBy("shard", "seq_index")
        .agg(F.array_sort(F.collect_list("span")).alias("doc_spans"))
    )
    return packed.join(spans, ["shard", "seq_index"])


def exact_substring_removal(
    df: DataFrame,
    span_len: int = 16,
    *,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    min_count: int = 2,
    keep_first: bool = True,
) -> DataFrame:
    """The removal half of Lee et al. 2022 ExactSubstr dedup (the
    measure half is token_span_duplication): every corpus position
    covered by a length-span_len token window that occurs >= min_count
    times is cut out of the document; with keep_first=True the
    corpus-minimum (id, pos) occurrence of each duplicated window is
    exempt, so exactly one copy of each duplicated span survives
    (window-level policy — a position in the first-occurrence doc can
    still be removed when a *different* duplicated window covers it).

    Returns (id, tokens cleaned, n_tok, n_removed) — one row per input
    doc, token order preserved.

    Shape at scale: explode to (id, pos, window-hash) -> ONE shuffle on
    the hash (count + row_number in the same window partition) ->
    groupBy(id) to collect each doc's removed starts -> join back and
    cut with a JVM filter-with-index. The per-doc coverage test is
    exists() over the doc's duplicated starts — O(n_tok * dup_starts)
    per doc, which is the right trade until dup density is extreme
    (then pre-merge the starts into intervals)."""
    from pyspark.sql import Window

    w = F.col(tokens_col)
    n = F.size(w)
    idxs, span_hash = _window_index_hashes(w, span_len)
    spans = df.select(
        F.col(id_col),
        F.explode(
            F.transform(idxs, lambda i: F.struct(i.alias("pos"), span_hash(i).alias("h")))
        ).alias("s"),
    ).select(id_col, F.col("s.pos").alias("pos"), F.col("s.h").alias("h"))
    part = Window.partitionBy("h")
    occ = spans.select(
        id_col,
        "pos",
        F.count(F.lit(1)).over(part).alias("c"),
        F.row_number()
        .over(part.orderBy(F.col(id_col).asc(), F.col("pos").asc()))
        .alias("rn"),
    )
    removed = occ.filter(
        (F.col("c") >= min_count) & (F.col("rn") > 1 if keep_first else F.lit(True))
    )
    starts = removed.groupBy(id_col).agg(
        F.array_sort(F.collect_list("pos")).alias("__starts")
    )
    st = F.col("__starts")
    # i is the 0-based token index; starts are 1-based window positions
    covered = lambda i: F.exists(  # noqa: E731
        st, lambda s: (i + 1 >= s) & (i + 1 < s + span_len)
    )
    kept = F.when(st.isNull(), w).otherwise(
        F.filter(w, lambda t, i: ~covered(i))
    )
    return (
        df.join(starts, id_col, "left")
        .select(
            F.col(id_col),
            kept.alias(tokens_col),
            n.alias("__n_orig"),
        )
        .select(
            id_col,
            tokens_col,
            F.size(tokens_col).alias("n_tok"),
            (F.col("__n_orig") - F.size(tokens_col)).alias("n_removed"),
        )
    )


def shuffle_sequences(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    num_shards: int = 64,
    seed: str = "shuffle-v1",
) -> DataFrame:
    """Deterministic corpus shuffle-and-shard — the final stage every
    pretraining data loader needs: rows are scattered pseudorandomly
    across num_shards output shards and given a pseudorandom position
    within their shard, WITHOUT a global sort.

    Adds (shuffle_shard int, shuffle_pos int): shard = hash32(seed, id) %
    num_shards, pos = rank of a 60-BIT hash within the shard (ties broken
    by id, so the assignment is total and reproducible across runs/
    partitioning). The within-shard sort key is hash60, not hash32: at
    the design scale of 10^12 rows a 32-bit key collides for ~N/2^32
    (hundreds of) rows per value, and the id tie-break would leave runs
    of consecutive-id documents adjacent in the "shuffled" order; 60 bits
    push expected collisions to ~0. hash60 is the first 15 hex chars of
    the same md5 whose first 8 are hash32, so the shard modulus is just
    the hash's top 32 bits — one md5 per row serves both columns.

    Shape at scale: ONE hash shuffle (the row_number window partitioned
    by shard) — no global ordering, no skew (the hash is uniform), and
    num_shards is sized so a shard is one output file (~corpus/num_shards
    rows each). Changing the seed is a full reshuffle, as intended
    (epoch reshuffles use seed=f"epoch-{i}")."""
    from pyspark.sql import Window

    from .dedup import hash60

    key = hash60(F.col(id_col).cast("string"), seed)
    w = Window.partitionBy("shuffle_shard").orderBy("__key", id_col)
    return (
        df.withColumn("__key", key)
        # top 32 of the 60 bits == hash32 of the same (seed, id)
        .withColumn(
            "shuffle_shard",
            (F.shiftright(F.col("__key"), 28) % num_shards).cast("int"),
        )
        .withColumn("shuffle_pos", (F.row_number().over(w) - 1).cast("int"))
        .drop("__key")
    )


def length_buckets(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    len_col: str = "n_tok",
    max_batch_tokens: int = 16384,
    seed: str = "shuffle-v1",
) -> DataFrame:
    """Length-bucketed batch assembly: rows are grouped into power-of-two
    length buckets (bucket b holds lengths in (2^(b-1), 2^b]; length<=1
    lands in bucket 1) and assigned deterministic batch ids so each batch
    pads to its bucket's capacity — the padding-efficiency trick for
    variable-length training/inference batching. Batch size per bucket is
    max(1, max_batch_tokens / 2^b), so every batch costs ~max_batch_tokens
    padded tokens regardless of bucket.

    Adds (bucket int, batch_id int, batch_pos int). Order within a bucket
    is pseudorandom (same hash60 key family as shuffle_sequences — 60
    bits so the id tie-break at 10^12 rows stays a tie-break, not the
    de-facto order; batches are length-homogeneous but content-shuffled).

    The bucket index is integer-exact in both engines —
    length(bin(greatest(n-1, 1))) — no float log2 edge cases at exact
    powers of two. Shape at scale: one window shuffle partitioned by
    bucket; buckets are few (~log2(max_len)) but each window only
    computes row_number, and per-bucket skew is bounded by corpus length
    distribution — repartition on (bucket, batch_id) afterwards if a
    writer wants one file per batch group."""
    from pyspark.sql import Window

    from .dedup import hash60

    n = F.col(len_col)
    b = F.length(F.bin(F.greatest(n - 1, F.lit(1)))).cast("int")
    cap = F.pow(F.lit(2.0), F.col("bucket"))
    batch_size = F.greatest(
        F.lit(1).cast("long"), F.floor(F.lit(max_batch_tokens) / cap).cast("long")
    )
    w = Window.partitionBy("bucket").orderBy("__key", id_col)
    rn = F.row_number().over(w) - 1
    return (
        df.withColumn("bucket", b)
        .withColumn("__key", hash60(F.col(id_col).cast("string"), seed))
        .withColumn("__rn", rn)
        .withColumn("batch_id", (F.col("__rn") / batch_size).cast("int"))
        .withColumn("batch_pos", (F.col("__rn") % batch_size).cast("int"))
        .drop("__key", "__rn")
    )


def pack_sequences_bestfit(
    df: DataFrame,
    max_len: int,
    *,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    num_shards: int = 8,
) -> DataFrame:
    """Bin-packing variant of pack_sequences: documents are NEVER split —
    each shard's docs are packed first-fit-decreasing into bins of
    capacity max_len (the 'sample packing' used when examples must stay
    contiguous for attention masking; concat-and-chunk crosses document
    boundaries, this does not). Docs longer than max_len are truncated,
    loudly, via the `truncated` flag.

    Returns (shard, bin_index, doc_ids array, tokens, n_tok, n_docs,
    truncated). Shape at scale: same one groupBy(shard) shuffle as
    pack_sequences; the FFD pass runs per shard in an Arrow batch
    (applyInPandas) — deterministic (stable sort by (length desc, id)
    and first-fit order)."""
    import pandas as pd

    shard = (F.col(id_col) % num_shards).alias("shard")
    safe_tokens = F.coalesce(
        F.col(tokens_col), F.array().cast(df.schema[tokens_col].dataType)
    )
    src = df.select(
        shard, F.col(id_col).alias("id"), safe_tokens.alias("t")
    )

    out_schema = (
        "shard long, bin_index int, doc_ids array<long>, tokens array<int>, "
        "n_tok int, n_docs int, truncated boolean"
    )

    def pack_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        docs = sorted(
            ((int(r.id), list(r.t)) for r in pdf.itertuples()),
            key=lambda d: (-len(d[1]), d[0]),
        )
        bins: list[dict] = []
        for did, toks in docs:
            trunc = len(toks) > max_len
            if trunc:
                toks = toks[:max_len]
            placed = None
            for b in bins:  # first fit over bins in creation order
                if b["n"] + len(toks) <= max_len:
                    placed = b
                    break
            if placed is None:
                placed = {"ids": [], "toks": [], "n": 0, "trunc": False}
                bins.append(placed)
            placed["ids"].append(did)
            placed["toks"].extend(toks)
            placed["n"] += len(toks)
            placed["trunc"] |= trunc
        shard_val = int(pdf["shard"].iloc[0]) if len(pdf) else 0
        return pd.DataFrame(
            {
                "shard": [shard_val] * len(bins),
                "bin_index": list(range(len(bins))),
                "doc_ids": [b["ids"] for b in bins],
                "tokens": [b["toks"] for b in bins],
                "n_tok": [b["n"] for b in bins],
                "n_docs": [len(b["ids"]) for b in bins],
                "truncated": [b["trunc"] for b in bins],
            }
        )

    return src.groupBy("shard").applyInPandas(pack_shard, out_schema)
