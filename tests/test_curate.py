"""End-to-end corpus-curation recipe: every stage fires on a corpus
with planted duplicates / junk / perplexity outliers, and the final
packed output conserves exactly the surviving train tokens."""

import pyspark.sql.functions as F
import pytest

from opentelemetry_collector_contrib_spark.dataprep.curate import curate_corpus

# 20 words: >= span_len below, so ExactSubstr cuts its repeats
COMMON = (
    "the quick brown fox jumps over the lazy dog near "
    "the old stone bridge by the quiet river again tonight"
)
JUNK_SYMBOLS = " ".join(["$$$ ### @@@ %%%"] * 14)  # symbol ratio >> 0.1
JUNK_RUN = "word " * 60  # one 60-long same-word run


def _stream(i: int, n: int = 50) -> str:
    """Deterministic per-doc word stream; docs share few shingles."""
    return " ".join(f"w{(i * 137 + k * 11) % 9973}" for k in range(n))


@pytest.fixture(scope="module")
def curated(spark):
    rows = []
    # 30 distinct good docs, each ending in the shared COMMON span
    for i in range(30):
        rows.append((i, _stream(i) + " " + COMMON, "en"))
    # exact duplicate of doc 0, near-duplicate of doc 1 (one word changed)
    rows.append((100, _stream(0) + " " + COMMON, "en"))
    rows.append((101, (_stream(1) + " " + COMMON).replace("w148 ", "zzz "), "en"))
    # junk that Gopher drops
    rows.append((200, JUNK_SYMBOLS, "en"))
    rows.append((201, JUNK_RUN, "en"))
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    return curate_corpus(
        spark,
        docs,
        gopher_kw={"min_words": 10},
        ppl_keep=("head", "middle", "tail"),  # tiny corpus: keep all buckets
        split_weights={"train": 1.0},
        max_len=64,
        num_shards=2,
    )


def test_duplicates_removed(curated):
    ids = {r["doc_id"] for r in curated["deduped"].select("doc_id").collect()}
    assert 100 not in ids  # exact duplicate of 0
    assert 101 not in ids  # near-duplicate of 1
    assert {i for i in range(30)} <= ids


def test_gopher_junk_dropped(curated):
    ids = {r["doc_id"] for r in curated["filtered"].select("doc_id").collect()}
    assert 200 not in ids and 201 not in ids
    assert len(ids) == 30


def test_scored_has_ppl_buckets(curated):
    rows = curated["scored"].select("doc_id", "logppl", "ppl_bucket").collect()
    assert len(rows) == 30
    assert {r["ppl_bucket"] for r in rows} == {"head", "middle", "tail"}


def test_packed_conserves_clean_train_tokens(curated):
    clean = curated["tokens"].filter("split = 'train'")
    n_clean = clean.select(F.sum(F.size("tokens"))).first()[0]
    n_packed = curated["packed"].select(F.sum("n_tok")).first()[0]
    assert n_clean == n_packed
    # the shared COMMON suffix (>= span_len tokens, repeated in all 30
    # docs) is cut from every doc but the corpus-first occurrence
    removed = {r["doc_id"]: r["n_removed"] for r in clean.collect()}
    assert removed[0] == 0
    assert sum(1 for v in removed.values() if v > 0) >= 28
