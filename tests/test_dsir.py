"""DSIR (Data Selection via Importance Resampling, arXiv:2302.03169) tests:
fit/score parity between the literal-map and join paths, selection
determinism, discrimination on a synthetic target/raw mix, and short-doc
safety."""

import pyspark.sql.functions as F
import pytest

from opentelemetry_collector_contrib_spark.dataprep import dsir

TARGETY = "the cat sat on the mat with the dog and the cat"
RAWY = "kernel panic at boot sector zero dump trace register overflow"


@pytest.fixture(scope="module")
def corpora(spark):
    target = spark.createDataFrame(
        [(i, TARGETY + f" v{i % 3}") for i in range(30)], ["doc_id", "text"]
    )
    raw = spark.createDataFrame(
        [(i, (TARGETY if i % 4 == 0 else RAWY) + f" x{i % 5}") for i in range(40)],
        ["doc_id", "text"],
    )
    return target, raw


def test_doc_ngrams_counts_repeats_and_bigrams(spark):
    row = spark.range(1).select(
        dsir.doc_ngrams(F.lit("a b a")).alias("g")
    ).first()
    assert row["g"] == ["a", "b", "a", "a b", "b a"]


def test_doc_ngrams_short_docs_safe(spark):
    # 0-word and 1-word docs must not crash (sequence(1, 0) pitfall)
    rows = (
        spark.createDataFrame([("",), ("solo",), ("  ",)], ["text"])
        .select(dsir.doc_ngrams(F.col("text")).alias("g"))
        .collect()
    )
    assert [r["g"] for r in rows] == [[], ["solo"], []]


def test_literal_and_join_paths_agree(spark, corpora):
    target, raw = corpora
    B = 32
    ratios = dsir.dsir_log_ratios(target, raw, buckets=B)
    lit_path = {
        r["doc_id"]: r["w"]
        for r in raw.select(
            "doc_id", dsir.dsir_weight(F.col("text"), ratios, B).alias("w")
        ).collect()
    }
    ratios_df = dsir.dsir_log_ratio_table(
        spark,
        dsir.bucket_counts(target, buckets=B),
        dsir.bucket_counts(raw, buckets=B),
        buckets=B,
    )
    join_path = {
        r["doc_id"]: r["logw"]
        for r in dsir.dsir_weights_join(raw, ratios_df, buckets=B).collect()
    }
    assert lit_path.keys() == join_path.keys()
    for k in lit_path:
        assert lit_path[k] == pytest.approx(join_path[k], abs=2e-4)


def test_declarative_fit_matches_driver_fit(spark, corpora):
    target, raw = corpora
    B = 32
    want = dsir.dsir_log_ratios(target, raw, buckets=B)
    got = {
        r["bucket"]: r["log_ratio"]
        for r in dsir.dsir_log_ratio_table(
            spark,
            dsir.bucket_counts(target, buckets=B),
            dsir.bucket_counts(raw, buckets=B),
            buckets=B,
        ).collect()
    }
    assert got == pytest.approx(want, abs=1e-4)


def test_weights_discriminate_targety_docs(spark, corpora):
    target, raw = corpora
    B = 64
    ratios = dsir.dsir_log_ratios(target, raw, buckets=B)
    rows = raw.select(
        "doc_id", dsir.dsir_weight(F.col("text"), ratios, B).alias("w")
    ).collect()
    targety = [r["w"] for r in rows if r["doc_id"] % 4 == 0]
    rawy = [r["w"] for r in rows if r["doc_id"] % 4 != 0]
    assert min(targety) > max(rawy)


def test_gumbel_topk_selection_deterministic(spark, corpora):
    target, raw = corpora
    B = 32
    ratios = dsir.dsir_log_ratios(target, raw, buckets=B)
    wts = raw.select(
        "doc_id",
        dsir.dsir_weight(F.col("text"), ratios, B).alias("logw"),
    )
    sel1 = dsir.dsir_select(wts, k=10)
    assert sel1.filter("selected").count() == 10
    picked1 = sorted(r["doc_id"] for r in sel1.filter("selected").collect())
    picked2 = sorted(
        r["doc_id"] for r in dsir.dsir_select(wts, k=10).filter("selected").collect()
    )
    assert picked1 == picked2
    # importance resampling: the top-k skews heavily toward target-like docs
    assert sum(1 for d in picked1 if d % 4 == 0) >= 8
    # a different seed reshuffles the marginal picks but stays deterministic
    picked_s2 = sorted(
        r["doc_id"]
        for r in dsir.dsir_select(wts, k=10, seed=99).filter("selected").collect()
    )
    assert picked_s2 == sorted(
        r["doc_id"]
        for r in dsir.dsir_select(wts, k=10, seed=99).filter("selected").collect()
    )
