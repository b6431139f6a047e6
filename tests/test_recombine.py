"""recombine (multiline merge) tests — transformer/recombine semantics:
is_first_entry / is_last_entry modes, per-source batches, combine_with."""

from __future__ import annotations

from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.operators import transformers


def _df(spark, rows):
    return spark.createDataFrame(rows, "source string, ingest_ts long, body string")


def test_recombine_first_entry_mode(spark):
    # stack traces: a new entry starts when the line does NOT begin with space
    rows = [
        ("a", 1, "Exception in thread"),
        ("a", 2, "  at foo()"),
        ("a", 3, "  at bar()"),
        ("a", 4, "Next log line"),
        ("b", 1, "other source"),
    ]
    out = transformers.recombine(
        _df(spark, rows), is_first_entry=~F.col("body").startswith(" ")
    )
    got = {(r["source"], r["body"]) for r in out.collect()}
    assert got == {
        ("a", "Exception in thread\n  at foo()\n  at bar()"),
        ("a", "Next log line"),
        ("b", "other source"),
    }


def test_recombine_last_entry_mode_and_combine_with(spark):
    rows = [
        ("a", 1, "part1"),
        ("a", 2, "part2;"),   # terminator
        ("a", 3, "part3"),
        ("a", 4, "part4;"),
    ]
    out = transformers.recombine(
        _df(spark, rows),
        is_last_entry=F.col("body").endswith(";"),
        combine_with="",
    )
    got = sorted(r["body"] for r in out.collect())
    assert got == ["part1part2;", "part3part4;"]


def test_recombine_keeps_first_entry_fields(spark):
    df = spark.createDataFrame(
        [("a", 1, "x", "INFO"), ("a", 2, " y", "DEBUG")],
        "source string, ingest_ts long, body string, lvl string",
    )
    out = transformers.recombine(df, is_first_entry=~F.col("body").startswith(" "))
    row = out.first()
    assert row["body"] == "x\n y" and row["lvl"] == "INFO" and row["ingest_ts"] == 1


def test_recombine_partial_lines_cri(spark):
    df = spark.createDataFrame(
        [
            ("a", 1, "hel", {"logtag": "P"}),
            ("a", 2, "lo ", {"logtag": "P"}),
            ("a", 3, "world", {"logtag": "F"}),
            ("a", 4, "single", {"logtag": "F"}),
        ],
        "source string, ingest_ts long, body string, attributes map<string,string>",
    )
    out = transformers.recombine_partial_lines(df)
    got = sorted(r["body"] for r in out.collect())
    assert got == ["hello world", "single"]
