"""Arbitrary-stateful streaming (streaming/stateful.py): groupbytrace
buffer-and-release on an event-time timer, and the tailsampling
composition over released complete traces.

Timeline discipline: event-time timers fire when a LATER micro-batch
advances the watermark past them, so each test drives the stream with
processAllAvailable() between file drops and uses a far-future sentinel
span to drain (the sentinel itself stays buffered and must not appear
in any output).
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.operators import processors
from opentelemetry_collector_contrib_spark.streaming import stateful

BASE = 1767225600  # 2026-01-01 00:00:00 UTC


def _write_spans(path, rows):
    with open(path, "w") as f:
        for trace, sec, name, dur in rows:
            f.write(
                json.dumps(
                    {
                        "trace_id": trace,
                        "ts": BASE + sec,
                        "name": name,
                        "duration_ms": dur,
                    }
                )
                + "\n"
            )


def _stream(spark, src):
    return (
        spark.readStream.schema(
            "trace_id string, ts double, name string, duration_ms double"
        )
        .json(str(src))
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )


def test_groupbytrace_stream_release_semantics(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    # batch 1: trace a (2 spans), trace b (1 span)
    _write_spans(src / "b1.jsonl", [("a", 0, "a1", 5.0), ("a", 2, "a2", 7.5), ("b", 1, "b1", 1.0)])

    name = "gbt_rel"
    released = stateful.groupbytrace_stream(
        _stream(spark, src), wait_duration=10.0, watermark="5 seconds"
    )
    q = (
        released.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        assert spark.table(name).count() == 0, "nothing may release before the wait expires"

        # batch 2: a third span joins trace a INSIDE its wait (timer must
        # not extend); trace c arrives; its ts pushes the watermark to
        # 00:00:25 which fires a (timeout 00:00:10) and b (00:00:11)
        _write_spans(src / "b2.jsonl", [("a", 8, "a3", 2.0), ("c", 30, "c1", 9.0)])
        q.processAllAvailable()
        got = {
            r["trace_id"]: r
            for r in spark.table(name)
            .groupBy("trace_id")
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.first("gbt_n_spans").alias("n_spans"),
                F.first("gbt_released_ms").alias("rel_ms"),
                F.sum("duration_ms").alias("dur_sum"),
            )
            .collect()
        }
        assert set(got) == {"a", "b"}
        # complete trace: all three a-spans in one release, late join included
        assert got["a"]["n_rows"] == 3 and got["a"]["n_spans"] == 3
        assert got["a"]["dur_sum"] == pytest.approx(14.5)
        # release anchored at FIRST span + wait (never extended by a3@8s)
        assert got["a"]["rel_ms"] == (BASE + 0) * 1000 + 10_000
        assert got["b"]["rel_ms"] == (BASE + 1) * 1000 + 10_000

        # batch 3: a span for the ALREADY-RELEASED trace a starts a fresh
        # wait; the sentinel pushes the watermark far enough to fire both
        # c (00:00:40) and a-again (00:00:37)
        _write_spans(src / "b3.jsonl", [("a", 27, "a4", 3.0), ("zz", 120, "s", 0.0)])
        q.processAllAvailable()
        final = spark.table(name)
        per_trace = {
            (r["trace_id"], r["rel_ms"]): r["n"]
            for r in final.groupBy("trace_id", F.col("gbt_released_ms").alias("rel_ms"))
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        assert per_trace[("c", (BASE + 30) * 1000 + 10_000)] == 1
        assert per_trace[("a", (BASE + 27) * 1000 + 10_000)] == 1  # re-buffered after release
        assert ("zz",) not in {(k[0],) for k in per_trace} or True
        assert "zz" not in {k[0] for k in per_trace}, "sentinel must stay buffered"

        # type round-trip through the to_json/from_json pack: timestamp
        # column comes back as a real timestamp, doubles as doubles
        dt = dict(final.dtypes)
        assert dt["ts"] == "timestamp" and dt["duration_ms"] == "double"
        a1 = final.filter((F.col("trace_id") == "a") & (F.col("name") == "a1")).first()
        assert a1["ts"].timestamp() == BASE and a1["duration_ms"] == 5.0
    finally:
        q.stop()


def test_tailsampling_stream_policies_over_complete_traces(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    # slow: one span over 500ms  |  err: error status wins via agg policy
    # tiny: all spans fast and small -> not sampled
    _write_spans(
        src / "b1.jsonl",
        [
            ("slow", 0, "s1", 900.0),
            ("slow", 1, "s2", 2.0),
            ("tiny", 2, "t1", 1.0),
            ("err", 3, "ERROR boom", 1.0),
        ],
    )
    # sentinel drives the watermark past every decision timer
    _write_spans(src / "b2.jsonl", [("zz", 300, "s", 0.0)])

    out_dir = tmp_path / "sampled"
    P = processors.TailPolicy

    def sink_writer(df, batch_id):
        df.write.mode("append").parquet(str(out_dir))

    q = stateful.tailsampling_stream(
        _stream(spark, src),
        policies=[
            P("slow", "agg", cond=F.max("duration_ms") > 500.0),
            P("errors", "agg", cond=F.max(F.col("name").startswith("ERROR"))),
        ],
        sink_writer=sink_writer,
        checkpoint=str(tmp_path / "ckpt"),
        decision_wait=10.0,
        watermark="5 seconds",
        trigger_once=False,
    ).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    back = spark.read.parquet(str(out_dir))
    kept = {r["trace_id"] for r in back.select("trace_id").distinct().collect()}
    assert kept == {"slow", "err"}
    # the sampled slow trace is COMPLETE (both spans), with release metadata
    slow = back.filter(F.col("trace_id") == "slow")
    assert slow.count() == 2
    assert slow.select(F.first("gbt_n_spans")).first()[0] == 2
