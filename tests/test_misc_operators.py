"""Coverage for the smaller operator surfaces: salted repartition (skew),
assign_keys/flatten/sanitize_utf8, OTTL limit/merge_maps/keep_matching,
scope_name parser, probabilistic sampler helper."""

from __future__ import annotations

from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.functions import ottl
from opentelemetry_collector_contrib_spark.functions.hashes import sample_predicate
from opentelemetry_collector_contrib_spark.operators import parsers, transformers
from opentelemetry_collector_contrib_spark.operators.enrich import salted_repartition


def test_salted_repartition_spreads_hot_key(spark):
    # 90% of rows share one hot key; salting must spread them over many
    # partitions while keeping placement deterministic across runs
    df = spark.range(2000).withColumn(
        "source", F.when(F.col("id") % 10 < 9, "hot").otherwise(F.concat(F.lit("cold-"), F.col("id")))
    )
    out = salted_repartition(df, "source", salt_buckets=8, num_partitions=8)
    parts = (
        out.withColumn("p", F.spark_partition_id())
        .filter(F.col("source") == "hot")
        .select("p")
        .distinct()
        .count()
    )
    assert parts >= 4, f"hot key landed in only {parts} partitions"
    a = sorted(r["id"] for r in out.collect())
    b = sorted(r["id"] for r in salted_repartition(df, "source", salt_buckets=8, num_partitions=8).collect())
    assert a == b == list(range(2000))


def test_assign_keys_and_flatten(spark):
    df = spark.createDataFrame([(1, ["x", "y", "z"])], "id long, vals array<string>")
    out = transformers.assign_keys(df, "vals", ["a", "b"])
    m = out.first()["attributes"]
    assert m == {"a": "x", "b": "y"}

    df2 = spark.createDataFrame([(1,)], "id long").select(
        "id",
        F.create_map(F.lit("keep"), F.lit("v")).alias("attributes"),
        F.create_map(F.lit("inner"), F.lit("w")).alias("nested"),
    )
    flat = transformers.flatten(df2, "nested", prefix="n")
    m2 = flat.first()["attributes"]
    assert m2 == {"keep": "v", "n.inner": "w"} and "nested" not in flat.columns


def test_sanitize_utf8_and_scope_name(spark):
    df = spark.createDataFrame([("ok body", "my.scope")], "body string, s string")
    out = transformers.sanitize_utf8(df)
    assert out.first()["body"] == "ok body"
    scoped = parsers.scope_name_parser(df, "s")
    assert scoped.first()["scope_name"] == "my.scope"


def test_ottl_limit_and_merge_and_keep_matching(spark):
    df = spark.range(1).select(
        F.create_map(
            F.lit("a"), F.lit("1"), F.lit("b"), F.lit("2"),
            F.lit("c"), F.lit("3"), F.lit("keep.me"), F.lit("4"),
        ).alias("m")
    )
    limited = df.select(ottl.limit_map(F.col("m"), 2, priority_keys=["keep.me"]).alias("m")).first()["m"]
    assert len(limited) == 2 and limited["keep.me"] == "4"

    kept = df.select(ottl.keep_matching_keys(F.col("m"), r"^keep\.").alias("m")).first()["m"]
    assert kept == {"keep.me": "4"}

    merged = df.select(
        ottl.merge_maps(
            F.col("m"), F.create_map(F.lit("a"), F.lit("9"), F.lit("z"), F.lit("8")), "insert"
        ).alias("m")
    ).first()["m"]
    # insert strategy: existing keys untouched, new keys added
    assert merged["a"] == "1" and merged["z"] == "8"

    updated = df.select(
        ottl.merge_maps(
            F.col("m"), F.create_map(F.lit("a"), F.lit("9"), F.lit("z"), F.lit("8")), "update"
        ).alias("m")
    ).first()["m"]
    assert updated["a"] == "9" and "z" not in updated


def test_sample_predicate_deterministic_rate(spark):
    df = spark.range(20000).select(F.col("id").cast("string").alias("k"))
    kept = df.filter(sample_predicate(F.col("k"), 25.0)).count()
    assert abs(kept / 20000 - 0.25) < 0.02
    kept2 = df.filter(sample_predicate(F.col("k"), 25.0)).count()
    assert kept == kept2


def test_isolation_forest_flags_planted_outliers(spark):
    import random

    from opentelemetry_collector_contrib_spark.operators import anomaly

    rng = random.Random(3)
    rows = [(i, rng.gauss(10.0, 1.0), rng.gauss(5.0, 0.5)) for i in range(300)]
    rows += [(1000, 50.0, -40.0), (1001, -30.0, 60.0)]  # far isolates
    df = spark.createDataFrame(rows, "id long, lat double, dur double")
    out = anomaly.isolation_forest_processor(
        df, ["lat", "dur"], num_trees=32, sample_size=64,
        threshold_quantile=0.99,
    )
    got = {r["id"]: r for r in out.collect()}
    normal_scores = [r["anomaly_score"] for i, r in got.items() if i < 1000]
    assert got[1000]["anomaly_score"] > max(normal_scores)
    assert got[1001]["anomaly_score"] > max(normal_scores)
    assert got[1000]["is_anomaly"] and got[1001]["is_anomaly"]
    # determinism: refit on the same data -> identical scores
    again = anomaly.isolation_forest_processor(
        df, ["lat", "dur"], num_trees=32, sample_size=64,
        threshold_quantile=0.99,
    )
    assert {r["id"]: r["anomaly_score"] for r in again.collect()} == {
        i: r["anomaly_score"] for i, r in got.items()
    }


def test_isolation_forest_pinned_model_across_batches(spark):
    from opentelemetry_collector_contrib_spark.operators import anomaly

    df = spark.createDataFrame(
        [(i, float(i % 7), float(i % 11)) for i in range(200)],
        "id long, a double, b double",
    )
    forest = anomaly.fit_isolation_forest(df, ["a", "b"], num_trees=16, sample_size=32)
    s1 = anomaly.isolation_forest_processor(
        df.filter("id < 100"), ["a", "b"], forest=forest
    )
    s2 = anomaly.isolation_forest_processor(
        df.filter("id >= 100"), ["a", "b"], forest=forest
    )
    # same (a, b) features -> same score under the pinned model, batch-independent
    m1 = {(r["a"], r["b"]): r["anomaly_score"] for r in s1.collect()}
    m2 = {(r["a"], r["b"]): r["anomaly_score"] for r in s2.collect()}
    shared = set(m1) & set(m2)
    assert shared and all(m1[k] == m2[k] for k in shared)


def test_sampler_priority_attribute_override(spark):
    from opentelemetry_collector_contrib_spark.operators import processors as P

    # trace id with LOW randomness (R = 0): only an always-sample
    # threshold keeps it; priority=100 must force it through
    rows = [
        ("a" + "0" * 31, 100.0),   # R=0, priority 100 -> kept
        ("b" + "0" * 31, None),    # R=0, no priority  -> dropped
        ("c" + "f" * 31, None),    # R=max, no priority -> kept at 50%
        ("d" + "f" * 31, 0.0),     # priority 0 = unset -> normal path
    ]
    df = spark.createDataFrame(rows, "trace_id string, prio double")
    out = P.probabilistic_sampler(
        df, 50.0, key_col="trace_id", mode="equalizing", priority_col="prio"
    ).collect()
    kept = {r["trace_id"][0]: r["sampling_threshold"] for r in out}
    assert set(kept) == {"a", "c", "d"}
    assert kept["a"] == "0"  # T=0: always-sample threshold from priority
    assert kept["c"] == "8"  # the configured 50% threshold
    # proportional: priority rescues an underflowed probability
    df2 = spark.createDataFrame(
        [("e" + "0" * 31, "ffffffffffffff", 100.0)],
        "trace_id string, th string, prio double",
    )
    out2 = P.probabilistic_sampler(
        df2, 1.0, key_col="trace_id", mode="proportional",
        th_col="th", priority_col="prio",
    ).collect()
    assert len(out2) == 1 and out2[0]["sampling_threshold"] == "0"


def test_stdin_and_namedpipe_inputs(spark, tmp_path):
    import io
    import os

    from opentelemetry_collector_contrib_spark.sources.readers import (
        namedpipe_input,
        stdin_input,
    )

    df = stdin_input(spark, stream=io.StringIO("line one\nline two\n"))
    assert [r.body for r in df.collect()] == ["line one", "line two"]

    fifo = str(tmp_path / "pipe")
    os.mkfifo(fifo)
    pid = os.fork()
    if pid == 0:  # writer child: open blocks until the reader opens
        with open(fifo, "w") as fh:
            fh.write("a=1\nb=2\n")
        os._exit(0)
    try:
        df2 = namedpipe_input(spark, fifo)
        assert [r.body for r in df2.collect()] == ["a=1", "b=2"]
    finally:
        os.waitpid(pid, 0)


def test_isolation_forest_case_ladder_matches_udf_scorer(spark):
    """The compiled CASE-ladder scorer (pure Columns, used by the
    connector_metrics oracle fold) must agree with the pandas-UDF
    tree-walk scorer on every row, and its SQL emission must agree with
    DuckDB evaluating the same ladder."""
    import duckdb

    from opentelemetry_collector_contrib_spark.operators import anomaly

    df = spark.createDataFrame(
        [(i, float((i * 37) % 101), float((i * 61) % 53)) for i in range(500)]
        + [(None, None, 1.0), (None, 2.0, None)],  # NULL features -> NULL score
        "id long, a double, b double",
    )
    forest = anomaly.fit_isolation_forest(
        df, ["a", "b"], num_trees=4, sample_size=32
    )
    cols = [F.col("a"), F.col("b")]
    both = df.select(
        "a",
        "b",
        F.round(anomaly.forest_score_column(forest, cols), 9).alias("ladder"),
        F.round(anomaly.isolation_forest_scores(forest, *cols), 9).alias("udf"),
        anomaly.forest_depth_column(forest, cols).alias("depth"),
    )
    rows = both.collect()
    assert all(r["ladder"] == r["udf"] for r in rows)
    assert sum(r["ladder"] is None for r in rows) == 2

    # SQL mirror: DuckDB evaluates the emitted ladder to the same depths
    pdf = df.toPandas()  # noqa: F841 (registered by name below)
    con = duckdb.connect()
    con.register("t", pdf)
    dsql = anomaly.forest_depth_sql(forest, ["a", "b"])
    duck = {
        (r[0], r[1]): r[2]
        for r in con.sql(f"SELECT a, b, {dsql} FROM t WHERE a IS NOT NULL AND b IS NOT NULL").fetchall()
    }
    for r in rows:
        if r["a"] is not None and r["b"] is not None:
            assert duck[(r["a"], r["b"])] == r["depth"]
