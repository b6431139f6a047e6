"""Benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

The flagship is the north-rule tokenized-sequence pipeline
(parse -> enrich -> route -> aggregate over (doc_id, tokens, n_tok, source));
its input is generated deterministically and distributed (datagen.py — pure
column expressions, no driver loops) at a row count proportional to sf, so
throughput here extrapolates to the 10^12-row target.

Usage:
    python bench.py                    # driver mode: one JSON line
    python bench.py --cpus 8           # scaling run at a different parallelism
    python bench.py --seq-rows 2000000 # override pipeline input size
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

from pyspark.sql import SparkSession

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

# Registry queries benchmarked alongside the flagship pipeline: one per
# operator family that dominates cost at scale (shuffle-heavy aggregation,
# window functions, regex/JSON parse, sessionization, dedup + ANN).
HEADLINE = [
    "pipeline_events",
    "routing_first_match",
    "logdedup_processor",
    "deltatocumulative",
    "recombine_sessions",
    "spanmetrics_connector",
    "transform_ottl",
    "dedup_minhash_lsh",
    "ann_cosine_topk",
    "text_quality_score",
]


def build_spark(cpus: int) -> SparkSession:
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"otelcontrib-spark-bench-{cpus}")
        .config("spark.sql.shuffle.partitions", str(max(cpus * 2, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .getOrCreate()
    )


def _force(df) -> int:
    """Materialize a DataFrame fully (all partitions, all columns)."""
    df.write.format("noop").mode("overwrite").save()
    return -1


def bench_log_pipeline(spark: SparkSession, n_rows: int, repeats: int = 2) -> float:
    """North-rule pipeline over n_rows tokenized sequences: vectorized parse
    of 4 payload shapes, broadcast enrich, first-match route, per-sink counts.
    Token arrays are carried end-to-end (the per-row invariant).

    Runs a small warmup first (JIT + codegen), then takes the min of
    `repeats` timed runs — this sandbox shares its host with other tenants,
    so the min is the meaningful throughput figure."""
    from opentelemetry_collector_contrib_spark import datagen
    from opentelemetry_collector_contrib_spark.plans.pipeline import log_pipeline

    meta = datagen.source_meta(spark)
    warm = log_pipeline(
        datagen.sequences(spark, 20_000), datagen.raw_logs(spark, 20_000), meta
    )
    _force(warm["routed"])

    best = float("inf")
    for _ in range(max(repeats, 1)):
        out = log_pipeline(
            datagen.sequences(spark, n_rows), datagen.raw_logs(spark, n_rows), meta
        )
        t0 = time.perf_counter()
        _force(out["routed"])
        out["counts"].collect()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--seq-rows", type=int, default=0, help="pipeline input rows (0 = 10M*sf)")
    ap.add_argument("--skip-registry", action="store_true", help="only the tokens pipeline")
    ap.add_argument("--repeats", type=int, default=2, help="timed pipeline runs (min reported)")
    args = ap.parse_args()

    try:
        sf = float(os.path.basename(args.sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = 0.1
    n_rows = args.seq_rows or max(int(10_000_000 * sf), 10_000)

    spark = build_spark(args.cpus)
    try:
        queries: dict[str, float] = {}

        t = bench_log_pipeline(spark, n_rows, repeats=args.repeats)
        queries["log_pipeline_tokens"] = round(t, 3)
        seq_per_sec = n_rows / t

        if not args.skip_registry:
            from opentelemetry_collector_contrib_spark.plans.queries import REGISTRY

            for name in HEADLINE:
                if name not in REGISTRY:
                    continue
                fn, _sql = REGISTRY[name]
                t0 = time.perf_counter()
                _force(fn(spark, args.sf_dir))
                queries[name] = round(time.perf_counter() - t0, 3)

        total = round(sum(queries.values()), 3)
        print(
            json.dumps(
                {
                    "metric": "headline_wall_seconds",
                    "value": total,
                    "unit": "sec",
                    "queries": queries,
                    "sf": sf,
                    "cpus": args.cpus,
                    "pipeline_rows": n_rows,
                    "pipeline_seq_per_sec": round(seq_per_sec, 1),
                }
            )
        )
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
