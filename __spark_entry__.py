"""Driver contract for the spark-graft builder (PySpark target).

entry(spark): flagship parse->enrich->route->aggregate pipeline on sf0.001.
queries(): one entry per implemented operator (SURVEY.md §2 inventory),
           backed by opentelemetry_collector_contrib_spark.plans.queries.
oracle_sql(): DuckDB-equivalent SQL per query (column names aliased to
              match; doubles rounded identically on both sides).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from opentelemetry_collector_contrib_spark.plans import pipeline as _pipeline
from opentelemetry_collector_contrib_spark.plans.queries import REGISTRY as _REGISTRY


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _pipeline.events_pipeline(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _sql) in _REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in _REGISTRY.items() if sql is not None}
