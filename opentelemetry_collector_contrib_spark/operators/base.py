"""Operator protocol: a Stage is DataFrame -> DataFrame; a Pipeline is an
ordered composition.

The reference wires stanza operators into a directed graph started
topologically (/root/reference/pkg/stanza/pipeline/directed.go:29-124) and
each operator mutates an Entry and passes it on. Spark-first translation:
every operator is a declarative transformation; the whole chain collapses
into one Catalyst plan (no per-entry interpreter, no operator threads).

Shared parser semantics (parse_from / parse_to / on_error) follow
/root/reference/pkg/stanza/operator/helper/parser.go:17-36,172-235:
- parse_from: source field (default ``body``)
- parse_to: destination map column (default ``attributes``)
- on_error: 'send' keeps the row with parse failure (null/empty result),
  'drop' removes rows that failed to parse. ('send_quiet'/'drop_quiet'
  differ only in logging, which has no Spark analog.)
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

StageFn = Callable[[DataFrame], DataFrame]


@dataclass
class Stage:
    name: str
    fn: StageFn

    def __call__(self, df: DataFrame) -> DataFrame:
        return self.fn(df)


@dataclass
class Pipeline:
    """Ordered operator chain; `apply` folds the stages into one plan."""

    stages: list[Stage] = field(default_factory=list)

    def add(self, name: str, fn: StageFn) -> "Pipeline":
        self.stages.append(Stage(name, fn))
        return self

    def apply(self, df: DataFrame) -> DataFrame:
        for s in self.stages:
            df = s(df)
        return df


def get_field(df: DataFrame, path: str) -> Column:
    """Resolve a stanza-style field path: ``body``, ``attributes.key`` /
    ``attributes[key]`` (entry field DSL,
    /root/reference/pkg/stanza/entry/entry.go:52-54)."""
    path = path.replace("[", ".").replace("]", "").replace('"', "")
    parts = path.split(".", 1)
    col = F.col(parts[0])
    if len(parts) == 1:
        return col
    dtype = dict(df.dtypes).get(parts[0], "")
    if dtype.startswith("map"):
        return F.element_at(col, F.lit(parts[1]))
    return F.col(path)


def set_parsed(
    df: DataFrame,
    parsed: Column,
    parse_to: str = "attributes",
    on_error: str = "send",
) -> DataFrame:
    """Write a map<string,string> parse result into ``parse_to`` (merged if
    the column exists), applying on_error semantics."""
    out = df.withColumn("__parsed", parsed)
    if on_error.startswith("drop"):
        out = out.filter(F.col("__parsed").isNotNull() & (F.size("__parsed") > 0))
    if parse_to in df.columns:
        # the EXISTING map must be NULL-safe too: map_filter(NULL) is NULL
        # and propagates through map_concat, silently nulling a successful
        # parse result for every row whose parse_to column is NULL
        existing = F.coalesce(
            F.col(parse_to), F.create_map().cast("map<string,string>")
        )
        merged = F.map_concat(
            F.map_filter(
                existing,
                lambda k, _: ~F.array_contains(F.map_keys(F.coalesce(F.col("__parsed"), F.create_map())), k),
            ),
            F.coalesce(F.col("__parsed"), F.create_map().cast("map<string,string>")),
        )
        # rows where BOTH sides were NULL keep NULL (not {}), preserving
        # the NULL-propagating on_error contract
        merged = F.when(
            F.col(parse_to).isNull() & F.col("__parsed").isNull(),
            F.lit(None).cast("map<string,string>"),
        ).otherwise(merged)
        out = out.withColumn(parse_to, merged)
    else:
        out = out.withColumn(parse_to, F.col("__parsed"))
    return out.drop("__parsed")
