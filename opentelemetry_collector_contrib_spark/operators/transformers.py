"""Stanza transformer operators (§2.4) as DataFrame stages.

References: /root/reference/pkg/stanza/operator/transformer/*.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .base import get_field


def _split_path(path: str) -> tuple[str, str | None]:
    p = path.replace("[", ".").replace("]", "").replace('"', "")
    parts = p.split(".", 1)
    return parts[0], (parts[1] if len(parts) > 1 else None)


def _write_field(df: DataFrame, path: str, value: Column) -> DataFrame:
    """Write a value to a top-level column or a key inside a map column."""
    col, key = _split_path(path)
    if key is None:
        return df.withColumn(col, value)
    dtype = dict(df.dtypes).get(col, "")
    if not dtype.startswith("map"):
        raise ValueError(f"cannot write nested field into non-map column {col} ({dtype})")
    from ..functions.ottl import set_key

    base = F.coalesce(F.col(col), F.create_map().cast(dtype))
    return df.withColumn(col, set_key(base, key, value))


def _delete_field(df: DataFrame, path: str) -> DataFrame:
    col, key = _split_path(path)
    if key is None:
        return df.drop(col)
    from ..functions.ottl import delete_key

    return df.withColumn(col, delete_key(F.col(col), key))


def add(df: DataFrame, field: str, value) -> DataFrame:
    """add transformer (transformer/add): upsert a literal or expression."""
    v = value if isinstance(value, Column) else F.lit(value)
    return _write_field(df, field, v)


def remove(df: DataFrame, field: str) -> DataFrame:
    return _delete_field(df, field)


def copy(df: DataFrame, from_field: str, to_field: str) -> DataFrame:
    return _write_field(df, to_field, get_field(df, from_field))


def move(df: DataFrame, from_field: str, to_field: str) -> DataFrame:
    """move: copy then delete source (transformer/move)."""
    return _delete_field(_write_field(df, to_field, get_field(df, from_field)), from_field)


def retain(df: DataFrame, fields: list[str]) -> DataFrame:
    """retain: keep only listed fields (transformer/retain). Top-level
    columns only in the flat model; map-key retention via keep_keys."""
    return df.select(*fields)


def flatten(df: DataFrame, map_col: str, prefix: str | None = None) -> DataFrame:
    """flatten (transformer/flatten): promote a nested map's keys one level
    up into attributes with optional prefix."""
    from ..functions.ottl import flatten_map

    inner = F.col(map_col)
    if prefix is None:
        prefix = map_col
    # NULL-guard: transform_keys/map_concat on a NULL nested map would
    # NULL the ENTIRE attributes map, silently destroying existing
    # attributes on every row where the source map is absent (e.g. an
    # upstream parse failure with on_error='send')
    merged = F.when(
        inner.isNotNull(), flatten_map(F.col("attributes"), inner, prefix)
    ).otherwise(F.col("attributes"))
    return df.withColumn("attributes", merged).drop(map_col)


def assign_keys(df: DataFrame, list_col: str, keys: list[str], out_col: str = "attributes") -> DataFrame:
    """assign_keys (transformer/assignkeys): zip a list value with keys.
    Short lists pad with NULL (try_element_at) instead of failing the job
    on map_from_arrays' equal-length requirement — the stanza reference
    logs and continues on malformed entries."""
    vals = F.array(
        *[F.try_element_at(F.col(list_col), F.lit(i + 1)) for i in range(len(keys))]
    )
    return df.withColumn(
        out_col, F.map_from_arrays(F.array(*[F.lit(k) for k in keys]), vals)
    )


def unquote(df: DataFrame, field: str) -> DataFrame:
    """unquote (transformer/unquote): strip one layer of matching quotes."""
    src = get_field(df, field)
    stripped = F.when(
        (F.length(src) >= 2)
        & (
            (src.startswith('"') & src.endswith('"'))
            | (src.startswith("'") & src.endswith("'"))
        ),
        src.substr(F.lit(2), F.length(src) - 2),
    ).otherwise(src)
    return _write_field(df, field, stripped)


def sanitize_utf8(df: DataFrame, field: str = "body") -> DataFrame:
    """sanitize_utf8 (transformer/sanitizeutf8): replace invalid UTF-8.
    Spark strings are already valid UTF-8 after decode; round-trip guard."""
    src = get_field(df, field)
    return _write_field(df, field, F.decode(F.encode(src, "UTF-8"), "UTF-8"))


def regex_replace(df: DataFrame, field: str, pattern: str, replacement: str) -> DataFrame:
    src = get_field(df, field)
    return _write_field(df, field, F.regexp_replace(src, pattern, replacement))


def filter_drop(df: DataFrame, condition: Column) -> DataFrame:
    """filter transformer: DROP entries matching the expression
    (/root/reference/pkg/stanza/operator/transformer/filter/transformer.go:25-40)."""
    return df.filter(~F.coalesce(condition, F.lit(False)))


def noop(df: DataFrame) -> DataFrame:
    return df


def router(df: DataFrame, routes: list[tuple[str, Column]], default: str = "default") -> DataFrame:
    """router transformer (transformer/router/transformer.go:48-82):
    first-match-wins tagging. Routes evaluated in order on disjoint
    remainders == a single when/when/otherwise chain."""
    expr = None
    for name, cond in routes:
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = expr.otherwise(default) if expr is not None else F.lit(default)
    return df.withColumn("route", expr)


def recombine(
    df: DataFrame,
    is_first_entry: Column | None = None,
    is_last_entry: Column | None = None,
    combine_field: str = "body",
    combine_with: str = "\n",
    source_identifier: str = "source",
    order_by: str = "ingest_ts",
    max_batch_size: int = 1000,
) -> DataFrame:
    """recombine (transformer/recombine/transformer.go:97-246): merge
    multiline entries into one, per source.

    Batch sessionization: group id = running count of boundary markers over
    (source, order) — the standard gaps-and-islands window pattern. The
    first row of each group supplies the non-combined fields (the reference
    keeps the first entry and overwrites its combine_field). The streaming
    analog (force_flush_period) is streaming/stateful.py.

    Scale note: the window partitions by source_identifier; skewed sources
    are the known hot-key risk — callers at 100 TB should pre-partition by
    (source, coarse time bucket) so each window partition is bounded.
    """
    if is_first_entry is None and is_last_entry is None:
        raise ValueError("need is_first_entry or is_last_entry")
    w = Window.partitionBy(source_identifier).orderBy(order_by)
    if is_first_entry is not None:
        marker = is_first_entry.cast("int")
        grp = F.sum(marker).over(w.rowsBetween(Window.unboundedPreceding, 0))
    else:
        # last-entry mode: group ends at a match; group id = count of
        # *previous* last-markers.
        marker = is_last_entry.cast("int")
        grp = F.sum(marker).over(w.rowsBetween(Window.unboundedPreceding, -1))
        grp = F.coalesce(grp, F.lit(0))
    tagged = df.withColumn("__grp", grp)
    # size-capped flush (transformer.go:189: numEntries >= maxBatchSize
    # splits the batch): a source whose boundary marker never fires —
    # e.g. a broken is_first_entry regex — would otherwise collapse
    # millions of rows into ONE group whose collect_list holds the whole
    # partition in executor memory. Same window partitioning, no extra
    # shuffle.
    rn = F.row_number().over(
        Window.partitionBy(source_identifier, "__grp").orderBy(order_by)
    )
    tagged = tagged.withColumn(
        "__sub", ((rn - 1) / F.lit(max_batch_size)).cast("int")
    )
    others = [c for c in df.columns if c not in (combine_field, source_identifier)]
    # collect_list over rows pre-sorted within the group: sort structs of
    # (order, value) then join — deterministic regardless of task order.
    pair = F.struct(F.col(order_by).alias("o"), F.col(combine_field).alias("v"))
    agg = [
        F.array_join(
            F.transform(F.array_sort(F.collect_list(pair)), lambda s: s["v"]), combine_with
        ).alias(combine_field),
    ] + [F.min_by(c, order_by).alias(c) for c in others]
    out = tagged.groupBy(source_identifier, "__grp", "__sub").agg(*agg)
    keep = [c for c in df.columns]
    return out.select(*keep)


def recombine_partial_lines(
    df: DataFrame,
    logtag_key: str = "logtag",
    log_key: str = "log",
    source_identifier: str = "source",
    order_by: str = "ingest_ts",
) -> DataFrame:
    """Container partial-line merge (parser/container internal recombine):
    cri logtag 'P' = partial, 'F' = final; concatenate P* F runs. The
    combined content is the PARSED log value (attributes[log_key]) when
    present — after container_parser, body still holds the raw CRI line —
    falling back to body for unparsed input."""
    tag = F.element_at(F.col("attributes"), logtag_key)
    content = F.coalesce(F.element_at(F.col("attributes"), log_key), F.col("body"))
    return recombine(
        df.withColumn("body", content),
        is_last_entry=tag == F.lit("F"),
        combine_field="body",
        combine_with="",
        source_identifier=source_identifier,
        order_by=order_by,
    )
