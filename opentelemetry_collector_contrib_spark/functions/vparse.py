"""Vectorized multi-format payload parsing as an Arrow-batched pandas UDF.

The north rule mandates the parse step as vectorized pandas/Arrow UDFs
over the payload column (BASELINE.json input_hint). This is also the
faster path at high parallelism: Python workers are separate PROCESSES,
so the parse scales past the single-JVM contention ceiling that caps the
equivalent from_json/regexp_extract expression chain (~2x throughput at
32 cores in this sandbox; see BASELINE.md bench notes).

Regexes compile once per worker process (module import), batches arrive
as Arrow arrays — never per-row Python UDFs.
"""

from __future__ import annotations

import json as _json
import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

# the four payload shapes of the synthetic corpus (FIXTURES.md §2):
# fmt 0 apache common-log, 1 JSON, 2 key=value, 3 containerd
APACHE_RX = re.compile(
    r"^(?P<client_ip>\S+) (?P<ident>\S+) (?P<user>\S+) \[(?P<ts>[^\]]+)\] "
    r'"(?P<method>\S+) (?P<path>\S+) (?P<proto>[^"]+)" (?P<status>\d+) (?P<size>\d+)$'
)
CONTAINERD_RX = re.compile(
    r"^(?P<time>\S+) (?P<stream>stdout|stderr) (?P<logtag>\S+) (?P<log>.*)$"
)


def _parse_one(body: str | None, fmt: int | None) -> dict | None:
    if body is None:
        return None
    # Arrow delivers a null int series as float64 NaN — normalize so the
    # auto-detect branches (`fmt is None`) actually fire for tables
    # without a fmt column instead of falling through to CONTAINERD_RX
    if fmt is not None and pd.isna(fmt):
        fmt = None
    if fmt == 1 or (fmt is None and body.startswith("{")):
        try:
            return {
                k: (v if isinstance(v, str) else _json.dumps(v, separators=(",", ":")))
                for k, v in _json.loads(body).items()
            }
        except ValueError:
            return {}
    if fmt == 2 or (fmt is None and re.match(r"^\w+=\S+( \w+=\S+)*$", body)):
        return dict(p.split("=", 1) for p in body.strip().split(" ") if "=" in p)
    rx = APACHE_RX if (fmt == 0 or fmt is None) else CONTAINERD_RX
    m = rx.match(body)
    if m is None and fmt is None:
        m = CONTAINERD_RX.match(body)
    return {k: v for k, v in m.groupdict().items() if v is not None} if m else {}


@pandas_udf(T.MapType(T.StringType(), T.StringType()))
def parse_multiformat(body: pd.Series, fmt: pd.Series) -> pd.Series:
    """body + fmt tag -> map<string,string> of extracted attributes.
    Non-string JSON values are stringified with compact json.dumps
    (booleans -> 'true'/'false', nested objects -> JSON text), matching
    the JVM from_json map<string,string> path."""
    return pd.Series(
        [_parse_one(b, f) for b, f in zip(body, fmt)], dtype=object
    )


def parse_multiformat_col(body: Column, fmt: Column) -> Column:
    return parse_multiformat(body, fmt)
