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


_KV_DETECT_RX = re.compile(r"^\w+=\S+( \w+=\S+)*$")


def _json_one(b: str) -> dict:
    try:
        return {
            k: (v if isinstance(v, str) else _json.dumps(v, separators=(",", ":")))
            for k, v in _json.loads(b).items()
        }
    except ValueError:
        return {}


def _kv_one(b: str) -> dict:
    return dict(p.split("=", 1) for p in b.strip().split(" ") if "=" in p)


def _extract_records(sub: pd.Series, rx) -> pd.Series:
    """Vectorized named-group extraction. Preferred path: ONE
    pyarrow.compute.extract_regex call — RE2 in C++ over the whole Arrow
    batch slice (~3.5x faster than pandas str.extract, which loops Python
    `re` per row) — then COLUMNAR dict assembly from the struct's child
    arrays (whole-struct to_pylist materializes 9-key dicts slower than
    the regex itself; ~25% total win measured at 1M rows). Falls back to
    str.extract if the pattern exceeds RE2 (none of ours do: no
    backrefs/lookarounds). Non-matching rows become {} (parser on_error
    semantics apply downstream on empty maps)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    pattern = rx.pattern if hasattr(rx, "pattern") else rx
    try:
        hits = pc.extract_regex(pa.array(sub, type=pa.string()), pattern=pattern)
    except pa.ArrowInvalid:  # RE2-unsupported construct: pandas fallback
        recs = sub.str.extract(pattern).to_dict("records")
        return pd.Series(
            [{k: v for k, v in r.items() if isinstance(v, str)} for r in recs],
            index=sub.index,
            dtype=object,
        )
    names = [f.name for f in hits.type]
    cols = [hits.field(i).to_pylist() for i in range(len(names))]
    struct_nulls = hits.null_count
    # optional groups would surface as per-field nulls on MATCHED rows;
    # drop them like the pandas path did (our patterns have none, so this
    # branch normally stays cold)
    field_nulls = any(hits.field(i).null_count > struct_nulls for i in range(len(names)))
    if struct_nulls:
        valid = pc.is_valid(hits).to_pylist()
        if field_nulls:
            rows = [
                {k: v for k, v in zip(names, vals) if v is not None} if ok else {}
                for ok, vals in zip(valid, zip(*cols))
            ]
        else:
            rows = [
                dict(zip(names, vals)) if ok else {}
                for ok, vals in zip(valid, zip(*cols))
            ]
    elif field_nulls:
        rows = [
            {k: v for k, v in zip(names, vals) if v is not None}
            for vals in zip(*cols)
        ]
    else:
        rows = [dict(zip(names, vals)) for vals in zip(*cols)]
    return pd.Series(rows, index=sub.index, dtype=object)


@pandas_udf(T.MapType(T.StringType(), T.StringType()))
def parse_multiformat(body: pd.Series, fmt: pd.Series) -> pd.Series:
    """body + fmt tag -> map<string,string> of extracted attributes.

    Group-wise vectorized: rows are partitioned by format once per batch,
    then each regex format runs as a single pandas str.extract (C regex
    loop) instead of a per-row Python re.match. JSON/key=value rows keep
    per-row parsing (inherently dict-shaped) but skip the format dispatch.
    Non-string JSON values are stringified with compact json.dumps
    (booleans -> 'true'/'false', nested objects -> JSON text), matching
    the JVM from_json map<string,string> path."""
    out = pd.Series([None] * len(body), index=body.index, dtype=object)
    bn = body.notna()
    fnum = pd.to_numeric(fmt, errors="coerce")
    known = fnum.notna() & bn
    is0 = known & (fnum == 0)
    is1 = known & (fnum == 1)
    is2 = known & (fnum == 2)
    auto = bn & fnum.isna()
    if auto.any():
        b = body[auto]
        j = b.str.startswith("{").fillna(False)
        is1.loc[j[j].index] = True
        rem = b[~j]
        kv = rem.str.match(_KV_DETECT_RX).fillna(False)
        is2.loc[kv[kv].index] = True
        rem2 = rem[~kv]
        ap = rem2.str.match(APACHE_RX).fillna(False)
        is0.loc[ap[ap].index] = True
    # everything else (fmt==3, unknown tags, auto-fallthrough) -> containerd,
    # matching _parse_one's dispatch
    is3 = bn & ~is0 & ~is1 & ~is2
    if is1.any():
        sub = body[is1]
        out.loc[is1] = pd.Series([_json_one(x) for x in sub], index=sub.index, dtype=object)
    if is2.any():
        sub = body[is2]
        out.loc[is2] = pd.Series([_kv_one(x) for x in sub], index=sub.index, dtype=object)
    if is0.any():
        out.loc[is0] = _extract_records(body[is0], APACHE_RX)
    if is3.any():
        out.loc[is3] = _extract_records(body[is3], CONTAINERD_RX)
    return out


def parse_multiformat_col(body: Column, fmt: Column) -> Column:
    return parse_multiformat(body, fmt)
