"""Local replica of the driver's correctness gate: run each queries() entry
on Spark and its oracle_sql() on DuckDB at sf0.01, compare row count, sorted
column names, and an order-insensitive value hash.

Usage: python tools/check_oracle.py [name ...]
"""

from __future__ import annotations

import hashlib
import math
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders", "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # kill float representation noise
        return f"{v:.6g}"
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{norm_cell(v[k])}" for k in sorted(v)) + "}"
    return str(v)


def value_hash(rows: list[dict]) -> str:
    cols = sorted(rows[0].keys()) if rows else []
    lines = sorted("|".join(norm_cell(r[c]) for c in cols) for r in rows)
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main():
    from opentelemetry_collector_contrib_spark.session import build_session

    import __spark_entry__ as entrymod

    only = set(sys.argv[1:])
    spark = build_session(app_name="oracle-check", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, SF_DIR)
            srows = [r.asDict() for r in sdf.collect()]
            scols = sorted(sdf.columns)
        except Exception as e:
            print(f"FAIL {name}: spark error {str(e)[:200]}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"SKIP {name}: rows-only check -> {len(srows)} rows")
            continue
        try:
            rel = con.sql(oracles[name])
            # the driver fetches via pandas where HUGEINT -> float64
            # ("128" vs "128.0") — reject un-cast SUM-of-integer columns
            # locally instead of finding out from CORRECTNESS_r{N}
            huge = [c for c, t in zip(rel.columns, rel.types) if "HUGEINT" in str(t).upper()]
            if huge:
                raise ValueError(f"oracle emits HUGEINT columns {huge}; add CAST(... AS BIGINT)")
            cur = con.execute(oracles[name])
            dcols_raw = [d[0] for d in cur.description]
            drows = [dict(zip(dcols_raw, row)) for row in cur.fetchall()]
            dcols = sorted(dcols_raw)
        except Exception as e:
            print(f"FAIL {name}: duckdb error {str(e)[:200]}")
            failures.append(name)
            continue
        ok_rows = len(srows) == len(drows)
        ok_cols = scols == dcols
        ok_hash = ok_rows and ok_cols and value_hash(srows) == value_hash(drows)
        if ok_hash:
            print(f"OK   {name}: {len(srows)} rows")
        else:
            failures.append(name)
            print(f"FAIL {name}: rows {len(srows)}/{len(drows)} cols_match={ok_cols}")
            if not ok_cols:
                print(f"     spark cols: {scols}\n     duck  cols: {dcols}")
            elif ok_rows:
                s = {("|".join(norm_cell(r[c]) for c in scols)) for r in srows}
                d = {("|".join(norm_cell(r[c]) for c in dcols)) for r in drows}
                for x in list(s - d)[:3]:
                    print(f"     spark-only: {x[:160]}")
                for x in list(d - s)[:3]:
                    print(f"     duck-only:  {x[:160]}")
    spark.stop()
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
