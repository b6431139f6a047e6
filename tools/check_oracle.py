"""Local replica of the driver's correctness gate: run each queries() entry
on Spark and its oracle_sql() on DuckDB, compare row count, sorted column
names, and an order-insensitive value hash.

Usage: python tools/check_oracle.py [name ...]
Env:   ORACLE_SF_DIR  parquet dir (default /root/testdata/sf0.01)
       ORACLE_CORES   spark local[N] + shuffle partitions (default 8)
       ORACLE_JSON    write a CORRECTNESS-style JSON report here
"""

from __future__ import annotations

import hashlib
import json
import math
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.01")
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
    exclude = set(filter(None, os.environ.get("ORACLE_EXCLUDE", "").split(",")))
    cores = int(os.environ.get("ORACLE_CORES", "8"))
    spark = build_session(app_name="oracle-check", master=f"local[{cores}]", shuffle_partitions=cores)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    report = {"sf_dir": SF_DIR, "cores": cores, "queries": {}}
    out = os.environ.get("ORACLE_JSON")

    def flush():
        # incremental write so an interrupted sweep keeps its partial results
        if out:
            n_ok = sum(1 for v in report["queries"].values() if v["status"] == "ok")
            report["summary"] = {"ok": n_ok, "total": len(report["queries"]), "failures": failures}
            with open(out, "w") as f:
                json.dump(report, f, indent=1)

    for name, fn in qs.items():
        if (only and name not in only) or name in exclude:
            continue
        t0 = time.monotonic()
        try:
            sdf = fn(spark, SF_DIR)
            srows = [r.asDict() for r in sdf.collect()]
            scols = sorted(sdf.columns)
        except Exception as e:
            print(f"FAIL {name}: spark error {str(e)[:200]}")
            failures.append(name)
            report["queries"][name] = {"status": "spark_error", "err": str(e)[:300]}
            flush()
            continue
        spark_sec = round(time.monotonic() - t0, 2)
        if name not in oracles:
            print(f"SKIP {name}: rows-only check -> {len(srows)} rows ({spark_sec}s)")
            report["queries"][name] = {"status": "rows_only", "rows": len(srows), "spark_sec": spark_sec}
            flush()
            continue
        t1 = time.monotonic()
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
            report["queries"][name] = {"status": "duckdb_error", "err": str(e)[:300]}
            flush()
            continue
        duck_sec = round(time.monotonic() - t1, 2)
        ok_rows = len(srows) == len(drows)
        ok_cols = scols == dcols
        ok_hash = ok_rows and ok_cols and value_hash(srows) == value_hash(drows)
        report["queries"][name] = {
            "status": "ok" if ok_hash else "mismatch",
            "rows": len(srows),
            "rows_match": ok_rows,
            "schema_match": ok_cols,
            "hash_match": ok_hash,
            "spark_sec": spark_sec,
            "duckdb_sec": duck_sec,
        }
        flush()
        if ok_hash:
            print(f"OK   {name}: {len(srows)} rows (spark {spark_sec}s, duck {duck_sec}s)")
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
    if out:
        flush()
        print(f"wrote {out}")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
