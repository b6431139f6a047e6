"""Deterministic 1% subset of sf10 documents/embeddings for the three
all-pairs oracle rows (dedup_simhash, dedup_ngram_jaccard,
dedup_embedding_cosine) whose DuckDB mirrors are O(n^2) and infeasible at
500k docs / 200k vectors (same policy as the sf1 sweep, VERDICT r3 ask #5).

Subset rule: keep id % 100 == 0, plus ids < 20 (docs) / < 10 (vectors) so
the fixed centroid/query/probe id sets used by the registry queries stay
complete. The sf10 replica stride (5000 docs / 2000 vecs) is a multiple
of 100, so id % 100 == 0 keeps ENTIRE replica cliques: every kept original
comes with all 99 of its near-dup replicas, so the subset has the same
near-dup cluster structure as full sf10 at 1/100 the rows (back to the
sf0.1 pairwise cost the oracle already handles).

All other tables are symlinked from sf10 unchanged.

Usage: python tools/make_sf10_subset.py [--src testdata_sf10] [--out testdata_sf10/subset]
"""

from __future__ import annotations

import argparse
import os

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default=os.path.join(REPO, "testdata_sf10"))
    ap.add_argument("--out", default=os.path.join(REPO, "testdata_sf10", "subset"))
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    con = duckdb.connect()
    con.execute(
        f"COPY (SELECT * FROM read_parquet('{args.src}/documents.parquet') "
        f"WHERE doc_id % 100 = 0 OR doc_id < 20 ORDER BY doc_id) "
        f"TO '{args.out}/documents.parquet' (FORMAT PARQUET)"
    )
    con.execute(
        f"COPY (SELECT * FROM read_parquet('{args.src}/embeddings.parquet') "
        f"WHERE vec_id % 100 = 0 OR vec_id < 10 ORDER BY vec_id) "
        f"TO '{args.out}/embeddings.parquet' (FORMAT PARQUET)"
    )
    for t in ["region", "nation", "customer", "supplier", "part", "orders", "lineitem", "events"]:
        dst = f"{args.out}/{t}.parquet"
        if not os.path.exists(dst):
            os.symlink(os.path.relpath(f"{args.src}/{t}.parquet", args.out), dst)
    for t in ["documents", "embeddings"]:
        n = con.sql(f"SELECT count(*) FROM read_parquet('{args.out}/{t}.parquet')").fetchone()[0]
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    main()
