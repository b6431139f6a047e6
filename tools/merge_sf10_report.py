"""Merge the sharded sf10 sweep (tools/run_sf10_sweep.sh: four cost-packed
main shards + the all-pairs subset shard) into ONE CORRECTNESS_SF10.json so
the round's sf10 evidence is a single 50/50 report.

The three all-pairs rows (dedup_simhash, dedup_ngram_jaccard,
dedup_embedding_cosine) run on the deterministic 1% subset
(tools/make_sf10_subset.py) because their DuckDB mirrors are O(n^2);
each merged row records which sf_dir it ran against.

Usage: python tools/merge_sf10_report.py SHARD.json [SHARD.json ...] [-o OUT]
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("shards", nargs="+")
    ap.add_argument("-o", "--out", default="CORRECTNESS_SF10.json")
    args = ap.parse_args()
    queries: dict[str, dict] = {}
    cores = None
    for path in args.shards:
        rep = json.load(open(path))
        cores = cores or rep.get("cores")
        for name, row in rep["queries"].items():
            row = dict(row)
            row["sf_dir"] = rep["sf_dir"]
            queries[name] = row
    ok = [
        n
        for n, v in queries.items()
        if v.get("rows_match") and v.get("schema_match") and v.get("hash_match")
    ]
    merged = {
        "sf": 10.0,
        "note": (
            "consolidated sf10 oracle sweep (deterministic 100x scale-up of "
            "the driver's sf0.1 — tools/make_sf10.py; 60M-row lineitem, "
            "10M-row events); the three O(n^2)-oracle all-pairs rows ran on "
            "the deterministic 1% clique-preserving subset "
            "(tools/make_sf10_subset.py), same policy as the sf1 sweep"
        ),
        "cores": cores,
        "queries": queries,
        "summary": {
            "ok": len(ok),
            "total": len(queries),
            "failures": sorted(set(queries) - set(ok)),
        },
    }
    with open(args.out, "w") as f:
        json.dump(merged, f, indent=1)
    print(
        f"{args.out}: {len(ok)}/{len(queries)} green; "
        f"failures={merged['summary']['failures']}"
    )


if __name__ == "__main__":
    main()
