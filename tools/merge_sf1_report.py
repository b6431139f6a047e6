"""Merge the full-sf1 sweep and the all-pairs-subset sweep into ONE
CORRECTNESS_SF1.json so the round's sf1 evidence is a single 50/50 report.

The three all-pairs rows (dedup_simhash, dedup_ngram_jaccard,
dedup_embedding_cosine) run on the deterministic 10% subset
(tools/make_sf1_subset.py) because their DuckDB mirrors are O(n^2);
each merged row records which sf_dir it ran against.

Usage: python tools/merge_sf1_report.py MAIN.json SUBSET.json [OUT.json]
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    main_path, subset_path = sys.argv[1], sys.argv[2]
    out = sys.argv[3] if len(sys.argv) > 3 else "CORRECTNESS_SF1.json"
    a = json.load(open(main_path))
    b = json.load(open(subset_path))
    queries: dict[str, dict] = {}
    for rep in (a, b):
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
        "sf": 1.0,
        "note": (
            "consolidated sf1 oracle sweep (deterministic 10x scale-up of the "
            "driver's sf0.1 — tools/make_sf1.py); the three O(n^2)-oracle "
            "all-pairs rows ran on the deterministic 10% subset "
            "(tools/make_sf1_subset.py) per VERDICT r3 ask #5"
        ),
        "cores": a.get("cores"),
        "queries": queries,
        "summary": {
            "ok": len(ok),
            "total": len(queries),
            "failures": sorted(set(queries) - set(ok)),
        },
    }
    with open(out, "w") as f:
        json.dump(merged, f, indent=1)
    print(f"{out}: {len(ok)}/{len(queries)} green; failures={merged['summary']['failures']}")


if __name__ == "__main__":
    main()
