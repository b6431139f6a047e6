"""Deterministic 100x scale-up of the driver's sf0.1 testdata -> "sf10".

Round-5 ask #1: repeat the sf0.1 -> sf1 evidence step one decade up.  Same
construction as tools/make_sf1.py (TPC dbgen-style replication: original
rows byte-identical, replica k shifts every PK/FK by k * <sf0.1
cardinality>, documents get a "[r{k}] " prefix so near-dups are realistic
CommonCrawl-style clusters — size 100 here — and embeddings get a k*1e-3
perturbation on dimension vec_id % 64), but written INCREMENTALLY: one
pq.ParquetWriter per table, one replica per write call, so the 60M-row
lineitem never sits in memory 100x at once.

Everything is a pure function of (original row, k): no RNG, no wall clock.
Subset note: all strides are multiples of 100, so `id % 100 == 0` keeps
entire replica cliques — tools/make_sf10_subset.py relies on this.

Output: /root/repo/testdata_sf10/*.parquet (gitignored; ~100x sf0.1).
Usage: python tools/make_sf10.py [--factor 100] [--out testdata_sf10]
"""

from __future__ import annotations

import argparse
import os
import sys

import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from make_sf1 import COPY_ONLY, SRC, STRIDES, shift_one  # noqa: E402


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=100)
    ap.add_argument("--out", default=os.path.join(repo, "testdata_sf10"))
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    for name in COPY_ONLY:
        t = pq.read_table(f"{SRC}/{name}.parquet")
        pq.write_table(t, f"{args.out}/{name}.parquet")
        print(f"{name}: {t.num_rows} rows (copied)", flush=True)
    for name in STRIDES:
        t = pq.read_table(f"{SRC}/{name}.parquet")
        dst = f"{args.out}/{name}.parquet"
        with pq.ParquetWriter(dst, t.schema) as w:
            for k in range(args.factor):
                w.write_table(shift_one(t, name, k), row_group_size=256 * 1024)
        n = pq.read_metadata(dst).num_rows
        print(f"{name}: {t.num_rows} -> {n} rows", flush=True)


if __name__ == "__main__":
    main()
