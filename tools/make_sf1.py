"""Deterministic 10x scale-up of the driver's sf0.1 testdata -> "sf1r".

The driver ships sf0.001/0.01/0.1 only; the round-4 ask is correctness +
bench evidence at sf1.  This builds a 10x replication of sf0.1 (the same
construction TPC uses for dbgen SF step-ups): every original row is kept
byte-identical (so fixed-id query subsets like `vec_id < 8` centroids and
`doc_id < 20` decontamination probes are unchanged), and nine replicas are
appended with keys shifted by k * <table cardinality> (keys stay dense
0..10N-1 and referential integrity is preserved because every FK is shifted
by the same replica stride as its PK).

Variation (so the corpus is not 90% byte-identical duplicates):
  - documents: replica k prefixes text with "[r{k}] " (near-dup clusters of
    size 10 across replicas -- realistic CommonCrawl-style duplication for
    the dedup/near-dup operators); n_chars stays == len(text).
  - embeddings: replica k adds k*1e-3 to dimension (vec_id % 64) -- a small
    directional perturbation (a scalar multiply would be invisible to
    cosine), so replicas are ~0.9999-cosine near-dups, not exact ties.
Everything is a pure function of (original row, k): no RNG, no wall clock.

Output: /root/repo/testdata_sf1/*.parquet (gitignored; ~10x sf0.1).
Usage: python tools/make_sf1.py [--factor 10] [--out testdata_sf1]
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"

# table -> {column: stride} ; stride = sf0.1 cardinality of the keyed table
STRIDES = {
    "customer": {"c_custkey": 15_000},
    "supplier": {"s_suppkey": 1_000},
    "part": {"p_partkey": 20_000},
    "orders": {"o_orderkey": 150_000, "o_custkey": 15_000},
    "lineitem": {"l_orderkey": 150_000, "l_partkey": 20_000, "l_suppkey": 1_000},
    "events": {"event_id": 100_000, "user_id": 1_500},
    "documents": {"doc_id": 5_000},
    "embeddings": {"vec_id": 2_000},
}
COPY_ONLY = ["region", "nation"]  # dimensions don't scale (TPC-H style)


def shift_one(table: pa.Table, name: str, k: int) -> pa.Table:
    """Replica k of a table: pure function of (original row, k) — keys
    shifted by k * stride, documents text prefixed, embeddings perturbed."""
    if k == 0:
        return table
    t = table
    for col, stride in STRIDES[name].items():
        idx = t.schema.get_field_index(col)
        shifted = pc.add(t.column(col), pa.scalar(k * stride, t.schema.field(col).type))
        t = t.set_column(idx, col, shifted)
    if name == "documents":
        prefix = f"[r{k}] "
        idx = t.schema.get_field_index("text")
        new_text = pc.binary_join_element_wise(pa.scalar(prefix), t.column("text").combine_chunks(), "")
        t = t.set_column(idx, "text", new_text)
        nidx = t.schema.get_field_index("n_chars")
        t = t.set_column(nidx, "n_chars", pc.add(t.column("n_chars"), pa.scalar(len(prefix), pa.int64())))
    if name == "embeddings":
        emb = t.column("embedding").combine_chunks()
        vals = emb.values.to_numpy(zero_copy_only=False).copy().reshape(len(t), 64)
        vec_ids = t.column("vec_id").to_numpy()
        vals[np.arange(len(t)), vec_ids % 64] += k * 1e-3
        flat = pa.array(vals.reshape(-1), type=pa.float32())
        new_emb = pa.ListArray.from_arrays(emb.offsets, flat)
        t = t.set_column(t.schema.get_field_index("embedding"), "embedding", new_emb)
    return t


def replicate(table: pa.Table, name: str, factor: int) -> pa.Table:
    return pa.concat_tables([shift_one(table, name, k) for k in range(factor)])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--out", default=os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "testdata_sf1"))
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    for name in COPY_ONLY:
        t = pq.read_table(f"{SRC}/{name}.parquet")
        pq.write_table(t, f"{args.out}/{name}.parquet")
        print(f"{name}: {t.num_rows} rows (copied)")
    for name in STRIDES:
        t = pq.read_table(f"{SRC}/{name}.parquet")
        out = replicate(t, name, args.factor)
        pq.write_table(out, f"{args.out}/{name}.parquet", row_group_size=256 * 1024)
        print(f"{name}: {t.num_rows} -> {out.num_rows} rows")


if __name__ == "__main__":
    main()
