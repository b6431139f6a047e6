"""Per-partition lineage / checkpoint-resume for batch jobs.

Semantics ported from the fileconsumer checkpoint protocol (fingerprint +
offset persistence,
/root/reference/pkg/stanza/fileconsumer/internal/checkpoint/checkpoint.go:24-57)
and the exporterhelper persistent sending queue (survive restarts,
exporter/glassflowexporter README "sending_queue"): a killed run resumes
without reprocessing completed input slices.

Batch protocol:
1. Input is split into deterministic slices (e.g. by a partition column or
   a hash bucket of a stable id).
2. Before processing a slice, check the lineage table; skip if status=done
   with the same input fingerprint.
3. After the sink write commits, append a lineage row (slice id,
   fingerprint, rows_in/rows_out, status=done).

The lineage table itself is tiny (one row per slice) — driver-side
read/append parquet is fine at any input scale.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LINEAGE_SCHEMA = "slice_id string, fingerprint string, rows_in long, rows_out long, status string, wall_seconds double"


def slice_fingerprint(df: DataFrame, id_col: str) -> str:
    """Deterministic fingerprint of a slice: count + xor + SUM of id
    hashes — the fileconsumer's first-N-bytes fingerprint analog
    (identifies the same input across runs). One aggregate pass,
    order-insensitive. The sum component is required because xor alone
    collapses duplicate ids (h^h = 0): [a,a,b] and [c,c,b] xor-collide at
    equal counts, and nothing enforces id uniqueness within a slice —
    a false fingerprint match means run_resumable silently skips changed
    input. The sum runs in decimal(38,0) (safe to ~10^19 rows; a long sum
    would both overflow-error under ANSI and wrap)."""
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.bit_xor(F.xxhash64(F.col(id_col))).alias("h"),
        F.sum(F.xxhash64(F.col(id_col)).cast("decimal(38,0)")).alias("s"),
    ).collect()[0]
    return f"{row['n']}:{row['h']}:{row['s']}"


class LineageLog:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        os.makedirs(path, exist_ok=True)

    def _file(self, slice_id: str) -> str:
        return os.path.join(self.path, f"{slice_id}.json")

    def done(self, slice_id: str, fingerprint: str) -> bool:
        f = self._file(slice_id)
        if not os.path.exists(f):
            return False
        rec = json.load(open(f))
        return rec.get("status") == "done" and rec.get("fingerprint") == fingerprint

    def commit(self, slice_id: str, fingerprint: str, rows_in: int, rows_out: int, wall: float) -> None:
        rec = {
            "slice_id": slice_id,
            "fingerprint": fingerprint,
            "rows_in": rows_in,
            "rows_out": rows_out,
            "status": "done",
            "wall_seconds": wall,
        }
        tmp = self._file(slice_id) + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(rec, fh)
        os.replace(tmp, self._file(slice_id))  # atomic rename == commit point

    def as_df(self) -> DataFrame:
        files = [self._file(f[: -len(".json")]) for f in os.listdir(self.path) if f.endswith(".json")]
        if not files:
            return self.spark.createDataFrame([], LINEAGE_SCHEMA)
        return self.spark.read.schema(LINEAGE_SCHEMA).json(files)


def run_resumable(
    spark: SparkSession,
    slices: dict[str, DataFrame],
    process: "callable",
    write: "callable",
    lineage_path: str,
    id_col: str = "doc_id",
) -> dict[str, dict]:
    """Process named slices, skipping ones already committed with the same
    fingerprint. Returns {slice_id: {skipped, rows_in, rows_out}}."""
    log = LineageLog(spark, lineage_path)
    results: dict[str, dict] = {}
    for sid, df in slices.items():
        fp = slice_fingerprint(df, id_col)
        if log.done(sid, fp):
            results[sid] = {"skipped": True}
            continue
        t0 = time.time()
        out = process(df)
        rows_out = write(sid, out)
        # the row count is already embedded in the fingerprint — a
        # df.count() here would be a whole extra scan of the slice
        rows_in = int(fp.split(":", 1)[0])
        log.commit(sid, fp, rows_in, rows_out, time.time() - t0)
        results[sid] = {"skipped": False, "rows_in": rows_in, "rows_out": rows_out}
    return results
