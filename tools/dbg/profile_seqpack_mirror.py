"""Fragment-by-fragment memory profile of the sequence_packing DuckDB
mirror at sf10 — finds which CTE blows the 70GB budget (the sf10 solo
rerun OOM'd with an EMPTY spill dir, i.e. an unspillable operator).

Usage: python tools/dbg/profile_seqpack_mirror.py [SF_DIR] [MEM]
Runs each fragment as a standalone COUNT(*)/aggregate so DuckDB must
execute it fully, printing wall time and the connection's reported
peak/current memory after each.
"""

import os
import sys
import time

import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/testdata_sf10"
MEM = sys.argv[2] if len(sys.argv) > 2 else "60GB"

con = duckdb.connect()
con.execute("SET threads=8")
con.execute(f"SET memory_limit='{MEM}'")
spill = f"/tmp/duckspill_prof_{os.getpid()}"
os.makedirs(spill, exist_ok=True)
con.execute(f"SET temp_directory='{spill}'")
con.execute(
    f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
)

PREFIX = """
WITH docoff AS (
  -- DuckDB 1.0's window operator materializes every input column per
  -- partition and over-reserves LIST blocks (instant bad_alloc at sf10);
  -- hash joins with LIST payloads on the build side do the same. So the
  -- running sum carries only scalars (text stays a VARCHAR) and the
  -- tokenization happens AFTER the window, inside the unnest subquery.
  SELECT doc_id, shard, text,
         SUM(n) OVER (PARTITION BY shard ORDER BY doc_id
                      ROWS UNBOUNDED PRECEDING) - n AS off
  FROM (SELECT doc_id, doc_id % 4 AS shard, text,
               len(string_split(text,' ')) AS n
        FROM documents)
),
tok AS (
  SELECT doc_id, shard, off,
         list_transform(string_split(text,' '),
                        w -> ('0x'||substr(md5(w),1,8))::BIGINT % 50257) AS t
  FROM docoff
),
flat AS (
  SELECT shard, off + unnest(range(1, len(t) + 1)) - 1 AS gpos,
         unnest(t) AS tk
  FROM tok
),
c2 AS MATERIALIZED (
  SELECT shard, CAST(gpos // 64 AS INT) AS seq_index,
         list(tk ORDER BY gpos) AS tokens,
         COUNT(*) AS n_tok
  FROM flat GROUP BY 1, 2
),
wins AS MATERIALIZED (
  SELECT shard, seq_index,
         unnest(range(1, len(tokens)-16+2)) AS pos,
         unnest(list_transform(range(1, len(tokens)-16+2),
                i -> hash(array_to_string(tokens[i:i+15], ',')))) AS w
  FROM c2
  WHERE len(tokens) >= 16
),
wc AS (SELECT w, COUNT(*) AS c FROM wins GROUP BY 1),
dup AS (
  SELECT shard, seq_index, COUNT(*) AS dup_spans
  FROM wins JOIN wc USING (w) WHERE c >= 2 GROUP BY 1, 2
),
occ AS (
  SELECT shard, seq_index, pos,
         COUNT(*) OVER (PARTITION BY w) AS c,
         ROW_NUMBER() OVER (PARTITION BY w
                            ORDER BY shard*1000000+seq_index, pos) AS rn
  FROM wins
),
rem AS (
  SELECT shard, seq_index, list_sort(list(pos)) AS starts
  FROM occ WHERE c >= 2 AND rn > 1 GROUP BY 1, 2
),
clean AS (
  SELECT c2.shard, c2.seq_index,
         CASE WHEN r.starts IS NULL THEN c2.tokens
              ELSE list_filter(c2.tokens, (x, i) ->
                     len(list_filter(r.starts,
                         s -> i >= s AND i < s + 16)) = 0)
         END AS ct
  FROM c2 LEFT JOIN rem r USING (shard, seq_index)
)
"""

FRAGMENTS = [
    ("tok", "SELECT COUNT(*), SUM(len(t)) FROM tok"),
    ("docoff", "SELECT COUNT(*), MAX(off) FROM docoff"),
    ("flat", "SELECT COUNT(*), bit_xor(tk::UBIGINT) FROM flat"),
    ("c2", "SELECT COUNT(*), SUM(n_tok) FROM c2"),
    ("wins", "SELECT COUNT(*), bit_xor(w) FROM wins"),
    ("wc", "SELECT COUNT(*), MAX(c) FROM wc"),
    ("dup", "SELECT COUNT(*), SUM(dup_spans) FROM dup"),
    ("occ", "SELECT COUNT(*), MAX(rn) FROM occ"),
    ("rem", "SELECT COUNT(*), SUM(len(starts)) FROM rem"),
    ("clean", "SELECT COUNT(*), SUM(len(ct)) FROM clean"),
]


def rss_gb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return int(line.split()[1]) / 1e6
    return -1.0


for name, frag in FRAGMENTS:
    t0 = time.time()
    try:
        row = con.execute(PREFIX + frag).fetchall()
        dt = time.time() - t0
        print(f"{name:8s} ok   {dt:8.1f}s rss={rss_gb():6.1f}GB {row}", flush=True)
    except Exception as e:  # noqa: BLE001
        dt = time.time() - t0
        print(f"{name:8s} FAIL {dt:8.1f}s rss={rss_gb():6.1f}GB {type(e).__name__}: {str(e)[:120]}", flush=True)
        break
