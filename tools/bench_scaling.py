"""Two-parallelism-level scaling benchmark (north-rule evidence).

The rule's two-cluster-size criterion (N vs 4N executors, >=0.8 scaling
efficiency) cannot use a real cluster in this sandbox; per the driver
instructions it is evidenced by running the SAME job at two local
parallelism levels in separate JVMs on identical input.

This sandbox host is shared (background load from other tenants), so each
level is run `--repeats` times interleaved (A B A B ...) and the MIN wall
time per level is used — the min is the contention-free figure.

Efficiency (N -> kN cores) = throughput(kN) / (k * throughput(N)).

Usage: python tools/bench_scaling.py [--levels 8,32] [--rows 2000000]
       [--repeats 3] [--out BENCH_SCALING.json]
Prints one JSON line; optionally writes it to --out.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_once(cpus: int, rows: int) -> dict:
    """One bench.py invocation in a fresh JVM (first SparkSession pins the
    master, so every level needs its own process)."""
    out = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "bench.py"),
            "--skip-registry",
            "--cpus", str(cpus),
            "--seq-rows", str(rows),
            "--repeats", "1",
        ],
        capture_output=True,
        text=True,
        env={**os.environ, "SPARK_GRAFT_DRIVER_MEM": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g")},
        check=True,
        cwd=REPO,
    )
    line = out.stdout.strip().splitlines()[-1]
    return json.loads(line)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--levels", default="8,32")
    ap.add_argument("--rows", type=int, default=2_000_000)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--out", default="")
    args = ap.parse_args()
    levels = [int(x) for x in args.levels.split(",")]

    best: dict[int, float] = {lv: float("inf") for lv in levels}
    for i in range(args.repeats):
        for lv in levels:  # interleaved so host noise hits both levels alike
            r = run_once(lv, args.rows)
            t = r["queries"]["log_pipeline_tokens"]
            best[lv] = min(best[lv], t)
            print(f"trial {i} local[{lv}]: {t:.2f}s", file=sys.stderr, flush=True)

    lo, hi = min(levels), max(levels)
    thr = {lv: args.rows / best[lv] for lv in levels}
    k = hi / lo
    eff = thr[hi] / (k * thr[lo])
    result = {
        "metric": "scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        "rows": args.rows,
        "levels": {
            str(lv): {
                "best_sec": round(best[lv], 2),
                "seq_per_sec": round(thr[lv], 1),
            }
            for lv in levels
        },
        "cores_ratio": k,
        "note": "min-of-interleaved-trials on a shared host; separate JVM per level",
    }
    line = json.dumps(result)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
