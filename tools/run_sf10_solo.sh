#!/bin/bash
# Solo reruns for the sf10 rows that failed under shard co-tenancy
# (4-5 concurrent oracle processes overcommitted RAM / filled the spill
# disk). One query per process, the whole host to itself, a DuckDB
# budget sized to the 128 GB box, and the spill dir on the big volume.
set -u
cd "$(dirname "$0")/.."
SF10=$PWD/testdata_sf10
# DuckDB's bundled jemalloc creates ~1 anonymous mapping per block on the
# 10M-row mirrors; the kernel default vm.max_map_count=65530 is exhausted
# long before memory is (the sporadic "bad allocation" OOMs at tiny block
# sizes with 70+ GB free). Raise it for the sweep; warn if not permitted.
if [ "$(cat /proc/sys/vm/max_map_count)" -lt 1048576 ]; then
  sysctl -w vm.max_map_count=2097152 \
    || echo "WARN: could not raise vm.max_map_count; big mirrors may bad_alloc" >&2
fi
export ORACLE_CORES=16 ORACLE_DUCK_THREADS=16 SPARK_DRIVER_MEMORY=20g
export ORACLE_DUCK_MEM=${ORACLE_DUCK_MEM:-70GB}

for q in "$@"; do
  echo "=== solo $q ==="
  ORACLE_SF_DIR=$SF10 ORACLE_JSON=/tmp/sf10_solo_$q.json \
    python tools/check_oracle.py "$q" >/tmp/sf10_solo_$q.log 2>&1
  python3 - "$q" <<'EOF'
import json, sys
q = sys.argv[1]
d = json.load(open(f"/tmp/sf10_solo_{q}.json"))
print(q, json.dumps(d["queries"].get(q, {}), default=str)[:300])
EOF
done
echo "solo runs done"
