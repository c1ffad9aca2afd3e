#!/bin/bash
# Quiet SOLO bench for scale adjudication. Round-14 verdict #4 adopted
# the rule this script enforces: an adjudication artifact only counts
# as "quiet" if the system loadavg is < 3 when the run STARTS (several
# r14 "solo quiet" artifacts embedded loadavgs of 5-25, which made them
# unusable as evidence). The gate runs BEFORE sbt launches; the start
# loadavg is stamped into the artifact as "loadavg_start" next to
# Bench's own end-of-run loadavg so a reader can verify both ends.
#
# usage: solo_bench.sh <keys,csv> <sf_dir> <out.json> [driver_mem=24g]
set -e
cd /root/repo
KEYS=$1; DIR=$2; OUT=$3; MEM=${4:-24g}
[ -n "$OUT" ] || { echo "usage: solo_bench.sh <keys,csv> <sf_dir> <out.json> [mem]"; exit 2; }
LA=$(cut -d' ' -f1 /proc/loadavg)
if ! python3 -c "import sys; sys.exit(0 if float('$LA') < 3.0 else 1)"; then
  echo "ABORT: loadavg $LA >= 3 at start — artifact would not qualify as quiet"
  exit 1
fi
echo "== solo bench keys=[$KEYS] sf=$DIR loadavg_start=$LA ($(date -u +%H:%M:%S)) =="
SPARK_GRAFT_SF_DIR=$DIR SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=$MEM \
  SPARK_GRAFT_ONLY=$KEYS SPARK_GRAFT_BENCH_OUT=$OUT \
  sbt -batch "runMain graft.Bench" 2>&1 | grep '"metric"'
python3 - "$OUT" "$LA" <<'EOF'
import json, sys
p, la = sys.argv[1], float(sys.argv[2])
d = json.load(open(p))
d["loadavg_start"] = la
json.dump(d, open(p, "w"))
print(f"stamped loadavg_start={la} -> {p}")
EOF
