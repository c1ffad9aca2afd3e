#!/bin/bash
# Quiet SOLO bench for scale adjudication. Round-14 verdict #4 adopted
# the loadavg rule this script enforces: an adjudication artifact only
# counts as "quiet" if the system loadavg is < 3 when the run STARTS
# (several r14 "solo quiet" artifacts embedded loadavgs of 5-25, which
# made them unusable as evidence). The gate runs BEFORE sbt launches;
# the start loadavg is stamped into the artifact as "loadavg_start"
# next to Bench's own end-of-run loadavg so a reader can verify both
# ends.
#
# Round-16 additions (r15 verdict #3 + advice):
#  - CONVERGENCE is enforced: Bench runs each key until the last two
#    successful runs agree within 10% (min 3, max 6 runs). A key that
#    never converges FAILS this script (exit 3) — r15 adjudicated two
#    keys on still-decaying series ([50.3, 26.1, 8.9] at run 3), which
#    the r14 precedent had already rejected for dedup_substring. The
#    artifact is still written (with "converged" per key) so the
#    failure itself is on the record, but it must not be cited as a
#    steady-state verdict.
#  - `set -eo pipefail` + pre-run `rm -f $OUT`: the old pipeline's
#    exit status was grep's, so an sbt failure after one '"metric"'
#    line could mask the error, and a stale $OUT from an earlier run
#    could be stamped as fresh evidence.
#
# usage: solo_bench.sh <keys,csv> <sf_dir> <out.json> [driver_mem=24g]
set -eo pipefail
cd /root/repo
KEYS=$1; DIR=$2; OUT=$3; MEM=${4:-24g}
[ -n "$OUT" ] || { echo "usage: solo_bench.sh <keys,csv> <sf_dir> <out.json> [mem]"; exit 2; }
rm -f "$OUT"
LA=$(cut -d' ' -f1 /proc/loadavg)
if ! python3 -c "import sys; sys.exit(0 if float('$LA') < 3.0 else 1)"; then
  echo "ABORT: loadavg $LA >= 3 at start — artifact would not qualify as quiet"
  exit 1
fi
echo "== solo bench keys=[$KEYS] sf=$DIR loadavg_start=$LA ($(date -u +%H:%M:%S)) =="
SPARK_GRAFT_SF_DIR=$DIR SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=$MEM \
  SPARK_GRAFT_ONLY=$KEYS SPARK_GRAFT_BENCH_OUT=$OUT \
  SPARK_GRAFT_CONVERGE=1 \
  sbt -batch "runMain graft.Bench" 2>&1 | grep '"metric"'
python3 - "$OUT" "$LA" <<'EOF'
import json, sys
p, la = sys.argv[1], float(sys.argv[2])
d = json.load(open(p))
d["loadavg_start"] = la
json.dump(d, open(p, "w"))
print(f"stamped loadavg_start={la} -> {p}")
bad = sorted(k for k, c in d.get("converged", {}).items() if not c)
if bad:
    print(f"NON-CONVERGED (not citable as steady state): {bad}")
    print({k: d.get("runs", {}).get(k) for k in bad})
    sys.exit(3)
EOF
