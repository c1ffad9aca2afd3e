#!/bin/bash
# Full-surface scale certification (round-13 form): generate the
# 10x/100x key-shifted replicas of the driver's sf0.1 (graft.GenData,
# const vocab — same shape as every prior sf1/sf10 artifact), then run
# the complete key surface at each point in N fresh-JVM shards and
# merge (tools/merge_bench.py). Sharding is the round-12 verdict #3
# fix: a single 193-key JVM inflates its LATE tail 2-3x (JVM aging /
# page-cache churn), which previously forced hand adjudication of
# in-band keys; fresh JVMs per ~32-key shard keep every key near its
# isolated steady state. One sbt JVM at a time (see
# .claude/skills/verify: concurrent benches contaminate /tmp layouts
# and contend for cores). 32g driver heap per the round-9 finding (at
# 24g sf10 loses localCheckpoint blocks to heap pressure).
#
# usage: certify_sf10.sh [round_tag]      (default r13)
set -e
cd /root/repo
TAG=${1:-r13}
SHARDS=${SHARDS:-6}
SF1=/tmp/graft_sf1
SF10=/tmp/graft_sf10

# NB: Spark writes lineitem.parquet as a DIRECTORY — test with -e, not -f
if [ ! -e $SF1/lineitem.parquet ]; then
  echo "== gen sf1 ($(date -u +%H:%M:%S)) =="
  sbt -batch "runMain graft.GenData /root/testdata/sf0.1 $SF1 10 const" 2>&1 | grep -E "gendata|error\]" | grep -v "INFO\|WARN" | tail -15
fi
if [ ! -e $SF10/lineitem.parquet ]; then
  echo "== gen sf10 ($(date -u +%H:%M:%S)) =="
  sbt -batch "runMain graft.GenData /root/testdata/sf0.1 $SF10 100 const" 2>&1 | grep -E "gendata|error\]" | grep -v "INFO\|WARN" | tail -15
fi

echo "== shard plan ($(date -u +%H:%M:%S)) =="
# sbt prefixes every stdout line with "[info] " — strip it and keep
# only bare key tokens (drops sbt's own chatter lines)
sbt -batch "runMain graft.ListKeys" 2>&1 \
  | sed -n 's/^\[info\] \([a-z][a-z0-9_]*\)$/\1/p' \
  | grep -vE '^(set|done)$' > /tmp/graft_keys.txt
N=$(wc -l < /tmp/graft_keys.txt)
echo "$N keys across $SHARDS shards"
if [ "$N" -lt 100 ]; then echo "ABORT: key extraction broke ($N keys)"; exit 1; fi
split -d -n r/$SHARDS /tmp/graft_keys.txt /tmp/graft_shard_

for SF in sf1 sf10; do
  DIR=/tmp/graft_$SF
  rm -f /tmp/bench_${TAG}_${SF}_shard*.json   # stale shards would merge silently
  for s in $(seq -f "%02g" 0 $((SHARDS-1))); do
    KEYS=$(paste -sd, /tmp/graft_shard_$s)
    echo "== bench $SF shard $s ($(date -u +%H:%M:%S)) =="
    SPARK_GRAFT_SF_DIR=$DIR SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=32g \
      SPARK_GRAFT_ONLY=$KEYS \
      SPARK_GRAFT_BENCH_OUT=/tmp/bench_${TAG}_${SF}_shard$s.json \
      sbt -batch "runMain graft.Bench" 2>&1 | grep '"metric"'
  done
  python3 tools/merge_bench.py BENCH_${SF}_${TAG}.json /tmp/bench_${TAG}_${SF}_shard*.json
done
echo "== done ($(date -u +%H:%M:%S)) =="
