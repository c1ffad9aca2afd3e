#!/bin/bash
# Round-12 full-surface scale certification: generate the 10x/100x
# key-shifted replicas of the driver's sf0.1 (graft.GenData, const
# vocab — same shape as every prior sf1/sf10 artifact), then run the
# complete 193-key Bench at each point. One sbt JVM at a time
# (see .claude/skills/verify: concurrent benches contaminate /tmp
# layouts and contend for cores). 32g driver heap per the round-9
# finding (at 24g sf10 loses localCheckpoint blocks to heap pressure).
set -e
cd /root/repo
SF1=/tmp/graft_sf1
SF10=/tmp/graft_sf10

echo "== gen sf1 ($(date -u +%H:%M:%S)) =="
sbt -batch "runMain graft.GenData /root/testdata/sf0.1 $SF1 10 const" 2>&1 | grep -E "gendata|error\]" | grep -v "INFO\|WARN" | tail -15

echo "== gen sf10 ($(date -u +%H:%M:%S)) =="
sbt -batch "runMain graft.GenData /root/testdata/sf0.1 $SF10 100 const" 2>&1 | grep -E "gendata|error\]" | grep -v "INFO\|WARN" | tail -15

echo "== bench sf1 ($(date -u +%H:%M:%S)) =="
SPARK_GRAFT_SF_DIR=$SF1 SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=32g \
  SPARK_GRAFT_BENCH_OUT=BENCH_sf1_r12.json \
  sbt -batch "runMain graft.Bench" 2>&1 | grep '"metric"'

echo "== bench sf10 ($(date -u +%H:%M:%S)) =="
SPARK_GRAFT_SF_DIR=$SF10 SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=32g \
  SPARK_GRAFT_BENCH_OUT=BENCH_sf10_r12.json \
  sbt -batch "runMain graft.Bench" 2>&1 | grep '"metric"'

echo "== done ($(date -u +%H:%M:%S)) =="
