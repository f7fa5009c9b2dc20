#!/usr/bin/env bash
# Round-15 evidence sweeps (VERDICT r14 next-round #1: the complete
# min-of-2 quiet-window full-inventory sf10 run at HEAD, third round open).
# SPARK_DRIVER_MEM is the real forked-JVM heap knob (build.sbt javaOptions);
# run with NOTHING else on the box. Artifacts:
#   bench_scaling_r15_full_sf0.1.json (doubles as bench_local_r15.json)
#   bench_scaling_r15_full_sf1.0.json
#   bench_scaling_r15_full_sf10.json
# Bench now records complete:false on any sentinel/error (r15 harness fix),
# so the gate's scaling-artifact check stands on its own.
set -euo pipefail
cd "$(dirname "$0")/.."
export SPARK_DRIVER_MEM=64g

run() {
  local dir="$1" out="$2" runs="$3" budget="$4"
  echo "=== sweep $dir -> $out (runs=$runs budget=${budget}s) ==="
  SPARK_GRAFT_SF_DIR="$dir" \
  SPARK_GRAFT_BENCH_RUNS="$runs" \
  SPARK_GRAFT_BENCH_BUDGET="$budget" \
  SPARK_GRAFT_BENCH_OUT="$out" \
    sbt -batch "runMain graft.Bench" 2>&1 | tail -2
}

run /root/testdata/sf0.1            bench_scaling_r15_full_sf0.1.json 3 1200
cp bench_scaling_r15_full_sf0.1.json bench_local_r15.json
run "$PWD/localdata/sf1.0"          bench_scaling_r15_full_sf1.0.json 2 1800
run "$PWD/localdata/sf10"           bench_scaling_r15_full_sf10.json  2 5400
echo "=== sweeps complete ==="
