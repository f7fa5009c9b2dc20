#!/usr/bin/env bash
# Round-14 evidence sweeps (VERDICT r13 next-round #1): full-inventory
# quiet-window runs at sf0.1 / sf1.0 / sf10, min-of-N, 64 GiB heap (the r12
# recipe — NOTE the knob is SPARK_DRIVER_MEM, which build.sbt reads into
# the FORKED run JVM's -Xmx; `sbt -J-Xmx64g` only sizes the sbt launcher
# and leaves the Spark JVM at the 8g default, which is exactly how the
# first r14 sf10 attempt OOM-killed its context at q120). Run with NOTHING
# else on the box — the r13 sf1.0 artifact is a crash log partly because
# it shared the machine. Artifacts land as
# bench_scaling_r14_full_<sf>.json; sf0.1 doubles as bench_local_r14.json.
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

run /root/testdata/sf0.1            bench_scaling_r14_full_sf0.1.json 3 1200
cp bench_scaling_r14_full_sf0.1.json bench_local_r14.json
run "$PWD/localdata/sf1.0"          bench_scaling_r14_full_sf1.0.json 2 1800
run "$PWD/localdata/sf10"           bench_scaling_r14_full_sf10.json  2 5400
echo "=== sweeps complete ==="
