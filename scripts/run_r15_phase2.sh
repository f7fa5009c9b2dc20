#!/usr/bin/env bash
# Round-15 phase 2 (after the full sweeps, same quiet window):
#   1. targeted cross-scale artifacts for the round's two headline fixes —
#      the two-level PQ family (q162/q98/q39) and the q34 wide-signature
#      rework — at sf1.0 and sf10, min-of-2 (the r14 q100fix precedent)
#   2. third-decade runs WITH RECALL (the r14 jsonl had twin_recall_pm=-1
#      everywhere; offset fixed at HEAD): pairs vs triples banding at
#      blocks=8, sf1.0 / sf10 / sf100 -> third_decade_r15.jsonl
set -euo pipefail
cd "$(dirname "$0")/.."
export SPARK_DRIVER_MEM=64g

for sf in sf1.0 sf10; do
  echo "=== phase2: q162fix targeted at $sf ==="
  SPARK_GRAFT_SF_DIR="$PWD/localdata/$sf" \
  SPARK_GRAFT_BENCH_ONLY=q162,q98,q39 \
  SPARK_GRAFT_BENCH_RUNS=2 SPARK_GRAFT_BENCH_BUDGET=1800 \
  SPARK_GRAFT_BENCH_OUT="bench_scaling_r15_q162fix_$sf.json" \
    sbt -batch "runMain graft.Bench" 2>&1 | tail -2
  echo "=== phase2: q34fix targeted at $sf ==="
  SPARK_GRAFT_SF_DIR="$PWD/localdata/$sf" \
  SPARK_GRAFT_BENCH_ONLY=q34 \
  SPARK_GRAFT_BENCH_RUNS=2 SPARK_GRAFT_BENCH_BUDGET=1200 \
  SPARK_GRAFT_BENCH_OUT="bench_scaling_r15_q34fix_$sf.json" \
    sbt -batch "runMain graft.Bench" 2>&1 | tail -2
done

# q120's r14 47x decade-2 ratio is unexplained (its query set is ALREADY
# bounded); VERDICT r14 #1 asks for a solo min-of-2 measurement to separate
# a real quadratic from the r14 window's 4-6x inflation + min-of-1 noise.
for sf in sf1.0 sf10; do
  echo "=== phase2: q120 solo at $sf ==="
  SPARK_GRAFT_SF_DIR="$PWD/localdata/$sf" \
  SPARK_GRAFT_BENCH_ONLY=q120 \
  SPARK_GRAFT_BENCH_RUNS=2 SPARK_GRAFT_BENCH_BUDGET=1200 \
  SPARK_GRAFT_BENCH_OUT="bench_scaling_r15_q120solo_$sf.json" \
    sbt -batch "runMain graft.Bench" 2>&1 | tail -2
done

: > third_decade_r15.jsonl
for sf in sf1.0 sf10 sf100; do
  for banding in pairs triples; do
    echo "=== phase2: ThirdDecade $sf blocks=8 $banding ==="
    sbt -batch "runMain graft.tools.ThirdDecade $PWD/localdata/$sf 8 1 $banding" 2>&1 \
      | grep third_decade | tee -a third_decade_r15.jsonl
  done
done
echo "=== phase2 complete ==="
