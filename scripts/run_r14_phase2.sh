#!/usr/bin/env bash
# Round-14 phase 2, run sequentially in a quiet window AFTER the full sweeps:
#   1. refresh the sf0.1 full-inventory artifact at HEAD (168 queries incl.
#      q168 and the two-level q100) -> bench_local_r14.json
#   2. targeted q100/q168 runs at sf1.0 and sf10 (the r12 q90fix precedent:
#      the full sf1.0/sf10 artifacts predate the q100 rework; the fix gets
#      its own three-scale evidence)
#   3. build the sf100 third-decade corpus (documents+embeddings, k=1000)
#   4. ThirdDecade candidate-generation probes at blocks=8 and 16 across
#      sf1.0 / sf10 / sf100
set -euo pipefail
cd "$(dirname "$0")/.."
export SPARK_DRIVER_MEM=64g

echo "=== phase2: sf0.1 full refresh ==="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
SPARK_GRAFT_BENCH_RUNS=3 SPARK_GRAFT_BENCH_BUDGET=1200 \
SPARK_GRAFT_BENCH_OUT=bench_scaling_r14_full_sf0.1.json \
  sbt -batch "runMain graft.Bench" 2>&1 | tail -2
cp bench_scaling_r14_full_sf0.1.json bench_local_r14.json

for sf in sf1.0 sf10; do
  echo "=== phase2: q100fix targeted at $sf ==="
  SPARK_GRAFT_SF_DIR="$PWD/localdata/$sf" \
  SPARK_GRAFT_BENCH_ONLY=q100,q168,q34 \
  SPARK_GRAFT_BENCH_RUNS=2 SPARK_GRAFT_BENCH_BUDGET=1800 \
  SPARK_GRAFT_BENCH_OUT="bench_scaling_r14_q100fix_$sf.json" \
    sbt -batch "runMain graft.Bench" 2>&1 | tail -2
done

echo "=== phase2: sf100 corpus build (documents+embeddings, k=1000) ==="
sbt -batch "runMain graft.tools.ScaleUp /root/testdata/sf0.1 localdata/sf100 1000 documents,embeddings" 2>&1 | tail -4

for sf in sf1.0 sf10 sf100; do
  for b in 8 16; do
    echo "=== phase2: ThirdDecade $sf blocks=$b ==="
    sbt -batch "runMain graft.tools.ThirdDecade $PWD/localdata/$sf $b 1" 2>&1 \
      | grep third_decade | tee -a third_decade_r14.jsonl
  done
done
echo "=== phase2 complete ==="
