#!/usr/bin/env bash
# Round-18 measurement chain, part B — run at the FINAL r18 HEAD in one quiet
# window. Part A (scripts/run_r18_sweeps.sh) was killed mid "postings-family
# targeted at sf10" when the build round was interrupted, and its committed
# full sweeps predate the two-sided dispatch commit (0669378) — they describe
# a pre-dispatch engine. This chain re-measures everything at HEAD:
#   1. targeted postings-family artifact at sf1.0/sf10 (q31/q92/q112/q141 +
#      q113/q126/q162) — finishing the interrupted step
#   2. full-inventory sweeps at sf0.1 / sf1.0 / sf10 (suffix r18b — the r18
#      files from part A are kept as the pre-dispatch record)
#   3. sf100: the top-10 sweep to COMPLETION (VERDICT r17 #5; seed cache OFF
#      per the sf100 discipline), the q162 solo artifact (VERDICT r17 #2's
#      "Done" bar), and the PQ phase profile at sf100
set -uo pipefail
cd "$(dirname "$0")/.."
export SPARK_DRIVER_MEM=64g

for sf in "$PWD/localdata/sf1.0" "$PWD/localdata/sf10"; do
  tag=$(basename "$sf")
  echo "=== r18b: postings-family targeted at $tag ==="
  SPARK_GRAFT_SF_DIR="$sf" \
  SPARK_GRAFT_BENCH_ONLY=q31,q92,q112,q113,q126,q141,q162 \
  SPARK_GRAFT_BENCH_RUNS=2 SPARK_GRAFT_BENCH_BUDGET=1800 \
  SPARK_GRAFT_BENCH_OUT="bench_scaling_r18_postingsfix_$tag.json" \
    sbt -batch "runMain graft.Bench" 2>&1 | tail -1
done

echo "=== r18b: full sweep sf0.1 ==="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_RUNS=3 \
SPARK_GRAFT_BENCH_BUDGET=1200 \
SPARK_GRAFT_BENCH_OUT=bench_scaling_r18b_full_sf0.1.json \
  sbt -batch "runMain graft.Bench" 2>&1 | tail -1

echo "=== r18b: full sweep sf1.0 ==="
SPARK_GRAFT_SF_DIR="$PWD/localdata/sf1.0" SPARK_GRAFT_BENCH_RUNS=2 \
SPARK_GRAFT_BENCH_BUDGET=1800 \
SPARK_GRAFT_BENCH_OUT=bench_scaling_r18b_full_sf1.0.json \
  sbt -batch "runMain graft.Bench" 2>&1 | tail -1

echo "=== r18b: full sweep sf10 ==="
SPARK_GRAFT_SF_DIR="$PWD/localdata/sf10" SPARK_GRAFT_BENCH_RUNS=2 \
SPARK_GRAFT_BENCH_BUDGET=3600 \
SPARK_GRAFT_BENCH_OUT=bench_scaling_r18b_full_sf10.json \
  sbt -batch "runMain graft.Bench" 2>&1 | tail -1

echo "=== r18b: sf100 top-10 to completion ==="
SPARK_GRAFT_SF_DIR="$PWD/localdata/sf100" SPARK_GRAFT_BENCH_SEED_CACHE=false \
SPARK_GRAFT_BENCH_ONLY=q31,q88,q92,q112,q113,q116,q126,q139,q141,q162 \
SPARK_GRAFT_BENCH_RUNS=1 SPARK_GRAFT_BENCH_BUDGET=10800 \
SPARK_GRAFT_BENCH_OUT=bench_scaling_r18_top10_sf100.json \
  sbt -batch "runMain graft.Bench" 2>&1 | tail -1

echo "=== r18b: q162 solo sf100 ==="
SPARK_GRAFT_SF_DIR="$PWD/localdata/sf100" SPARK_GRAFT_BENCH_SEED_CACHE=false \
SPARK_GRAFT_BENCH_ONLY=q162 SPARK_GRAFT_BENCH_RUNS=1 \
SPARK_GRAFT_BENCH_BUDGET=2400 \
SPARK_GRAFT_BENCH_OUT=bench_r18_q162solo_sf100.json \
  sbt -batch "runMain graft.Bench" 2>&1 | tail -1

echo "=== r18b: PQ phase profile sf100 ==="
sbt -batch "runMain graft.tools.PqPhaseProfile $PWD/localdata/sf100 1" \
  > pqphase_r18_sf100.log 2>&1 || true
tail -3 pqphase_r18_sf100.log
echo "=== r18b chain done ==="
