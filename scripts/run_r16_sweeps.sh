#!/usr/bin/env bash
# Round-16 measurement chain, run at the FINAL HEAD in one quiet window
# (no concurrent sbt, no editing src/ while this runs — the bench
# discipline in PLANS.md §r15-6):
#   1. targeted trio artifact (the gramKeyAt + shared-census fix evidence)
#   2. targeted IVF-family artifact (the centroid-model-as-data rewiring)
#   3. full-inventory sweeps at sf0.1 / sf1.0 / sf10 — the judge's "one
#      artifact that describes the engine as shipped" (VERDICT r15 #2)
#   4. ThirdDecade sf100: triples (r15 champion) vs quads (the new
#      fourth-decade form), full logs, recall on every row
set -uo pipefail
cd "$(dirname "$0")/.."
export SPARK_DRIVER_MEM=64g

healthy() { # artifact is complete:true with zero errors
  python3 -c "import json,sys; a=json.load(open('$1')); sys.exit(0 if a.get('complete') is True and not a.get('errors') else 1)"
}

for sf in /root/testdata/sf0.1 "$PWD/localdata/sf1.0" "$PWD/localdata/sf10"; do
  tag=$(basename "$sf")
  echo "=== r16: trio targeted at $tag ==="
  SPARK_GRAFT_SF_DIR="$sf" \
  SPARK_GRAFT_BENCH_ONLY=q160,q161,q163 \
  SPARK_GRAFT_BENCH_RUNS=2 SPARK_GRAFT_BENCH_BUDGET=1800 \
  SPARK_GRAFT_BENCH_OUT="bench_scaling_r16_trio_$tag.json" \
    sbt -batch "runMain graft.Bench" 2>&1 | tail -2
done

for sf in "$PWD/localdata/sf1.0" "$PWD/localdata/sf10"; do
  tag=$(basename "$sf")
  echo "=== r16: IVF-family targeted at $tag ==="
  SPARK_GRAFT_SF_DIR="$sf" \
  SPARK_GRAFT_BENCH_ONLY=q39,q98,q100,q120,q162,q168 \
  SPARK_GRAFT_BENCH_RUNS=2 SPARK_GRAFT_BENCH_BUDGET=1800 \
  SPARK_GRAFT_BENCH_OUT="bench_scaling_r16_ivffix_$tag.json" \
    sbt -batch "runMain graft.Bench" 2>&1 | tail -2
done

echo "=== r16: full sf0.1 ==="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
SPARK_GRAFT_BENCH_RUNS=3 SPARK_GRAFT_BENCH_BUDGET=1200 \
SPARK_GRAFT_BENCH_OUT=bench_scaling_r16_full_sf0.1.json \
  sbt -batch "runMain graft.Bench" 2>&1 | tail -2
# promote ONLY a healthy artifact (ADVICE r15)
if healthy bench_scaling_r16_full_sf0.1.json; then
  cp bench_scaling_r16_full_sf0.1.json bench_local_r16.json
else
  echo "REFUSING to promote sf0.1 artifact: incomplete or errored" >&2
fi

echo "=== r16: full sf1.0 ==="
SPARK_GRAFT_SF_DIR="$PWD/localdata/sf1.0" \
SPARK_GRAFT_BENCH_RUNS=2 SPARK_GRAFT_BENCH_BUDGET=1800 \
SPARK_GRAFT_BENCH_OUT=bench_scaling_r16_full_sf1.0.json \
  sbt -batch "runMain graft.Bench" 2>&1 | tail -2

echo "=== r16: full sf10 ==="
SPARK_GRAFT_SF_DIR="$PWD/localdata/sf10" \
SPARK_GRAFT_BENCH_RUNS=2 SPARK_GRAFT_BENCH_BUDGET=5400 \
SPARK_GRAFT_BENCH_OUT=bench_scaling_r16_full_sf10.json \
  sbt -batch "runMain graft.Bench" 2>&1 | tail -2

for banding in triples quads; do
  echo "=== r16: ThirdDecade sf100 blocks=8 $banding ==="
  sbt -batch "runMain graft.tools.ThirdDecade $PWD/localdata/sf100 8 1 $banding" \
    > "third_decade_r16_sf100_$banding.log" 2>&1
  echo "exit=$? (full log: third_decade_r16_sf100_$banding.log)"
  grep -h third_decade "third_decade_r16_sf100_$banding.log" | tee -a third_decade_r16.jsonl
done
echo "=== r16 chain complete ==="
