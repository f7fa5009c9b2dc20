#!/usr/bin/env bash
# Round-15 phase 3, at the q33/trio-rework HEAD (quiet window):
#   1. targeted q33 + generation-eval-trio artifacts at sf0.1/sf1.0/sf10
#      (the round's in-session fixes get their own cross-scale evidence)
#   2. full-inventory sf0.1 refresh at HEAD -> bench_local_r15.json
#   3. the two sf100 ThirdDecade runs the phase-2 chain lost (its
#      `grep | tee` pipeline swallowed the failure under pipefail) —
#      FULL output logged to third_decade_sf100.log this time
set -uo pipefail
cd "$(dirname "$0")/.."
export SPARK_DRIVER_MEM=64g

for sf in /root/testdata/sf0.1 "$PWD/localdata/sf1.0" "$PWD/localdata/sf10"; do
  tag=$(basename "$sf")
  echo "=== phase3: q33+trio targeted at $tag ==="
  SPARK_GRAFT_SF_DIR="$sf" \
  SPARK_GRAFT_BENCH_ONLY=q33,q160,q161,q163 \
  SPARK_GRAFT_BENCH_RUNS=2 SPARK_GRAFT_BENCH_BUDGET=1800 \
  SPARK_GRAFT_BENCH_OUT="bench_scaling_r15_q33trio_$tag.json" \
    sbt -batch "runMain graft.Bench" 2>&1 | tail -2
done

echo "=== phase3: sf0.1 full refresh at HEAD ==="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
SPARK_GRAFT_BENCH_RUNS=3 SPARK_GRAFT_BENCH_BUDGET=1200 \
SPARK_GRAFT_BENCH_OUT=bench_scaling_r15_full_sf0.1.json \
  sbt -batch "runMain graft.Bench" 2>&1 | tail -2
# promote ONLY a healthy artifact (ADVICE r15: without -e, a failed bench
# run would otherwise let this cp promote a stale prior artifact as the
# round's local benchmark)
if python3 -c "import json,sys; a=json.load(open('bench_scaling_r15_full_sf0.1.json')); sys.exit(0 if a.get('complete') is True and not a.get('errors') else 1)"; then
  cp bench_scaling_r15_full_sf0.1.json bench_local_r15.json
else
  echo "REFUSING to promote bench_scaling_r15_full_sf0.1.json: incomplete or errored" >&2
fi

for banding in pairs triples; do
  echo "=== phase3: ThirdDecade sf100 blocks=8 $banding ==="
  sbt -batch "runMain graft.tools.ThirdDecade $PWD/localdata/sf100 8 1 $banding" \
    > "third_decade_sf100_$banding.log" 2>&1
  echo "exit=$? (full log: third_decade_sf100_$banding.log)"
  grep -h third_decade "third_decade_sf100_$banding.log" | tee -a third_decade_r15.jsonl
done
echo "=== phase3 complete ==="
