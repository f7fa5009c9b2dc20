#!/usr/bin/env bash
# Round-17 measurement chain, run at the FINAL HEAD in one quiet window
# (no concurrent sbt, no editing src/ while this runs — the bench
# discipline in PLANS.md §r15-6):
#   1. targeted IVF artifact (the grouped cell-layout fix evidence)
#   2. targeted victims artifact (q115/q116/q118/q127/q141/q88 — the seed
#      scoping + chunked-window fixes, solo view)
#   3. q24 solo min-of-3 at sf0.1 (the r16 quiet-window regression check)
#   4. full-inventory sweeps at sf0.1 / sf1.0 / sf10
#   5. ThirdDecade sf100: triples-collapsed (the clique-collapse lever)
#      head-to-head against r16's raw triples artifact
#   6. top-10 most-expensive-queries subset sweep at sf100 (VERDICT r16 #5
#      — the first full-query evidence in the third decade)
set -uo pipefail
cd "$(dirname "$0")/.."
export SPARK_DRIVER_MEM=64g

healthy() { # artifact is complete:true with zero errors
  python3 -c "import json,sys; a=json.load(open('$1')); sys.exit(0 if a.get('complete') is True and not a.get('errors') else 1)"
}

for sf in "$PWD/localdata/sf1.0" "$PWD/localdata/sf10"; do
  tag=$(basename "$sf")
  echo "=== r17: IVF-family targeted at $tag ==="
  SPARK_GRAFT_SF_DIR="$sf" \
  SPARK_GRAFT_BENCH_ONLY=q39,q98,q100,q120,q162,q168 \
  SPARK_GRAFT_BENCH_RUNS=2 SPARK_GRAFT_BENCH_BUDGET=1800 \
  SPARK_GRAFT_BENCH_OUT="bench_scaling_r17_ivffix_$tag.json" \
    sbt -batch "runMain graft.Bench" 2>&1 | tail -2
done

echo "=== r17: victims targeted at sf10 (post-fix solo view) ==="
SPARK_GRAFT_SF_DIR="$PWD/localdata/sf10" \
SPARK_GRAFT_BENCH_ONLY=q115,q116,q118,q127,q141,q88 \
SPARK_GRAFT_BENCH_RUNS=2 SPARK_GRAFT_BENCH_BUDGET=1800 \
SPARK_GRAFT_BENCH_OUT="bench_scaling_r17_victims_sf10.json" \
  sbt -batch "runMain graft.Bench" 2>&1 | tail -2

echo "=== r17: q24 solo at sf0.1 (min-of-3) ==="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
SPARK_GRAFT_BENCH_ONLY=q24 \
SPARK_GRAFT_BENCH_RUNS=3 SPARK_GRAFT_BENCH_BUDGET=600 \
SPARK_GRAFT_BENCH_OUT="bench_r17_q24_sf0.1.json" \
  sbt -batch "runMain graft.Bench" 2>&1 | tail -2

echo "=== r17: full sf0.1 ==="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
SPARK_GRAFT_BENCH_RUNS=3 SPARK_GRAFT_BENCH_BUDGET=1200 \
SPARK_GRAFT_BENCH_OUT=bench_scaling_r17_full_sf0.1.json \
  sbt -batch "runMain graft.Bench" 2>&1 | tail -2
# promote ONLY a healthy artifact (ADVICE r15)
if healthy bench_scaling_r17_full_sf0.1.json; then
  cp bench_scaling_r17_full_sf0.1.json bench_local_r17.json
else
  echo "REFUSING to promote sf0.1 artifact: incomplete or errored" >&2
fi

echo "=== r17: full sf1.0 ==="
SPARK_GRAFT_SF_DIR="$PWD/localdata/sf1.0" \
SPARK_GRAFT_BENCH_RUNS=2 SPARK_GRAFT_BENCH_BUDGET=1800 \
SPARK_GRAFT_BENCH_OUT=bench_scaling_r17_full_sf1.0.json \
  sbt -batch "runMain graft.Bench" 2>&1 | tail -2

echo "=== r17: full sf10 ==="
SPARK_GRAFT_SF_DIR="$PWD/localdata/sf10" \
SPARK_GRAFT_BENCH_RUNS=2 SPARK_GRAFT_BENCH_BUDGET=5400 \
SPARK_GRAFT_BENCH_OUT=bench_scaling_r17_full_sf10.json \
  sbt -batch "runMain graft.Bench" 2>&1 | tail -2

echo "=== r17: ThirdDecade sf100 triples-collapsed ==="
sbt -batch "runMain graft.tools.ThirdDecade $PWD/localdata/sf100 8 1 triples-collapsed" \
  2>&1 | grep '"tool"' | tee -a third_decade_r17.jsonl

echo "=== r17: top-10 subset at sf100 (min-of-1, labeled) ==="
SPARK_GRAFT_SF_DIR="$PWD/localdata/sf100" \
SPARK_GRAFT_BENCH_ONLY=q162,q141,q88,q112,q92,q31,q116,q139,q126,q113 \
SPARK_GRAFT_BENCH_RUNS=1 SPARK_GRAFT_BENCH_BUDGET=7200 \
SPARK_GRAFT_BENCH_OUT=bench_scaling_r17_top10_sf100.json \
  sbt -batch "runMain graft.Bench" 2>&1 | tail -2

echo "=== r17 chain done ==="
