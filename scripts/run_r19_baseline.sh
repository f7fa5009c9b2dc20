#!/usr/bin/env bash
# Round-19 baseline chain (measure FIRST, guide §1): establishes this box's
# "before" numbers at the round-19 starting tree, plus the targeted phase
# profiles the VERDICT r18 list asks for, in ONE quiet serialized window.
#   1. sf0.1 full sweep, seeds ON  — box calibration against
#      bench_scaling_r18b_full_sf0.1.json (same mode r18 ran in)
#   2. sf0.1 full sweep, seeds OFF — the new driver-visible default; the
#      per-query deltas vs (1) are the honest cost of the removed seed cache
#   3. sf10 full sweep, seeds OFF  — the "before" for every sf10-targeted fix
#   4. q05/q41/q161 solo min-of-3 at sf10 (VERDICT r18 #7 adjudication)
#   5. q116 phase profile at sf1.0 and sf10 (VERDICT r18 #4)
#   6. q112 prefix phase profile at sf10, theta=0.1 (VERDICT r18 #6)
#   7. before-plan dumps into plans/r19/
set -uo pipefail
cd "$(dirname "$0")/.."
export SPARK_DRIVER_MEM=64g

echo "=== r19 baseline: sf0.1 full, seeds ON (box calibration) ==="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_RUNS=3 \
SPARK_GRAFT_BENCH_BUDGET=1200 SPARK_GRAFT_BENCH_SEED_CACHE=true \
SPARK_GRAFT_BENCH_OUT=bench_r19_base_sf0.1_seedson.json \
  sbt -batch "runMain graft.Bench" 2>&1 | tail -1

echo "=== r19 baseline: sf0.1 full, seeds OFF (new default) ==="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_RUNS=3 \
SPARK_GRAFT_BENCH_BUDGET=1500 \
SPARK_GRAFT_BENCH_OUT=bench_r19_base_sf0.1.json \
  sbt -batch "runMain graft.Bench" 2>&1 | tail -1

echo "=== r19 baseline: sf10 full, seeds OFF ==="
SPARK_GRAFT_SF_DIR="$PWD/localdata/sf10" SPARK_GRAFT_BENCH_RUNS=2 \
SPARK_GRAFT_BENCH_BUDGET=3600 \
SPARK_GRAFT_BENCH_OUT=bench_r19_base_sf10.json \
  sbt -batch "runMain graft.Bench" 2>&1 | tail -1

echo "=== r19: q05/q41/q161 solo adjudication at sf10 (VERDICT r18 #7) ==="
SPARK_GRAFT_SF_DIR="$PWD/localdata/sf10" \
SPARK_GRAFT_BENCH_ONLY=q05,q41,q161 \
SPARK_GRAFT_BENCH_RUNS=3 SPARK_GRAFT_BENCH_BUDGET=1200 \
SPARK_GRAFT_BENCH_OUT=bench_r19_victims_sf10.json \
  sbt -batch "runMain graft.Bench" 2>&1 | tail -1

echo "=== r19: q116 phase profile (VERDICT r18 #4) ==="
sbt -batch "runMain graft.tools.LeakageProfile $PWD/localdata/sf1.0 2" \
  > leakage_profile_r19_sf1.0.log 2>&1 || true
grep -E "PHASE|pairs|rounds" leakage_profile_r19_sf1.0.log | tail -20
sbt -batch "runMain graft.tools.LeakageProfile $PWD/localdata/sf10 1" \
  > leakage_profile_r19_sf10.log 2>&1 || true
grep -E "PHASE|pairs|rounds" leakage_profile_r19_sf10.log | tail -12

echo "=== r19: q112 prefix phase profile at theta=0.1 (VERDICT r18 #6) ==="
sbt -batch "runMain graft.tools.PigeonProfile $PWD/localdata/sf10 0.1" \
  > pigeon_profile_r19_sf10_t01.log 2>&1 || true
grep -E "phase|rows" pigeon_profile_r19_sf10_t01.log | tail -20

echo "=== r19: before-plan dumps (plans/r19) ==="
mkdir -p plans/r19
for q in q116_leakage_safe_split q126_tfidf_cosine q112_minhash_calibration \
         q31_dedup_jaccard q92_containment_dedup q141_dedup_savings \
         q05_join_shuffle q41_neardup_clusters q161_bleu_precisions; do
  sbt -batch "runMain graft.tools.ExplainQuery $q $PWD/localdata/sf10 --no-run" \
    2>/dev/null | sed -n '/^== Physical Plan ==/,$p' \
    > "plans/r19/${q}_before.txt" || true
done
wc -l plans/r19/*_before.txt
echo "=== r19 baseline chain done ==="
