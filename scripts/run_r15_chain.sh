#!/usr/bin/env bash
# Round-15 quiet-window chain: the whole evidence run in one sequential
# process so nothing else competes with the benchmark JVMs.
#   0. full test suite at HEAD (sbt_test_r15.log)
#   1. regenerate localdata (gitignored; wiped between rounds): sf1.0 (k=10),
#      sf10 (k=100), sf100 (documents+embeddings, k=1000) — deterministic,
#      so the corpora are byte-identical to r14's
#   2. scripts/run_r15_sweeps.sh  (full-inventory sf0.1/sf1.0/sf10, min-of-N)
#   3. scripts/run_r15_phase2.sh  (q162fix/q34fix targeted + third decade
#      with recall)
set -euo pipefail
cd "$(dirname "$0")/.."
export SPARK_DRIVER_MEM=64g

echo "=== chain: sbt test at HEAD ==="
sbt -batch test > sbt_test_r15.log 2>&1 || { tail -30 sbt_test_r15.log; exit 1; }
grep -E "All tests passed|Tests: succeeded" sbt_test_r15.log | tail -2

echo "=== chain: regenerate localdata ==="
sbt -batch "runMain graft.tools.ScaleUp /root/testdata/sf0.1 localdata/sf1.0 10" 2>&1 | tail -2
sbt -batch "runMain graft.tools.ScaleUp /root/testdata/sf0.1 localdata/sf10 100" 2>&1 | tail -2
sbt -batch "runMain graft.tools.ScaleUp /root/testdata/sf0.1 localdata/sf100 1000 documents,embeddings" 2>&1 | tail -2
du -sh localdata/*

echo "=== chain: full sweeps ==="
scripts/run_r15_sweeps.sh

echo "=== chain: phase 2 ==="
scripts/run_r15_phase2.sh

echo "=== chain complete ==="
