#!/usr/bin/env bash
# Round-18 session runner: the sandbox was wiped after the part-A interrupt,
# so localdata/ must be regenerated (deterministic ScaleUp — byte-identical
# corpora to every prior round) and the sf0.01 full-value oracle compare
# re-run in THIS sandbox before the part-B measurement chain
# (scripts/run_r18b_sweeps.sh) produces the at-HEAD artifacts.
set -uo pipefail
cd "$(dirname "$0")/.."
export SPARK_DRIVER_MEM=64g

echo "=== r18b prep: regenerate localdata (deterministic) ==="
sbt -batch "runMain graft.tools.ScaleUp /root/testdata/sf0.1 localdata/sf1.0 10" 2>&1 | tail -2
sbt -batch "runMain graft.tools.ScaleUp /root/testdata/sf0.1 localdata/sf10 100" 2>&1 | tail -2
sbt -batch "runMain graft.tools.ScaleUp /root/testdata/sf0.1 localdata/sf100 1000 documents,embeddings,events" 2>&1 | tail -2
du -sh localdata/* || true

echo "=== r18b prep: fresh full-value oracle compare at sf0.01 (at HEAD) ==="
sbt -batch 'runMain graft.Verify /root/testdata/sf0.01 /tmp/r18b_verify_out' 2>&1 | tail -1
python3 tools/compare_oracle.py /root/testdata/sf0.01 /tmp/r18b_verify_out \
  CORRECTNESS_r18_local.json 2>&1 | tail -2

bash scripts/run_r18b_sweeps.sh
