#!/usr/bin/env bash
# Derive the round-closing counts FROM THE ARTIFACTS, never by hand — the
# r10 closing commit said "143 queries / 247 tests" while the shipped
# artifacts held 144/249 (two landed after the message was drafted). Run this
# right before writing any closing-state commit message or PLANS.md section.
#
# Usage: scripts/closing_counts.sh [CORRECTNESS_json] [bench_json] [test_log]
set -euo pipefail
cd "$(dirname "$0")/.."

# `|| true` inside the substitutions: with pipefail an unmatched glob makes
# ls fail through the pipe and set -e would kill the whole script silently —
# a missing artifact must degrade to an empty default, not suppress the report
corr="${1:-$(ls -t CORRECTNESS_r*.json 2>/dev/null | head -1 || true)}"
bench="${2:-$(ls -t bench_local_r*.json 2>/dev/null | head -1 || true)}"
testlog="${3:-}"

echo "== declared queries (SparkEntry.queries via PipelineQueries/RelationalQueries/XmlQueries) =="
declared=$(grep -rhoE '"q[0-9]+[a-z0-9_]*" -> \(\(' \
  src/main/scala/graft/queries/*.scala | sort -u | wc -l)
echo "declared: $declared"

if [[ -n "$corr" && -f "$corr" ]]; then
  python3 - "$corr" <<'EOF'
import json, sys
d = json.load(open(sys.argv[1]))
total = len(d)
green = sum(1 for v in d.values()
            if v.get("rows_match") and v.get("schema_match")
            and v.get("hash_match") and not v.get("err"))
errs = [k for k, v in d.items() if v.get("err")]
print(f"correctness artifact: {green}/{total} green ({sys.argv[1]})")
if errs:
    print(f"  ERRORED: {errs}")
EOF
fi

if [[ -n "$bench" && -f "$bench" ]]; then
  python3 - "$bench" <<'EOF'
import json, sys
d = json.load(open(sys.argv[1]))
print(f"bench artifact: total={d['value']:.1f}s measured={d.get('measured')}"
      f"/{d.get('of')} passes={d.get('passes_done')} errors={len(d.get('errors', {}))}"
      f" ({sys.argv[1]})")
EOF
fi

if [[ -n "$testlog" && -f "$testlog" ]]; then
  grep -E "Tests: succeeded" "$testlog" | tail -1
else
  echo "test count: pass a 'sbt test' log as arg 3, or read the final" \
    "'Tests: succeeded N' line from the suite run"
fi
