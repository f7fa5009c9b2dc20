#!/usr/bin/env bash
# Derive the round-closing counts FROM THE ARTIFACTS, never by hand — the
# r10 closing commit said "143 queries / 247 tests" while the shipped
# artifacts held 144/249, and the r11 snapshot shipped a 153-vs-156
# bench gap this script had already surfaced. Run it right before writing
# any closing-state commit message or PLANS.md section.
#
# Usage: scripts/closing_counts.sh [--gate] [CORRECTNESS_json] [bench_json] [test_log]
#
# --gate: exit NON-ZERO unless declared == correctness total == bench
#   measured, correctness is all-green with zero errors, the bench ran
#   error-free, every declared query number has a COVERAGE.md mention, AND
#   the sbt test log (arg 3, REQUIRED in gate mode) shows zero failures.
#   The closing snapshot must run this mode and abort on failure — counts
#   can then never diverge from artifacts again (VERDICT r11 #6, r12 #8).
set -euo pipefail
cd "$(dirname "$0")/.."

gate=0
if [[ "${1:-}" == "--gate" ]]; then gate=1; shift; fi

# `|| true` inside the substitutions: with pipefail an unmatched glob makes
# ls fail through the pipe and set -e would kill the whole script silently —
# a missing artifact must degrade to an empty default, not suppress the report
corr="${1:-$(ls -t CORRECTNESS_r*.json 2>/dev/null | head -1 || true)}"
bench="${2:-$(ls -t bench_local_r*.json 2>/dev/null | head -1 || true)}"
testlog="${3:-}"

fail=0

declared=$(grep -rhoE '"q[0-9]+[a-z0-9_]*" -> \(\(' \
  src/main/scala/graft/queries/*.scala | sort -u | wc -l)
echo "declared queries: $declared"

# every declared query number must appear in COVERAGE.md (the prose
# evidence table, which uses both plain mentions and qNN–qMM ranges) —
# a query shipped without documentation is the r11 gap
missing_cov=$(python3 - <<'PYEOF'
import re, subprocess
src = subprocess.run(
    ["grep", "-rhoE", '"q[0-9]+[a-z0-9_]*" -> \\(\\(',
     *__import__("glob").glob("src/main/scala/graft/queries/*.scala")],
    capture_output=True, text=True).stdout
declared = set(int(m) for m in re.findall(r'"q0*(\d+)[a-z0-9_]*"', src))
cov = open("COVERAGE.md").read()
mentioned = set(int(m) for m in re.findall(r'q0*(\d+)', cov))
for a, b in re.findall(r'q0*(\d+)[–-]q0*(\d+)', cov):
    mentioned.update(range(int(a), int(b) + 1))
missing = sorted(declared - mentioned)
print(" ".join(f"q{n}" for n in missing))
PYEOF
)
if [[ -n "$missing_cov" ]]; then
  echo "COVERAGE.md MISSING: $missing_cov"
  fail=1
else
  echo "COVERAGE.md: all declared query numbers mentioned"
fi

if [[ -n "$corr" && -f "$corr" ]]; then
  corr_out=$(python3 - "$corr" <<'PYEOF'
import json, sys
d = json.load(open(sys.argv[1]))
total = len(d)
green = sum(1 for v in d.values()
            if v.get("rows_match") and v.get("schema_match")
            and v.get("hash_match") and not v.get("err"))
errs = [k for k, v in d.items() if v.get("err")]
print(f"{green} {total} {len(errs)}")
PYEOF
)
  read -r green total errn <<< "$corr_out"
  echo "correctness artifact: $green/$total green, $errn errored ($corr)"
  if [[ $gate -eq 1 ]]; then
    [[ "$green" == "$total" && "$errn" == 0 ]] || { echo "GATE: correctness not all-green"; fail=1; }
    # EQUALITY, not <=: a round that adds queries must refresh the
    # correctness artifact before the snapshot, else the new queries were
    # never verified (ADVICE r12) — list exactly which ids are unverified
    if [[ "$total" != "$declared" ]]; then
      missing_corr=$(python3 - "$corr" <<'PYEOF'
import json, re, subprocess, sys, glob
src = subprocess.run(
    ["grep", "-rhoE", '"q[0-9]+[a-z0-9_]*" -> \\(\\(',
     *glob.glob("src/main/scala/graft/queries/*.scala")],
    capture_output=True, text=True).stdout
declared = set(re.findall(r'"(q[0-9]+[a-z0-9_]*)"', src))
have = set(json.load(open(sys.argv[1])).keys())
print(" ".join(sorted(declared - have)) or "(none missing - artifact has extras)")
PYEOF
)
      echo "GATE: correctness total $total != declared $declared; unverified: $missing_corr"
      fail=1
    fi
  fi
else
  echo "correctness artifact: MISSING"; [[ $gate -eq 1 ]] && fail=1
fi

if [[ -n "$bench" && -f "$bench" ]]; then
  bench_out=$(python3 - "$bench" <<'PYEOF'
import json, sys
d = json.load(open(sys.argv[1]))
print(f"{d.get('measured')} {d.get('of')} {len(d.get('errors', {}))} {d['value']:.1f}")
PYEOF
)
  read -r bmeas bof berr bsec <<< "$bench_out"
  echo "bench artifact: $bmeas/$bof measured, $berr errors, ${bsec}s ($bench)"
  if [[ $gate -eq 1 ]]; then
    [[ "$bmeas" == "$declared" && "$berr" == 0 ]] || {
      echo "GATE: bench measured $bmeas != declared $declared (or errors)"; fail=1; }
  fi
else
  echo "bench artifact: MISSING"; [[ $gate -eq 1 ]] && fail=1
fi

# scaling artifacts must be VALID (VERDICT r13 #1): the r13 snapshot
# committed a crashed sf1.0 sweep (complete:false, 80/166, 7 errors) with
# no adjudication. Every bench_scaling_*.json in the repo must be a
# complete, error-free run — a crashed sweep gets renamed to
# *.json.crashed (kept for the record, excluded from evidence) and re-run.
scaling_bad=$(python3 - <<'PYEOF'
import glob, json
bad = []
for f in sorted(glob.glob("bench_scaling_*.json")):
    try:
        d = json.load(open(f))
    except Exception as e:
        bad.append(f"{f}(unparseable)")
        continue
    if d.get("complete") is not True or d.get("errors"):
        bad.append(f"{f}(complete={d.get('complete')},errors={len(d.get('errors', {}))})")
print(" ".join(bad))
PYEOF
)
if [[ -n "$scaling_bad" ]]; then
  echo "scaling artifacts INVALID: $scaling_bad"
  [[ $gate -eq 1 ]] && fail=1
else
  echo "scaling artifacts: all complete, zero errors"
fi

# the FIFTH count (VERDICT r12 #8): the gate takes the sbt test log as
# arg 3 and verifies it, so declared/bench/correctness/COVERAGE *and*
# tests are one atomic check — no count left on faith
if [[ -n "$testlog" && -f "$testlog" ]]; then
  tline=$(grep -E "Tests: succeeded" "$testlog" | tail -1 || true)
  echo "test log: ${tline:-no 'Tests: succeeded' line found} ($testlog)"
  if [[ $gate -eq 1 ]]; then
    if [[ -z "$tline" ]] || ! echo "$tline" | grep -qE "failed 0\b" \
       || ! grep -q "All tests passed" "$testlog"; then
      echo "GATE: test log missing, has failures, or lacks 'All tests passed'"
      fail=1
    fi
  fi
else
  echo "test count: pass a 'sbt test' log as arg 3, or read the final" \
    "'Tests: succeeded N' line from the suite run"
  if [[ $gate -eq 1 ]]; then
    echo "GATE: gate mode requires the sbt test log as arg 3"
    fail=1
  fi
fi

if [[ $gate -eq 1 ]]; then
  if [[ $fail -ne 0 ]]; then
    echo "GATE FAILED: counts diverge — refresh the stale artifact before the snapshot"
    exit 1
  fi
  echo "GATE PASSED: declared == bench == all-green correctness == COVERAGE, tests green"
fi
