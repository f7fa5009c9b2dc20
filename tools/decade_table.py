#!/usr/bin/env python3
"""Decade table over full-inventory sweep artifacts.

Usage: decade_table.py SF01.json SF1.json SF10.json [--flag 12]

Prints a markdown table of per-query best timings at the three scales with
decade ratios dec1 = sf1.0/sf0.1 and dec2 = sf10/sf1.0, sorted by dec2
descending, flagging ratios above the threshold (default 12 — the r14
adjudication bar). Artifact health (complete/errors/passes) prints first,
and an artifact with complete != true or any recorded error EXITS NON-ZERO
after the report (ADVICE r15: printed-only health let a partial run feed
the table anyway) — pass --allow-partial to downgrade that to the old
warning behavior when deliberately tabulating a known-partial run.
"""
import json
import sys


def load(path):
    with open(path) as f:
        d = json.load(f)
    return d


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    flag = 12.0
    if "--flag" in sys.argv:
        flag = float(sys.argv[sys.argv.index("--flag") + 1])
    arts = [load(p) for p in args]
    unhealthy = []
    for p, a in zip(args, arts):
        print(f"health {p}: measured={a.get('measured')}/{a.get('of')} "
              f"complete={a.get('complete')} passes={a.get('passes_done')} "
              f"errors={len(a.get('errors') or {})} total={a.get('value')}s")
        if a.get("complete") is not True or (a.get("errors") or {}):
            unhealthy.append(p)
    qs = [a["queries"] for a in arts]
    names = sorted(set().union(*[set(q) for q in qs]))
    rows = []
    for n in names:
        t = [q.get(n) for q in qs]
        if any(v is None or v <= 0 for v in t):
            rows.append((float("-inf"), n, t, None, None))
            continue
        dec1 = t[1] / t[0] if len(t) > 1 else None
        dec2 = t[2] / t[1] if len(t) > 2 else None
        rows.append((dec2 if dec2 is not None else float("-inf"), n, t, dec1, dec2))
    rows.sort(reverse=True)
    print(f"\n| query | sf0.1 s | sf1.0 s | sf10 s | dec1 | dec2 | flag>{flag} |")
    print("|---|---|---|---|---|---|---|")
    for _, n, t, dec1, dec2 in rows:
        ts = " | ".join("-" if v is None or v <= 0 else f"{v:.2f}" for v in t)
        d1 = "-" if dec1 is None else f"{dec1:.1f}×"
        d2 = "-" if dec2 is None else f"{dec2:.1f}×"
        fl = "**FLAG**" if (dec2 or 0) > flag else ""
        print(f"| {n} | {ts} | {d1} | {d2} | {fl} |")
    flagged = [n for _, n, _, _, d2 in rows if (d2 or 0) > flag]
    print(f"\nflagged (dec2 > {flag}): {len(flagged)} -> {', '.join(flagged)}")
    if unhealthy:
        print(f"\nUNHEALTHY artifacts (complete!=true or errors): "
              f"{', '.join(unhealthy)}", file=sys.stderr)
        if "--allow-partial" not in sys.argv:
            print("refusing to stand behind this table; rerun the sweep or "
                  "pass --allow-partial to tabulate anyway", file=sys.stderr)
            sys.exit(1)


if __name__ == "__main__":
    main()
