#!/usr/bin/env python3
"""Three-scale sweep adjudication table.

Usage: python3 tools/scaling_ratios.py sf01.json sf1.json sf10.json [threshold]

Prints per-query decade ratios and the log100 fitted exponent, sorted by
decade-2 ratio descending, flagging everything above the adjudication
threshold (default 12 — the r12 standard: every flagged ratio must be traced
to a linear contract or a measured constant, or fixed).
"""
import json
import math
import sys


def load(p):
    with open(p) as f:
        return json.load(f)["queries"]


def main():
    a, b, c = (load(p) for p in sys.argv[1:4])
    thr = float(sys.argv[4]) if len(sys.argv) > 4 else 12.0
    rows = []
    for q in sorted(set(a) & set(b) & set(c)):
        t1, t2, t3 = a[q], b[q], c[q]
        if min(t1, t2, t3) <= 0:
            continue
        rows.append((q, t1, t2, t3, t2 / t1, t3 / t2,
                     math.log(t3 / t1) / math.log(100)))
    rows.sort(key=lambda r: -r[5])
    flagged = 0
    print(f"{'query':42s} {'sf0.1':>7s} {'sf1.0':>7s} {'sf10':>8s} "
          f"{'dec1':>6s} {'dec2':>6s} {'exp':>5s}")
    for q, t1, t2, t3, d1, d2, e in rows:
        mark = " <-- ADJUDICATE" if d2 > thr else ""
        flagged += d2 > thr
        print(f"{q:42s} {t1:7.2f} {t2:7.2f} {t3:8.2f} "
              f"{d1:6.2f} {d2:6.2f} {e:5.2f}{mark}")
    tot1 = sum(r[1] for r in rows)
    tot2 = sum(r[2] for r in rows)
    tot3 = sum(r[3] for r in rows)
    print(f"\n{'TOTAL':42s} {tot1:7.1f} {tot2:7.1f} {tot3:8.1f} "
          f"{tot2/tot1:6.2f} {tot3/tot2:6.2f}")
    print(f"common queries: {len(rows)}; flagged (dec2 > {thr}): {flagged}")


if __name__ == "__main__":
    main()
