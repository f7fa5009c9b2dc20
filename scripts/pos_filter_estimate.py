#!/usr/bin/env python3
"""Measure-before-build estimator for the PPJoin positional filter (the
"Not yet optimized #1" lever named in OPTIMIZATION_r18.md / VERDICT r17):
replays the pigeonhole candidate join in DuckDB on the REAL corpus (q31/q112's
doc_id % 3 slice, 2-gram distinct shingles, the oracle's own CTE shapes) and
counts how many candidate-join rows the positional bound

    c  <=  min(rk_a, rk_b) + min(np_a - rk_a, np_b - rk_b)

would actually prune (valid at EVERY generated row: common tokens before the
shared token t number at most min(rk)-1 because ranks are order-isomorphic to
the global (df, token) order, and common tokens after t at most min(np - rk)).

Run: python3 scripts/pos_filter_estimate.py [sfdir]   (default sf0.1)

Measured r18, sf0.1 (recorded in OPTIMIZATION_r18.md "Not yet optimized"):
  jaccard theta=0.5: rows=1,758,671 kept=1,353,876  -> cut 23.0%, mult 2.02
  jaccard theta=0.1: rows=3,507,607 kept=3,506,560  -> cut  0.0%, mult 3.16
  containment T=0.8: rows=  662,536 kept=  662,273  -> cut  0.0%, mult 1.36
The q112 (theta=0.1) and q92 lever is REFUTED on this corpus: a shared
token's in-doc rank is ~ np * (global df quantile of the token), so the two
positions are strongly correlated across the pair and the bound
min(rk)+min(suffix) ~ np almost never drops below the (small) required
overlap. Only the symmetric theta=0.5 join sees a 23% row cut, worth ~0.3 s
of q31's 18 s at sf10 (the gate kernel behind the cut rows costs ~100 ns/row)
- below the complexity bar this round.
"""
import sys

import duckdb

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
con = duckdb.connect()
con.execute(
    f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')")

BASE = """
WITH ws AS (SELECT doc_id, text, string_split(text, ' ') AS ws
            FROM documents WHERE doc_id % 3 = 0),
sh AS (SELECT doc_id, list_distinct(CASE WHEN len(ws) >= 2
         THEN list_transform(range(0, len(ws)-1), i -> array_to_string(ws[i+1:i+2], ' '))
         ELSE [text] END) AS s FROM ws),
post AS (SELECT doc_id, len(s) AS sz, unnest(s) AS sh FROM sh),
dfreq AS (SELECT sh, count(*) AS df FROM post GROUP BY sh),
ranked AS (SELECT p.doc_id, p.sz, p.sh,
             row_number() OVER (PARTITION BY p.doc_id ORDER BY d.df, p.sh) AS rk,
             count(*) OVER (PARTITION BY p.doc_id) AS np
           FROM post p JOIN dfreq d USING (sh))
"""

for theta in (0.5, 0.1):
    tp = theta - 0.00005
    total, pairs, kept = con.execute(BASE + f""",
    pre AS (SELECT * FROM ranked WHERE rk <= np - ceil(sz * {tp}) + 1),
    cand AS (SELECT a.doc_id AS a, b.doc_id AS b, a.sz AS sza, b.sz AS szb,
               a.rk AS rka, b.rk AS rkb, a.np AS npa, b.np AS npb
             FROM pre a JOIN pre b ON a.sh = b.sh AND a.doc_id < b.doc_id)
    SELECT count(*), count(DISTINCT (a, b)),
           sum(CASE WHEN (least(rka, rkb) + least(npa - rka, npb - rkb)) * (1.0 + {tp})
                         >= {tp} * (sza + szb) THEN 1 ELSE 0 END)
    FROM cand""").fetchone()
    print(f"jaccard theta={theta}: rows={total:,} pairs={pairs:,} "
          f"mult={total / pairs:.2f} kept={kept:,} cut={(1 - kept / total) * 100:.1f}%")

T = 800000  # q92's fixed-point containment threshold
total, pairs, kept = con.execute(BASE + f""",
pre AS (SELECT * FROM ranked
        WHERE rk <= greatest(np - ceil(({T}::BIGINT * sz + 999999) / 1000000.0) + 1, 1)),
cand AS (SELECT a.doc_id AS a, b.doc_id AS b, a.sz AS sza, b.sz AS szb,
           a.rk AS rka, b.rk AS rkb, a.np AS npa, b.np AS npb
         FROM pre a JOIN ranked b ON a.sh = b.sh
         WHERE a.sz < b.sz OR (a.sz = b.sz AND a.doc_id < b.doc_id))
SELECT count(*), count(DISTINCT (a, b)),
       sum(CASE WHEN 1000000 * (least(rka, rkb) + least(npa - rka, npb - rkb))
                     >= {T} * least(sza, szb) THEN 1 ELSE 0 END)
FROM cand""").fetchone()
print(f"containment T={T}: rows={total:,} pairs={pairs:,} "
      f"mult={total / pairs:.2f} kept={kept:,} cut={(1 - kept / total) * 100:.1f}%")
