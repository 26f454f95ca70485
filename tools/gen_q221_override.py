#!/usr/bin/env python3
"""Emit the big-SF adjudication override for q221_lsh_tuning.

Usage: python3 tools/gen_q221_override.py <verifyOutDir> [<overridesFile>]

q221's base oracle computes its ground truth with a LEXICOGRAPHIC
prefix filter (list_sort of the shingle set, prefix self-join). That
is exact, but at sf1 the half-sample is ~250k docs and common shingles
sort into the prefixes, so the truth candidate join spills >65 GB and
never finishes — it was the single unadjudicated query of the r11 sf1
sweep. The ENGINE's truth (Dedup.prefixJaccardPairs, dfOrdered=true)
orders each doc's shingles by ascending document frequency instead, so
prefixes hold the RAREST shingles and candidate postings stay small.

Prefix-filter recall is exact under ANY consistent global element
order (the pigeonhole is order-agnostic), so the verified truth SET —
and therefore every output number — is IDENTICAL between the two
spellings; only the candidate volume differs. This script rewrites the
oracle to the df-ordered prefix + q199-style temp-table stages:

  q221smp    doc_id, sg, shset for the md5 half-sample (one scan)
  q221sets   shset + size for verification
  q221pref   df-ascending rarest-first prefixes (window, not sort+slice)
  q221truth  verified jaccard >= 1/2 pairs (same set as the base CTE)
  q221sig    the 8 minhash components
  final      the base oracle's band/recall/precision SELECT, verbatim,
             pointed at the temp tables

Everything except the truth stage is lifted verbatim (anchored string
surgery) from the oracle_sql.json dump, so the band math cannot drift
from the gate oracle. Validate with tools/check.py at a scale where
both spellings terminate (sf0.01/sf0.1) before trusting it at sf1.
"""
import json, os, sys


def build(sql: str) -> str:
    a = sql.index(" smp AS (")
    head = sql[:a].rstrip().rstrip(",")            # WITH toks .., sh ..
    b = sql.index("),\n ptss")
    smp_body = sql[a + len(" smp AS ("):b]         # SELECT .. FROM sh WHERE ..
    c = sql.index(" sig AS (")
    d = sql.index("),\n bands1")
    sig_body = sql[c + len(" sig AS ("):d].replace("FROM smp", "FROM q221smp")
    tail = sql[sql.index(" bands1 AS"):]
    tail = tail.replace("FROM sig", "FROM q221sig")
    tail = tail.replace("JOIN truth USING", "JOIN q221truth USING")
    return f"""CREATE OR REPLACE TEMP TABLE q221smp AS
{head}
{smp_body};
CREATE OR REPLACE TEMP TABLE q221sets AS
SELECT doc_id, shset, len(shset) AS n FROM q221smp WHERE len(shset) > 0;
CREATE OR REPLACE TEMP TABLE q221pref AS
WITH tokens AS (SELECT doc_id, unnest(shset) AS el FROM q221sets),
 freq AS (SELECT el, count(*) AS dfc FROM tokens GROUP BY 1),
 ord AS (SELECT t.doc_id, t.el,
   ROW_NUMBER() OVER (PARTITION BY t.doc_id ORDER BY f.dfc, t.el) AS pos
  FROM tokens t JOIN freq f USING (el))
SELECT o.doc_id, o.el AS p
FROM ord o JOIN q221sets s USING (doc_id)
WHERE o.pos <= s.n - ((1 * s.n + 1) // 2) + 1;
CREATE OR REPLACE TEMP TABLE q221truth AS
WITH cand AS (SELECT DISTINCT x.doc_id AS ida, y.doc_id AS idb
  FROM q221pref x JOIN q221pref y ON x.p = y.p AND x.doc_id < y.doc_id)
SELECT cand.ida, cand.idb
FROM cand JOIN q221sets a ON a.doc_id = cand.ida
 JOIN q221sets b ON b.doc_id = cand.idb
WHERE len(list_intersect(a.shset, b.shset)) * 2
  >= a.n + b.n - len(list_intersect(a.shset, b.shset));
CREATE OR REPLACE TEMP TABLE q221sig AS
{sig_body};
WITH tn AS (SELECT count(*) AS n_truth FROM q221truth),
{tail}"""


def main():
    out_dir = sys.argv[1]
    ov_file = sys.argv[2] if len(sys.argv) > 2 else "tools/sf1_overrides.json"
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracle = json.load(f)
    with open(ov_file) as f:
        overrides = json.load(f)
    overrides["q221_lsh_tuning"] = {"oracle": build(oracle["q221_lsh_tuning"])}
    with open(ov_file, "w") as f:
        json.dump(overrides, f, indent=1)
    print(f"wrote q221_lsh_tuning override to {ov_file}")


if __name__ == "__main__":
    main()
