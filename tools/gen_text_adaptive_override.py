#!/usr/bin/env python3
"""Bake a NON-clamp adaptive minhash banding into a q39 override oracle.

Usage:
  python3 tools/gen_text_adaptive_override.py <verifyOutDir> \
      --k 24 --rows 3 [--overrides tools/sf10_overrides.json] [--sample]

The text twin of gen_adaptive_overrides.py (VERDICT r14 #1, extended to
the text family in r15): past 65,536 docs Dedup.adaptiveMinhashParams
resolves (24, 3) — outside the (8, 2) clamp every gated corpus bakes —
and that production banding had only ever been MEASURED (TextScaleProbe
recall), never hash-adjudicated. This script rewrites q39's base oracle
(read from <verifyOutDir>/oracle_sql.json) to an arbitrary (k, rows):

  sig:   s0..s7 ('i:' md5 minhash components) -> s0..s{k-1}
  bands: 4 bands of md5(s0||s1).. -> k/rows bands of
         md5(s_{rows*b} || .. || s_{rows*b+rows-1}), mirroring the
         engine's bandsOf (md5 over the separator-free concat)

Identity rail: regenerating at (8, 2) must reproduce the base oracle
byte-for-byte (asserted every run).

--sample restricts the candidate join's SMALLER endpoint (a.doc_id,
the `a < b` side) to the fixed 1/16 md5-nibble sample AND emits the
matching spark_sql post-filter on ida. UNLIKE gen_sf1_overrides.py's
scan-level sampling (sound only for banding-free brute-force oracles),
the scan/sig/bands/bucket-size/truncation stages here stay FULL-CORPUS
— identical to the engine's run — so BucketCap truncation (the one
cross-document coupling in this pipeline) is computed on exactly the
same posting lists. Only the final pair enumeration is restricted, and
a pair's membership there depends only on its own two (already banded,
already truncated) endpoints: full_pairs where nib(ida)=0 ==
sampled-oracle pairs, exactly.
"""
import argparse
import json
import os

NIB = ("(strpos('0123456789abcdef', "
       "substr(md5(CAST({c} AS VARCHAR)), 1, 1)) - 1)")

SIG_HEAD = " sig AS (SELECT doc_id, shset, "
SIG_TAIL = " FROM sh),"
BANDS_HEAD = " bands AS ("
BANDS_TAIL = "),\n bsz AS"
CAND_ANCHOR = " ON a.bi = b.bi AND a.bv = b.bv AND a.doc_id < b.doc_id)"


def comps_sql(k: int) -> str:
    return ", ".join(
        f"list_aggregate(list_transform(sg, x -> md5('{i}:' || x)), "
        f"'min') AS s{i}" for i in range(k))


def bands_sql(k: int, rows: int) -> str:
    parts = []
    for b in range(k // rows):
        concat = " || ".join(f"s{b * rows + i}" for i in range(rows))
        parts.append(f"SELECT doc_id, {b} AS bi, md5({concat}) AS bv "
                     f"FROM sig")
    return "\n  UNION ALL ".join(parts)


def rebanded(sql: str, k: int, rows: int, sample: bool) -> str:
    a = sql.index(SIG_HEAD) + len(SIG_HEAD)
    b = sql.index(SIG_TAIL, a)
    out = sql[:a] + comps_sql(k) + sql[b:]
    a = out.index(BANDS_HEAD) + len(BANDS_HEAD)
    b = out.index(BANDS_TAIL, a)
    out = out[:a] + bands_sql(k, rows) + out[b:]
    if sample:
        assert CAND_ANCHOR in out
        out = out.replace(
            CAND_ANCHOR,
            " ON a.bi = b.bi AND a.bv = b.bv AND a.doc_id < b.doc_id AND "
            + NIB.format(c="a.doc_id") + " = 0)")
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("verify_out")
    ap.add_argument("--k", type=int, required=True)
    ap.add_argument("--rows", type=int, required=True)
    ap.add_argument("--overrides", default="tools/sf10_overrides.json")
    ap.add_argument("--sample", action="store_true")
    args = ap.parse_args()
    assert args.k % args.rows == 0

    with open(os.path.join(args.verify_out, "oracle_sql.json")) as f:
        base = json.load(f)["q39_minhash_pairs"]
    # rail: the surgery at the clamp banding is the identity
    assert rebanded(base, 8, 2, False) == base, "identity check failed"

    try:
        with open(args.overrides) as f:
            out = json.load(f)
    except FileNotFoundError:
        out = {}
    entry = {"oracle": rebanded(base, args.k, args.rows, args.sample),
             "_banding": f"({args.k}, {args.rows}) adaptive minhash "
                         f"(derived from the base q39 oracle by "
                         f"gen_text_adaptive_override.py)"}
    if args.sample:
        entry["spark_sql"] = ("SELECT * FROM graft_out WHERE "
                              + NIB.format(c="ida") + " = 0")
    out["q39_minhash_pairs"] = entry
    with open(args.overrides, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote q39_minhash_pairs: banding ({args.k}, {args.rows})"
          + (", ida-sampled 1/16" if args.sample else ""))


if __name__ == "__main__":
    main()
