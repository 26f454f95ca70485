#!/usr/bin/env python3
"""Generate the big-SF adjudication overrides for tools/check.py.

Usage: python3 tools/gen_sf1_overrides.py <verifyOutDir> [<outFile>]

The four exact-recall dedup queries' oracles are deliberately
brute-force (they prove the Spark side's banding/prefix recall with no
banding of their own to agree with by accident), which makes them
quadratic in the corpus — they terminate at the sf0.01 gate but stall
at sf1+ (VERDICT r10 "What's wrong" #3). At big SF we gate them on a
deterministic md5 doc-sample instead, the q221/q83 precedent:

  - the override ORACLE is the original SQL with its (single)
    `FROM documents` scan restricted to docs whose first md5 nibble is
    0 (a fixed 1/16 sample — id-structure-free, unlike `% k`);
  - the override SPARK side restricts the full output to rows whose
    BOTH endpoints are in the same sample.

This is sound because each output row of these queries depends only on
its own two documents (pairwise-decomposable), so
  full_pairs ∩ (S × S) == pairs_computed_on(S)
exactly, for ANY fixed doc subset S. The compare stays the usual
schema+rows+values gate, just over the sampled pair set (check.py
prints OK* for overridden rows).
"""
import json, os, sys

NIB = ("(strpos('0123456789abcdef', "
       "substr(md5(CAST({c} AS VARCHAR)), 1, 1)) - 1)")

# pairwise-decomposable pair tables: (endpoint columns)
TARGETS = {
    "q154_prefix_join": ("ida", "idb"),
    "q159_containment_join": ("ida", "idb"),
    "q185_ahash_near_dup": ("ida", "idb"),
    "q188_incr_image_dedup": ("ida", "idb"),
    # shares q188's oracle verbatim (streaming face of the same gate)
    "q291_stream_image_dedup": ("ida", "idb"),
}


def main():
    out_dir = sys.argv[1]
    out_file = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1_overrides.json"
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracle = json.load(f)
    overrides = {}
    for name, (a, b) in TARGETS.items():
        sql = oracle[name]
        n = sql.count("FROM documents")
        assert n == 1, f"{name}: expected one documents scan, found {n}"
        sampled = sql.replace(
            "FROM documents",
            "FROM (SELECT * FROM documents WHERE "
            + NIB.format(c="doc_id") + " = 0)")
        overrides[name] = {
            "oracle": sampled,
            "spark_sql": ("SELECT * FROM graft_out WHERE "
                          + NIB.format(c=a) + " = 0 AND "
                          + NIB.format(c=b) + " = 0"),
        }
    with open(out_file, "w") as f:
        json.dump(overrides, f, indent=1)
    print(f"wrote {len(overrides)} overrides to {out_file}")


if __name__ == "__main__":
    main()
