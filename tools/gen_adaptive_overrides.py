#!/usr/bin/env python3
"""Bake a NON-clamp adaptive banding into q302/q303 override oracles.

Usage:
  python3 tools/gen_adaptive_overrides.py --band-bits 6 \
      [--overrides tools/sf1_overrides.json] \
      [--source tools/sf1_overrides.json] \
      [--sample 'vec_id % 16 = 3']

VERDICT r14 "What's missing" #1: the production-default adaptive
banding (Similarity.adaptiveBandBits) had never been hash-adjudicated
at a scale where it DIFFERS from the pinned clamp-region constants —
q302/q303's base oracles bake 16/4, so at sf1 (banding 24/6) they were
SKIP'd. This script closes that: it takes the already-adjudicated
PINNED override oracles (q135_ann_knn_join / q205_hard_negatives in
--source, the entries whose 16/4 shape is hash-green at sf0.01/0.1/sf1)
and rewrites ONLY the banding by anchored string surgery:

  sig:    [... FOR j IN range(0, 16)]   ->  range(0, 4*bandBits)
          (nBands stays 4 — resolveBanding's invariant: recall is
           re-supplied by more hyperplanes per band, not more bands)
  bucket: 8*sig[4b+1]+4*sig[4b+2]+2*sig[4b+3]+sig[4b+4]
          -> the MSB-first fold over bandBits sig elements, mirroring
             the engine's aggregate(..., acc*2 + sig[b*bandBits+i])

Everything else — the scaled-int quantization, hyperplane LCG
(j*128+d seeds work for any j), BucketCap keep rule, cosine, window —
is byte-identical to the adjudicated pinned oracle, so the band math
is the ONLY degree of freedom. Safety rails:

  * identity check: band_bits=4 with no sample must reproduce the
    pinned SQL byte-for-byte (asserted on every run);
  * validate the rewritten oracle at a SMALL scale first by dumping the
    engine's explicit (4*bb, bb) run (graft.tools.BandedDump) and
    gating it with tools/check.py before trusting the big-SF receipt.

--sample 'vec_id % 16 = N' restricts the oracle's candidate x-side (the
qid side) to a deterministic residue class AND emits the matching
"spark_sql" post-filter on graft_out. Sound for these two queries
because each output row's top-k is computed over the FULL collision
side (only the qid axis is sampled — per-qid results are independent);
it exists so the sf10 spot-check's DuckDB candidate volume stays
bounded. The engine still computes the full corpus join.
"""
import argparse
import json

PIN_SIG = "FOR j IN range(0, 16)] AS sig"
PIN_BUCKET = ("8*sig[4*t.b+1] + 4*sig[4*t.b+2] + 2*sig[4*t.b+3] + "
              "sig[4*t.b+4]")
PIN_GUARD = "AND x.vec_id <> y.vec_id),"

PAIRS = {  # target name -> pinned source entry
    "q302_ann_adaptive": "q135_ann_knn_join",
    "q303_hard_negatives_adaptive": "q205_hard_negatives",
}


def bucket_expr(bb: int) -> str:
    terms = [f"{2 ** (bb - 1 - i)}*sig[{bb}*t.b+{i + 1}]"
             for i in range(bb - 1)]
    terms.append(f"sig[{bb}*t.b+{bb}]")
    return " + ".join(terms)


def rebanded(sql: str, bb: int, sample: str | None) -> str:
    assert PIN_SIG in sql, "sig anchor missing — pinned oracle changed?"
    assert PIN_BUCKET in sql, "bucket anchor missing — pinned oracle changed?"
    out = sql.replace(PIN_SIG, f"FOR j IN range(0, {4 * bb})] AS sig")
    out = out.replace(PIN_BUCKET, bucket_expr(bb))
    if sample:
        assert PIN_GUARD in out, "kc guard anchor missing"
        out = out.replace(
            PIN_GUARD, f"AND x.vec_id <> y.vec_id\n  WHERE x.{sample}),")
    return out


def staged_q303(sql: str) -> str:
    """Restructure the (already rebanded/sampled) q303 oracle into the
    q199/q221 temp-table staging. The monolithic spelling spilled >50 GB
    of DuckDB temp at sf10 even on a 1/64 qid sample: with neg and sc
    inlined, the optimizer carries the ~520 B quantized arrays through
    FOUR hash joins around two blocking operators. Staging materializes
    (1) the quantized corpus once (200k rows), (2) the candidate pairs
    as bare int scalars, then streams one label-filter + cosine pass
    into the window — identical rows by construction (the stages are
    the oracle's own CTEs, split at their boundaries)."""
    a2 = sql.index(",\n s AS (")
    a3 = sql.index(",\n neg AS (")
    head = sql[:a2]                      # WITH p AS (...), n AS (...)
    mid = sql[a2 + 1:a3]                 # \n s/b/bsz/br/kc CTEs
    tail = sql[a3 + 2:]                  # neg/sc/rk CTEs + final SELECT
    assert " FROM n)" in mid
    mid = mid.replace(" FROM n)", " FROM q303n)")
    for old, new in (("FROM kc", "FROM q303kc kc"),
                     ("JOIN n a", "JOIN q303n a"),
                     ("JOIN n c", "JOIN q303n c")):
        assert old in tail
        tail = tail.replace(old, new)
    return (f"CREATE OR REPLACE TEMP TABLE q303n AS\n{head}\n"
            "SELECT * FROM n;\n"
            f"CREATE OR REPLACE TEMP TABLE q303kc AS\nWITH{mid}\n"
            "SELECT * FROM kc;\n"
            f"WITH {tail}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--band-bits", type=int, required=True)
    ap.add_argument("--overrides", default="tools/sf1_overrides.json",
                    help="file to write the q302/q303 entries into")
    ap.add_argument("--source", default="tools/sf1_overrides.json",
                    help="file holding the adjudicated pinned oracles")
    ap.add_argument("--sample", default=None,
                    help="deterministic qid-side sample predicate, e.g. "
                         "'vec_id % 16 = 3' (adds the matching spark_sql "
                         "post-filter)")
    ap.add_argument("--stage-q303", action="store_true",
                    help="emit q303 in the temp-table staging (needed at "
                         "sf10 where the monolithic spelling spills)")
    args = ap.parse_args()

    with open(args.source) as f:
        src = json.load(f)
    try:
        with open(args.overrides) as f:
            out = json.load(f)
    except FileNotFoundError:
        out = {}

    for target, pinned_name in PAIRS.items():
        pinned = src[pinned_name]["oracle"]
        # rail: the surgery at bb=4 is the identity on the pinned oracle
        assert rebanded(pinned, 4, None) == pinned, \
            f"identity check failed for {pinned_name}"
        sql = rebanded(pinned, args.band_bits, args.sample)
        if args.stage_q303 and target == "q303_hard_negatives_adaptive":
            sql = staged_q303(sql)
        entry = {"oracle": sql,
                 "_banding": f"{4 * args.band_bits}/{args.band_bits} "
                             f"(adaptive at this scale; derived from the "
                             f"adjudicated {pinned_name} pinned oracle by "
                             f"gen_adaptive_overrides.py)"}
        if args.sample:
            entry["spark_sql"] = ("SELECT * FROM graft_out WHERE "
                                  + args.sample.replace("vec_id", "qid"))
        out[target] = entry
        print(f"wrote {target}: banding {4 * args.band_bits}/"
              f"{args.band_bits}"
              + (f", sampled ({args.sample})" if args.sample else ""))

    with open(args.overrides, "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
