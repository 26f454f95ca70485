#!/usr/bin/env python3
"""Re-record a carry-forward block in tools/sf1_overrides.json.

Usage: python3 tools/rerecord_carry.py <name> <sfDir> <adjudicated-note>

Recomputes the sha256 of the entry's effective oracle SQL and of every
source file already listed in its carry_forward.source_files, and pins
the CURRENT corpus row counts of the tables named in
carry_forward.corpus_tables (default: embeddings, documents) from
<sfDir>. Refuses to run unless the caller confirms a fresh solo replay
just passed (the contract: hashes are re-recorded ONLY together with a
fresh replay — this script exists so the re-record step can't typo a
hash, not so it can skip the replay).

Set GRAFT_RERECORD_REPLAYED=1 to confirm.
"""
import hashlib, json, os, sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from check import parquet_rowcount  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OVERRIDES = os.path.join(REPO, "tools", "sf1_overrides.json")


def main():
    if os.environ.get("GRAFT_RERECORD_REPLAYED") != "1":
        sys.exit("refusing: re-record hashes only together with a fresh "
                 "solo replay (set GRAFT_RERECORD_REPLAYED=1 after the "
                 "check.py gate for this name passed)")
    name, sf_dir, note = sys.argv[1], sys.argv[2], sys.argv[3]
    with open(OVERRIDES) as f:
        overrides = json.load(f)
    entry = overrides[name]
    cf = entry["carry_forward"]
    cf["adjudicated"] = note
    cf["oracle_sha256"] = hashlib.sha256(
        entry["oracle"].encode()).hexdigest()
    for rel in list(cf.get("source_files", {})):
        with open(os.path.join(REPO, rel), "rb") as f:
            cf["source_files"][rel] = hashlib.sha256(f.read()).hexdigest()
    tables = cf.get("corpus_tables", ["embeddings", "documents"])
    cf["corpus_rowcounts"] = {
        t: parquet_rowcount(os.path.join(sf_dir, f"{t}.parquet"))
        for t in tables}
    with open(OVERRIDES, "w") as f:
        json.dump(overrides, f, indent=1)
        f.write("\n")
    print(f"re-recorded {name}: oracle {cf['oracle_sha256'][:12]}.., "
          f"{len(cf['source_files'])} source hashes, "
          f"corpus rowcounts {cf['corpus_rowcounts']}")


if __name__ == "__main__":
    main()
