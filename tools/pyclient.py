#!/usr/bin/env python3
"""Python client bridge over graft's Arrow wire.

The reference's user-facing artifact is a Python pandas client: its
Demo notebook (examples/Demo.ipynb) reads parquet, merges two tables on
two string keys, groupby-counts, and fetches the result as Arrow IPC
record batches that the client materializes to pandas
(charmpandas/interface.py:23-33). This script reproduces that exact
workflow against the graft engine from Python:

  1. spark-submits graft.tools.PyBridge (tools/run.sh), which runs the
     pipeline through the Table facade and ships ONE Arrow IPC stream;
  2. decodes the payload with pyarrow -> pandas (the reference client's
     decode, verbatim: pa.ipc.open_stream(...).read_all().to_pandas());
  3. asserts equality against the same DuckDB oracle the driver's
     correctness gate uses, over the identical parquet inputs.

A second leg round-trips the q66 pandas-facade chain: the engine runs
set_column -> fillna -> astype -> rename -> value_counts/groupby-sum ->
merge through the Scala facade, and this client re-runs the SAME five
ops in real pandas on the raw corpus parquet — one result, two
implementations, asserted frame-equal. That turns the facade from a
demo into a contract.

Usage: python3 tools/pyclient.py [nRows] [sfDir]
       (defaults: 2,000,000 rows; /root/testdata/sf0.001)
Exit 0 = both legs green.
"""
import json
import os
import subprocess
import sys
import time

import duckdb
import pandas as pd
import pyarrow as pa

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_bridge(*args):
    """spark-submit the engine side; return its one-line JSON report."""
    t0 = time.time()
    proc = subprocess.run(
        [os.path.join(REPO, "tools", "run.sh"), "graft.tools.PyBridge",
         *args],
        capture_output=True, text=True, cwd=REPO)
    if proc.returncode != 0:
        sys.stderr.write(proc.stdout[-2000:] + "\n" + proc.stderr[-2000:])
        raise SystemExit(f"PyBridge {args[0]} failed rc={proc.returncode}")
    line = [l for l in proc.stdout.strip().splitlines()
            if l.startswith("{")][-1]
    rep = json.loads(line)
    rep["wall_secs"] = round(time.time() - t0, 3)
    return rep


def decode(work):
    """The reference client's fetch decode: Arrow IPC stream -> pandas."""
    with open(os.path.join(work, "result.arrows"), "rb") as f:
        payload = f.read()
    return pa.ipc.open_stream(payload).read_all().to_pandas(), len(payload)


def frames_equal(a, b, sort_by):
    a = a.sort_values(sort_by).reset_index(drop=True)
    b = b.sort_values(sort_by).reset_index(drop=True)
    if sorted(a.columns) != sorted(b.columns):
        return False, f"columns differ: {list(a.columns)} vs {list(b.columns)}"
    b = b[list(a.columns)]
    try:
        pd.testing.assert_frame_equal(a, b, check_dtype=False)
        return True, ""
    except AssertionError as e:
        return False, str(e)[:500]


def leg_demo(n):
    work = "/tmp/graft_pyclient_demo"
    rep = run_bridge("demo", work, str(n))
    got, nbytes = decode(work)
    # the driver-gate oracle, over the very files the engine read
    oracle = duckdb.sql(f"""
        SELECT city, count(user_id) AS "count(user_id)"
        FROM '{work}/users/*.parquet'
        JOIN '{work}/ages/*.parquet' USING (first_name, last_name)
        GROUP BY city""").df()
    ok, why = frames_equal(got, oracle, ["city"])
    total = int(got["count(user_id)"].sum())
    assert total == n, f"demo pipeline lost rows: {total} != {n}"
    print(f"demo    rows={len(got)} n={n} engine_secs={rep['secs']:.3f} "
          f"wall_secs={rep['wall_secs']} payload={nbytes}B "
          f"{'OK' if ok else 'MISMATCH: ' + why}")
    return ok


def leg_facade(sf):
    work = "/tmp/graft_pyclient_facade"
    rep = run_bridge("facade", sf, work)
    got, nbytes = decode(work)
    # the SAME five facade ops, in real pandas, on the raw corpus —
    # mirrors q66_pandas_facade op for op
    c = pd.read_parquet(os.path.join(sf, "customer.parquet"))
    base = (c.assign(bal=c.c_acctbal.where(c.c_acctbal >= 0))
             .fillna({"bal": 0.0})
             .astype({"bal": "int64"})
             .rename(columns={"c_mktsegment": "segment"}))
    vc = (base["segment"].value_counts()
          .rename_axis("segment").reset_index(name="n"))
    sums = (base.groupby("segment", as_index=False)["bal"].sum()
            .rename(columns={"bal": "sum_bal"}))
    want = vc.merge(sums, on="segment")[["segment", "n", "sum_bal"]]
    ok, why = frames_equal(got, want, ["segment"])
    print(f"facade  rows={len(got)} engine_secs={rep['secs']:.3f} "
          f"wall_secs={rep['wall_secs']} payload={nbytes}B "
          f"{'OK' if ok else 'MISMATCH: ' + why}")
    return ok


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"
    ok = leg_demo(n) & leg_facade(sf)
    print("pyclient: ALL OK" if ok else "pyclient: FAILURES")
    raise SystemExit(0 if ok else 1)


if __name__ == "__main__":
    main()
