#!/bin/bash
# The sf10 heavy-family bench protocol (r16 warm-run + r17 stabilizers),
# in-repo so round-over-round receipts run the SAME recipe instead of
# hand-rolled /tmp scripts.
#
#   tools/bench_sf10.sh [outdir]        # default /tmp/graft_bench_sf10
#
# Protocol:
#   run 0: warmup, DISCARDED (tagged warmup_run_discarded — absorbs the
#          ~20 min cold-cache signature documented since r15)
#   run 1-2: kept, tagged discarded_first_run, 120-150 s apart
# Stabilizers (in Bench itself since r17): uncounted warm pass +
# median-of-3 timed reps for the high-variance movers; q130_pagerank is
# opted in via SPARK_GRAFT_WARMPASS_EXTRA (scale-scoped — its GC-draw
# swing is an sf10 phenomenon; receipts tools/receipts/r17/
# q130_sf10_settled.txt).
#
# Needs /tmp/sf10 (ScaleUp 100x of /root/testdata/sf0.1); builds it if
# missing.
set -eu
cd "$(dirname "$0")/.."
OUT="${1:-/tmp/graft_bench_sf10}"
mkdir -p "$OUT"

if [ ! -d /tmp/sf10 ]; then
  echo "[bench_sf10] building /tmp/sf10 via ScaleUp (one-time, ~20 min)"
  SPARK_DRIVER_MEM=24g tools/run.sh graft.tools.ScaleUp \
    /root/testdata/sf0.1 /tmp/sf10 100 > "$OUT/scaleup.log" 2>&1
fi

export SPARK_GRAFT_SF_DIR=/tmp/sf10 SPARK_DRIVER_MEM=64g SPARK_GRAFT_CPUS=32
export SPARK_GRAFT_QUERIES=q39_minhash_pairs,q85_incremental_dedup,q130_pagerank,q135_ann_knn_join,q198_bucketed_join,q199_label_prop,q205_hard_negatives,q211_pq_encode,q302_ann_adaptive,q303_hard_negatives_adaptive
export SPARK_GRAFT_WARMPASS_EXTRA=q130_pagerank

echo "[bench_sf10] warmup run (discarded)"
SPARK_GRAFT_WARMUP_NOTE=warmup_run_discarded tools/run.sh graft.Bench \
  > "$OUT/warmup_discarded.log" 2>&1 || true
cp target/bench.json "$OUT/warmup_discarded.json" 2>/dev/null || true

for i in 1 2; do
  sleep 120
  echo "[bench_sf10] kept run $i"
  SPARK_GRAFT_WARMUP_NOTE=discarded_first_run tools/run.sh graft.Bench \
    > "$OUT/kept$i.log" 2>&1
  cp target/bench.json "$OUT/kept$i.json"
done

echo "[bench_sf10] done — receipts in $OUT (kept1.json / kept2.json)"
