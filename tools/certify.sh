#!/bin/bash
# One-command multi-scale certification (VERDICT r12 directive 6).
#
# Runs the full Verify -> DuckDB-check gate at each requested scale and
# emits ONE consolidated receipt, replacing the hand-orchestrated
# per-scale /tmp logs of the r12 close (check_r12h / check_sf01_r12 /
# verify_sf1_r12).
#
# Usage:
#   tools/certify.sh                      # sf0.01 + sf0.1 (the cheap pair)
#   tools/certify.sh --sf1                # ... + sf1 (needs /tmp/sf1; ~hours
#                                         #   of DuckDB oracle replay)
#   CERTIFY_OUT=/tmp/certify tools/certify.sh
#
# Per-scale knobs applied automatically:
#   sf0.01 / sf0.1 : exact oracles, no overrides, default memory.
#   sf1            : tools/sf1_overrides.json (the adjudicated oracle
#                    restructurings of r11 — sampled gates print OK*),
#                    GRAFT_CHECK_MEM / THREADS sized for the big replays,
#                    SPARK_DRIVER_MEM=24g for Verify.
#
# Exit 0 only if EVERY scale passes completely. The consolidated receipt
# lands at $CERTIFY_OUT/certify_receipt.txt with per-scale pass counts.
set -u
cd "$(dirname "$0")/.."

OUT="${CERTIFY_OUT:-/tmp/graft_certify}"
mkdir -p "$OUT"
RECEIPT="$OUT/certify_receipt.txt"
: > "$RECEIPT"
FAIL=0

run_scale() { # name sfDir extraEnv...
  local name="$1" sf="$2"; shift 2
  local vdir="$OUT/verify_$name" vlog="$OUT/verify_$name.log" clog="$OUT/check_$name.log"
  echo "[certify] $name: Verify -> $vdir"
  if ! env "$@" tools/run.sh graft.Verify "$sf" "$vdir" >"$vlog" 2>&1; then
    echo "$name VERIFY-CRASH (see $vlog)" >> "$RECEIPT"; FAIL=1; return
  fi
  echo "[certify] $name: DuckDB check"
  local overrides=""
  [ "$name" = sf1 ] && overrides="tools/sf1_overrides.json"
  if env "$@" python3 tools/check.py "$sf" "$vdir" $overrides >"$clog" 2>&1; then
    echo "$name $(tail -2 "$clog" | grep 'queries pass')" >> "$RECEIPT"
  else
    echo "$name CHECK-FAIL: $(tail -2 "$clog" | tr '\n' ' ')" >> "$RECEIPT"
    grep -E "MISMATCH|ERR" "$clog" | head -20 >> "$RECEIPT"
    FAIL=1
  fi
}

run_scale sf0.01 /root/testdata/sf0.01
run_scale sf0.1  /root/testdata/sf0.1

if [ "${1:-}" = "--sf1" ]; then
  if [ ! -d /tmp/sf1 ]; then
    echo "[certify] building /tmp/sf1 via ScaleUp"
    SPARK_DRIVER_MEM=24g tools/run.sh graft.tools.ScaleUp \
      /root/testdata/sf0.1 /tmp/sf1 10 >"$OUT/scaleup_sf1.log" 2>&1 \
      || { echo "sf1 SCALEUP-CRASH" >> "$RECEIPT"; FAIL=1; }
  fi
  # SPARK_GRAFT_ADAPTIVE_GATES=run: at sf1 the adaptive twins resolve
  # 24/6 — outside the oracle clamp — and since r15 the overrides file
  # carries EXACT 24/6-baked oracles for them (gen_adaptive_overrides),
  # so the right posture is run-and-adjudicate, not pre-flight-exclude.
  [ -d /tmp/sf1 ] && run_scale sf1 /tmp/sf1 \
    SPARK_DRIVER_MEM=24g GRAFT_CHECK_MEM=55GB GRAFT_CHECK_THREADS=16 \
    GRAFT_CHECK_TMPDIR=/tmp/graft_certify_duck \
    SPARK_GRAFT_ADAPTIVE_GATES=run

fi

# Recall probes ride the same receipt (VERDICT r14 optional 7): the
# quality gate (does the production banding still beat the pinned
# 16/4 on recall AND time at scale?) lands next to the correctness
# counts instead of needing a separate archaeology run. Runs whenever
# a scale corpus is present — independent of the (hours-long) --sf1
# oracle replay. CERTIFY_RECALL=0 skips.
if [ "${CERTIFY_RECALL:-1}" != 0 ]; then
  : > "$OUT/recall_probes.jsonl"
  for rsf in /tmp/sf1 /tmp/sf10; do
    [ -d "$rsf" ] || continue
    echo "[certify] recall probe at $rsf"
    if SPARK_DRIVER_MEM=24g tools/run.sh graft.tools.LshScaleProbe \
        "$rsf" 3 100 16/4,adaptive >"$OUT/recall_$(basename "$rsf").log" 2>&1; then
      grep '^{' "$OUT/recall_$(basename "$rsf").log" >> "$OUT/recall_probes.jsonl"
    else
      echo "recall-probe $rsf CRASH (see $OUT/recall_$(basename "$rsf").log)" >> "$RECEIPT"
      FAIL=1
    fi
  done
  echo "recall_probes: $(wc -l < "$OUT/recall_probes.jsonl") lines -> $OUT/recall_probes.jsonl" >> "$RECEIPT"
fi

echo "==== certify receipt ===="
cat "$RECEIPT"
exit $FAIL
