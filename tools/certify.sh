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
  # SPARK_GRAFT_ADAPTIVE_GATES names EXACTLY the twins: at sf1 they
  # resolve 24/6 — outside the oracle clamp — and since r15 the
  # overrides file carries EXACT 24/6-baked oracles for them
  # (gen_adaptive_overrides), so the right posture for THOSE NAMES is
  # run-and-adjudicate. Scoped per name (ADVICE r15): the text-family
  # gates carry no scale-matched overrides here, so they keep their
  # pre-flight — if /tmp/sf1 ever regrows past the text clamp they
  # PRECONDITION-mark instead of reporting bare hash mismatches.
  [ -d /tmp/sf1 ] && run_scale sf1 /tmp/sf1 \
    SPARK_DRIVER_MEM=24g GRAFT_CHECK_MEM=55GB GRAFT_CHECK_THREADS=16 \
    GRAFT_CHECK_TMPDIR=/tmp/graft_certify_duck \
    SPARK_GRAFT_ADAPTIVE_GATES=q302_ann_adaptive,q303_hard_negatives_adaptive

fi

# Recall probes ride the same receipt (VERDICT r14 optional 7): the
# quality gate (does the production banding still beat the pinned
# 16/4 on recall AND time at scale?) lands next to the correctness
# counts instead of needing a separate archaeology run. Runs whenever
# a scale corpus is present — independent of the (hours-long) --sf1
# oracle replay. CERTIFY_RECALL=0 skips.
#
# PROTOCOL + FLOOR (VERDICT r15 #1): probes run the PINNED protocol
# (2000 target queries, stride = n/2000 — LshScaleProbe pinned-v1) so
# the numbers are comparable round-over-round, and the receipt FAILS
# unless, at every probed decade: (a) the line is pinned-v1, (b)
# adaptive recall >= the pinned-16/4 recall (the banding policy's
# whole justification), and (c) adaptive recall >= the absolute floor
# 0.65 — chosen deliberately against the r15 sf10 estimate 0.6995 at
# n=200k: ~100 hits of headroom under the binomial spread of a
# 6000-truth-pair sample, while any real banding regression (the 16/4
# clamp ceiling would score 0.18 here) lands far below it.
RECALL_FLOOR="${CERTIFY_RECALL_FLOOR:-0.65}"
if [ "${CERTIFY_RECALL:-1}" != 0 ]; then
  : > "$OUT/recall_probes.jsonl"
  for rsf in /tmp/sf1 /tmp/sf10; do
    [ -d "$rsf" ] || continue
    echo "[certify] recall probe at $rsf (pinned protocol)"
    if SPARK_DRIVER_MEM=24g tools/run.sh graft.tools.LshScaleProbe \
        "$rsf" 3 pinned 16/4,adaptive >"$OUT/recall_$(basename "$rsf").log" 2>&1; then
      grep '^{' "$OUT/recall_$(basename "$rsf").log" >> "$OUT/recall_probes.jsonl"
    else
      echo "recall-probe $rsf CRASH (see $OUT/recall_$(basename "$rsf").log)" >> "$RECEIPT"
      FAIL=1
    fi
  done
  echo "recall_probes: $(wc -l < "$OUT/recall_probes.jsonl") lines -> $OUT/recall_probes.jsonl" >> "$RECEIPT"
  if [ -s "$OUT/recall_probes.jsonl" ]; then
    if python3 - "$OUT/recall_probes.jsonl" "$RECALL_FLOOR" <<'PYEOF' >> "$RECEIPT"; then
import json, sys
path, floor = sys.argv[1], float(sys.argv[2])
by_sf = {}
for line in open(path):
    r = json.loads(line)
    if r.get("probe") != "lsh_scale":
        continue
    by_sf.setdefault(r["sf"], {})[r["tag"]] = r
bad = []
for sf, tags in sorted(by_sf.items()):
    a, f = tags.get("adaptive"), tags.get("fixed")
    if not a or not f:
        bad.append(f"{sf}: missing adaptive/fixed pair"); continue
    for r in (a, f):
        if r.get("protocol") != "pinned-v1":
            bad.append(f"{sf}/{r['tag']}: protocol {r.get('protocol')!r} "
                       "is not pinned-v1 — number not gateable")
    if a["recall_at_k"] < f["recall_at_k"]:
        bad.append(f"{sf}: adaptive recall {a['recall_at_k']:.4f} < "
                   f"pinned-16/4 {f['recall_at_k']:.4f}")
    if a["recall_at_k"] < floor:
        bad.append(f"{sf}: adaptive recall {a['recall_at_k']:.4f} < "
                   f"floor {floor}")
    print(f"recall-gate {sf}: adaptive={a['recall_at_k']:.4f} "
          f"fixed={f['recall_at_k']:.4f} floor={floor} "
          f"queries={a['queries_sampled']} protocol={a.get('protocol')}"
          + ("" if not bad else " [VIOLATIONS PENDING]"))
for b in bad:
    print(f"recall-gate FAIL: {b}")
sys.exit(1 if bad else 0)
PYEOF
      true
    else
      FAIL=1
    fi
  fi
fi

echo "==== certify receipt ===="
cat "$RECEIPT"
exit $FAIL
