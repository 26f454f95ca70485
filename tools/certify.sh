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
# whole justification), and (c) adaptive recall >= the decade's floor.
#
# PER-DECADE FLOORS (VERDICT r16 #6): one 0.65 floor was tight at sf10
# and slack at sf1 (0.8945 measured there) — a sf1-only regression to
# 0.70 would have passed. Floors are keyed on the probed corpus size:
# n <= 65,536 (the sf1 decade; adaptive resolves 24/6, measured 0.8945
# seed-stably — r17 study: 0.8695-0.8945 across 3 hyperplane draws)
# gates at 0.85; past it (sf10: 36/9, measured 0.6995) at 0.65.
# CERTIFY_RECALL_FLOOR overrides BOTH (legacy, breach-test knob);
# CERTIFY_RECALL_FLOOR_SMALL / _LARGE override one side each.
RECALL_FLOOR="${CERTIFY_RECALL_FLOOR:-}"
RECALL_FLOOR_SMALL="${CERTIFY_RECALL_FLOOR_SMALL:-0.85}"
RECALL_FLOOR_LARGE="${CERTIFY_RECALL_FLOOR_LARGE:-0.65}"
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
    if python3 - "$OUT/recall_probes.jsonl" "$RECALL_FLOOR" \
        "$RECALL_FLOOR_SMALL" "$RECALL_FLOOR_LARGE" <<'PYEOF' >> "$RECEIPT"; then
import json, sys
path, both, small, large = (sys.argv[1], sys.argv[2],
                            float(sys.argv[3]), float(sys.argv[4]))
def floor_for(n):
    if both:            # legacy single-floor override (breach tests)
        return float(both)
    return small if n <= 65536 else large
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
    floor = floor_for(a["n"])
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
          f"fixed={f['recall_at_k']:.4f} floor={floor} (n={a['n']}) "
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
