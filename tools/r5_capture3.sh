#!/bin/bash
# Round-5 second capture queue, PRIORITY-ORDERED: the chip went into a
# ~25x compute-degraded state mid-first-capture (tunnel up, GEMMs slow —
# see CLAUDE.md 2026-08-19) and recovery time is unknown, so the rows
# that matter most run first once tools/chip_health.py says the chip is
# back:
#   1. bench          — the round's headline RTF + same-session b8/b16
#                       (VERDICT #8) + the fixed train row (#4b); the
#                       first r5 bench ran degraded and is invalid.
#   2. kernel check   — green CURRENT artifact + probes the new 'rollw'
#                       shear adjoint ('flip' is unsupported: no Mosaic
#                       lax.rev lowering).
#   3. fm conv-only   — conv_glu kernel speed in isolation (numerically
#                       green under the f64 arbiter; r4 A/B'd it only
#                       jointly with the losing attention fusions).
#   4. probs-apply A/B — decides the _PROBS_APPLY default cleanly.
#   5. train clean/rollw/noreg — backward levers + regularizer share.
#   6. fm fused-on    — expected loser; completeness row.
# Every fm run also emits the r5 glue rows (nfe_glue_only, stack_full).
#
# Usage: bash tools/r5_capture3.sh [logfile]
set -u
cd /root/repo
LOG=${1:-/root/repo/R5_CAPTURE2.log}
# rotate rather than clobber: a previous queue's gate history (possibly
# the only record of a degraded window) survives as ${LOG}.prev
if [ -s "$LOG" ]; then mv "$LOG" "$LOG.prev"; fi
: > "$LOG"
say() { echo "[$(date +%H:%M:%S)] $*" | tee -a "$LOG"; }

run() { # run <seconds> <name> <cmd...>
  local t=$1 name=$2; shift 2
  say "START $name"
  if timeout "$t" "$@" >> "$LOG" 2>&1; then
    say "OK    $name"
  else
    say "FAIL  $name (rc=$?)"
  fi
}

# Gate on chip HEALTH (>=50 TFLOP/s chained-GEMM), waiting up to
# $WAIT_BUDGET_S (default 8 h; override to fit the session window).
WAIT_BUDGET_S=${WAIT_BUDGET_S:-28800}
if ! timeout $((WAIT_BUDGET_S + 700)) python tools/chip_health.py --wait --budget-s "$WAIT_BUDGET_S" --interval-s 600 >> "$LOG" 2>&1; then
  say "ABORT: chip degraded or unreachable for the whole wait budget"
  exit 1
fi
say "chip healthy — starting queue"

run 2700 "bench (healthy rerun)" env BENCH_DEADLINE=2400 python bench.py

run 1800 "kernel check (rollw probe)" python tools/tpu_kernel_check.py

# conv-only A/B: isolate the conv_glu kernel's speed from the attention
# fusions (r4 measured them only jointly)
run 3000 "fm conv fused only"         python tools/profile_fm.py --fused-eval off --fused-conv on  --probs-apply on  --out /root/repo/PROFILE_r5_convfused.json
run 3000 "fm unfused probs-apply ON"  python tools/profile_fm.py --fused-eval off --fused-conv off --probs-apply on  --out /root/repo/PROFILE_r5_pa_on.json
run 3000 "fm unfused probs-apply OFF" python tools/profile_fm.py --fused-eval off --fused-conv off --probs-apply off --out /root/repo/PROFILE_r5_pa_off.json

run 2400 "train full B8 (clean baseline)" python tools/profile_train.py --remat full --out /root/repo/PROFILE_train_r5_clean.json
run 2400 "train full B8 rollw" python tools/profile_train.py --remat full --bwd-shear-adj rollw --out /root/repo/PROFILE_train_r5_rollw.json
run 2400 "train full B8 no-reg" python tools/profile_train.py --remat full --no-reg --out /root/repo/PROFILE_train_r5_noreg.json

run 3000 "fm fused on (clean)"        python tools/profile_fm.py --fused-eval on  --fused-conv off --probs-apply on  --out /root/repo/PROFILE_r5_fused.json

# stamp whether the chip was still healthy at the end (a mid-queue
# re-degradation would otherwise silently poison the later rows)
run 600  "chip health (post)" python tools/chip_health.py

run 120 "summarize" python tools/summarize_r5.py

say "queue done"
