#!/bin/bash
# Round-5 follow-up queue: same-session A/Bs that react to the FIRST r5
# capture (R5_CAPTURE.log):
#   * probs-apply on/off at NFE level, one session — the first capture
#     showed mixed per-stack results under cross-session jitter (ds2
#     162->116 us, ds1 +36) and the r5 nonlin rerouting was reverted
#     after measuring 4x slower; this pair decides the _PROBS_APPLY
#     default cleanly.
#   * fused-eval on with the reverted nonlin + lane-padded consumers
#     (the first capture's fused-on row ran a mid-edit mix).
#   * kernel check re-run: probes the new 'rollw' shear adjoint
#     (stride = w-1 dynamic rotate; 'flip' measured unsupported).
#   * train full B8 with --bwd-shear-adj rollw (if the check says ok).
#
# Usage: bash tools/r5_capture2.sh [logfile]
set -u
cd /root/repo
LOG=${1:-/root/repo/R5_CAPTURE2.log}
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

# Gate on chip HEALTH, not just reachability: the first r5 capture's
# bench tail ran on a chip degraded ~25x (tunnel up, compute throttled —
# RTF 0.2703) and recorded garbage.  chip_health.py chains 50 big GEMMs
# under one dispatch and demands >=50 TFLOP/s; --wait re-probes every
# 10 min for up to 5 h so the queue starts itself when the chip recovers.
if ! timeout 19000 python tools/chip_health.py --wait --budget-s 18000 --interval-s 600 >> "$LOG" 2>&1; then
  say "ABORT: chip degraded or unreachable for the whole wait budget"
  exit 1
fi
say "chip healthy — starting queue"

run 1800 "kernel check (rollw probe)" python tools/tpu_kernel_check.py

run 3000 "fm unfused probs-apply OFF" python tools/profile_fm.py --fused-eval off --fused-conv off --probs-apply off --out /root/repo/PROFILE_r5_pa_off.json
run 3000 "fm unfused probs-apply ON"  python tools/profile_fm.py --fused-eval off --fused-conv off --probs-apply on  --out /root/repo/PROFILE_r5_pa_on.json
run 3000 "fm fused on (clean)"        python tools/profile_fm.py --fused-eval on  --fused-conv off --probs-apply on  --out /root/repo/PROFILE_r5_fused.json
# conv-only A/B: the conv_glu kernel is numerically GREEN under the f64
# arbiter (kernel 9.4e-4 vs XLA 1.3e-3 from truth) — isolate its speed
# from the attention fusions (r4 measured them only jointly)
run 3000 "fm conv fused only"         python tools/profile_fm.py --fused-eval off --fused-conv on  --probs-apply on  --out /root/repo/PROFILE_r5_convfused.json

run 2400 "train full B8 (clean baseline)" python tools/profile_train.py --remat full --out /root/repo/PROFILE_train_r5_clean.json
run 2400 "train full B8 rollw" python tools/profile_train.py --remat full --bwd-shear-adj rollw --out /root/repo/PROFILE_train_r5_rollw.json
# regularizer share of the step: same program minus the Balancer/Whiten
# stat ops — (clean) - (noreg) pins their fwd+bwd cost for the
# bwd/fwd-ratio analysis (VERDICT r4 next #2)
run 2400 "train full B8 no-reg" python tools/profile_train.py --remat full --no-reg --out /root/repo/PROFILE_train_r5_noreg.json

# re-verify health before the headline rows (a mid-queue degradation
# would otherwise poison them silently), then re-run bench: the first r5
# bench tail was captured on the degraded chip and its RTF/serving/train
# rows are all invalid.  Serving b8+b16 land in the same session, which
# is the VERDICT #8 regression separation.
run 600  "chip health (pre-bench)" python tools/chip_health.py
run 2700 "bench (healthy rerun)" env BENCH_DEADLINE=2400 python bench.py

run 120 "summarize" python tools/summarize_r5.py

say "queue done"
