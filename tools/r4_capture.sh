#!/bin/bash
# Round-4 on-chip measurement queue.  Run in background once the TPU
# tunnel is up; each step is timeout-bounded and logs to $LOG.  Order is
# by evidence value: the remat A/B (VERDICT r3 next #2) and the fused-eval
# A/B (#3) come before the long bench re-capture.
#
# Usage: bash tools/r4_capture.sh [logfile]
set -u
cd /root/repo
LOG=${1:-/root/repo/R4_CAPTURE.log}
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

# cheap probe first so a dead tunnel fails fast instead of queueing hours
if ! timeout 360 python -c "
import jax, jax.numpy as jnp, numpy as np
x = jnp.ones((128,128), jnp.bfloat16)
print('PROBE_OK', float(np.asarray(jax.jit(lambda a: a@a)(x))[0,0]))
" >> "$LOG" 2>&1; then
  say "ABORT: tunnel probe failed"
  exit 1
fi
say "probe ok — starting queue"

# 1) training remat A/B at full size (PROFILE_train_r4 = the 'full' baseline)
run 2400 "train remat=full"      python tools/profile_train.py --remat full      --out /root/repo/PROFILE_train_r4.json
# 'dots' is the only saved-residual policy that FITS v5e HBM per
# HBM_ACCOUNTING.json (9.9 GiB temp vs 17.8 for xprobs/all at B=8);
# xprobs/xprobs_ff dropped from the queue: they exceed 16 GiB and the
# named exclusions are no-ops (the backward's residuals are the untagged
# pre-activations).  B=16 runs with FULL remat: saved-residual policies
# roughly double their footprint at B=16, while full remat stays ~6 GiB.
run 2400 "train remat=dots"      python tools/profile_train.py --remat dots      --out /root/repo/PROFILE_train_r4_dots.json
run 2400 "train remat=full B16"  python tools/profile_train.py --remat full --batch 16 --out /root/repo/PROFILE_train_r4_b16.json

# 2) eval-fusion A/B (PROFILE_r4 = fused; _unfused = r3 configuration)
run 3000 "fm fused on"  python tools/profile_fm.py --fused-eval on  --fused-conv on  --out /root/repo/PROFILE_r4.json
run 3000 "fm fused off" python tools/profile_fm.py --fused-eval off --fused-conv off --out /root/repo/PROFILE_r4_unfused.json

# 3) kernel numerics on real hardware (covers the round-4 fusions)
run 1800 "kernel check" python tools/tpu_kernel_check.py

# 3b) int8 serving A/B (weight-only + dynamic-activation rows)
run 2400 "int8 rtf" python tools/int8_rtf.py

# 4) builder-side bench capture (full rows; driver re-runs this at round end)
run 2400 "bench" env BENCH_DEADLINE=2100 python bench.py

# merge whatever landed into R4_SUMMARY.json
run 120 "summarize" python tools/summarize_r4.py

say "queue done"
