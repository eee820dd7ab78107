#!/bin/bash
# Round-5 on-chip measurement queue.  Run in background once the TPU
# tunnel is up; each step is timeout-bounded and logs to $LOG.  Order is
# by evidence value (VERDICT r4 next-list):
#   #1  fresh kernel check — the f64-arbitrated conv_glu verdict plus the
#       new flip-mode backward and lane-padded probs_apply kernels
#   #3  eval NFE A/B with the r5 lane-padded consumers (fused off = the
#       new default; fused on = the r4 deferred-probs path, now also
#       lane-padded) — decides whether the fused default flips back
#   #2  train profiles: full-remat baseline with the lane-padded backward,
#       the flip shear-adjoint A/B, the new 'names' policy, and a batch
#       sweep (B=16/24/32, full remat fits ~6 GiB at B=16)
#   #5  int8 ladder with the fidelity closers unquantized
#   #8  bench (serving b8/b16 land in the same session -> separates the
#       183x -> 157.5x regression from tunnel jitter)
#
# Usage: bash tools/r5_capture.sh [logfile]
set -u
cd /root/repo
LOG=${1:-/root/repo/R5_CAPTURE.log}
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
if ! timeout 400 python -c "
import jax, jax.numpy as jnp, numpy as np
x = jnp.ones((128,128), jnp.bfloat16)
print('PROBE_OK', float(np.asarray(jax.jit(lambda a: a@a)(x))[0,0]))
" >> "$LOG" 2>&1; then
  say "ABORT: tunnel probe failed"
  exit 1
fi
say "probe ok — starting queue"

# 1) kernel numerics on real hardware: f64-arbitrated conv_glu, flip-mode
#    backward, lane-padded probs_apply/probs_consume/head0 (writes
#    KERNEL_CHECK.json — the r4 stale-green artifact is replaced either way)
run 2400 "kernel check" python tools/tpu_kernel_check.py

# 2) eval NFE A/B with the r5 consumers
run 3000 "fm fused off" python tools/profile_fm.py --fused-eval off --fused-conv off --out /root/repo/PROFILE_r5_unfused.json
run 3000 "fm fused on"  python tools/profile_fm.py --fused-eval on  --fused-conv off --out /root/repo/PROFILE_r5.json

# 3) training profiles (full remat baseline first, then the A/Bs)
run 2400 "train full B8"       python tools/profile_train.py --remat full  --out /root/repo/PROFILE_train_r5.json
run 2400 "train full B8 flip"  python tools/profile_train.py --remat full  --bwd-shear-adj flip --out /root/repo/PROFILE_train_r5_flip.json
run 2400 "train names B8"      python tools/profile_train.py --remat names --out /root/repo/PROFILE_train_r5_names.json
run 2400 "train full B16"      python tools/profile_train.py --remat full --batch 16 --out /root/repo/PROFILE_train_r5_b16.json
run 2400 "train full B24"      python tools/profile_train.py --remat full --batch 24 --out /root/repo/PROFILE_train_r5_b24.json
run 2400 "train names B16"     python tools/profile_train.py --remat names --batch 16 --out /root/repo/PROFILE_train_r5_names_b16.json

# 4) int8 ladder with the fidelity closers unquantized
run 2400 "int8 rtf" python tools/int8_rtf.py

# 5) builder-side bench capture (headline + b8/b16 same-session rows;
#    driver re-runs bench.py at round end)
run 3000 "bench" env BENCH_DEADLINE=2400 python bench.py

say "queue done"
