"""HBM accounting for the remat-policy A/B (VERDICT r3 next #2).

Compiles the 123M training fwd+bwd program once per rematerialization
policy at the bench shape (B=8, T=1024, bf16 compute) and reads XLA's
buffer assignment via ``compiled.memory_analysis()``:

  temp_size_in_bytes   — activations + workspace the backward must hold
  argument/output      — params (f32) + optimizer state + batch
  peak_memory_in_bytes — what must fit in HBM

together with the v5e headroom math (16 GiB HBM per chip), so the
"do the saved-activation variants fit?" question demanded by the r3
verdict has a committed, reproducible answer even when the TPU tunnel
is down.  CAVEATS: (1) on the CPU backend the fused attention kernels
are gated off (`zipformer._fused_attention_wanted`), so the unfused
path materializes and SAVES the (B, H, T, T) probs under the
save-everything policies — on TPU the flash consumer custom-VJPs never
keep them, so the CPU numbers are an UPPER bound for `all`/`xprobs`;
(2) which tensors a policy may save is decided by jax partial-eval
(backend-independent), and it prefers PRE-activations for Swoosh/GLU
chains — which is why `xprobs_ff`'s extra name exclusions measure as
byte-identical to `xprobs` (see docs/training.md, "Remat policies and
HBM accounting").  (Reference training memory strategy: fp16 autocast
+ GradScaler, ref bin/train_zipvoice.py:610-618; the TPU rebuild uses
bf16 + selective remat instead.)

Usage: python tools/hbm_accounting.py [--batch 8] [--frames 1024] \
           [--out /root/repo/HBM_ACCOUNTING.json]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

V5E_HBM_GIB = 16.0

POLICIES = ("full", "dots", "names", "xprobs", "xprobs_ff", "all")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--frames", type=int, default=1024)
    ap.add_argument("--out", type=str, default="/root/repo/HBM_ACCOUNTING.json")
    ap.add_argument("--policies", type=str, default=",".join(POLICIES))
    args = ap.parse_args()

    import jax

    # Decide the platform BEFORE any in-process backend init: a
    # jax_platforms update after jax.devices() is a silent no-op.  The
    # probe is a subprocess (a downed tunnel hangs in-process init), and
    # the accelerator check must recognize the image's 'axon' TPU plugin.
    if _backend_up():
        on_accel = jax.default_backend() in ("tpu", "axon")
    else:
        on_accel = False
    if not on_accel:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from _train_program import make_loss_and_fwd_bwd
    from zipvoice_tpu.config import ZipVoiceConfig
    from zipvoice_tpu.models.zipvoice import init_zipvoice
    from zipvoice_tpu.nn.zipformer import set_remat_policy, set_scan_layers
    from zipvoice_tpu.train.scaled_adam import scaled_adam
    from zipvoice_tpu.train.schedules import zipvoice_schedules

    set_scan_layers(True)

    cfg = ZipVoiceConfig(vocab_size=700, pad_id=0)
    rng = np.random.default_rng(0)
    b, t = args.batch, args.frames
    batch = {
        "tokens": jnp.asarray(
            rng.integers(1, cfg.vocab_size, (b, 128)), jnp.int32),
        "tokens_lens": jnp.full((b,), 100, jnp.int32),
        "features": jnp.asarray(
            rng.standard_normal((b, t, cfg.feat_dim)), jnp.float32),
        "features_lens": jnp.full((b,), 1000, jnp.int32),
    }
    params = init_zipvoice(jax.random.PRNGKey(0), cfg)
    sched = zipvoice_schedules(10000.0, cfg)
    key = jax.random.PRNGKey(1)
    dtype = jnp.bfloat16

    # single-sourced in tools/_train_program.py: mirrors train/step.py's
    # loss_fn exactly, so the accounting covers the real training program
    _, fwd_bwd = make_loss_and_fwd_bwd(cfg, dtype)

    # persistent-state bytes that coexist with the step's temp buffers
    n_params = sum(int(np.prod(a.shape)) for a in jax.tree.leaves(params))
    opt = scaled_adam(clipping_scale=2.0)
    opt_state = opt.init(params)
    opt_bytes = sum(
        a.size * a.dtype.itemsize
        for a in jax.tree.leaves(opt_state)
        if hasattr(a, "dtype")
    )
    param_bytes = sum(
        a.size * a.dtype.itemsize for a in jax.tree.leaves(params))
    batch_bytes = sum(a.size * a.dtype.itemsize for a in jax.tree.leaves(batch))
    persistent = param_bytes + opt_bytes + batch_bytes

    out = {
        "_doc": __doc__.split("\n")[0],
        "backend": jax.devices()[0].platform,
        "device_kind": jax.devices()[0].device_kind,
        "shape": {"batch": b, "frames": t, "compute_dtype": "bfloat16"},
        "n_params": n_params,
        "persistent_bytes": {
            "params_f32": param_bytes,
            "scaled_adam_state": opt_bytes,
            "batch": batch_bytes,
            "total_gib": round(persistent / 2**30, 3),
        },
        "v5e_hbm_gib": V5E_HBM_GIB,
        "policies": {},
    }

    for name in args.policies.split(","):
        set_remat_policy(None if name == "full" else name)
        t0 = time.monotonic()
        try:
            compiled = jax.jit(fwd_bwd).lower(params, batch, key, sched).compile()
            ma = compiled.memory_analysis()
            temp = int(ma.temp_size_in_bytes)
            peak = int(getattr(ma, "peak_memory_in_bytes", 0))
            # grads (f32 params-shaped) are part of the program OUTPUT here;
            # in the real step they feed the optimizer in the same program
            fits = (persistent + temp + param_bytes) / 2**30 < V5E_HBM_GIB
            row = {
                "temp_gib": round(temp / 2**30, 3),
                "peak_program_gib": round(peak / 2**30, 3),
                "argument_gib": round(int(ma.argument_size_in_bytes) / 2**30, 3),
                "output_gib": round(int(ma.output_size_in_bytes) / 2**30, 3),
                "est_total_gib": round(
                    (persistent + temp + param_bytes) / 2**30, 3),
                "fits_v5e_16gib": bool(fits),
                "compile_s": round(time.monotonic() - t0, 1),
            }
        except Exception as e:  # noqa: BLE001 — record, keep going
            row = {"error": f"{type(e).__name__}: {str(e)[:300]}"}
        out["policies"][name] = row
        print(name, json.dumps(row), flush=True)

    set_remat_policy(None)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print("wrote", args.out)


def _backend_up(timeout_s: float = 60.0) -> bool:
    """Subprocess-probe the default backend (the tunnel hang can't be
    escaped in-process — CLAUDE.md 2026-08-17)."""
    import subprocess

    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; jax.devices(); print('OK')"],
            capture_output=True, text=True, timeout=timeout_s,
        )
        return r.returncode == 0 and "OK" in r.stdout
    except Exception:  # noqa: BLE001
        return False


if __name__ == "__main__":
    main()
