"""On-device breakdown of the 123M training step (default B=8, T=1024, bf16).

Times, as separate jitted programs (scan layers, regularizers
live — the exact bench._train_throughput configuration):
  1. loss forward only
  2. loss forward + backward (value_and_grad)
  3. full step (fwd + bwd + ScaledAdam update)  [the bench number]
  4. ScaledAdam update alone on fixed gradients
so the step budget splits into fwd / bwd / optimizer, and the remat
recompute cost is visible as (2) vs 3x(1).

--remat {full,all,dots,xprobs,xprobs_ff,names} selects the rematerialization
policy (nn.zipformer.set_remat_policy) for the A/B demanded by the r3
verdict; --batch/--frames pick the shape; --out the artifact path.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--remat", type=str, default="full",
                    choices=["full", "all", "dots", "xprobs", "xprobs_ff", "names"])
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--frames", type=int, default=1024)
    ap.add_argument("--bwd-shear-adj", type=str, default="matmul",
                    choices=["matmul", "flip", "rollw"],
                    help="attention-backward shear-adjoint formulation "
                         "(ops.attention.set_bwd_shear_adj A/B)")
    ap.add_argument("--no-reg", action="store_true",
                    help="stub the balancer/whiten regularizers to identity "
                         "(same program structure, RNG, and remat policy) — "
                         "pins their share of the fwd/bwd budget for the "
                         "bwd/fwd-ratio analysis (VERDICT r4 next #2)")
    ap.add_argument("--out", type=str,
                    default="/root/repo/PROFILE_train_r4.json")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_compilation")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

    import jax.numpy as jnp

    from _train_program import make_loss_and_fwd_bwd
    from zipvoice_tpu.config import ZipVoiceConfig
    from zipvoice_tpu.models.zipvoice import init_zipvoice
    from zipvoice_tpu.nn.zipformer import set_remat_policy, set_scan_layers
    from zipvoice_tpu.train.scaled_adam import apply_updates, scaled_adam
    from zipvoice_tpu.train.schedules import zipvoice_schedules
    from zipvoice_tpu.train.step import TrainConfig, make_train_step
    from zipvoice_tpu.utils.flops import peak_bf16_tflops, train_step_flops

    set_scan_layers(True)
    set_remat_policy(None if args.remat == "full" else args.remat)
    from zipvoice_tpu.ops.attention import set_bwd_shear_adj

    set_bwd_shear_adj(args.bwd_shear_adj)

    if args.no_reg:
        # identity-stub the stat regularizers at TRACE time: everything
        # else in the train program (masks, layer paths, remat, optimizer)
        # is unchanged, so (reg run) - (this run) pins the fwd+bwd cost of
        # the Balancer/Whiten custom-VJP stat ops alone.  RNG streams
        # shift (the stubs skip the gate draws) — irrelevant for timing.
        # Tool-only monkeypatch, never a library mode.
        from zipvoice_tpu.nn import zipformer as _zf

        _zf._maybe_balancer = lambda ctx, x, prob, **kw: x
        _zf._maybe_whiten = (
            lambda ctx, x, limit_key, grad_scale, **kw: x
        )

    cfg = ZipVoiceConfig(vocab_size=700, pad_id=0)
    rng = np.random.default_rng(0)
    b, t = args.batch, args.frames
    batch = {
        "tokens": rng.integers(1, cfg.vocab_size, (b, 128)).astype(np.int32),
        "tokens_lens": np.full((b,), 100, np.int32),
        "features": rng.standard_normal((b, t, cfg.feat_dim)).astype(np.float32),
        "features_lens": np.full((b,), 1000, np.int32),
    }
    dev_batch = {k: jnp.asarray(v) for k, v in batch.items()}
    params = init_zipvoice(jax.random.PRNGKey(0), cfg)
    opt = scaled_adam(clipping_scale=2.0)
    opt_state = opt.init(params)
    step = make_train_step(cfg, opt, TrainConfig(compute_dtype="bfloat16"))
    sched = zipvoice_schedules(10000.0, cfg)
    key = jax.random.PRNGKey(1)
    dtype = jnp.bfloat16
    results = {}

    # single-sourced in tools/_train_program.py: mirrors train/step.py's
    # loss_fn exactly (same RNG splits / masks / dtype)
    loss_fn, _fb = make_loss_and_fwd_bwd(cfg, dtype)

    def timeit(name, fn, n=10):
        """min-of-3 runs of an n-dispatch pipelined loop.  The r5 first
        capture showed single-loop numbers jitter ~±30% within one session
        (loss_fwd 26.9 vs 19.5 ms for the same program minutes apart —
        tunnel hiccups land inside the timed window); min-of-3 recovers
        the steady state the way bench.py's min-of-8 does."""
        t_c0 = time.monotonic()
        out = fn()
        float(np.asarray(jax.tree.leaves(out)[0], np.float32).ravel()[0])
        compile_s = time.monotonic() - t_c0

        def one_loop():
            t0 = time.monotonic()
            for _ in range(n):
                out = fn()
            float(np.asarray(
                jax.tree.leaves(out)[0], np.float32).ravel()[0])
            return (time.monotonic() - t0) / n

        per = min(one_loop() for _ in range(3))
        results[name] = {"ms": round(per * 1e3, 2),
                         "compile_s": round(compile_s, 1)}
        print(f"{name:24s} {per * 1e3:8.2f} ms  (compile {compile_s:.0f}s)",
              flush=True)
        return per

    fwd = jax.jit(loss_fn)
    fwd_bwd = jax.jit(_fb)

    # full_step donates params/opt_state: keep a live copy for the other
    # programs (donated buffers are invalidated after the first call)
    params_keep = jax.tree.map(lambda a: a + 0, params)
    state = {"params": params, "opt_state": opt_state}

    def full():
        p2, o2, m = step(state["params"], state["opt_state"], dev_batch, key,
                         np.int32(2), np.float32(0), sched)
        state["params"], state["opt_state"] = p2, o2
        return m["loss"]

    s_fwd = timeit("loss_fwd", lambda: fwd(params_keep, dev_batch, key, sched))
    s_fb = timeit("loss_fwd_bwd",
                  lambda: fwd_bwd(params_keep, dev_batch, key, sched))
    s_full = timeit("full_step", full)

    grads = jax.tree.map(lambda a: (a * 1e-3), params_keep)
    opt_state2 = opt.init(params_keep)

    @jax.jit
    def opt_only(p, o, g):
        updates, o2 = opt.update(g, o, p, jnp.float32(0.02))
        return apply_updates(p, updates), o2

    s_opt = timeit("scaled_adam_update",
                   lambda: opt_only(params_keep, opt_state2, grads))

    flops = train_step_flops(cfg, b, t, 128)
    peak = peak_bf16_tflops(jax.devices()[0].device_kind)
    results["_summary"] = {
        "bwd_minus_fwd_ms": round((s_fb - s_fwd) * 1e3, 2),
        "step_minus_fwdbwd_ms": round((s_full - s_fb) * 1e3, 2),
        "opt_only_ms": round(s_opt * 1e3, 2),
        "analytic_tflops": round(flops / 1e12, 3),
        "mfu_full_step": round(flops / s_full / 1e12 / peak, 4),
        "mfu_fwd_only": round((flops / 3) / s_fwd / 1e12 / peak, 4),
        "device": jax.devices()[0].device_kind,
        "remat_policy": args.remat,
        "bwd_shear_adj": args.bwd_shear_adj,
        "no_reg": bool(args.no_reg),
        "batch": b,
        "frames": t,
    }
    print(json.dumps(results["_summary"], indent=2), flush=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
