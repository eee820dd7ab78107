"""On-device module-level profile of the fm_decoder serving step.

Times each Zipformer submodule in isolation at the exact serving shapes
(123M config, CFG-doubled batch B=2, frame bucket T=1024) by chaining N
iterations through a ``lax.scan`` (same trick as bench._vocoder_on_chip:
the remote-tunnel dispatch latency amortizes away, so per-iteration time
is true on-chip compute).  Each module's output feeds the next iteration's
input so XLA cannot hoist or dead-code the body.

Reports measured us/call, analytic GEMM GFLOPs (utils/flops.py
conventions), achieved TFLOP/s, and percent of bf16 peak — then
reconstructs the per-NFE budget from the per-module numbers and compares
it against the directly measured full forward, so the "unexplained"
residual (glue: downsample/upsample, bypass, norms, embeds) is explicit.

--fused-eval/--fused-conv A/B the round-4 eval fusions (deferred-probs
attention + fused conv middle); --out picks the artifact path (default
PROFILE_r4.json).  Run with a generous timeout: ~20 small programs
compile terminal-side on the tunnel.
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
    ap.add_argument("--fused-eval", choices=["on", "off"], default="on")
    ap.add_argument("--fused-conv", choices=["on", "off"], default="on")
    ap.add_argument("--probs-apply", choices=["on", "off"], default="on",
                    help="lane-padded Pallas shared-probs consume in the "
                         "SelfAttention modules (zf.set_probs_apply)")
    ap.add_argument("--out", type=str, default="/root/repo/PROFILE_r4.json")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_compilation")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

    import jax.numpy as jnp

    from zipvoice_tpu.config import ZipVoiceConfig
    from zipvoice_tpu.nn import zipformer as zf
    from zipvoice_tpu.nn.functional import compact_rel_positional_encoding
    from zipvoice_tpu.utils.flops import peak_bf16_tflops

    zf.set_scan_layers(False)
    zf.set_fused_eval(args.fused_eval == "on")
    zf.set_fused_conv(args.fused_conv == "on")
    zf.set_probs_apply(args.probs_apply == "on")

    dtype = jnp.bfloat16
    model_cfg = ZipVoiceConfig(vocab_size=700, pad_id=0)
    cfg = model_cfg.fm_decoder_config()
    B = 2  # CFG doubling
    D = cfg.encoder_dim
    H = cfg.num_heads
    QD, VD, PD = cfg.query_head_dim, cfg.value_head_dim, cfg.pos_head_dim
    FF = cfg.feedforward_dim

    key = jax.random.PRNGKey(0)
    params = zf.init_tts_zipformer(key, cfg)
    params = jax.tree.map(lambda a: a.astype(dtype), params)

    device_kind = jax.devices()[0].device_kind
    peak = peak_bf16_tflops(device_kind)

    results = {}

    def timed_scan(name, body, x0, n=64, gflops=None):
        """body: carry -> carry.  Returns per-call seconds.

        Two-point measurement: the same scanned body at length n and 4n,
        per-call time = slope between them.  The remote-tunnel dispatch +
        readback is a large constant (~tens of ms) per program execution;
        dividing a single run by n leaves a floor of constant/n that
        swamps sub-millisecond modules — the slope cancels it exactly.
        """

        def make(length):
            @jax.jit
            def chained(x):
                out, _ = jax.lax.scan(
                    lambda c, _: (body(c), None), x, None, length=length
                )
                return out

            return chained

        c1, c4 = make(n), make(4 * n)

        def run(fn):
            t0 = time.monotonic()
            o = fn(x0)
            # forced host readback: block_until_ready alone can
            # under-measure over the tunnel
            leaf = jax.tree.leaves(o)[0]
            float(np.asarray(leaf, np.float32).ravel()[0])
            return time.monotonic() - t0

        t_c0 = time.monotonic()
        run(c1)
        run(c4)
        compile_s = time.monotonic() - t_c0
        t1 = min(run(c1) for _ in range(5))
        t4 = min(run(c4) for _ in range(5))
        per = max(t4 - t1, 1e-9) / (3 * n)
        row = {
            "us": round(per * 1e6, 2),
            "dispatch_floor_ms": round((t1 - per * n) * 1e3, 1),
            "compile_s": round(compile_s, 1),
        }
        if gflops is not None:
            tf = gflops / 1e3 / per
            row["gflops"] = round(gflops, 2)
            row["tflops_per_s"] = round(tf, 1)
            row["pct_peak"] = round(100 * tf / peak, 1)
        results[name] = row
        print(f"{name:34s} {per * 1e6:9.1f} us"
              + (f"  {row['tflops_per_s']:7.1f} TF/s  {row['pct_peak']:5.1f}%"
                 if gflops is not None else ""),
              flush=True)
        return per

    rng = np.random.default_rng(0)

    def x_at(t, d=D):
        return jnp.asarray(rng.standard_normal((B, t, d)) * 0.3, dtype)

    # ---- per-module GEMM FLOP models (match utils/flops conventions) ----
    def ff_gflops(t):
        return 2 * B * t * D * FF * 2 / 1e9

    def probs_gflops(t):
        qk = 2 * B * t * t * H * QD
        pos = 2 * B * t * (2 * t - 1) * H * PD
        proj = 2 * B * t * D * (2 * H * QD + H * PD)
        pe = 2 * (2 * t - 1) * cfg.pos_dim * H * PD
        return (qk + pos + proj + pe) / 1e9

    def selfattn_gflops(t):
        proj = 2 * B * t * D * H * VD * 2  # in_proj + out_proj
        av = 2 * B * H * t * t * VD
        return (proj + av) / 1e9

    def nonlin_gflops(t):
        proj = 2 * B * t * D * (3 * (H * VD) + H * VD)  # in 3x192, out 192
        av = 2 * B * t * t * (H * VD)
        return (proj + av) / 1e9

    def conv_gflops(t, k):
        proj = 2 * B * t * D * (2 * D + D)  # in_proj 2D, out_proj D
        dw = 2 * B * t * k * D
        return (proj + dw) / 1e9

    def layer_gflops(t, k):
        return (3 * ff_gflops(t) + probs_gflops(t) + 2 * selfattn_gflops(t)
                + nonlin_gflops(t) + 2 * conv_gflops(t, k))

    # stacks: (ds, n_layers, kernel); T=1024 bucket
    stacks = list(zip(cfg.downsampling_factor, cfg.num_encoder_layers,
                      cfg.cnn_module_kernel))

    # ---- 1. full NFE forward (the anchor) ----
    t_full = 1024
    in_dim = cfg.in_dim  # 300

    def nfe_body(x):
        out = zf.tts_zipformer_forward(
            params, cfg, x, t=jnp.full((B,), 0.5, dtype),
            padding_mask=None,
        )
        return x * jnp.asarray(0.999, dtype) + jnp.tile(out, (1, 1, 3)).astype(dtype)

    nfe_gf = sum(n * layer_gflops(t_full // ds, k) for ds, n, k in stacks)
    # in/out proj + time embed glue
    nfe_gf += 2 * B * t_full * in_dim * D / 1e9 + 2 * B * t_full * D * cfg.out_dim / 1e9
    nfe_s = timed_scan("fm_decoder_NFE(B2,T1024)", nfe_body,
                       x_at(t_full, in_dim), n=32, gflops=nfe_gf)

    # ---- 2. full encoder layer at each ds level ----
    layer_s = {}
    for t, k, tag in ((1024, 31, "ds1"), (512, 15, "ds2"), (256, 7, "ds4")):
        pos = compact_rel_positional_encoding(t, cfg.pos_dim)
        lp = params["encoders"]["0"]["layers"]["0"] if tag == "ds1" else (
            params["encoders"]["1"]["encoder"]["layers"]["0"] if tag == "ds2"
            else params["encoders"]["2"]["encoder"]["layers"]["0"])
        te = jnp.zeros((B, D), dtype)

        def layer_body(x, lp=lp, pos=pos, te=te):
            return zf._encoder_layer(lp, cfg, x, pos, te, None, None)

        layer_s[tag] = timed_scan(
            f"encoder_layer({tag},T{t},K{k})", layer_body, x_at(t), n=64,
            gflops=layer_gflops(t, k))

    # ---- 3. submodules at ds=1 (T=1024) and ds=4 (T=256) ----
    for t, k, tag in ((1024, 31, "ds1"), (256, 7, "ds4")):
        pos = compact_rel_positional_encoding(t, cfg.pos_dim)
        lp = (params["encoders"]["0"]["layers"]["0"] if tag == "ds1"
              else params["encoders"]["2"]["encoder"]["layers"]["0"])
        probs0 = jnp.asarray(
            rng.dirichlet(np.ones(t), (B, H, t)), dtype)

        def probs_body(x, lp=lp, pos=pos):
            pr = zf._attention_weights(lp["self_attn_weights"], cfg, x, pos,
                                       None, None)
            return x * jnp.asarray(0.999, dtype) + jnp.mean(
                pr, axis=(1, 3))[..., None].astype(dtype)

        def sa_body(x, lp=lp, probs0=probs0):
            return zf._self_attention(lp["self_attn1"], cfg, x, probs0, None)

        def na_body(x, lp=lp, probs0=probs0):
            return zf._nonlin_attention(lp["nonlin_attention"], x,
                                        probs0[:, 0], None)

        def conv_body(x, lp=lp):
            return zf._conv_module(lp["conv_module1"], x, None, None)

        def ff_body(x, lp=lp):
            return zf._feedforward(lp["feed_forward1"], x, None)

        nn = 128 if t >= 1024 else 256
        timed_scan(f"attn_probs({tag},T{t})", probs_body, x_at(t), n=nn,
                   gflops=probs_gflops(t))
        timed_scan(f"self_attn({tag},T{t})", sa_body, x_at(t), n=nn,
                   gflops=selfattn_gflops(t))
        timed_scan(f"nonlin_attn({tag},T{t})", na_body, x_at(t), n=nn,
                   gflops=nonlin_gflops(t))
        timed_scan(f"conv_module({tag},T{t},K{k})", conv_body, x_at(t), n=nn,
                   gflops=conv_gflops(t, k))
        timed_scan(f"feedforward({tag},T{t})", ff_body, x_at(t), n=nn,
                   gflops=ff_gflops(t))

        if args.fused_eval == "on":
            # round-4 fused-eval rows: projections + probs_consume kernel +
            # out proj (replaces attn_probs + self_attn reads), and the
            # head-0 tile-recompute nonlin path
            def sa_fused_body(x, lp=lp, pos=pos):
                q, kk_, pq, pe, _ = zf._attention_projections(
                    lp["self_attn_weights"], cfg, x, pos, None
                )
                bundle = zf._EvalAttn(q, kk_, pq, pe, None)
                out, probs = zf._self_attention(
                    lp["self_attn1"], cfg, x, bundle, None
                )
                return out + jnp.mean(probs, axis=(1, 3))[..., None].astype(
                    dtype
                ) * jnp.asarray(1e-3, dtype)

            def na_fused_body(x, lp=lp, pos=pos):
                q, kk_, pq, pe, _ = zf._attention_projections(
                    lp["self_attn_weights"], cfg, x, pos, None
                )
                bundle = zf._EvalAttn(q, kk_, pq, pe, None)
                return zf._nonlin_attention(
                    lp["nonlin_attention"], x, bundle, None
                )

            timed_scan(f"probs_consume_sa1({tag},T{t})", sa_fused_body,
                       x_at(t), n=nn,
                       gflops=probs_gflops(t) + selfattn_gflops(t))
            timed_scan(f"head0_consume_na({tag},T{t})", na_fused_body,
                       x_at(t), n=nn,
                       gflops=probs_gflops(t) / H + nonlin_gflops(t))

    # ---- glue, measured DIRECTLY (r5): the full forward with ZERO layers
    # per stack — in/out proj, time-embed MLP, per-stack pos-emb + time
    # linears, and all three down/up/bypass wrappers, i.e. everything the
    # per-layer reconstruction cannot see.  The r5 unfused profile left
    # 739.6 us (18.5%) unattributed; this row pins how much of that is
    # real wrapper compute vs layer-sum underestimate.
    import dataclasses

    cfg0 = dataclasses.replace(
        cfg, num_encoder_layers=(0,) * len(cfg.num_encoder_layers)
    )
    params0 = jax.tree.map(
        lambda a: a.astype(dtype), zf.init_tts_zipformer(key, cfg0)
    )

    def glue_only_body(x):
        out = zf.tts_zipformer_forward(
            params0, cfg0, x, t=jnp.full((B,), 0.5, dtype),
            padding_mask=None,
        )
        return x * jnp.asarray(0.999, dtype) + jnp.tile(out, (1, 1, 3)).astype(dtype)

    timed_scan("nfe_glue_only(0layers,T1024)", glue_only_body,
               x_at(t_full, in_dim), n=128)

    # full ds=2 stack (wrapper + its 2 layers) in context: stack_minus_
    # layers = per-stack overhead as the real forward pays it (pos-emb,
    # stack time linear, ds/us/bypass, any layout transitions)
    te_mlp = jnp.zeros((B, cfg.time_embed_dim), dtype)

    def stack2_body(x):
        return zf._downsampled_encoder_stack(
            params["encoders"]["1"], cfg, 1, x, te_mlp, None
        )

    timed_scan("stack_full(ds2,T1024)", stack2_body, x_at(1024), n=64,
               gflops=cfg.num_encoder_layers[1] * layer_gflops(512, 15))

    # ---- glue: down/up-sample + out_combiner bypass of one ds=2 stack,
    # with the inner encoder replaced by identity (isolates wrapper cost) ----
    sp2 = params["encoders"]["1"]

    def glue_body(x):
        ds = 2
        src_orig = x
        xd = zf._downsample(sp2["downsample"], x, ds)
        xu = zf._upsample(xd, ds, x.shape[1])
        return zf._bypass(sp2["out_combiner"], src_orig, xu, None)

    timed_scan("ds_us_bypass(ds2,T1024)", glue_body, x_at(1024), n=256)

    # pos-emb generation per stack call (computed at trace time? no — runtime)
    def pos_body(x):
        pe = compact_rel_positional_encoding(1024, cfg.pos_dim)
        return x * jnp.asarray(0.999, dtype) + jnp.sum(pe).astype(dtype) * 1e-9

    timed_scan("pos_encoding(T1024)", pos_body, x_at(1024), n=256)

    # ---- reconstruction (layer counts derived from the config) ----
    n_by_ds = {}
    for ds, n, _k in stacks:
        n_by_ds[ds] = n_by_ds.get(ds, 0) + n
    recon = (n_by_ds.get(1, 0) * layer_s["ds1"]
             + n_by_ds.get(2, 0) * layer_s["ds2"]
             + n_by_ds.get(4, 0) * layer_s["ds4"])
    results["_summary"] = {
        "nfe_measured_us": round(nfe_s * 1e6, 1),
        "nfe_from_layers_us": round(recon * 1e6, 1),
        "glue_residual_us": round((nfe_s - recon) * 1e6, 1),
        "glue_residual_pct": round(100 * (nfe_s - recon) / nfe_s, 1),
        "sampler_16step_est_ms": round(16 * nfe_s * 1e3, 2),
        "device": device_kind,
        "peak_bf16_tflops": peak,
        "fused_eval": args.fused_eval,
        "fused_conv": args.fused_conv,
        "probs_apply": args.probs_apply,
    }
    print(json.dumps(results["_summary"], indent=2), flush=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
