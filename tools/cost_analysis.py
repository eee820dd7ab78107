"""XLA cost analysis of the compiled TPU training programs (no execution).

AOT-lowers and compiles the profile_train loss programs (loss fwd, loss
fwd+bwd at B=8/T=1024, bf16, full remat, layers UNROLLED — see the
scan-undercount note in main()) against the TPU backend and reads
``compiled.cost_analysis()`` — flops and bytes accessed as XLA itself
accounts them.  This runs compile-side only, so
it works even while the chip's compute is degraded (r5 observed state),
and it answers the question the wall-clock A/Bs cannot: is the
backward's ~5x-of-forward cost FLOP-bound or HBM-bound?

Roofline arithmetic (v5e: 197 bf16 TFLOP/s, ~819 GB/s HBM):
  t_flops = flops / peak;  t_bytes = bytes / bw
whichever is larger is the bound; measured/bound = achieved fraction.

Writes COST_ANALYSIS_r5.json.  Compile cost ~2-4 min/program terminal-
side; persistent cache does not cover tunnel compiles.
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

import numpy as np

PEAK_TFLOPS = 197.0
HBM_GBPS = 819.0


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--nfe", action="store_true",
                    help="also analyze the eval fm_decoder NFE program "
                         "(B=2 CFG-doubled, T=1024, unfused defaults)")
    ap.add_argument("--out", default="/root/repo/COST_ANALYSIS_r5.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from _train_program import make_loss_and_fwd_bwd
    from zipvoice_tpu.config import ZipVoiceConfig
    from zipvoice_tpu.models.zipvoice import init_zipvoice
    from zipvoice_tpu.nn.zipformer import set_remat_policy, set_scan_layers
    from zipvoice_tpu.train.schedules import zipvoice_schedules

    # UNROLLED layers: XLA's cost_analysis counts a lax.scan body ONCE,
    # ignoring the trip count (verified on CPU: a 10-iteration scan of a
    # matmul reports the flops of one matmul), so the scanned-layer train
    # program under-reports flops/bytes ~3x.  Unrolling restores true
    # counts; the unrolled step's wall time is within ~5% of the scanned
    # one (docs/training.md), so rooflines computed here apply to both.
    set_scan_layers(False)
    set_remat_policy(None)  # full remat — the measured-optimal default

    cfg = ZipVoiceConfig(vocab_size=700, pad_id=0)
    rng = np.random.default_rng(0)
    b, t = 8, 1024
    batch = {
        "tokens": jnp.asarray(
            rng.integers(1, cfg.vocab_size, (b, 128)).astype(np.int32)),
        "tokens_lens": jnp.full((b,), 100, jnp.int32),
        "features": jnp.asarray(
            rng.standard_normal((b, t, cfg.feat_dim)).astype(np.float32)),
        "features_lens": jnp.full((b,), 1000, jnp.int32),
    }
    params = init_zipvoice(jax.random.PRNGKey(0), cfg)
    sched = zipvoice_schedules(10000.0, cfg)  # same point as profile_train
    key = jax.random.PRNGKey(1)

    loss_fn, fwd_bwd = make_loss_and_fwd_bwd(cfg, jnp.bfloat16)

    out = {"batch": b, "frames": t, "remat_policy": "full",
           "peak_bf16_tflops": PEAK_TFLOPS, "hbm_gbps": HBM_GBPS}

    for name, fn in (("loss_fwd", loss_fn), ("loss_fwd_bwd", fwd_bwd)):
        print(f"lower+compile {name} ...", flush=True)
        compiled = jax.jit(fn).lower(params, batch, key, sched).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, list):  # older jax returns [dict]
            ca = ca[0]
        flops = float(ca.get("flops", 0.0))
        byts = float(ca.get("bytes accessed", 0.0))
        t_flops_ms = flops / (PEAK_TFLOPS * 1e12) * 1e3
        t_bytes_ms = byts / (HBM_GBPS * 1e9) * 1e3
        row = {
            "xla_flops_g": round(flops / 1e9, 1),
            "xla_bytes_accessed_gib": round(byts / 2**30, 2),
            "roofline_flops_ms": round(t_flops_ms, 2),
            "roofline_bytes_ms": round(t_bytes_ms, 2),
            "bound": "hbm" if t_bytes_ms > t_flops_ms else "mxu",
            "arithmetic_intensity_flop_per_byte": (
                round(flops / byts, 1) if byts else None),
        }
        # a few interesting secondary counters when present
        # (XLA reports optimal_seconds as a negative sentinel on TPU/CPU
        # backends without a device model — drop it rather than publish
        # garbage like -173.98 in the committed artifact)
        for k in ("transcendentals", "optimal_seconds"):
            if k in ca and float(ca[k]) >= 0:
                row[k] = float(ca[k])
        out[name] = row
        print(json.dumps({name: row}), flush=True)

    if args.nfe:
        from zipvoice_tpu.nn import zipformer as zf

        zf.set_scan_layers(False)
        fcfg = cfg.fm_decoder_config()
        fparams = jax.tree.map(
            lambda a: a.astype(jnp.bfloat16),
            zf.init_tts_zipformer(jax.random.PRNGKey(0), fcfg))
        x_nfe = jnp.zeros((2, 1024, fcfg.in_dim), jnp.bfloat16)
        t_nfe = jnp.full((2,), 0.5, jnp.bfloat16)

        def nfe(p, x, tt):
            return zf.tts_zipformer_forward(p, fcfg, x, t=tt,
                                            padding_mask=None)

        print("lower+compile fm_decoder_NFE ...", flush=True)
        compiled = jax.jit(nfe).lower(fparams, x_nfe, t_nfe).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0))
        byts = float(ca.get("bytes accessed", 0.0))
        out["fm_decoder_NFE_B2_T1024"] = {
            "xla_flops_g": round(flops / 1e9, 1),
            "xla_bytes_accessed_gib": round(byts / 2**30, 3),
            "roofline_flops_ms": round(flops / (PEAK_TFLOPS * 1e12) * 1e3, 3),
            "roofline_bytes_ms": round(byts / (HBM_GBPS * 1e9) * 1e3, 3),
            "bound": ("hbm" if byts / HBM_GBPS > flops / (PEAK_TFLOPS * 1e3)
                      else "mxu"),
            "arithmetic_intensity_flop_per_byte": (
                round(flops / byts, 1) if byts else None),
        }
        print(json.dumps({"fm_decoder_NFE": out["fm_decoder_NFE_B2_T1024"]}),
              flush=True)

    if "loss_fwd" in out and "loss_fwd_bwd" in out:
        f, fb = out["loss_fwd"], out["loss_fwd_bwd"]
        out["bwd_only"] = {
            "xla_flops_g": round(
                fb["xla_flops_g"] - f["xla_flops_g"], 1),
            "xla_bytes_accessed_gib": round(
                fb["xla_bytes_accessed_gib"] - f["xla_bytes_accessed_gib"], 2),
            "roofline_flops_ms": round(
                fb["roofline_flops_ms"] - f["roofline_flops_ms"], 2),
            "roofline_bytes_ms": round(
                fb["roofline_bytes_ms"] - f["roofline_bytes_ms"], 2),
        }

    with open(args.out, "w") as fobj:
        json.dump(out, fobj, indent=1)
    print(json.dumps(out, indent=1), flush=True)


if __name__ == "__main__":
    main()
