"""Model export for deployment — the jax.export analogue of the reference's
ONNX path (ref zipvoice/bin/onnx_export.py).

The reference exports two ONNX graphs: OnnxTextModel (text encoder + uniform
duration expansion, ref :112-154) and OnnxFlowMatchingModel (one CFG-folded
fm_decoder step, ref :157-204), then loops the flow graph in Python at
inference (ref infer_zipvoice_onnx.py:357-377).  Here the SAME split is
serialized as StableHLO via jax.export — plus a third, fully-fused program
(text + N-step ODE) that has no host loop at all.  Artifacts are
``.stablehlo`` bytes loadable on any XLA backend via jax.export.deserialize.
"""

from __future__ import annotations

import argparse
import logging
from pathlib import Path

import numpy as np


def get_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model-name", type=str, default="zipvoice",
                   choices=["zipvoice", "zipvoice_distill"])
    p.add_argument("--model-dir", type=str, required=True)
    p.add_argument("--checkpoint-name", type=str, default="model.pt")
    p.add_argument("--out-dir", type=str, required=True)
    p.add_argument("--num-step", type=int, default=None)
    p.add_argument("--guidance-scale", type=float, default=None)
    p.add_argument("--t-shift", type=float, default=0.5)
    p.add_argument("--timesteps", type=str, default=None,
                   help="Explicit comma-separated Euler grid spanning [0,1] "
                        "(EPSS-style pruned schedules), baked into the "
                        "fused sampler program instead of "
                        "--num-step/--t-shift")
    p.add_argument("--max-tokens", type=int, default=256,
                   help="static token-axis size of the exported programs")
    p.add_argument("--max-frames", type=int, default=3072,
                   help="static frame-axis size (30s ~ 2812 frames)")
    p.add_argument("--dtype", type=str, default="float32",
                   choices=["float32", "bfloat16"])
    p.add_argument("--quantize", type=str, default=None,
                   choices=["int8", "int8-dynamic"],
                   help="int8 for linear layers — the TPU counterpart of "
                        "the reference's dynamic-int8 ONNX export (ref "
                        "onnx_export.py:384-400). 'int8' = weight-only "
                        "(bandwidth win, negligible quality cost); "
                        "'int8-dynamic' = also quantize activations per "
                        "row and run s8xs8->s32 on the MXU (2x bf16 peak), "
                        "the full dynamic-quant analogue")
    return p


def main():
    args = get_parser().parse_args()
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")

    import jax
    import jax.numpy as jnp

    from zipvoice_tpu.io.model_dir import load_model_dir

    assets = load_model_dir(
        model_dir=args.model_dir, model_name=args.model_name,
        checkpoint_name=args.checkpoint_name,
    )
    cfg = assets.model_cfg
    defaults = assets.defaults
    num_step = args.num_step or defaults["num_step"]
    timesteps = (
        tuple(float(x) for x in args.timesteps.split(","))
        if args.timesteps else None
    )
    gs = args.guidance_scale if args.guidance_scale is not None else defaults[
        "guidance_scale"]
    distill = defaults["distill"]
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    if args.quantize in ("int8", "int8-dynamic"):
        from zipvoice_tpu.ops.quant import (
            cast_quantized_tree,
            quantize_linear_int8,
            quantized_bytes,
        )

        before = quantized_bytes(assets.params)
        params = quantize_linear_int8(assets.params)
        logging.info("%s quantization: %.1f MB -> %.1f MB", args.quantize,
                     before / 1e6, quantized_bytes(params) / 1e6)
        # single-sourced cast policy: int8 weights stay int8, per-channel
        # scales stay f32 (they feed the f32 accumulator epilogue), other
        # leaves follow --dtype
        params = cast_quantized_tree(params, dtype)
    else:
        params = jax.tree.map(lambda a: jnp.asarray(a, dtype), assets.params)

    # trace-time binding: every program exported below bakes the
    # dynamic-activation path in; reset on the way out so an in-process
    # caller (tests) doesn't leak the mode into later traces
    from zipvoice_tpu.nn.functional import set_int8_dynamic

    if args.quantize == "int8-dynamic":
        set_int8_dynamic(True)
    try:
        _export_programs(args, params, cfg, dtype, distill, num_step, gs,
                         timesteps)
    finally:
        set_int8_dynamic(False)


def _export_programs(args, params, cfg, dtype, distill, num_step, gs,
                     timesteps):
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    from zipvoice_tpu.models import zipvoice as zv

    s, t, f = args.max_tokens, args.max_frames, cfg.feat_dim
    out_dir = Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    def save(name, fn, specs):
        exp = jexport.export(jax.jit(fn))(*specs)
        data = exp.serialize()
        (out_dir / f"{name}.stablehlo").write_bytes(data)
        logging.info("exported %s (%d KB)", name, len(data) // 1024)

    spec = lambda shape, dt=dtype: jax.ShapeDtypeStruct(shape, dt)  # noqa: E731

    # 1. text model: embed + text encoder + uniform duration expansion
    #    (ref onnx_export.py:112-154)
    def text_model(tokens, tokens_lens, features_lens):
        embed = zv.forward_text_embed(params, cfg, tokens, tokens_lens, dtype)
        cond, _ = zv.forward_text_condition(embed, tokens_lens, features_lens, t)
        return cond

    save("text_model", text_model,
         (spec((1, s), jnp.int32), spec((1,), jnp.int32), spec((1,), jnp.int32)))

    # 2. one CFG-folded flow-matching step (ref onnx_export.py:157-204);
    #    t is a runtime input so one program serves the host-looped solver
    def fm_step(t_scalar, xt, text_cond, speech_cond, padding_mask):
        if distill:
            return zv.forward_fm_decoder(
                params, cfg, t_scalar, xt, text_cond, speech_cond,
                padding_mask, guidance_scale=jnp.float32(gs),
            )
        from zipvoice_tpu.models.distill import _cfg_velocity_traced_t

        return _cfg_velocity_traced_t(
            params, cfg, t_scalar, xt, text_cond, speech_cond, padding_mask,
            jnp.float32(gs),
        )

    save("fm_decoder_step", fm_step,
         (spec((), jnp.float32), spec((1, t, f)), spec((1, t, f)),
          spec((1, t, f)), spec((1, t), jnp.bool_)))

    # 3. fully-fused sampler: text + N-step ODE in one program (no host loop)
    def sampler(tokens, tokens_lens, prompt_features, prompt_features_lens,
                features_lens, noise):
        return zv.sample(
            params, cfg, tokens, tokens_lens, prompt_features,
            prompt_features_lens, features_lens, noise,
            num_step=num_step, guidance_scale=gs, t_shift=args.t_shift,
            distill=distill, timesteps=timesteps,
        )

    save("sampler_fused", sampler,
         (spec((1, s), jnp.int32), spec((1,), jnp.int32), spec((1, t, f)),
          spec((1,), jnp.int32), spec((1,), jnp.int32), spec((1, t, f))))

    logging.info("done: %s", out_dir)


if __name__ == "__main__":
    main()
