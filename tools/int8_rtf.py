"""int8 serving: on-device RTF + fidelity vs bf16.

Runs the 16-step CFG sampler (123M, 10 s request) three ways — bf16,
int8 weight-only, and int8 dynamic (weights AND per-row activation
scales, s8xs8->s32 on the MXU; ops/quant.py + nn.functional
set_int8_dynamic — the TPU counterpart of the reference's dynamic-int8
ONNX export, ref onnx_export.py:384-400) — and reports sampler wall time
plus mel MSE vs the bf16 baseline.  Writes INT8_RTF.json.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_compilation")
    import jax.numpy as jnp

    from zipvoice_tpu.config import FeatureConfig, ZipVoiceConfig
    from zipvoice_tpu.eval.metrics import mel_mse
    from zipvoice_tpu.models import zipvoice as zv
    from zipvoice_tpu.ops.quant import (
        cast_quantized_tree,
        quantize_linear_int8,
    )

    dtype = jnp.bfloat16
    cfg = ZipVoiceConfig(vocab_size=700, pad_id=0)
    feat_cfg = FeatureConfig()
    rng = np.random.default_rng(0)

    frame_rate = feat_cfg.sampling_rate / feat_cfg.hop_length
    total = 1024
    prompt_len = int(3.0 * frame_rate)
    cat = list(rng.integers(1, cfg.vocab_size, 160))
    tokens_padded = zv.pad_labels([cat], cfg.pad_id)
    pf = np.zeros((1, total, cfg.feat_dim), np.float32)
    pf[0, :prompt_len] = rng.standard_normal((prompt_len, cfg.feat_dim)) * 0.1
    noise = rng.standard_normal((1, total, cfg.feat_dim)).astype(np.float32)

    params = zv.init_zipvoice(jax.random.PRNGKey(0), cfg)
    params_bf16 = jax.tree.map(lambda a: jnp.asarray(a, dtype), params)
    params_int8 = cast_quantized_tree(
        quantize_linear_int8(jax.tree.map(np.asarray, params)), dtype
    )

    args = (
        tokens_padded, np.array([len(cat)], np.int32),
        jnp.asarray(pf, dtype), np.array([prompt_len], np.int32),
        np.array([938], np.int32), jnp.asarray(noise, dtype),
    )

    def run(p, n=8):
        fn = jax.jit(lambda p_, *a: zv.sample(
            p_, cfg, *a, num_step=16, guidance_scale=1.0, t_shift=0.5))
        out = fn(p, *args)
        float(np.asarray(out[0, 0, 0], np.float32))
        times = []
        for _ in range(n):
            t0 = time.monotonic()
            out = fn(p, *args)
            float(np.asarray(out[0, 0, 0], np.float32))
            times.append(time.monotonic() - t0)
        return np.asarray(out.astype(jnp.float32)), float(np.min(times))

    mel16, t16 = run(params_bf16)
    mel8, t8 = run(params_int8)

    # dynamic activation quantization (s8xs8->s32 on the MXU; the full
    # analogue of the reference's onnxruntime dynamic MatMul quant)
    from zipvoice_tpu.nn.functional import set_int8_dynamic

    set_int8_dynamic(True)
    try:
        mel8d, t8d = run(params_int8)
    finally:
        set_int8_dynamic(False)

    wav_secs = 938 * feat_cfg.hop_length / feat_cfg.sampling_rate
    gen = slice(prompt_len, 938)
    report = {
        "rtf_bf16": round(t16 / wav_secs, 5),
        "rtf_int8": round(t8 / wav_secs, 5),
        "rtf_int8_dynamic": round(t8d / wav_secs, 5),
        "mel_mse_int8_vs_bf16": float(f"{mel_mse(mel8[0, gen], mel16[0, gen]):.3e}"),
        "mel_mse_int8_dynamic_vs_bf16": float(
            f"{mel_mse(mel8d[0, gen], mel16[0, gen]):.3e}"),
        "param_bytes_bf16": int(sum(
            np.prod(a.shape) * a.dtype.itemsize
            for a in jax.tree.leaves(params_bf16))),
        "param_bytes_int8": int(sum(
            np.prod(a.shape) * a.dtype.itemsize
            for a in jax.tree.leaves(params_int8))),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(report, indent=2))
    with open("/root/repo/INT8_RTF.json", "w") as f:
        json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
