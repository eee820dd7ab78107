"""jax.export round trip of the deployment programs (tiny model, CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from zipvoice_tpu.config import ZipVoiceConfig
from zipvoice_tpu.models import zipvoice as zv

TINY = dict(
    fm_decoder_downsampling_factor=(1, 2, 1),
    fm_decoder_num_layers=(1, 1, 1),
    fm_decoder_cnn_module_kernel=(9, 7, 9),
    fm_decoder_feedforward_dim=96,
    fm_decoder_num_heads=2,
    fm_decoder_dim=64,
    text_encoder_num_layers=1,
    text_encoder_feedforward_dim=48,
    text_encoder_cnn_module_kernel=5,
    text_encoder_num_heads=2,
    text_encoder_dim=48,
    time_embed_dim=32,
    text_embed_dim=48,
    query_head_dim=8,
    value_head_dim=8,
    pos_head_dim=4,
    pos_dim=48,
    feat_dim=16,
    vocab_size=40,
    pad_id=0,
)


def test_export_sampler_roundtrip(tmp_path):
    from jax import export as jexport

    cfg = ZipVoiceConfig(**TINY)
    params = zv.init_zipvoice(jax.random.PRNGKey(0), cfg)
    s, t, f = 12, 32, cfg.feat_dim

    def sampler(tokens, tokens_lens, pf, pfl, fl, noise):
        return zv.sample(params, cfg, tokens, tokens_lens, pf, pfl, fl,
                         noise, num_step=2, guidance_scale=1.0, t_shift=0.5)

    spec = lambda shape, dt=jnp.float32: jax.ShapeDtypeStruct(shape, dt)  # noqa: E731
    exp = jexport.export(jax.jit(sampler))(
        spec((1, s), jnp.int32), spec((1,), jnp.int32), spec((1, t, f)),
        spec((1,), jnp.int32), spec((1,), jnp.int32), spec((1, t, f)),
    )
    data = exp.serialize()
    (tmp_path / "sampler.stablehlo").write_bytes(data)

    back = jexport.deserialize(
        bytearray((tmp_path / "sampler.stablehlo").read_bytes())
    )
    rng = np.random.default_rng(0)
    args = (
        rng.integers(1, 40, (1, s)).astype(np.int32),
        np.array([10], np.int32),
        (rng.standard_normal((1, t, f)) * 0.1).astype(np.float32),
        np.array([8], np.int32),
        np.array([28], np.int32),
        rng.standard_normal((1, t, f)).astype(np.float32),
    )
    direct = np.asarray(jax.jit(sampler)(*args))
    loaded = np.asarray(back.call(*args))
    np.testing.assert_allclose(loaded, direct, atol=1e-5)


def test_int8_weight_only_quantization():
    """Quantized sampler (a) really shrinks the tree, (b) leaves embeddings/
    depthwise convs untouched, (c) stays close to f32 output, (d) round-trips
    through dequantize."""
    from zipvoice_tpu.ops.quant import (
        dequantize_linear_int8,
        quantize_linear_int8,
        quantized_bytes,
    )

    cfg = ZipVoiceConfig(**TINY)
    params = jax.tree.map(np.asarray, zv.init_zipvoice(jax.random.PRNGKey(0), cfg))
    qparams = quantize_linear_int8(params, min_elems=256)

    assert quantized_bytes(qparams) < 0.55 * quantized_bytes(params)
    assert "weight" in qparams["embed"]  # embeddings not quantized
    flat = []

    def walk(d, p=""):
        if isinstance(d, dict):
            for k, v in d.items():
                walk(v, f"{p}.{k}")
        else:
            flat.append(p)

    walk(qparams)
    assert any("weight_int8" in p for p in flat)
    assert not any("depthwise_conv" in p and "int8" in p for p in flat)

    # forward comparison on the same noise
    rng = np.random.default_rng(0)
    cat = list(rng.integers(1, cfg.vocab_size, 12))
    tokens = zv.pad_labels([cat], cfg.pad_id)
    total, prompt_len, f = 64, 16, cfg.feat_dim
    pf = np.zeros((1, total, f), np.float32)
    pf[0, :prompt_len] = rng.standard_normal((prompt_len, f)) * 0.1
    noise = rng.standard_normal((1, total, f)).astype(np.float32)

    def run(p):
        return np.asarray(zv.sample(
            p, cfg, tokens, np.array([len(cat)], np.int32), pf,
            np.array([prompt_len], np.int32), np.array([total], np.int32),
            noise, num_step=2, guidance_scale=1.0, t_shift=0.5,
        ))

    ref = run(params)
    quant = run(qparams)
    assert np.isfinite(quant).all()
    mse = float(np.mean((ref - quant) ** 2))
    assert mse < 5e-3, mse  # int8 weight-only error budget

    # dequantized tree runs the normal path and matches the quantized one
    deq = run(dequantize_linear_int8(qparams))
    assert float(np.mean((deq - quant) ** 2)) < 1e-9


def test_int8_dynamic_activation_quantization():
    """set_int8_dynamic(True): linear() quantizes activations per row and
    runs s8xs8->s32 (the full dynamic-quant analogue of the reference's
    onnxruntime path, ref onnx_export.py:384-400).  (a) the unit matmul
    stays within the 8-bit error envelope, (b) the end-to-end 2-step sample
    stays finite and close to f32, (c) the mode resets cleanly."""
    from zipvoice_tpu.nn import functional as F
    from zipvoice_tpu.ops.quant import quantize_linear_int8

    rng = np.random.default_rng(0)
    w = rng.standard_normal((96, 64)).astype(np.float32)
    x = (rng.standard_normal((4, 7, 96)) * 2.0).astype(np.float32)
    qp = quantize_linear_int8({"lin": {"weight": w}}, min_elems=1)["lin"]
    ref = x.reshape(-1, 96) @ w

    F.set_int8_dynamic(True)
    try:
        out = np.asarray(F.linear(qp, jnp.asarray(x))).reshape(-1, 64)
        # the int8 dot really is baked into the traced program
        # (StableHLO spells the types i8/i32)
        hlo = jax.jit(lambda a: F.linear(qp, a)).lower(jnp.asarray(x)).as_text()
        assert "i8" in hlo and "i32" in hlo, hlo[:800]
    finally:
        F.set_int8_dynamic(False)
    # 8-bit error envelope, relative to the output scale: accumulating
    # in_dim=96 products of two 8-bit-rounded operands gives error
    # ~ sqrt(96)/2 * s_x * s_w << the output rms
    rel = np.abs(out - ref) / np.std(ref)
    assert float(rel.max()) < 0.05, rel.max()

    # end-to-end tiny sample
    cfg = ZipVoiceConfig(**TINY)
    params = jax.tree.map(np.asarray,
                          zv.init_zipvoice(jax.random.PRNGKey(0), cfg))
    qparams = quantize_linear_int8(params, min_elems=256)
    cat = list(rng.integers(1, cfg.vocab_size, 12))
    tokens = zv.pad_labels([cat], cfg.pad_id)
    total, prompt_len, f = 64, 16, cfg.feat_dim
    pf = np.zeros((1, total, f), np.float32)
    pf[0, :prompt_len] = rng.standard_normal((prompt_len, f)) * 0.1
    noise = rng.standard_normal((1, total, f)).astype(np.float32)

    def run(p):
        return np.asarray(zv.sample(
            p, cfg, tokens, np.array([len(cat)], np.int32), pf,
            np.array([prompt_len], np.int32), np.array([total], np.int32),
            noise, num_step=2, guidance_scale=1.0, t_shift=0.5,
        ))

    ref_out = run(params)
    F.set_int8_dynamic(True)
    try:
        dyn = run(qparams)
    finally:
        F.set_int8_dynamic(False)
    assert np.isfinite(dyn).all()
    mse = float(np.mean((ref_out - dyn) ** 2))
    assert mse < 2e-2, mse  # dynamic-quant error budget (weights AND acts)

    # mode reset: the same tree now takes the weight-only path again
    wonly = run(qparams)
    assert float(np.mean((wonly - ref_out) ** 2)) < 5e-3


@pytest.mark.parametrize("quantize", ["int8", "int8-dynamic"])
def test_export_cli_int8(tmp_path, monkeypatch, quantize):
    """export_model --quantize int8[-dynamic] produces a loadable StableHLO
    sampler."""
    import json
    import sys

    import torch

    from jax import export as jexport

    from zipvoice_tpu.bin import export_model
    from zipvoice_tpu.io.checkpoint import params_to_state_dict
    from zipvoice_tpu.text.tokenizer import write_token_file

    cfg = ZipVoiceConfig(**TINY)
    params = zv.init_zipvoice(jax.random.PRNGKey(0), cfg)
    sd = {k: torch.from_numpy(np.asarray(v))
          for k, v in params_to_state_dict(params).items()}
    torch.save({"model": sd}, tmp_path / "model.pt")
    raw = {k: list(v) if isinstance(v, tuple) else v for k, v in TINY.items()
           if k not in ("vocab_size", "pad_id")}
    (tmp_path / "model.json").write_text(json.dumps(
        {"model": raw, "feature": {"sampling_rate": 24000, "type": "vocos",
                                   "n_mels": 16}}))
    token2id = {"_": 0}
    for i in range(1, 40):
        token2id[f"tk{i}"] = i
    write_token_file(token2id, str(tmp_path / "tokens.txt"))

    out = tmp_path / "exported"
    monkeypatch.setattr(sys, "argv", [
        "export_model", "--model-dir", str(tmp_path), "--out-dir", str(out),
        "--num-step", "2", "--max-tokens", "16", "--max-frames", "64",
        "--quantize", quantize,
    ])
    export_model.main()

    exp = jexport.deserialize((out / "sampler_fused.stablehlo").read_bytes())
    rng = np.random.default_rng(0)
    tokens = np.zeros((1, 16), np.int32)
    tokens[0, :8] = rng.integers(1, 40, 8)
    res = exp.call(
        tokens, np.array([8], np.int32),
        np.zeros((1, 64, 16), np.float32), np.array([16], np.int32),
        np.array([64], np.int32),
        rng.standard_normal((1, 64, 16)).astype(np.float32),
    )
    assert np.isfinite(np.asarray(res)).all()


@pytest.mark.parametrize("mode", ["fused", "host-loop"])
def test_infer_exported_cli_end_to_end(tmp_path, monkeypatch, mode):
    """Full deployment loop: export_model -> bin/infer_exported (the
    onnxruntime-path equivalent) synthesizes a wav from the StableHLO
    artifacts — fused single-program mode AND the host Euler loop that
    mirrors the reference's ONNX flow (ref infer_zipvoice_onnx.py:357-377)."""
    import json
    import sys

    import torch

    from zipvoice_tpu.audio.vocos import VocosConfig, init_vocos
    from zipvoice_tpu.audio.wav import read_wav, write_wav
    from zipvoice_tpu.bin import export_model, infer_exported
    from zipvoice_tpu.io.checkpoint import params_to_state_dict
    from zipvoice_tpu.text.tokenizer import write_token_file

    cfg = ZipVoiceConfig(**TINY)
    params = zv.init_zipvoice(jax.random.PRNGKey(0), cfg)
    sd = {k: torch.from_numpy(np.asarray(v))
          for k, v in params_to_state_dict(params).items()}
    torch.save({"model": sd}, tmp_path / "model.pt")
    raw = {k: list(v) if isinstance(v, tuple) else v for k, v in TINY.items()
           if k not in ("vocab_size", "pad_id")}
    (tmp_path / "model.json").write_text(json.dumps(
        {"model": raw, "feature": {"sampling_rate": 24000, "type": "vocos",
                                   "n_mels": 16}}))
    tokens = {"_": 0, " ": 1}
    for i, ch in enumerate("abcdefghijklmnopqrstuvwxyz"):
        tokens[ch] = i + 2
    write_token_file(tokens, str(tmp_path / "tokens.txt"))

    out = tmp_path / "exported"
    monkeypatch.setattr(sys, "argv", [
        "export_model", "--model-dir", str(tmp_path), "--out-dir", str(out),
        "--num-step", "2", "--max-tokens", "32", "--max-frames", "128",
    ])
    export_model.main()

    # tiny vocos ckpt in torch layout (same as test_pipeline)
    vcfg = VocosConfig(input_channels=16, dim=32, intermediate_dim=64,
                       num_layers=2, n_fft=64, hop_length=16)
    vparams = init_vocos(jax.random.PRNGKey(3), vcfg)

    def to_sd(tree, prefix=""):
        o = {}
        for k, v in tree.items():
            name = f"{prefix}.{k}" if prefix else k
            if isinstance(v, dict):
                o.update(to_sd(v, name))
            else:
                arr = np.asarray(v)
                if name.endswith("embed.weight") and arr.ndim == 3:
                    arr = np.transpose(arr, (2, 1, 0))
                elif name.endswith("dwconv.weight") and arr.ndim == 2:
                    arr = np.transpose(arr)[:, None, :]
                elif name.endswith(".weight") and arr.ndim == 2:
                    arr = np.transpose(arr)
                o[name] = torch.from_numpy(arr.copy())
        return o

    torch.save(to_sd(vparams), tmp_path / "vocos.bin")
    rng = np.random.default_rng(0)
    write_wav(tmp_path / "p.wav",
              (rng.standard_normal((1, 8000)) * 0.05).astype(np.float32),
              24000)

    import zipvoice_tpu.models.pipeline as pl_mod

    orig_init = pl_mod.ZipVoicePipeline.__init__

    def patched_init(self, *a, **kw):
        kw["vocos_cfg"] = vcfg
        orig_init(self, *a, **kw)

    monkeypatch.setattr(pl_mod.ZipVoicePipeline, "__init__", patched_init)
    out_wav = tmp_path / "out.wav"
    monkeypatch.setattr(sys, "argv", [
        "infer_exported", "--export-dir", str(out),
        "--model-dir", str(tmp_path), "--tokenizer", "simple",
        "--vocoder-path", str(tmp_path / "vocos.bin"), "--mode", mode,
        "--prompt-wav", str(tmp_path / "p.wav"), "--prompt-text", "hi",
        "--text", "hello", "--res-wav-path", str(out_wav),
    ])
    infer_exported.main()
    wav, sr = read_wav(out_wav)
    assert sr == 24000 and wav.shape[-1] > 0 and np.isfinite(wav).all()


def test_export_cli_with_timesteps(tmp_path, monkeypatch):
    """--timesteps bakes a pruned Euler grid into the fused StableHLO
    sampler; the exported program runs and matches an in-process sample
    with the same explicit grid."""
    import json
    import sys

    import torch

    from jax import export as jexport

    from zipvoice_tpu.bin import export_model
    from zipvoice_tpu.io.checkpoint import params_to_state_dict
    from zipvoice_tpu.text.tokenizer import write_token_file

    cfg = ZipVoiceConfig(**TINY)
    params = zv.init_zipvoice(jax.random.PRNGKey(0), cfg)
    sd = {k: torch.from_numpy(np.asarray(v))
          for k, v in params_to_state_dict(params).items()}
    torch.save({"model": sd}, tmp_path / "model.pt")
    raw = {k: list(v) if isinstance(v, tuple) else v for k, v in TINY.items()
           if k not in ("vocab_size", "pad_id")}
    (tmp_path / "model.json").write_text(json.dumps(
        {"model": raw, "feature": {"sampling_rate": 24000, "type": "vocos",
                                   "n_mels": 16}}))
    token2id = {"_": 0}
    for i in range(1, 40):
        token2id[f"tk{i}"] = i
    write_token_file(token2id, str(tmp_path / "tokens.txt"))

    out = tmp_path / "exported"
    monkeypatch.setattr(sys, "argv", [
        "export_model", "--model-dir", str(tmp_path), "--out-dir", str(out),
        "--num-step", "7", "--max-tokens", "16", "--max-frames", "64",
        "--timesteps", "0,0.4,0.8,1",
    ])
    export_model.main()

    exp = jexport.deserialize((out / "sampler_fused.stablehlo").read_bytes())
    rng = np.random.default_rng(1)
    t, f = 64, 16
    tok = rng.integers(1, 40, (1, 16)).astype(np.int32)
    args_run = (
        tok, np.array([10], np.int32),
        (rng.standard_normal((1, t, f)) * 0.1).astype(np.float32),
        np.array([20], np.int32), np.array([60], np.int32),
        rng.standard_normal((1, t, f)).astype(np.float32),
    )
    got = np.asarray(exp.call(*args_run))
    want = np.asarray(zv.sample(
        params, cfg, *[np.asarray(a) for a in args_run],
        num_step=99, timesteps=(0.0, 0.4, 0.8, 1.0),
    ))
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_int8_fidelity_closers_stay_unquantized():
    """The r5 fidelity closers (VERDICT r4 next #5): the model-level
    velocity/output head, the conditioning in_proj, and every time-embed
    MLP keep their full-precision 'weight' under quantize_linear_int8;
    per-layer module projections still quantize."""
    import jax

    from zipvoice_tpu.config import ZipVoiceConfig
    from zipvoice_tpu.models.zipvoice import init_zipvoice
    from zipvoice_tpu.ops.quant import quantize_linear_int8

    from tests.test_variants import TINY

    cfg = ZipVoiceConfig(**TINY, vocab_size=30, pad_id=0)
    params = init_zipvoice(jax.random.PRNGKey(0), cfg)
    q = quantize_linear_int8(params, min_elems=1)

    # closers keep "weight"
    assert "weight" in q["fm_decoder"]["out_proj"]
    assert "weight" in q["fm_decoder"]["in_proj"]
    assert "weight" in q["fm_decoder"]["time_embed"]["0"]
    assert "weight" in q["fm_decoder"]["time_embed"]["2"]
    stack0 = q["fm_decoder"]["encoders"]["0"]
    enc0 = stack0["encoder"] if "encoder" in stack0 else stack0
    assert "weight" in enc0["time_emb"]["1"]
    # per-layer projections still quantize (incl. their module out_projs)
    layer = enc0["layers"]["0"]
    assert "weight_int8" in layer["self_attn1"]["out_proj"]
    assert "weight_int8" in layer["feed_forward1"]["in_proj"]
