"""End-to-end pipeline test with a tiny random-init model, exercising the
full model-dir contract (torch-format checkpoint + model.json + tokens.txt),
WAV IO, the jitted sample/vocode programs, and bucket-padding invariance."""

import json

import numpy as np
import pytest

import jax.numpy as jnp

from zipvoice_tpu.audio.vocos import VocosConfig, init_vocos
from zipvoice_tpu.audio.wav import read_wav, resample, write_wav
from zipvoice_tpu.config import ZipVoiceConfig
from zipvoice_tpu.io.model_dir import load_model_dir
from zipvoice_tpu.models import zipvoice as zv
from zipvoice_tpu.models.pipeline import ZipVoicePipeline

torch = pytest.importorskip("torch")

TINY = dict(
    fm_decoder_downsampling_factor=(1, 2, 1),
    fm_decoder_num_layers=(1, 1, 1),
    fm_decoder_cnn_module_kernel=(9, 7, 9),
    fm_decoder_feedforward_dim=128,
    fm_decoder_num_heads=2,
    fm_decoder_dim=64,
    text_encoder_num_layers=1,
    text_encoder_feedforward_dim=64,
    text_encoder_cnn_module_kernel=5,
    text_encoder_num_heads=2,
    text_encoder_dim=48,
    time_embed_dim=32,
    text_embed_dim=48,
    query_head_dim=8,
    value_head_dim=8,
    pos_head_dim=4,
    pos_dim=48,
    feat_dim=20,
)

TOKENS_TXT = {"_": 0, " ": 1}
for i, ch in enumerate("abcdefghijklmnopqrstuvwxyz"):
    TOKENS_TXT[ch] = i + 2


@pytest.fixture(scope="module")
def model_dir(tmp_path_factory):
    import jax

    from zipvoice_tpu.io.checkpoint import params_to_state_dict
    from zipvoice_tpu.text.tokenizer import write_token_file

    d = tmp_path_factory.mktemp("model")
    write_token_file(TOKENS_TXT, str(d / "tokens.txt"))
    model_json = {
        "model": {k: list(v) if isinstance(v, tuple) else v for k, v in TINY.items()},
        "feature": {"sampling_rate": 24000, "type": "vocos", "n_mels": 20},
    }
    (d / "model.json").write_text(json.dumps(model_json))

    cfg = ZipVoiceConfig(**TINY, vocab_size=len(TOKENS_TXT), pad_id=0)
    params = zv.init_zipvoice(jax.random.PRNGKey(0), cfg)
    sd = {
        k: torch.from_numpy(np.asarray(v))
        for k, v in params_to_state_dict(params).items()
    }
    torch.save({"model": sd}, d / "model.pt")
    return d


def test_wav_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    wav = (rng.standard_normal((1, 4000)) * 0.2).astype(np.float32)
    write_wav(tmp_path / "a.wav", wav, 24000)
    back, sr = read_wav(tmp_path / "a.wav")
    assert sr == 24000
    np.testing.assert_allclose(back, wav, atol=1.0 / 32000)


def test_resample_preserves_tone():
    t = np.arange(24000) / 24000
    wav = np.sin(2 * np.pi * 440 * t).astype(np.float32)[None]
    out = resample(wav, 24000, 16000)
    assert out.shape == (1, 16000)
    t2 = np.arange(16000) / 16000
    ref = np.sin(2 * np.pi * 440 * t2).astype(np.float32)
    # interior matches a 440 Hz tone at the new rate
    assert np.abs(out[0, 200:-200] - ref[200:-200]).max() < 0.01


def test_pipeline_end_to_end(model_dir):
    import jax

    assets = load_model_dir(model_dir=str(model_dir), model_name="zipvoice",
                            tokenizer_name="simple")
    assert assets.model_cfg.feat_dim == 20
    assert assets.model_cfg.vocab_size == len(TOKENS_TXT)

    vcfg = VocosConfig(input_channels=20, dim=32, intermediate_dim=64,
                       num_layers=2, n_fft=64, hop_length=16)
    vocos_params = init_vocos(jax.random.PRNGKey(1), vcfg)

    pipe = ZipVoicePipeline(
        params=assets.params, model_cfg=assets.model_cfg,
        feat_cfg=assets.feat_cfg, vocos_params=vocos_params, vocos_cfg=vcfg,
        tokenizer=assets.tokenizer, token_bucket=8, frame_bucket=32,
    )
    rng = np.random.default_rng(0)
    prompt_wav = (rng.standard_normal((1, 24000)) * 0.05).astype(np.float32)

    res = pipe.synthesize(
        text="hello world", prompt_text="hi there", prompt_wav=prompt_wav,
        prompt_sr=24000, num_step=2, guidance_scale=1.0,
    )
    assert res.wav.ndim == 1 and len(res.wav) > 0
    assert np.isfinite(res.wav).all()
    assert np.abs(res.wav).max() <= 1.0
    assert res.features.shape[-1] == 100 or res.features.shape[-1] == 20
    assert {"rtf", "rtf_no_vocoder", "rtf_vocoder"} <= set(res.metrics)


@pytest.mark.parametrize("quantize", ["int8", "int8-dynamic"])
def test_pipeline_quantized_serving(model_dir, quantize):
    """--quantize serving path at the DEPLOYMENT dtype (bf16): the pipeline
    quantizes the tree at init, int8 weights + f32 per-channel scales
    survive the bf16 device cast (keyed check — under bf16 a stray f32
    leaf can only be a scale), and synthesize stays finite and close to
    the unquantized pipeline."""
    import jax

    from zipvoice_tpu.nn import functional as F

    assets = load_model_dir(model_dir=str(model_dir), model_name="zipvoice",
                            tokenizer_name="simple")
    vcfg = VocosConfig(input_channels=20, dim=32, intermediate_dim=64,
                       num_layers=2, n_fft=64, hop_length=16)
    vocos_params = init_vocos(jax.random.PRNGKey(1), vcfg)
    kw = dict(
        model_cfg=assets.model_cfg, feat_cfg=assets.feat_cfg,
        vocos_params=vocos_params, vocos_cfg=vcfg,
        tokenizer=assets.tokenizer, token_bucket=8, frame_bucket=32,
        dtype=jnp.bfloat16,
    )
    rng = np.random.default_rng(0)
    prompt_wav = (rng.standard_normal((1, 24000)) * 0.05).astype(np.float32)
    req = dict(text="hello world", prompt_text="hi there",
               prompt_wav=prompt_wav, prompt_sr=24000, num_step=2,
               guidance_scale=1.0, seed=7)

    try:
        ref = ZipVoicePipeline(params=assets.params, **kw).synthesize(**req)
        qpipe = ZipVoicePipeline(params=assets.params, quantize=quantize,
                                 **kw)

        # keyed walk: every weight_int8 is int8, every weight_scale is f32
        # (the exact divergence the export path once had), everything else
        # followed the bf16 deployment dtype
        def walk(d, path=()):
            if not isinstance(d, dict):
                yield path, d
            else:
                for k, v in d.items():
                    yield from walk(v, path + (k,))

        n_q = n_s = 0
        for path, leaf in walk(qpipe.params):
            if path[-1] == "weight_int8":
                assert leaf.dtype == jnp.int8, path
                n_q += 1
            elif path[-1] == "weight_scale":
                assert leaf.dtype == jnp.float32, path
                n_s += 1
            else:
                assert leaf.dtype == jnp.bfloat16, (path, leaf.dtype)
        assert n_q > 0 and n_q == n_s
        res = qpipe.synthesize(**req)
        # the trace-time dynamic mode is bound per the pipeline's mode
        assert F._INT8_DYNAMIC == (quantize == "int8-dynamic")
    finally:
        F.set_int8_dynamic(False)
    assert np.isfinite(res.wav).all()
    # mechanism check, not a fidelity budget (tiny random weights amplify
    # relative quant error; the 123M fidelity rows come from
    # tools/int8_rtf.py on the real config): outputs must track the
    # unquantized pipeline closely
    a = np.asarray(res.features, np.float32).ravel()
    b = np.asarray(ref.features, np.float32).ravel()
    mse = float(np.mean((a - b) ** 2))
    assert mse < 1e-1, mse
    assert float(np.corrcoef(a, b)[0, 1]) > 0.98


def test_bucket_padding_invariance(model_dir):
    """Padding T/S up to buckets must not change the generated mel except for
    the downsample-boundary tail frames (same leak exists in the reference's
    batched padding, SimpleDownsample right-pad, ref zipformer.py:897-901)."""
    assets = load_model_dir(model_dir=str(model_dir), model_name="zipvoice",
                            tokenizer_name="simple")
    pipe_a = ZipVoicePipeline(
        params=assets.params, model_cfg=assets.model_cfg,
        feat_cfg=assets.feat_cfg, tokenizer=assets.tokenizer,
        token_bucket=1, frame_bucket=1,
    )
    pipe_b = ZipVoicePipeline(
        params=assets.params, model_cfg=assets.model_cfg,
        feat_cfg=assets.feat_cfg, tokenizer=assets.tokenizer,
        token_bucket=16, frame_bucket=64,
    )
    rng = np.random.default_rng(1)
    tokens = [3, 4, 5, 6, 3, 9]
    prompt_tokens = [5, 6]
    prompt_feats = (rng.standard_normal((11, 20)) * 0.1).astype(np.float32)
    noise = rng.standard_normal((1, 512, 20)).astype(np.float32)

    mel_a, len_a = pipe_a.sample_features(
        tokens, prompt_tokens, prompt_feats, num_step=2, guidance_scale=1.0,
        noise=noise.copy(),
    )
    mel_b, len_b = pipe_b.sample_features(
        tokens, prompt_tokens, prompt_feats, num_step=2, guidance_scale=1.0,
        noise=noise.copy(),
    )
    assert len_a == len_b
    core = slice(0, len_a - 8)
    err = np.abs(mel_a[core] - mel_b[core]).max()
    assert err < 1e-3, f"bucket variance {err}"


def test_infer_cli_end_to_end(model_dir, tmp_path, monkeypatch):
    """Drive bin/infer_zipvoice.main() with a tiny model dir + tiny vocos
    checkpoint: exercises model-dir loading, vocoder loading, synthesis,
    batch TSV mode and wav writing."""
    import sys

    import jax
    import torch

    from zipvoice_tpu.bin import infer_zipvoice

    # tiny vocos checkpoint in the published torch layout
    vcfg = VocosConfig(input_channels=20, dim=32, intermediate_dim=64,
                       num_layers=2, n_fft=64, hop_length=16)
    vparams = init_vocos(jax.random.PRNGKey(3), vcfg)

    def tree_to_torch_sd(tree, prefix=""):
        out = {}
        for k, v in tree.items():
            name = f"{prefix}.{k}" if prefix else k
            if isinstance(v, dict):
                out.update(tree_to_torch_sd(v, name))
            else:
                arr = np.asarray(v)
                if name.endswith("embed.weight") and arr.ndim == 3:
                    arr = np.transpose(arr, (2, 1, 0))
                elif name.endswith("dwconv.weight") and arr.ndim == 2:
                    arr = np.transpose(arr)[:, None, :]
                elif name.endswith(".weight") and arr.ndim == 2:
                    arr = np.transpose(arr)
                out[name] = torch.from_numpy(arr.copy())
        return out

    voc_path = tmp_path / "vocos.bin"
    torch.save(tree_to_torch_sd(vparams), voc_path)

    rng = np.random.default_rng(0)
    prompt = tmp_path / "prompt.wav"
    write_wav(prompt, (rng.standard_normal((1, 24000)) * 0.05).astype(np.float32),
              24000)

    # patch the pipeline's vocos config to the tiny one
    import zipvoice_tpu.models.pipeline as pl_mod

    orig_init = pl_mod.ZipVoicePipeline.__init__

    def patched_init(self, *a, **kw):
        kw["vocos_cfg"] = vcfg
        orig_init(self, *a, **kw)

    monkeypatch.setattr(pl_mod.ZipVoicePipeline, "__init__", patched_init)

    out_wav = tmp_path / "out.wav"
    monkeypatch.setattr(sys, "argv", [
        "infer_zipvoice", "--model-dir", str(model_dir),
        "--vocoder-path", str(voc_path), "--tokenizer", "simple",
        "--prompt-wav", str(prompt), "--prompt-text", "hi there",
        "--text", "hello world", "--res-wav-path", str(out_wav),
        "--num-step", "2",
    ])
    infer_zipvoice.main()
    wav, sr = read_wav(out_wav)
    assert sr == 24000 and wav.shape[-1] > 0
    assert np.isfinite(wav).all()


def test_synthesize_batch(model_dir):
    import jax

    assets = load_model_dir(model_dir=str(model_dir), model_name="zipvoice",
                            tokenizer_name="simple")
    vcfg = VocosConfig(input_channels=20, dim=32, intermediate_dim=64,
                       num_layers=2, n_fft=64, hop_length=16)
    pipe = ZipVoicePipeline(
        params=assets.params, model_cfg=assets.model_cfg,
        feat_cfg=assets.feat_cfg,
        vocos_params=init_vocos(jax.random.PRNGKey(1), vcfg), vocos_cfg=vcfg,
        tokenizer=assets.tokenizer, token_bucket=8, frame_bucket=32,
    )
    rng = np.random.default_rng(2)
    wavs = [(rng.standard_normal((1, 20000 + 4000 * i)) * 0.05).astype(np.float32)
            for i in range(3)]
    results = pipe.synthesize_batch(
        texts=["hello world", "abc", "longer sentence here ok"],
        prompt_texts=["hi", "yo there", "hm"],
        prompt_wavs=wavs, prompt_srs=[24000] * 3,
        num_step=2, guidance_scale=1.0,
    )
    assert len(results) == 3
    lens = {len(r.wav) for r in results}
    assert len(lens) == 3  # per-request lengths differ
    for r in results:
        assert np.isfinite(r.wav).all() and len(r.wav) > 0


def test_dialog_pipeline_variant(tmp_path):
    """Dialog-variant pipeline: speaker-tagged tokens + spk_embed params."""
    import jax

    from zipvoice_tpu.models.dialog import init_zipvoice_dialog

    cfg = ZipVoiceConfig(**TINY, vocab_size=40, pad_id=0)
    params = init_zipvoice_dialog(jax.random.PRNGKey(5), cfg)
    from zipvoice_tpu.config import FeatureConfig

    pipe = ZipVoicePipeline(
        params=params, model_cfg=cfg, feat_cfg=FeatureConfig(n_mels=20),
        variant="dialog", token_bucket=8, frame_bucket=32,
    )
    rng = np.random.default_rng(3)
    prompt_feats = (rng.standard_normal((11, 20)) * 0.1).astype(np.float32)
    mel, gen_len = pipe.sample_features(
        tokens=[3, 4, 5, 6], prompt_tokens=[7, 8], prompt_feats=prompt_feats,
        num_step=2, guidance_scale=1.5,
    )
    assert gen_len > 0 and np.isfinite(np.asarray(mel)).all()


def test_synthesize_long(model_dir):
    import jax

    assets = load_model_dir(model_dir=str(model_dir), model_name="zipvoice",
                            tokenizer_name="simple")
    vcfg = VocosConfig(input_channels=20, dim=32, intermediate_dim=64,
                       num_layers=2, n_fft=64, hop_length=16)
    pipe = ZipVoicePipeline(
        params=assets.params, model_cfg=assets.model_cfg,
        feat_cfg=assets.feat_cfg,
        vocos_params=init_vocos(jax.random.PRNGKey(1), vcfg), vocos_cfg=vcfg,
        tokenizer=assets.tokenizer, token_bucket=8, frame_bucket=32,
    )
    rng = np.random.default_rng(4)
    prompt_wav = (rng.standard_normal((1, 20000)) * 0.05).astype(np.float32)
    long_text = ("the quick brown fox jumps over the lazy dog. " * 4).strip()
    res = pipe.synthesize_long(
        text=long_text, prompt_text="hi", prompt_wav=prompt_wav,
        prompt_sr=24000, num_step=2, max_chunk_seconds=2.0,
        carry_seconds=0.5,
    )
    assert res.metrics["chunks"] >= 2
    assert len(res.wav) > 0 and np.isfinite(res.wav).all()


def test_pipeline_warmup(model_dir):
    import jax

    assets = load_model_dir(model_dir=str(model_dir), model_name="zipvoice",
                            tokenizer_name="simple")
    vcfg = VocosConfig(input_channels=20, dim=32, intermediate_dim=64,
                       num_layers=2, n_fft=64, hop_length=16)
    pipe = ZipVoicePipeline(
        params=assets.params, model_cfg=assets.model_cfg,
        feat_cfg=assets.feat_cfg,
        vocos_params=init_vocos(jax.random.PRNGKey(1), vcfg), vocos_cfg=vcfg,
        tokenizer=assets.tokenizer, token_bucket=8, frame_bucket=32,
    )
    pipe.warmup(num_step=2, seconds=(0.5,), token_counts=(4,))
    # the warmed program is reused: same bucket -> per-instance memo hit
    assert len(getattr(pipe, "_memo__sample_fn", {})) >= 1


def test_synthesize_fused_matches_split(model_dir):
    """The one-program sample+vocoder+PCM16 path must produce the same wav
    as the split sample_features->vocode path (same seed/noise), modulo the
    int16 quantization both paths share."""
    import jax

    assets = load_model_dir(model_dir=str(model_dir), model_name="zipvoice",
                            tokenizer_name="simple")
    vcfg = VocosConfig(input_channels=20, dim=32, intermediate_dim=64,
                       num_layers=2, n_fft=64, hop_length=16)
    pipe = ZipVoicePipeline(
        params=assets.params, model_cfg=assets.model_cfg,
        feat_cfg=assets.feat_cfg,
        vocos_params=init_vocos(jax.random.PRNGKey(1), vcfg), vocos_cfg=vcfg,
        tokenizer=assets.tokenizer, token_bucket=8, frame_bucket=32,
    )
    rng = np.random.default_rng(0)
    prompt_wav = (rng.standard_normal((1, 24000)) * 0.05).astype(np.float32)
    kw = dict(text="hello world", prompt_text="hi there",
              prompt_wav=prompt_wav, prompt_sr=24000, num_step=2,
              guidance_scale=1.0, seed=7)
    split = pipe.synthesize(**kw)
    fused = pipe.synthesize_fused(**kw)
    assert fused.wav.shape == split.wav.shape
    np.testing.assert_allclose(fused.wav, split.wav, atol=1.5 / 32767.0)
    assert fused.metrics["rtf"] > 0


def test_infer_dialog_cli_end_to_end(tmp_path, monkeypatch):
    """Drive bin/infer_zipvoice_dialog.main(): dialog model dir + split
    two-speaker prompts + tiny vocos (merged-prompt assembly, speaker-tag
    tokenization, vocoding, wav write)."""
    import sys

    import jax
    import torch

    from zipvoice_tpu.bin import infer_zipvoice_dialog
    from zipvoice_tpu.io.checkpoint import params_to_state_dict
    from zipvoice_tpu.models.dialog import init_zipvoice_dialog
    from zipvoice_tpu.text.tokenizer import write_token_file

    from pathlib import Path as _P

    pinyin = _P("/root/reference/egs/zipvoice/local/pinyin.txt")
    if not pinyin.exists():
        pytest.skip("reference pinyin inventory not mounted")
    from zipvoice_tpu.bin.make_tokens import build_emilia_tokens

    d = tmp_path / "dialog_model"
    d.mkdir()
    # emilia inventory + the dialog [S1]/[S2] extension (EN G2P is gated in
    # this image, so the test drives the ZH path via the vendored pinyin
    # fallback)
    tokens = dict(build_emilia_tokens(str(pinyin)))
    tokens["[S1]"] = len(tokens)
    tokens["[S2]"] = len(tokens)
    write_token_file(tokens, str(d / "tokens.txt"))
    (d / "model.json").write_text(json.dumps({
        "model": {k: list(v) if isinstance(v, tuple) else v
                  for k, v in TINY.items()},
        "feature": {"sampling_rate": 24000, "type": "vocos", "n_mels": 20},
    }))
    cfg = ZipVoiceConfig(**TINY, vocab_size=len(tokens), pad_id=0)
    params = init_zipvoice_dialog(jax.random.PRNGKey(2), cfg)
    sd = {k: torch.from_numpy(np.asarray(v).copy())
          for k, v in params_to_state_dict(params).items()}
    torch.save({"model": sd}, d / "model.pt")

    vcfg = VocosConfig(input_channels=20, dim=32, intermediate_dim=64,
                       num_layers=2, n_fft=64, hop_length=16)
    vparams = init_vocos(jax.random.PRNGKey(3), vcfg)

    def tree_to_torch_sd(tree, prefix=""):
        out = {}
        for k, v in tree.items():
            name = f"{prefix}.{k}" if prefix else k
            if isinstance(v, dict):
                out.update(tree_to_torch_sd(v, name))
            else:
                arr = np.asarray(v)
                if name.endswith("embed.weight") and arr.ndim == 3:
                    arr = np.transpose(arr, (2, 1, 0))
                elif name.endswith("dwconv.weight") and arr.ndim == 2:
                    arr = np.transpose(arr)[:, None, :]
                elif name.endswith(".weight") and arr.ndim == 2:
                    arr = np.transpose(arr)
                out[name] = torch.from_numpy(arr.copy())
        return out

    voc_path = tmp_path / "vocos.bin"
    torch.save(tree_to_torch_sd(vparams), voc_path)

    rng = np.random.default_rng(0)
    p1 = tmp_path / "p1.wav"
    p2 = tmp_path / "p2.wav"
    write_wav(p1, (rng.standard_normal((1, 16000)) * 0.05).astype(np.float32),
              24000)
    write_wav(p2, (rng.standard_normal((1, 16000)) * 0.05).astype(np.float32),
              24000)

    import zipvoice_tpu.models.pipeline as pl_mod

    orig_init = pl_mod.ZipVoicePipeline.__init__

    def patched_init(self, *a, **kw):
        kw["vocos_cfg"] = vcfg
        orig_init(self, *a, **kw)

    monkeypatch.setattr(pl_mod.ZipVoicePipeline, "__init__", patched_init)

    out_wav = tmp_path / "dialog_out.wav"
    monkeypatch.setattr(sys, "argv", [
        "infer_zipvoice_dialog", "--model-name", "zipvoice_dialog",
        "--model-dir", str(d), "--vocoder-path", str(voc_path),
        "--prompt-text-1", "[S1] 你好。",
        "--prompt-wav-1", str(p1),
        "--prompt-text-2", "[S2] 很好，谢谢。",
        "--prompt-wav-2", str(p2),
        "--text", "[S1] 今天天气不错。 [S2] 确实很好。",
        "--res-wav-path", str(out_wav), "--num-step", "2",
    ])
    infer_zipvoice_dialog.main()
    wav, sr = read_wav(out_wav)
    assert sr == 24000 and wav.shape[-1] > 0
    assert np.isfinite(wav).all()


def test_pipeline_is_garbage_collectable(model_dir):
    """Dropping a pipeline must actually free it: the jit memo lives on the
    instance, so no class-level cache pins discarded pipelines' device
    params (HBM) for the process lifetime (VERDICT r2 weak #7)."""
    import gc
    import weakref

    import jax

    assets = load_model_dir(model_dir=str(model_dir), model_name="zipvoice",
                            tokenizer_name="simple")
    vcfg = VocosConfig(input_channels=20, dim=32, intermediate_dim=64,
                       num_layers=2, n_fft=64, hop_length=16)
    pipe = ZipVoicePipeline(
        params=assets.params, model_cfg=assets.model_cfg,
        feat_cfg=assets.feat_cfg,
        vocos_params=init_vocos(jax.random.PRNGKey(1), vcfg), vocos_cfg=vcfg,
        tokenizer=assets.tokenizer, token_bucket=8, frame_bucket=32,
    )
    # populate every memoized program kind the serving path uses
    pipe.warmup(num_step=2, seconds=(0.5,), token_counts=(4,))
    assert getattr(pipe, "_memo__sample_fn", {})
    ref = weakref.ref(pipe)
    del pipe
    gc.collect()
    assert ref() is None, "pipeline still reachable after deletion"


def test_explicit_timesteps_schedule(model_dir):
    """Custom Euler grids (EPSS-style pruned schedules, arXiv 2505.19931):
    passing the exact t-shift grid reproduces the num_step path bit-for-bit;
    a pruned 4-knot grid runs (fewer model evals) and differs; invalid grids
    are rejected."""
    import pytest as _pytest

    from zipvoice_tpu.sampling.euler import get_time_steps, validate_time_steps

    assets = load_model_dir(model_dir=str(model_dir), model_name="zipvoice",
                            tokenizer_name="simple")
    pipe = ZipVoicePipeline(
        params=assets.params, model_cfg=assets.model_cfg,
        feat_cfg=assets.feat_cfg, tokenizer=assets.tokenizer,
        token_bucket=8, frame_bucket=32,
    )
    rng = np.random.default_rng(2)
    tokens = [3, 4, 5, 6]
    prompt_tokens = [5, 6]
    prompt_feats = (rng.standard_normal((9, 20)) * 0.1).astype(np.float32)
    noise = rng.standard_normal((1, 256, 20)).astype(np.float32)

    mel_a, len_a = pipe.sample_features(
        tokens, prompt_tokens, prompt_feats, num_step=3, t_shift=0.5,
        noise=noise.copy())
    grid = get_time_steps(0.0, 1.0, 3, 0.5)
    mel_b, len_b = pipe.sample_features(
        tokens, prompt_tokens, prompt_feats, num_step=99, t_shift=0.9,
        noise=noise.copy(), timesteps=tuple(float(t) for t in grid))
    assert len_a == len_b
    np.testing.assert_array_equal(mel_a, mel_b)

    mel_c, _ = pipe.sample_features(
        tokens, prompt_tokens, prompt_feats, noise=noise.copy(),
        timesteps=(0.0, 0.4, 0.7, 0.9, 1.0))
    assert np.abs(mel_c - mel_a).max() > 1e-6  # genuinely different schedule

    with _pytest.raises(ValueError):
        validate_time_steps([0.5, 0.2, 1.0])
    with _pytest.raises(ValueError):
        validate_time_steps([0.3])
    # grids must COVER [0, 1]: a late start treats noise as integrated
    # state, an early stop returns an unfinished sample
    with _pytest.raises(ValueError):
        validate_time_steps([0.5, 0.8, 1.0])
    with _pytest.raises(ValueError):
        validate_time_steps([0.0, 0.4, 0.9])

    # memo-key normalization: 3-arg and 4-arg-with-default calls of
    # _sample_fn must share ONE compiled program (a raw-args key would
    # compile twice, defeating warmup)
    assert pipe._sample_fn(3, 1.0, 0.5) is pipe._sample_fn(3, 1.0, 0.5, None)


def test_pipeline_conflicting_int8_modes_rejected(model_dir):
    """Two LIVE pipelines with different int8 modes cannot coexist (the
    dynamic flag is a process-global trace-time binding); dropping the
    first frees the mode."""
    import gc

    import jax

    from zipvoice_tpu.nn import functional as F

    assets = load_model_dir(model_dir=str(model_dir), model_name="zipvoice",
                            tokenizer_name="simple")
    vcfg = VocosConfig(input_channels=20, dim=32, intermediate_dim=64,
                       num_layers=2, n_fft=64, hop_length=16)
    kw = dict(
        model_cfg=assets.model_cfg, feat_cfg=assets.feat_cfg,
        vocos_params=init_vocos(jax.random.PRNGKey(1), vcfg), vocos_cfg=vcfg,
        tokenizer=assets.tokenizer, token_bucket=8, frame_bucket=32,
    )
    try:
        p1 = ZipVoicePipeline(params=assets.params, quantize="int8", **kw)
        with pytest.raises(ValueError, match="live pipeline"):
            ZipVoicePipeline(params=assets.params, quantize="int8-dynamic",
                             **kw)
        # same mode coexists fine
        ZipVoicePipeline(params=assets.params, quantize="int8", **kw)
        del p1
        gc.collect()
        ZipVoicePipeline(params=assets.params, quantize="int8-dynamic", **kw)
    finally:
        F.set_int8_dynamic(False)


def test_dialog_stereo_pipeline_variant():
    """Stereo-dialog variant through the PIPELINE: the sample space is 2F
    (prompt feats stacked channel-major, noise 2F) while model_cfg.feat_dim
    stays the per-channel mel dim.  Regression: the pipeline drew noise
    with feat_dim (F), which broke the two-stream width auto-dispatch."""
    import jax

    from zipvoice_tpu.config import FeatureConfig
    from zipvoice_tpu.models.dialog import init_zipvoice_dialog_stereo

    cfg = ZipVoiceConfig(**TINY, vocab_size=40, pad_id=0)
    params = init_zipvoice_dialog_stereo(jax.random.PRNGKey(6), cfg)
    pipe = ZipVoicePipeline(
        params=params, model_cfg=cfg, feat_cfg=FeatureConfig(n_mels=20),
        variant="dialog_stereo", token_bucket=8, frame_bucket=32,
    )
    assert pipe.sample_feat_dim == 40
    rng = np.random.default_rng(7)
    prompt_feats = (rng.standard_normal((11, 40)) * 0.1).astype(np.float32)
    mel, gen_len = pipe.sample_features(
        tokens=[3, 4, 5, 6], prompt_tokens=[7, 8], prompt_feats=prompt_feats,
        num_step=2, guidance_scale=1.5,
    )
    assert gen_len > 0 and np.isfinite(np.asarray(mel)).all()
    assert np.asarray(mel).shape[-1] == 40


@pytest.mark.parametrize("feat_type,length", [
    ("vocos", 24000),      # 1 s, mid-bucket
    ("vocos", 32768),      # exactly one bucket (hop 256 * 128 frames)
    ("vocos", 32769),      # one past the bucket boundary
    ("vocos", 7321),       # short, odd length
    ("bigvgan", 23240),    # r=200 >= 128: the unbucketed STFT comes up one
                           # frame SHORT and fix_num_frames replicate-pads
    ("bigvgan", 24000),
])
def test_prompt_features_bucketed_exact(model_dir, feat_type, length):
    """prompt_features runs the fbank on a BUCKETED padded length (bounded
    program count under arbitrary client prompt lengths) — and must equal
    the direct unbucketed extraction EXACTLY, including the replicate-pad
    tail bigvgan's frame contract can need."""
    from zipvoice_tpu.audio.mel import extract_features as ef
    from zipvoice_tpu.config import FeatureConfig

    assets = load_model_dir(model_dir=str(model_dir), model_name="zipvoice",
                            tokenizer_name="simple")
    fcfg = FeatureConfig(n_mels=20, type=feat_type)
    pipe = ZipVoicePipeline(
        params=assets.params, model_cfg=assets.model_cfg, feat_cfg=fcfg,
        tokenizer=assets.tokenizer, token_bucket=8, frame_bucket=32,
    )
    rng = np.random.default_rng(11)
    wav = (rng.standard_normal((1, length)) * 0.2).astype(np.float32)

    feats, prompt_rms = pipe.prompt_features(wav, 24000)

    # oracle: the unbucketed extraction on the identically-normalized wav
    w = wav.copy()
    if prompt_rms < 0.1:
        w = w * (0.1 / prompt_rms)
    ref = ef(w, fcfg, num_channels=1)
    ref = (ref + fcfg.feat_bias) * fcfg.feat_scale

    assert feats.shape == ref.shape
    np.testing.assert_allclose(
        np.asarray(feats, np.float32), np.asarray(ref, np.float32),
        atol=2e-6, rtol=1e-5,
    )


def test_silent_prompt_rejected(model_dir):
    """An all-zeros prompt must raise (the server maps it to HTTP 400)
    instead of dividing by zero and serving NaN audio."""
    assets = load_model_dir(model_dir=str(model_dir), model_name="zipvoice",
                            tokenizer_name="simple")
    pipe = ZipVoicePipeline(
        params=assets.params, model_cfg=assets.model_cfg,
        feat_cfg=assets.feat_cfg, tokenizer=assets.tokenizer,
        token_bucket=8, frame_bucket=32,
    )
    with pytest.raises(ValueError, match="silent"):
        pipe.prompt_features(np.zeros((1, 24000), np.float32), 24000)


def test_long_form_plan_splits_cjk(model_dir):
    """CJK text has no whitespace after 。！？ — the planner must still
    split it into multiple chunks under the length cap."""
    assets = load_model_dir(model_dir=str(model_dir), model_name="zipvoice",
                            tokenizer_name="simple")
    pipe = ZipVoicePipeline(
        params=assets.params, model_cfg=assets.model_cfg,
        feat_cfg=assets.feat_cfg, tokenizer=assets.tokenizer,
        token_bucket=8, frame_bucket=32,
    )
    text = "你好世界这是一句话。" * 12  # ~36 s of CJK, no spaces anywhere
    chunks = pipe._long_form_plan(text, max_chunk_seconds=8.0)
    assert len(chunks) >= 3
    # and the Latin guard still holds sentences with decimals together
    assert pipe._long_form_plan("pi is 3.14 ok", 30.0) == ["pi is 3.14 ok"]


def test_long_form_zero_carry_uses_original_prompt(model_dir):
    """carry_seconds=0 must condition every chunk on the ORIGINAL prompt —
    mel[-0:] Python slicing silently carried the ENTIRE previous chunk
    (maximum carry instead of disabled carry)."""
    import jax

    assets = load_model_dir(model_dir=str(model_dir), model_name="zipvoice",
                            tokenizer_name="simple")
    vcfg = VocosConfig(input_channels=20, dim=32, intermediate_dim=64,
                       num_layers=2, n_fft=64, hop_length=16)
    pipe = ZipVoicePipeline(
        params=assets.params, model_cfg=assets.model_cfg,
        feat_cfg=assets.feat_cfg,
        vocos_params=init_vocos(jax.random.PRNGKey(1), vcfg), vocos_cfg=vcfg,
        tokenizer=assets.tokenizer, token_bucket=8, frame_bucket=32,
    )
    seen_prompt_frames = []
    real = pipe.sample_features

    def spy(tokens, prompt_tokens, prompt_feats, **kw):
        seen_prompt_frames.append(int(np.asarray(prompt_feats).shape[0]))
        return real(tokens, prompt_tokens, prompt_feats, **kw)

    pipe.sample_features = spy
    rng = np.random.default_rng(4)
    prompt_wav = (rng.standard_normal((1, 20000)) * 0.05).astype(np.float32)
    long_text = ("the quick brown fox jumps over the lazy dog. " * 4).strip()
    res = pipe.synthesize_long(
        text=long_text, prompt_text="hi", prompt_wav=prompt_wav,
        prompt_sr=24000, num_step=2, max_chunk_seconds=2.0,
        carry_seconds=0.0,
    )
    assert res.metrics["chunks"] >= 2
    assert len(seen_prompt_frames) >= 2
    # every chunk must see the ORIGINAL prompt (same frame count), not the
    # full previous chunk's mel
    assert all(n == seen_prompt_frames[0] for n in seen_prompt_frames[1:]), (
        seen_prompt_frames
    )
    assert np.isfinite(res.wav).all()
