"""Aux subsystems: diagnostics, inf-check, data-prep CLIs, averaged-model CLI,
and variant train-step smoke tests."""

import sys
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from zipvoice_tpu.config import FeatureConfig, ZipVoiceConfig
from zipvoice_tpu.models.dialog import init_zipvoice_dialog
from zipvoice_tpu.models.distill import distill_config, init_zipvoice_distill
from zipvoice_tpu.models.zipvoice import init_zipvoice
from zipvoice_tpu.utils.diagnostics import (
    activation_diagnostics,
    format_diagnostics,
    param_diagnostics,
)
from zipvoice_tpu.utils.hooks import assert_all_finite, find_nonfinite

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


def test_diagnostics():
    cfg = ZipVoiceConfig(**TINY)
    params = init_zipvoice(jax.random.PRNGKey(0), cfg)
    pstats = param_diagnostics(params)
    assert "embed.weight" in pstats
    assert pstats["embed.weight"]["rms"] > 0
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 16, 48), dtype=np.float32)
    astats = activation_diagnostics(
        params["fm_decoder"], cfg.fm_decoder_config(),
        rng.standard_normal((2, 16, 48), dtype=np.float32),
        t=np.array([0.3, 0.6], np.float32),
    )
    assert set(astats) >= {"in_proj", "encoders.0", "encoders.2", "out_proj"}
    text = format_diagnostics(astats)
    assert "rms" in text and "encoders.1" in text

    # per-module taps (ref diagnostics hooks every module): layer submodule
    # outputs appear by name, attention weights carry an entropy stat, and
    # per-dim/eig summaries exist (ref get_tensor_stats :45-112)
    attn_keys = [k for k in astats if k.endswith("self_attn_weights")]
    assert attn_keys, list(astats)[:10]
    assert all("entropy" in astats[k] for k in attn_keys)
    assert any(k.endswith("feed_forward1") for k in astats)
    assert any(k.endswith("conv_module2") for k in astats)
    assert any(".layer0." in k for k in astats)
    ff = next(k for k in astats if k.endswith("feed_forward1"))
    assert len(astats[ff]["dims"][2]["rms"]) == 11  # 11-point profile
    assert len(astats[ff]["eigs"]) == 11
    # entropy of a softmax over T=16 keys lands in (0, log 16]
    ent = astats[attn_keys[0]]["entropy"]
    assert 0.0 < ent <= np.log(16) + 1e-6
    # per-dim profiles render
    assert "eigs percentiles" in format_diagnostics(astats)


def test_dim_and_eig_stats_math():
    from zipvoice_tpu.utils.diagnostics import (
        attention_entropy,
        dim_stats,
        eig_stats,
    )

    rng = np.random.default_rng(0)
    x = rng.standard_normal((100, 8)).astype(np.float32)
    ds = dim_stats(x, 1)
    assert len(ds["rms"]) == 11
    assert ds["rms"][0] <= ds["rms"][-1]  # sorted profile
    # eigs of an isotropic gaussian cluster near 1
    eigs = eig_stats(rng.standard_normal((20000, 6)).astype(np.float32), -1)
    assert 0.8 < eigs[0] < eigs[-1] < 1.2
    assert eig_stats(np.zeros((4, 1024), np.float32), -1) is None  # too wide
    # uniform attention -> entropy log(K); one-hot -> 0
    k = 32
    uni = np.full((1, 1, 4, k), 1.0 / k)
    assert abs(attention_entropy(uni) - np.log(k)) < 1e-9
    hot = np.zeros((1, 1, 4, k))
    hot[..., 0] = 1.0
    assert attention_entropy(hot) == 0.0


def test_inf_check():
    tree = {"a": {"w": np.ones(3)}, "b": np.array([1.0, np.nan])}
    assert find_nonfinite(tree) == ["b"]
    with pytest.raises(FloatingPointError):
        assert_all_finite(tree)
    assert_all_finite({"a": np.ones(2)})


def test_dialog_and_stereo_train_step():
    from zipvoice_tpu.models.dialog import init_zipvoice_dialog_stereo
    from zipvoice_tpu.train.scaled_adam import scaled_adam
    from zipvoice_tpu.train.step import TrainConfig, make_train_step

    cfg = ZipVoiceConfig(**TINY)
    rng = np.random.default_rng(0)
    opt = scaled_adam(clipping_scale=2.0)

    def batch(feat_mult):
        return {
            "tokens": rng.integers(1, 38, (2, 10)).astype(np.int32),
            "tokens_lens": np.array([8, 6], np.int32),
            "features": rng.standard_normal(
                (2, 24, TINY["feat_dim"] * feat_mult)
            ).astype(np.float32),
            "features_lens": np.array([24, 18], np.int32),
        }

    # mono dialog
    params = init_zipvoice_dialog(jax.random.PRNGKey(0), cfg)
    step = make_train_step(
        cfg, opt,
        TrainConfig(compute_dtype="float32", loss="dialog",
                    use_regularizers=False),
    )
    p2, _, m = step(params, opt.init(params), batch(1),
                    jax.random.PRNGKey(1), np.int32(1), np.float32(0))
    assert np.isfinite(float(m["loss"]))

    # stereo two-channel objective with energy loss
    sparams = init_zipvoice_dialog_stereo(jax.random.PRNGKey(1), cfg)
    step2 = make_train_step(
        cfg, opt,
        TrainConfig(compute_dtype="float32", loss="dialog", stereo=True,
                    se_weight=1.0, use_regularizers=False),
    )
    p3, _, m2 = step2(sparams, opt.init(sparams), batch(2),
                      jax.random.PRNGKey(2), np.int32(1), np.float32(0))
    assert np.isfinite(float(m2["loss"]))


def test_distill_train_step():
    from zipvoice_tpu.train.distill_step import (
        draw_t_schedule,
        make_distill_train_step,
    )
    from zipvoice_tpu.train.scaled_adam import scaled_adam
    from zipvoice_tpu.train.step import TrainConfig

    cfg = ZipVoiceConfig(**TINY)
    dcfg = distill_config(cfg)
    rng = np.random.default_rng(1)
    student = init_zipvoice_distill(jax.random.PRNGKey(0), cfg)
    teacher = jax.tree.map(lambda a: a.copy(), student)
    opt = scaled_adam(clipping_scale=2.0)
    step = make_distill_train_step(
        dcfg, opt, TrainConfig(base_lr=1e-4, compute_dtype="float32",
                               use_regularizers=False),
        stage="second",
    )
    batch = {
        "tokens": rng.integers(1, 38, (2, 10)).astype(np.int32),
        "tokens_lens": np.array([8, 6], np.int32),
        "features": rng.standard_normal((2, 24, TINY["feat_dim"])).astype(
            np.float32
        ),
        "features_lens": np.array([24, 18], np.int32),
    }
    t_triple = np.asarray(draw_t_schedule(rng), np.float32)
    emb_before = np.asarray(student["embed"]["weight"]).copy()
    fm_before = np.asarray(
        student["fm_decoder"]["in_proj"]["weight"]
    ).copy()
    s2, t2, _, m = step(student, teacher, opt.init(student), batch,
                        jax.random.PRNGKey(3), np.int32(1), t_triple)
    assert np.isfinite(float(m["loss"])) and np.isfinite(float(m["ref_loss"]))
    # only fm_decoder moved
    np.testing.assert_array_equal(np.asarray(s2["embed"]["weight"]), emb_before)
    assert np.abs(
        np.asarray(s2["fm_decoder"]["in_proj"]["weight"]) - fm_before
    ).max() > 0


def test_prepare_and_fbank_clis(tmp_path, monkeypatch):
    from zipvoice_tpu.audio.wav import write_wav
    from zipvoice_tpu.bin import compute_fbank, prepare_dataset

    rng = np.random.default_rng(0)
    wav_dir = tmp_path / "wavs"
    wav_dir.mkdir()
    rows = []
    for i in range(3):
        path = wav_dir / f"u{i}.wav"
        write_wav(path, rng.standard_normal((1, 24000)).astype(np.float32) * 0.1,
                  24000)
        rows.append(f"u{i}\thello world {i}\t{path}")
    tsv = tmp_path / "raw.tsv"
    tsv.write_text("\n".join(rows) + "\n")

    monkeypatch.setattr(
        sys, "argv",
        ["prepare_dataset", "--tsv-path", str(tsv), "--output-dir",
         str(tmp_path / "data"), "--prefix", "t", "--subset", "train"],
    )
    prepare_dataset.main()
    out = (tmp_path / "data" / "t_train.tsv").read_text().strip().split("\n")
    assert len(out) == 3 and out[0].count("\t") == 4

    monkeypatch.setattr(
        sys, "argv",
        ["compute_fbank", "--manifest", str(tmp_path / "data" / "t_train.tsv"),
         "--output-dir", str(tmp_path / "feats"), "--prefix", "t",
         "--subset", "train", "--shard-size", "2"],
    )
    compute_fbank.main()
    shards = sorted((tmp_path / "feats").glob("*.npz"))
    assert len(shards) == 2  # 3 utts, shard size 2
    data = np.load(shards[0])
    key = list(data.keys())[0]
    assert data[key].shape[1] == 100 and data[key].dtype == np.float16


def test_generate_averaged_model_cli(tmp_path, monkeypatch):
    from zipvoice_tpu.bin import generate_averaged_model
    from zipvoice_tpu.train.checkpoint import (
        init_averaged_model,
        load_checkpoint,
        save_checkpoint,
    )

    cfg = ZipVoiceConfig(**TINY)
    params = init_zipvoice(jax.random.PRNGKey(0), cfg)
    avg1 = init_averaged_model(params)
    params2 = jax.tree.map(lambda a: a + 1.0, params)
    avg2 = init_averaged_model(params2)
    save_checkpoint(str(tmp_path / "epoch-1.pt"), params, model_avg=avg1,
                    info={"batch_idx_train": 200, "average_period": 200})
    save_checkpoint(str(tmp_path / "epoch-2.pt"), params2, model_avg=avg2,
                    info={"batch_idx_train": 400, "average_period": 200})

    monkeypatch.setattr(
        sys, "argv",
        ["generate_averaged_model", "--exp-dir", str(tmp_path),
         "--epoch", "2", "--avg", "1"],
    )
    generate_averaged_model.main()
    out = load_checkpoint(str(tmp_path / "epoch-2-avg-1.pt"))
    # avg over (1, 2] = (avg2*400 - avg1*200) / 200 = 2*p2 - p = p + 2
    expect = np.asarray(params["embed"]["weight"]) + 2.0
    np.testing.assert_allclose(
        np.asarray(out["params"]["embed"]["weight"]), expect, rtol=1e-6
    )


def test_recipe_prep_scripts(tmp_path):
    """egs local prep tooling: emilia jsonl -> TSV (filter rules),
    opendialog jsonl -> TSV, manifest validator."""
    import importlib.util
    import json
    import subprocess

    root = Path(__file__).resolve().parents[1]

    def load(path, name):
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod

    em = load(root / "egs/zipvoice/local/prepare_emilia.py", "prep_emilia")
    # filter rules (ref preprocess_emilia.py:136-174)
    assert em.keep_text("hello world", 2.0)
    assert em.keep_text("你好世界", 2.0)
    assert not em.keep_text("안녕하세요", 2.0)            # Korean
    assert not em.keep_text("こんにちは world", 2.0)       # Japanese
    assert not em.keep_text("!!!", 2.0)                    # no valid chars
    assert not em.keep_text(" ".join(["word"] * 12), 2.0)  # 10x repeat
    assert not em.keep_text("hi", 60.0)                    # 2 wpm < 20

    # end-to-end CLI: jsonl -> TSV
    jsonl = tmp_path / "emilia.jsonl"
    rows = [
        {"id": "a1", "wav": "wavs/a1.mp3", "text": "hello there friend",
         "duration": 2.0, "language": "en", "dnsmos": 3.4},
        {"id": "a2", "wav": "wavs/a2.mp3", "text": "안녕", "duration": 1.0},
        {"id": "a3", "wav": "wavs/a3.mp3", "text": "good audio",
         "duration": 1.5, "dnsmos": 1.0},
    ]
    jsonl.write_text("\n".join(json.dumps(r) for r in rows))
    out_tsv = tmp_path / "emilia.tsv"
    r = subprocess.run(
        [sys.executable, str(root / "egs/zipvoice/local/prepare_emilia.py"),
         "--jsonl", str(jsonl), "--wav-root", "/data", "--output",
         str(out_tsv), "--min-dnsmos", "3.0"],
        capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stderr
    lines = out_tsv.read_text().splitlines()
    assert len(lines) == 1 and lines[0].startswith("a1\thello there friend\t")
    assert lines[0].endswith("/data/wavs/a1.mp3")

    od = tmp_path / "opendialog.jsonl"
    od.write_text(json.dumps(
        {"id": "d1", "text": "[S1] hi_there [S2] hello", "path": "audio/d1.mp3"}
    ) + "\n" + json.dumps({"id": "d2", "text": "no tags", "path": "x.mp3"}))
    od_tsv = tmp_path / "od.tsv"
    r = subprocess.run(
        [sys.executable,
         str(root / "egs/zipvoice_dialog/local/prepare_opendialog.py"),
         "--jsonl", str(od), "--output", str(od_tsv)],
        capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stderr
    lines = od_tsv.read_text().splitlines()
    assert len(lines) == 1
    assert lines[0].split("\t")[1] == "[S1] hi there [S2] hello"

    # validator: the produced TSVs pass; a broken one fails
    val = root / "egs/zipvoice/utils/validate_manifest.py"
    r = subprocess.run([sys.executable, str(val), str(out_tsv), str(od_tsv)],
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stdout + r.stderr
    bad = tmp_path / "bad.tsv"
    bad.write_text("a1\ttext\tx.wav\na1\t\ty.wav\n")
    r = subprocess.run([sys.executable, str(val), str(bad)],
                       capture_output=True, text=True)
    assert r.returncode == 1 and "duplicate id" in r.stdout


def test_train_finetune_flag(tmp_path, monkeypatch):
    """--finetune = fixed LR schedule + schedules pinned past their ramps
    (ref train_zipvoice.py:204-210,564-565,967-968): drive main() for one
    tiny step and inspect the trainer config it builds."""
    import json

    from zipvoice_tpu.audio.wav import write_wav
    from zipvoice_tpu.bin import train_zipvoice
    from zipvoice_tpu.text.tokenizer import write_token_file

    rng = np.random.default_rng(0)
    wav = (rng.standard_normal(28800) * 0.1).astype(np.float32)
    write_wav(str(tmp_path / "u0.wav"), wav, 24000)
    (tmp_path / "train.tsv").write_text(
        f"u0\thello\t{tmp_path / 'u0.wav'}\n"
    )
    toks = {t: i for i, t in enumerate(["_", " ", "h", "e", "l", "o"])}
    write_token_file(toks, str(tmp_path / "tokens.txt"))
    (tmp_path / "model.json").write_text(json.dumps(
        {"model": TINY,
         "feature": {"sampling_rate": 24000, "type": "vocos", "n_mels": 16}}
    ))

    captured = {}
    from zipvoice_tpu.train import trainer as trainer_mod

    orig_init = trainer_mod.Trainer.__init__

    def spy_init(self, **kw):
        captured["schedule"] = kw["train_cfg"].schedule
        captured["offset"] = kw["options"].batch_count_offset
        orig_init(self, **kw)

    monkeypatch.setattr(trainer_mod.Trainer, "__init__", spy_init)
    monkeypatch.setattr(sys, "argv", [
        "train_zipvoice", "--train-manifest", str(tmp_path / "train.tsv"),
        "--token-file", str(tmp_path / "tokens.txt"), "--tokenizer", "simple",
        "--model-config", str(tmp_path / "model.json"),
        "--exp-dir", str(tmp_path / "exp"), "--num-epochs", "1",
        "--num-steps-per-epoch", "1", "--max-duration", "5",
        "--dtype", "float32", "--finetune",
    ])
    train_zipvoice.main()
    assert captured["schedule"] == "fixed"
    assert captured["offset"] == 100000.0
    assert (tmp_path / "exp" / "epoch-1.pt").exists()


def test_analytic_flops_close_to_xla_count():
    """utils/flops.py GEMM accounting vs XLA's own cost analysis: analytic
    counts matmul/conv MACs only, so it must land slightly BELOW XLA's
    all-ops count but within ~20% (bench.py's MFU relies on this)."""
    import jax
    import jax.numpy as jnp

    from zipvoice_tpu.config import ZipformerConfig
    from zipvoice_tpu.nn import zipformer as zf
    from zipvoice_tpu.utils.flops import zipformer_fwd_flops

    cfg = ZipformerConfig(
        in_dim=32, out_dim=32, downsampling_factor=(1, 2, 1),
        num_encoder_layers=(2, 2, 2), cnn_module_kernel=(7, 7, 7),
        encoder_dim=64, query_head_dim=16, pos_head_dim=4, value_head_dim=8,
        num_heads=4, feedforward_dim=128, pos_dim=16, use_time_embed=True,
        time_embed_dim=32,
    )
    p = zf.init_tts_zipformer(jax.random.PRNGKey(0), cfg)
    t = 256
    # unrolled layers: under lax.scan XLA's cost analysis counts the scanned
    # layer body once instead of num_layers times
    zf.set_scan_layers(False)
    try:
        f = jax.jit(lambda p, x, tt: zf.tts_zipformer_forward(p, cfg, x, tt))
        comp = f.lower(p, jnp.zeros((2, t, 32)), jnp.zeros((2,))).compile()
    finally:
        zf.set_scan_layers(True)
    ca = comp.cost_analysis()
    ca = ca[0] if isinstance(ca, list) else ca
    xla_flops = float(ca["flops"])
    mine = zipformer_fwd_flops(cfg, t, batch=2)
    assert 0.8 * xla_flops < mine <= 1.05 * xla_flops, (mine, xla_flops)


def test_peak_tflops_lookup():
    from zipvoice_tpu.utils.flops import mfu, peak_bf16_tflops

    assert peak_bf16_tflops("TPU v5 lite0") == 197.0
    assert peak_bf16_tflops("TPU v4") == 275.0
    assert peak_bf16_tflops("unknown accelerator") == 197.0
    # 98.5 TFLOP in 1s on a v5e = 50% MFU
    assert abs(mfu(98.5e12, 1.0, "TPU v5 lite") - 0.5) < 1e-9


def test_tb_writer_roundtrip(tmp_path):
    """Pure-python TB event writer: records parse back (both framing CRCs
    verified) with the file_version header and exact scalar values."""
    import struct

    from zipvoice_tpu.utils.tb_writer import TBWriter, read_events

    tb = TBWriter(tmp_path / "tb")
    tb.add_scalars(1, {"train/loss": 0.5, "train/lr": 1e-3})
    tb.add_scalar("valid/loss", 0.25, step=7)
    events = read_events(tb.path)
    assert len(events) == 3
    _, _, s0 = events[0]
    assert s0 == {}  # file_version header record
    _, step1, s1 = events[1]
    assert step1 == 1
    assert abs(s1["train/loss"] - 0.5) < 1e-7
    assert abs(s1["train/lr"] - 1e-3) < 1e-9
    _, step2, s2 = events[2]
    assert step2 == 7 and abs(s2["valid/loss"] - 0.25) < 1e-7

    # known-answer CRC32C check (IETF test vector: "123456789" -> 0xe3069283)
    from zipvoice_tpu.utils.tb_writer import _crc32c

    assert _crc32c(b"123456789") == 0xE3069283


def test_trainer_writes_tb_events(tmp_path):
    """Trainer._log mirrors scalar records into the exp dir's tensorboard/
    event file (ref train_zipvoice.py:712-725)."""
    from zipvoice_tpu.train.trainer import Trainer
    from zipvoice_tpu.utils.tb_writer import read_events

    t = Trainer.__new__(Trainer)  # log plumbing only, no model
    from zipvoice_tpu.train.trainer import TrainerOptions

    t.opts = TrainerOptions(exp_dir=str(tmp_path))
    t._log_path = tmp_path / "train_log.jsonl"
    t._tb = None
    t.batch_idx_train = 3
    t._log({"step": 3, "epoch": 1, "loss": 1.25, "lr": 0.01})
    files = list((tmp_path / "tensorboard").glob("events.out.tfevents.*"))
    assert len(files) == 1
    events = read_events(files[0])
    assert events[-1][1] == 3
    assert abs(events[-1][2]["train/loss"] - 1.25) < 1e-7
    assert "train/epoch" not in events[-1][2]


def test_prefetch_close_then_next_does_not_hang():
    """close() suppresses the producer sentinel; __next__ must terminate
    (previously blocked forever on q.get())."""
    import time

    from zipvoice_tpu.data.prefetch import PrefetchIterator

    it = PrefetchIterator(iter(range(100)), depth=2)
    assert next(it) == 0
    it.close()
    t0 = time.monotonic()
    try:
        while True:
            next(it)
    except StopIteration:
        pass
    assert time.monotonic() - t0 < 5.0


def test_manifest_crlf_and_segment_crop(tmp_path):
    """CRLF manifests must not leave \\r on the last column; segment crops
    round instead of truncating (4.145 s @ 24 kHz is 99480 samples, int()
    gave 99479)."""
    import numpy as np

    from zipvoice_tpu.audio.wav import write_wav
    from zipvoice_tpu.config import FeatureConfig
    from zipvoice_tpu.data.dataset import (
        OnDeviceFbankCollator,
        read_tsv_manifest,
    )

    wav_path = tmp_path / "a.wav"
    rng = np.random.default_rng(0)
    write_wav(wav_path, (rng.standard_normal((1, 24000 * 6)) * 0.1).astype(
        np.float32), 24000)
    (tmp_path / "m.tsv").write_bytes(
        f"u0\thello\t{wav_path}\t0.0\t4.145\r\n".encode()
    )
    utts = read_tsv_manifest(tmp_path / "m.tsv")
    assert utts[0].wav_path == str(wav_path)  # no trailing \r
    assert abs(utts[0].duration - 4.145) < 1e-9

    col = OnDeviceFbankCollator(tokenizer=None, feat_cfg=FeatureConfig(),
                                pad_id=0)
    wav = col.load_audio(utts[0])
    assert wav.shape[-1] == round(4.145 * 24000)  # 99480, not 99479


def test_native_gate_excludes_segment_rows(tmp_path, monkeypatch):
    """The native batch loader reads WHOLE files: end-cropped manifest rows
    must take the python cropping path (previously they passed the gate and
    only an accidental TypeError saved correctness)."""
    import numpy as np

    from zipvoice_tpu.audio.wav import write_wav
    from zipvoice_tpu.config import FeatureConfig
    from zipvoice_tpu.data.dataset import OnDeviceFbankCollator, Utterance

    wav_path = str(tmp_path / "b.wav")
    rng = np.random.default_rng(1)
    write_wav(wav_path, (rng.standard_normal((1, 24000 * 3)) * 0.1).astype(
        np.float32), 24000)
    import zipvoice_tpu.ops.native as native

    monkeypatch.setattr(native, "available", lambda: True)

    def boom(*a, **k):
        raise AssertionError("native loader must not see segment rows")

    monkeypatch.setattr(native, "batch_load_wav", boom)
    col = OnDeviceFbankCollator(tokenizer=None, feat_cfg=FeatureConfig(),
                                pad_id=0)
    seg = Utterance("u", "t", wav_path, start=0.0, duration=1.5)
    out = col._load_batch_audio([seg])
    assert out[0].shape[-1] == round(1.5 * 24000)


def test_probe_wav_clamps_streaming_sizes(tmp_path):
    """probe_wav must clamp the data-chunk size to the bytes present:
    streaming headers write 0xFFFFFFFF (and truncated files lie)."""
    import numpy as np

    from zipvoice_tpu.audio.wav import (
        pcm16_bytes,
        probe_wav,
        wav_stream_header,
    )

    pcm = pcm16_bytes(np.zeros(2400, np.float32))
    (tmp_path / "s.wav").write_bytes(wav_stream_header(24000) + pcm)
    sr, n, ch = probe_wav(tmp_path / "s.wav")
    assert (sr, n, ch) == (24000, 2400, 1)


def test_safetensors_strips_ddp_prefix(tmp_path):
    """The safetensors branch must strip 'module.' like the .pt branch."""
    import numpy as np
    from safetensors.numpy import save_file

    from zipvoice_tpu.io.checkpoint import load_torch_state_dict

    save_file({"module.embed.weight": np.zeros((3, 2), np.float32)},
              str(tmp_path / "m.safetensors"))
    sd = load_torch_state_dict(tmp_path / "m.safetensors")
    assert list(sd) == ["embed.weight"]


def test_instance_cache_concurrency():
    """Same-key concurrent first-callers dedupe to ONE build; distinct-key
    builds overlap instead of serializing (ADVICE r3: a build-wide lock
    serialized distinct-shape TPU compiles); builder errors propagate to
    waiters and are not cached."""
    import threading

    from zipvoice_tpu.utils.memo import instance_cache

    class Builder:
        def __init__(self):
            self.calls = []
            self.gate = threading.Event()
            import collections

            self.started = collections.defaultdict(threading.Event)

        @instance_cache(maxsize=2)
        def build(self, key):
            self.calls.append(key)
            if key == "boom":
                raise ValueError("boom")
            self.started[key].set()
            self.gate.wait(5.0)  # simulate a slow compile
            return f"prog-{key}"

    b = Builder()
    results = {}

    def call(key):
        try:
            results[threading.get_ident()] = b.build(key)
        except ValueError as e:
            results[threading.get_ident()] = e

    # two same-key + one distinct-key caller, all while the build is slow
    threads = [threading.Thread(target=call, args=(k,))
               for k in ("a", "a", "c")]
    for t in threads:
        t.start()
    # both builds are in flight concurrently (distinct keys don't
    # serialize) — handshake on per-key events, not a sleep, so a loaded
    # CI box can't flake this
    assert b.started["a"].wait(5.0) and b.started["c"].wait(5.0)
    assert sorted(b.calls) == ["a", "c"], b.calls
    b.gate.set()
    for t in threads:
        t.join(10.0)
    vals = sorted(str(v) for v in results.values())
    assert vals == ["prog-a", "prog-a", "prog-c"]
    assert sorted(b.calls) == ["a", "c"]  # same-key deduped to one build

    # errors propagate and are not cached (a retry rebuilds)
    try:
        b.build("boom")
        raise AssertionError("expected ValueError")
    except ValueError:
        pass
    assert b.calls.count("boom") == 1
    try:
        b.build("boom")
        raise AssertionError("expected ValueError")
    except ValueError:
        pass
    assert b.calls.count("boom") == 2

    # LRU bound still enforced (maxsize=2)
    b.build("d")
    assert len(b._memo_build) <= 2
