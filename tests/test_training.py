"""End-to-end training tests: data pipeline, trainer loop, checkpoints,
averaging, resume — on the 8-device virtual CPU mesh."""

import json
import sys

import numpy as np
import pytest

import jax

from zipvoice_tpu.config import FeatureConfig, ZipVoiceConfig
from zipvoice_tpu.data.dataset import (
    DurationBucketSampler,
    OnDeviceFbankCollator,
    read_tsv_manifest,
)
from zipvoice_tpu.models.zipvoice import init_zipvoice
from zipvoice_tpu.parallel.mesh import make_mesh
from zipvoice_tpu.text.tokenizer import SimpleTokenizer, write_token_file
from zipvoice_tpu.train.checkpoint import (
    average_checkpoints_with_averaged_model,
    load_checkpoint,
)
from zipvoice_tpu.train.scaled_adam import scaled_adam
from zipvoice_tpu.train.step import TrainConfig
from zipvoice_tpu.train.trainer import Trainer, TrainerOptions

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
    feat_dim=20,
)


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    """Synthetic wav corpus + TSV manifest + tokens.txt."""
    from zipvoice_tpu.audio.wav import write_wav

    d = tmp_path_factory.mktemp("corpus")
    rng = np.random.default_rng(0)
    lines = []
    texts = ["hello world", "abc def", "the quick brown fox", "jumps over"]
    for i in range(8):
        dur = rng.uniform(1.2, 2.5)
        n = int(dur * 24000)
        wav = (rng.standard_normal((1, n)) * 0.1).astype(np.float32)
        path = d / f"utt{i}.wav"
        write_wav(path, wav, 24000)
        lines.append(f"utt{i}\t{texts[i % 4]}\t{path}")
    manifest = d / "train.tsv"
    manifest.write_text("\n".join(lines) + "\n")

    token2id = {"_": 0, " ": 1}
    for i, ch in enumerate("abcdefghijklmnopqrstuvwxyz"):
        token2id[ch] = i + 2
    write_token_file(token2id, str(d / "tokens.txt"))
    return d


def test_manifest_and_sampler(corpus):
    utts = read_tsv_manifest(corpus / "train.tsv")
    assert len(utts) == 8
    sampler = DurationBucketSampler(utts, max_duration=6.0, seed=1)
    batches = list(sampler)
    assert sum(len(b) for b in batches) == 8
    for b in batches:
        assert sum(u.duration for u in b) <= 6.0 + 3.0  # one-over allowance
    # resume: consume 1 batch, save state, rebuild, check continuation
    sampler.set_epoch(2)
    it = iter(sampler)
    first = next(it)
    state = sampler.state_dict()
    rest = [b for b in it]
    sampler2 = DurationBucketSampler(utts, max_duration=6.0, seed=1)
    sampler2.load_state_dict(state)
    rest2 = list(sampler2)
    assert [[u.uid for u in b] for b in rest] == [
        [u.uid for u in b] for b in rest2
    ]


def test_collator_shapes(corpus):
    utts = read_tsv_manifest(corpus / "train.tsv")[:3]
    tok = SimpleTokenizer(str(corpus / "tokens.txt"))
    feat_cfg = FeatureConfig(n_mels=20)
    coll = OnDeviceFbankCollator(tok, feat_cfg, pad_id=0, frame_bucket=32,
                                 token_bucket=8, batch_bucket=4)
    batch = coll(utts)
    b, t, f = batch["features"].shape
    assert b == 4 and f == 20 and t % 32 == 0
    assert batch["tokens"].shape[0] == 4
    assert batch["tokens"].shape[1] % 8 == 0
    assert (batch["features_lens"][:3] > 0).all()
    assert batch["features_lens"][3] == 0
    assert (batch["tokens_lens"][:3] > 0).all()


def test_trainer_loop_and_resume(corpus, tmp_path):
    utts = read_tsv_manifest(corpus / "train.tsv")
    tok = SimpleTokenizer(str(corpus / "tokens.txt"))
    feat_cfg = FeatureConfig(n_mels=20)
    cfg = ZipVoiceConfig(**TINY, vocab_size=tok.vocab_size, pad_id=tok.pad_id)
    # one uniform bucket shape -> a single train-step compilation
    coll = OnDeviceFbankCollator(tok, feat_cfg, pad_id=0, frame_bucket=256,
                                 token_bucket=32, batch_bucket=8)
    sampler = DurationBucketSampler(utts, max_duration=12.0, seed=3)

    mesh = make_mesh(n_data=8)
    opt = scaled_adam(clipping_scale=2.0)

    def build(exp_dir):
        return Trainer(
            model_cfg=cfg,
            params=init_zipvoice(jax.random.PRNGKey(0), cfg),
            opt=opt,
            train_cfg=TrainConfig(base_lr=0.02, compute_dtype="float32"),
            options=TrainerOptions(
                exp_dir=str(exp_dir), save_every_n=2, keep_last_k=2,
                average_period=2, log_interval=2, valid_interval=1000,
            ),
            mesh=mesh,
        )

    exp = tmp_path / "exp"
    trainer = build(exp)

    losses = []
    for epoch in [1, 2]:
        trainer.epoch = epoch
        sampler.set_epoch(epoch)
        for utt_batch in sampler:
            m = trainer.step_and_log(coll(utt_batch),
                                     sampler_state_fn=sampler.state_dict)
            losses.append(float(m["loss"]))
        trainer.save(str(exp / f"epoch-{epoch}.pt"), sampler.state_dict())

    assert all(np.isfinite(losses))
    assert (exp / "epoch-1.pt").exists() and (exp / "epoch-2.pt").exists()
    assert (exp / f"checkpoint-{(trainer.batch_idx_train // 2) * 2}.pt").exists()
    assert (exp / "train_log.jsonl").exists()

    # averaged-model differencing between the two epoch checkpoints
    avg = average_checkpoints_with_averaged_model(
        str(exp / "epoch-1.pt"), str(exp / "epoch-2.pt")
    )
    assert "fm_decoder" in avg and "embed" in avg

    # resume from epoch-2 and continue one step
    trainer2 = build(tmp_path / "exp2")
    sampler_state = trainer2.resume(str(exp / "epoch-2.pt"))
    assert trainer2.batch_idx_train == trainer.batch_idx_train
    sampler.set_epoch(3)
    batch = coll(next(iter(sampler)))
    m = trainer2.step_and_log(batch)
    assert np.isfinite(float(m["loss"]))

    # checkpoint roundtrip sanity: params equal after save/load
    state = load_checkpoint(str(exp / "epoch-2.pt"))
    a = np.asarray(state["params"]["embed"]["weight"])
    b = np.asarray(jax.tree.leaves(trainer.params.__class__ == dict and
                                   trainer.params["embed"]["weight"]))
    np.testing.assert_allclose(a, np.asarray(trainer.params["embed"]["weight"]),
                               rtol=0, atol=0)


def test_train_cli_smoke(corpus, tmp_path, monkeypatch):
    """bin/train_zipvoice.py end-to-end: argparse -> data -> trainer -> ckpt."""
    from zipvoice_tpu.bin.train_zipvoice import main

    model_json = {
        "model": {k: list(v) if isinstance(v, tuple) else v
                  for k, v in TINY.items()},
        "feature": {"sampling_rate": 24000, "type": "vocos", "n_mels": 20},
    }
    cfg_path = tmp_path / "model.json"
    cfg_path.write_text(json.dumps(model_json))
    exp = tmp_path / "exp"
    monkeypatch.setattr(sys, "argv", [
        "train_zipvoice.py",
        "--train-manifest", str(corpus / "train.tsv"),
        "--token-file", str(corpus / "tokens.txt"),
        "--tokenizer", "simple",
        "--model-config", str(cfg_path),
        "--exp-dir", str(exp),
        "--num-epochs", "1",
        "--num-steps-per-epoch", "2",
        "--max-duration", "10",
        "--dtype", "float32",
        "--log-interval", "1",
        "--save-every-n", "1000",
    ])
    main()
    assert (exp / "epoch-1.pt").exists()
    assert (exp / "train_log.jsonl").exists()


def test_distill_cli_and_iter_averaging(corpus, tmp_path, monkeypatch):
    """Drives run_distill.sh's path: distill trainer keeps model_avg in its
    checkpoint-N.pt saves, then generate_averaged_model --iter works
    (VERDICT weak #1 regression: model_avg used to be missing -> KeyError)."""
    from zipvoice_tpu.bin import generate_averaged_model
    from zipvoice_tpu.bin.train_zipvoice_distill import main as distill_main
    from zipvoice_tpu.train.checkpoint import save_checkpoint

    model_json = {
        "model": {k: list(v) if isinstance(v, tuple) else v
                  for k, v in TINY.items()},
        "feature": {"sampling_rate": 24000, "type": "vocos", "n_mels": 20},
    }
    cfg_path = tmp_path / "model.json"
    cfg_path.write_text(json.dumps(model_json))

    tok_vocab = 28  # simple tokenizer on corpus tokens.txt
    cfg = ZipVoiceConfig(**TINY, vocab_size=tok_vocab, pad_id=0)
    teacher = init_zipvoice(jax.random.PRNGKey(7), cfg)
    teacher_path = tmp_path / "teacher.pt"
    save_checkpoint(str(teacher_path), teacher)

    exp = tmp_path / "exp_distill"
    monkeypatch.setattr(sys, "argv", [
        "train_zipvoice_distill.py",
        "--train-manifest", str(corpus / "train.tsv"),
        "--token-file", str(corpus / "tokens.txt"),
        "--tokenizer", "simple",
        "--model-config", str(cfg_path),
        "--exp-dir", str(exp),
        "--teacher-checkpoint", str(teacher_path),
        "--distill-stage", "first",
        "--num-iters", "3",
        "--save-every-n", "1",
        "--average-period", "1",
        "--max-duration", "10",
        "--dtype", "float32",
        "--log-interval", "1",
    ])
    distill_main()
    assert (exp / "checkpoint-3.pt").exists()

    monkeypatch.setattr(sys, "argv", [
        "generate_averaged_model", "--exp-dir", str(exp),
        "--iter", "3", "--avg", "2",
    ])
    generate_averaged_model.main()
    out = load_checkpoint(str(exp / "iter-3-avg-2.pt"))
    w = np.asarray(out["params"]["fm_decoder"]["in_proj"]["weight"])
    assert np.isfinite(w).all()


def test_average_checkpoints_plain_fallback(tmp_path):
    """Checkpoints without model_avg average via the plain-mean fallback."""
    from zipvoice_tpu.train.checkpoint import save_checkpoint

    cfg = ZipVoiceConfig(**TINY)
    p1 = init_zipvoice(jax.random.PRNGKey(0), cfg)
    p2 = jax.tree.map(lambda a: a + 2.0, p1)
    save_checkpoint(str(tmp_path / "checkpoint-1.pt"), p1,
                    info={"batch_idx_train": 1, "average_period": 1})
    save_checkpoint(str(tmp_path / "checkpoint-2.pt"), p2,
                    info={"batch_idx_train": 2, "average_period": 1})
    params = average_checkpoints_with_averaged_model(
        str(tmp_path / "checkpoint-1.pt"), str(tmp_path / "checkpoint-2.pt")
    )
    expect = np.asarray(p1["embed"]["weight"]) + 1.0
    np.testing.assert_allclose(
        np.asarray(params["embed"]["weight"]), expect, rtol=1e-5, atol=1e-6
    )


def test_prefetch_batches_matches_inline_and_resumes(corpus):
    """PrefetchBatches yields the same batches as inline collation and its
    state_dict trails consumption (resume-safe even though the producer
    thread runs ahead)."""
    from zipvoice_tpu.data.prefetch import PrefetchBatches

    utts = read_tsv_manifest(corpus / "train.tsv")
    ident = lambda b: [u.uid for u in b]  # noqa: E731

    sampler_a = DurationBucketSampler(utts, max_duration=5.0, seed=3)
    sampler_a.set_epoch(1)
    inline = [ident(b) for b in sampler_a]

    sampler_b = DurationBucketSampler(utts, max_duration=5.0, seed=3)
    sampler_b.set_epoch(1)
    pf = PrefetchBatches(sampler_b, ident, depth=2)
    it = iter(pf)
    got = [next(it)]
    state = pf.state_dict()
    # state reflects exactly one consumed batch, not producer progress
    assert state["batch_cursor"] == 1
    got += list(it)
    assert got == inline

    # resuming from the snapshotted state replays the remaining batches
    sampler_c = DurationBucketSampler(utts, max_duration=5.0, seed=3)
    sampler_c.load_state_dict(state)
    rest = [ident(b) for b in sampler_c]
    assert rest == inline[1:]


def test_manifest_token_columns_and_host_sharding(tmp_path, corpus):
    """4/6-column manifests carry offline tokens into the collator without
    re-tokenizing; per-host sharding hands every host the SAME batch count
    (SPMD collective alignment)."""
    from zipvoice_tpu.data.dataset import (
        DurationBucketSampler,
        read_tsv_manifest,
    )

    utts = read_tsv_manifest(corpus / "train.tsv")
    # write a 6-col variant with fake offline tokens
    six = tmp_path / "six.tsv"
    with open(six, "w") as f:
        for u in utts:
            f.write(f"{u.uid}\t{u.text}\t{u.wav_path}\t0.0\t"
                    f"{u.duration or 1.0}\ta b c\n")
    loaded = read_tsv_manifest(six)
    assert all(u.token_strs == ["a", "b", "c"] for u in loaded)

    # equal batch counts across hosts
    counts = []
    for pi in range(3):
        s = DurationBucketSampler(utts, max_duration=3.0, seed=1,
                                  process_index=pi, process_count=3)
        counts.append(len(s))
    assert len(set(counts)) == 1


def test_prefetch_close_releases_producer(corpus):
    """Breaking a prefetch loop early must not leave the producer thread
    blocked (close() drains and stops it)."""
    import threading

    from zipvoice_tpu.data.dataset import (
        DurationBucketSampler,
        read_tsv_manifest,
    )
    from zipvoice_tpu.data.prefetch import PrefetchBatches

    utts = read_tsv_manifest(corpus / "train.tsv")
    sampler = DurationBucketSampler(utts, max_duration=2.0, seed=0)
    before = threading.active_count()
    batches = PrefetchBatches(sampler, lambda b: len(b), depth=1)
    next(iter(batches))  # consume one, then abandon
    batches.close()
    batches._it._thread.join(timeout=5)
    assert not batches._it._thread.is_alive()
    assert threading.active_count() <= before + 1


def test_lr_hours_epoch_keying_matches_reference_eden():
    """--lr-hours re-keys Eden's epoch knee to hours (ref
    train_zipvoice.py:626-632 constructs Eden(lr_batches, lr_hours) and
    step_epoch(hours)): the epoch factor at h seen hours must be
    ((h^2+H^2)/H^2)^-0.25.  The previous hours/lr_hours keying (without the
    lr_epochs factor) made decay ~lr_epochs times too slow."""
    import numpy as np

    from zipvoice_tpu.train.lr_schedule import eden_lr
    from zipvoice_tpu.train.step import TrainConfig
    from zipvoice_tpu.train.trainer import Trainer, TrainerOptions

    t = Trainer.__new__(Trainer)
    t.opts = TrainerOptions(lr_hours=30000.0)
    t.train_cfg = TrainConfig(lr_epochs=10.0)
    t.epoch = 1
    t.seen_seconds = 30000.0 * 3600.0  # exactly lr_hours seen
    e = t._epoch_value()
    # epoch factor from eden_lr at this keying (batch term neutralized)
    lr = float(eden_lr(1.0, 0.0, e, lr_batches=1e6,
                       lr_epochs=t.train_cfg.lr_epochs,
                       warmup_batches=0.0, warmup_start=1.0))
    want = ((1.0**2 + 1.0) / 1.0) ** -0.25  # h == H -> 2^-0.25
    assert abs(lr - want) < 1e-6, (lr, want)


def test_unroll_layers_flag_toggles_scan():
    """--unroll-layers routes through maybe_init_distributed into
    zipformer.set_scan_layers(False) for every trainer CLI."""
    import argparse

    from zipvoice_tpu.bin._train_common import maybe_init_distributed
    from zipvoice_tpu.nn import zipformer as zf

    before = zf._SCAN_LAYERS
    try:
        zf.set_scan_layers(True)
        maybe_init_distributed(argparse.Namespace(unroll_layers=True,
                                                  distributed=False))
        assert zf._SCAN_LAYERS is False
        zf.set_scan_layers(True)
        maybe_init_distributed(argparse.Namespace(unroll_layers=False,
                                                  distributed=False))
        assert zf._SCAN_LAYERS is True
    finally:
        zf.set_scan_layers(before)
