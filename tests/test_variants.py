"""Parity tests for the Distill / Dialog / Dialog-Stereo variants."""

import numpy as np
import pytest

from tests.conftest import requires_reference

import jax
import jax.numpy as jnp

from zipvoice_tpu.config import ZipVoiceConfig
from zipvoice_tpu.io.checkpoint import state_dict_to_params
from zipvoice_tpu.models import dialog as zd
from zipvoice_tpu.models import distill as zdist
from zipvoice_tpu.models import zipvoice as zv

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
SPK_A, SPK_B = 28, 29


def _tiny_list():
    return {k: (list(v) if isinstance(v, tuple) else v) for k, v in TINY.items()}


@requires_reference
def test_dialog_text_embed_parity(reference_path):
    import torch

    from zipvoice.models.zipvoice_dialog import ZipVoiceDialog

    torch.manual_seed(0)
    ref = ZipVoiceDialog(**_tiny_list(), vocab_size=30, pad_id=0,
                         spk_a_id=SPK_A, spk_b_id=SPK_B)
    ref.eval()
    params = state_dict_to_params(
        {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    )
    cfg = ZipVoiceConfig(**TINY, vocab_size=30, pad_id=0)

    tokens = [[SPK_A, 3, 4, 5, SPK_B, 6, 7, SPK_A, 8], [SPK_B, 9, 10]]
    with torch.no_grad():
        ref_embed, ref_lens = ref.forward_text_embed(tokens)

    tokens_padded = zv.pad_labels(tokens, 0)
    tokens_lens = np.array([len(t) for t in tokens])
    embed = zd.forward_text_embed(
        params, cfg, tokens_padded, tokens_lens,
        spk_a_id=SPK_A, spk_b_id=SPK_B,
    )
    err = np.abs(np.asarray(embed) - ref_embed.numpy()).max()
    assert err < 1e-4, f"dialog text embed err {err}"


@requires_reference
def test_speaker_parity_matches_reference(reference_path):
    import torch

    from zipvoice.models.zipvoice_dialog import ZipVoiceDialog

    torch.manual_seed(0)
    ref = ZipVoiceDialog(**_tiny_list(), vocab_size=30, pad_id=0,
                         spk_a_id=SPK_A, spk_b_id=SPK_B)
    toks = torch.tensor([[SPK_A, 3, 4, SPK_B, 5, 0, 0], [3, 3, SPK_B, 4, 5, 6, 0]])
    a_idx, b_idx = ref.extract_spk_indices(toks)
    spk = np.asarray(zd.speaker_parity(np.asarray(toks), 0, SPK_A, SPK_B))
    ref_spk = np.full(toks.shape, -1)
    ref_spk[tuple(i.numpy() for i in a_idx)] = 0
    ref_spk[tuple(i.numpy() for i in b_idx)] = 1
    np.testing.assert_array_equal(spk, ref_spk)


@requires_reference
def test_two_stream_backbone_parity(reference_path):
    import torch

    from zipvoice.models.modules.zipformer_two_stream import TTSZipformerTwoStream

    torch.manual_seed(1)
    f = TINY["feat_dim"]
    kw = dict(
        in_dim=(f * 5, f * 3),
        out_dim=(f * 2, f),
        downsampling_factor=list(TINY["fm_decoder_downsampling_factor"]),
        num_encoder_layers=list(TINY["fm_decoder_num_layers"]),
        cnn_module_kernel=list(TINY["fm_decoder_cnn_module_kernel"]),
        encoder_dim=TINY["fm_decoder_dim"],
        feedforward_dim=TINY["fm_decoder_feedforward_dim"],
        num_heads=TINY["fm_decoder_num_heads"],
        query_head_dim=TINY["query_head_dim"],
        pos_head_dim=TINY["pos_head_dim"],
        value_head_dim=TINY["value_head_dim"],
        pos_dim=TINY["pos_dim"],
        use_time_embed=True,
        time_embed_dim=TINY["time_embed_dim"],
    )
    ref = TTSZipformerTwoStream(**kw)
    ref.eval()
    params = state_dict_to_params(
        {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    )
    from zipvoice_tpu.nn.zipformer import tts_zipformer_forward

    cfg = ZipVoiceConfig(**TINY, vocab_size=30, pad_id=0).fm_decoder_config()
    rng = np.random.default_rng(0)
    tt = rng.uniform(0, 1, (2,)).astype(np.float32)
    for width, out_width in [(f * 5, f * 2), (f * 3, f)]:
        x = rng.standard_normal((2, 21, width), dtype=np.float32)
        with torch.no_grad():
            ref_out = ref(torch.from_numpy(x), torch.from_numpy(tt)).numpy()
        out = np.asarray(tts_zipformer_forward(params, cfg, x, t=tt))
        assert out.shape == (2, 21, out_width)
        err = np.abs(out - ref_out).max()
        assert err < 1e-4, f"two-stream width={width} err {err}"


@requires_reference
def test_sample_intermediate_parity(reference_path):
    import torch

    from zipvoice.models.zipvoice import ZipVoice

    torch.manual_seed(2)
    ref = ZipVoice(**_tiny_list(), vocab_size=30, pad_id=0)
    ref.eval()
    params = state_dict_to_params(
        {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    )
    cfg = ZipVoiceConfig(**TINY, vocab_size=30, pad_id=0)

    rng = np.random.default_rng(3)
    tokens = [[3, 4, 5, 6], [7, 8, 9]]
    b, t_frames, f = 2, 28, TINY["feat_dim"]
    features = rng.standard_normal((b, t_frames, f), dtype=np.float32)
    features_lens = np.array([28, 20])
    noise = rng.standard_normal((b, t_frames, f), dtype=np.float32)
    scm = (np.arange(t_frames)[None, :] >= np.array([5, 4])[:, None])

    with torch.no_grad():
        ref_x, _ = ref.sample_intermediate(
            tokens=tokens,
            features=torch.from_numpy(features),
            features_lens=torch.from_numpy(features_lens),
            noise=torch.from_numpy(noise),
            speech_condition_mask=torch.from_numpy(scm),
            t_start=0.2,
            t_end=0.7,
            num_step=2,
            guidance_scale=torch.full((b, 1, 1), 0.5),
        )

    tokens_padded = zv.pad_labels(tokens, 0)
    tokens_lens = np.array([len(x) for x in tokens])
    # guidance as (B,1,1) tensor goes through the CFG path with scalar-equal
    # values; our CFG path takes the python float
    x = zdist.sample_intermediate(
        params, cfg, tokens_padded, tokens_lens, features, features_lens,
        noise, scm, t_start=0.2, t_end=0.7, num_step=2, guidance_scale=0.5,
        distill=False,
    )
    err = np.abs(np.asarray(x) - ref_x.numpy()).max()
    assert err < 2e-4, f"sample_intermediate err {err}"


@requires_reference
def test_energy_loss_parity(reference_path):
    import torch

    from zipvoice.models.zipvoice_dialog import ZipVoiceDialogStereo

    torch.manual_seed(3)
    ref = ZipVoiceDialogStereo(**_tiny_list(), vocab_size=30, pad_id=0,
                               spk_a_id=SPK_A, spk_b_id=SPK_B)
    f = TINY["feat_dim"]
    rng = np.random.default_rng(4)
    f1 = rng.standard_normal((2, 13, f), dtype=np.float32)
    f2 = rng.standard_normal((2, 13, f), dtype=np.float32)
    gt = rng.standard_normal((2, 13, 2 * f), dtype=np.float32)
    with torch.no_grad():
        ref_pen = ref.energy_based_loss(
            torch.from_numpy(f1), torch.from_numpy(f2), torch.from_numpy(gt)
        ).numpy()
    pen = np.asarray(zd.energy_based_loss(f1, f2, gt, f))
    np.testing.assert_allclose(pen, ref_pen, atol=1e-5)


def test_stereo_projection_surgery():
    cfg = ZipVoiceConfig(**TINY, vocab_size=30, pad_id=0)
    params = zd.init_zipvoice_dialog(jax.random.PRNGKey(0), cfg)
    f = cfg.feat_dim
    stereo = zd.duplicate_projections_stereo(params, f)
    w = np.asarray(params["fm_decoder"]["in_proj"]["weight"])
    w0 = np.asarray(stereo["fm_decoder"]["in_proj"]["0"]["weight"])
    assert w0.shape == (5 * f, w.shape[1])
    np.testing.assert_allclose(w0[:f], w[:f] / 2, atol=0)
    np.testing.assert_allclose(w0[f:2*f], w[:f] / 2, atol=0)
    np.testing.assert_allclose(w0[2*f:3*f], w[f:2*f], atol=0)
    np.testing.assert_allclose(w0[3*f:4*f], w[2*f:] / 2, atol=0)
    ow = np.asarray(params["fm_decoder"]["out_proj"]["weight"])
    ow0 = np.asarray(stereo["fm_decoder"]["out_proj"]["0"]["weight"])
    np.testing.assert_allclose(ow0[:, :f], ow, atol=0)
    np.testing.assert_allclose(ow0[:, f:], ow, atol=0)
    # mixed stream unchanged
    np.testing.assert_allclose(
        np.asarray(stereo["fm_decoder"]["in_proj"]["1"]["weight"]), w, atol=0
    )
    # stereo loss runs with the surgically-built params
    rng = np.random.default_rng(5)
    feats = rng.standard_normal((2, 24, 2 * f), dtype=np.float32)
    loss = zd.compute_fm_loss_dialog(
        stereo, cfg, zv.pad_labels([[3, SPK_A, 4], [5, 6, SPK_B]], 0),
        np.array([3, 3]), feats, np.array([24, 18]),
        rng.standard_normal((2, 24, 2 * f), dtype=np.float32).astype(np.float32),
        np.full((2, 1, 1), 0.4, np.float32), jax.random.PRNGKey(1),
        se_weight=1.0, stereo=True,
    )
    assert np.isfinite(float(loss))


def test_distill_loss_and_ema():
    cfg = ZipVoiceConfig(**TINY, vocab_size=30, pad_id=0)
    student = zdist.init_zipvoice_distill(jax.random.PRNGKey(0), cfg)
    teacher = jax.tree.map(lambda a: a.copy(), student)
    rng = np.random.default_rng(6)
    b, t_frames, f = 2, 24, TINY["feat_dim"]
    dcfg = zdist.distill_config(cfg)
    loss, ref_loss = zdist.compute_distill_loss(
        student, teacher, dcfg,
        zv.pad_labels([[3, 4, 5], [6, 7]], 0), np.array([3, 2]),
        rng.standard_normal((b, t_frames, f), dtype=np.float32),
        np.array([24, 16]), jax.random.PRNGKey(2),
        t_value=0.3, t_delta_fix=0.2, t_delta_ema=0.1, stage="second",
    )
    assert np.isfinite(float(loss)) and np.isfinite(float(ref_loss))
    new_teacher = zdist.ema_update(teacher, jax.tree.map(lambda a: a * 2, student))
    d = np.asarray(new_teacher["embed"]["weight"]) - np.asarray(
        teacher["embed"]["weight"]
    )
    expected = 1e-4 * np.asarray(student["embed"]["weight"])
    np.testing.assert_allclose(d, expected, rtol=1e-3, atol=1e-8)


@requires_reference
def test_sample_intermediate_distill_default_guidance_parity(reference_path):
    """distill=True with NO guidance passed must embed the solver's
    documented DEFAULT 0.0 scale (ref solver.py:134: guidance_scale=0.0,
    always tensorized and embedded; its sinusoidal embedding at 0.0 is
    nonzero since cos(0)=1) — None previously skipped the embedding branch
    entirely, changing the network input.  The reference side is driven
    with an explicit 0.0 (its own sample_intermediate default of None
    crashes in torch.tensor; real callers always pass a value)."""
    import torch

    from zipvoice.models.zipvoice_distill import ZipVoiceDistill

    torch.manual_seed(4)
    ref = ZipVoiceDistill(**_tiny_list(), vocab_size=30, pad_id=0)
    ref.eval()
    params = state_dict_to_params(
        {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    )
    from zipvoice_tpu.models.distill import distill_config

    cfg = distill_config(ZipVoiceConfig(**TINY, vocab_size=30, pad_id=0))

    rng = np.random.default_rng(5)
    tokens = [[3, 4, 5, 6], [7, 8, 9]]
    b, t_frames, f = 2, 28, TINY["feat_dim"]
    features = rng.standard_normal((b, t_frames, f), dtype=np.float32)
    features_lens = np.array([28, 20])
    noise = rng.standard_normal((b, t_frames, f), dtype=np.float32)
    scm = (np.arange(t_frames)[None, :] >= np.array([5, 4])[:, None])

    with torch.no_grad():
        ref_x, _ = ref.sample_intermediate(
            tokens=tokens,
            features=torch.from_numpy(features),
            features_lens=torch.from_numpy(features_lens),
            noise=torch.from_numpy(noise),
            speech_condition_mask=torch.from_numpy(scm),
            t_start=0.2,
            t_end=0.7,
            num_step=2,
            guidance_scale=torch.zeros((2, 1, 1)),
        )

    tokens_padded = zv.pad_labels(tokens, 0)
    tokens_lens = np.array([len(x) for x in tokens])
    x = zdist.sample_intermediate(
        params, cfg, tokens_padded, tokens_lens, features, features_lens,
        noise, scm, t_start=0.2, t_end=0.7, num_step=2, distill=True,
    )
    err = np.abs(np.asarray(x) - ref_x.numpy()).max()
    assert err < 2e-4, f"distill default-guidance err {err}"
