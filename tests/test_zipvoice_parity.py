"""End-to-end parity of the ZipVoice model (text cond + CFM + CFG sampling)
against the reference torch implementation with injected noise."""

import numpy as np
import pytest

from tests.conftest import requires_reference

from zipvoice_tpu.config import ZipVoiceConfig
from zipvoice_tpu.io.checkpoint import state_dict_to_params
from zipvoice_tpu.models import zipvoice as zv

TINY = dict(
    fm_decoder_downsampling_factor=(1, 2, 1),
    fm_decoder_num_layers=(1, 1, 1),
    fm_decoder_cnn_module_kernel=(9, 7, 9),
    fm_decoder_feedforward_dim=192,
    fm_decoder_num_heads=2,
    fm_decoder_dim=64,
    text_encoder_num_layers=1,
    text_encoder_feedforward_dim=96,
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
    vocab_size=30,
    pad_id=0,
)


@pytest.fixture(scope="module")
def models(reference_path):
    import torch

    from zipvoice.models.zipvoice import ZipVoice

    torch.manual_seed(0)
    tiny = {
        k: (list(v) if isinstance(v, tuple) else v) for k, v in TINY.items()
    }
    ref = ZipVoice(**tiny)
    ref.eval()
    params = state_dict_to_params(
        {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    )
    cfg = ZipVoiceConfig(**TINY)
    return ref, params, cfg


TOKENS = [[3, 5, 7, 2, 9, 11], [4, 6, 8]]
PROMPT_TOKENS = [[12, 13], [14, 15, 16]]


@requires_reference
def test_text_condition_parity(models):
    import torch

    ref, params, cfg = models
    tokens = [p + t for p, t in zip(PROMPT_TOKENS, TOKENS)]
    features_lens = np.array([40, 25])
    num_frames = 40

    with torch.no_grad():
        embed_t, tokens_lens_t = ref.forward_text_embed(tokens)
        ref_cond, ref_mask = ref.forward_text_condition(
            embed_t, tokens_lens_t, torch.tensor(features_lens)
        )

    tokens_padded = zv.pad_labels(tokens, cfg.pad_id)
    tokens_lens = np.array([len(t) for t in tokens])
    embed = zv.forward_text_embed(params, cfg, tokens_padded, tokens_lens)
    cond, mask = zv.forward_text_condition(
        embed, tokens_lens, features_lens, num_frames
    )

    np.testing.assert_array_equal(np.asarray(mask), ref_mask.numpy())
    err = np.abs(np.asarray(cond) - ref_cond.numpy()).max()
    assert err < 1e-4, f"text condition err {err}"


@requires_reference
def test_fm_decoder_parity(models):
    import torch

    ref, params, cfg = models
    rng = np.random.default_rng(0)
    b, t, f = 2, 24, TINY["feat_dim"]
    xt = rng.standard_normal((b, t, f), dtype=np.float32)
    tc = rng.standard_normal((b, t, f), dtype=np.float32)
    sc = rng.standard_normal((b, t, f), dtype=np.float32)
    tt = np.float32(0.3)
    mask = np.arange(t)[None, :] >= np.array([24, 17])[:, None]

    with torch.no_grad():
        ref_v = ref.forward_fm_decoder(
            t=torch.tensor(tt),
            xt=torch.from_numpy(xt),
            text_condition=torch.from_numpy(tc),
            speech_condition=torch.from_numpy(sc),
            padding_mask=torch.from_numpy(mask),
        ).numpy()

    v = np.asarray(
        zv.forward_fm_decoder(params, cfg, tt, xt, tc, sc, padding_mask=mask)
    )
    err = np.abs(v - ref_v).max()
    assert err < 1e-4, f"fm decoder err {err}"


@requires_reference
@pytest.mark.parametrize("guidance_scale,num_step", [(0.0, 4), (1.0, 8)])
def test_sampling_parity(models, guidance_scale, num_step):
    """Compare the full Euler+CFG integration given identical noise/conditions
    (the reference pieces are composed exactly as ZipVoice.sample does,
    ref zipvoice.py:388-486, minus the internal randn)."""
    import torch

    ref, params, cfg = models
    rng = np.random.default_rng(1)

    tokens = [p + t for p, t in zip(PROMPT_TOKENS, TOKENS)]
    tokens_lens = np.array([len(t) for t in tokens])
    prompt_features_lens = np.array([9, 7])
    features_lens = np.array([36, 21])
    num_frames = 36
    f = TINY["feat_dim"]

    prompt_features = np.zeros((2, num_frames, f), np.float32)
    for i, l in enumerate(prompt_features_lens):
        prompt_features[i, :l] = rng.standard_normal((l, f), dtype=np.float32)
    noise = rng.standard_normal((2, num_frames, f), dtype=np.float32)

    # --- reference path
    with torch.no_grad():
        embed_t, tl_t = ref.forward_text_embed(tokens)
        text_cond_t, pad_mask_t = ref.forward_text_condition(
            embed_t, tl_t, torch.tensor(features_lens)
        )
        from zipvoice.utils.common import make_pad_mask as ref_make_pad_mask

        prompt_mask = ref_make_pad_mask(
            torch.tensor(prompt_features_lens), num_frames
        )
        speech_cond_t = torch.where(
            prompt_mask.unsqueeze(-1),
            torch.zeros(1),
            torch.from_numpy(prompt_features),
        )
        ref_x1 = ref.solver.sample(
            x=torch.from_numpy(noise),
            text_condition=text_cond_t,
            speech_condition=speech_cond_t,
            padding_mask=pad_mask_t,
            num_step=num_step,
            guidance_scale=guidance_scale,
            t_shift=0.5,
        ).numpy()

    # --- ours
    tokens_padded = zv.pad_labels(tokens, cfg.pad_id)
    x1 = np.asarray(
        zv.sample(
            params,
            cfg,
            tokens_padded,
            tokens_lens,
            prompt_features,
            prompt_features_lens,
            features_lens,
            noise,
            num_step=num_step,
            guidance_scale=guidance_scale,
            t_shift=0.5,
        )
    )
    err = np.abs(x1 - ref_x1).max()
    mse = np.mean((x1 - ref_x1) ** 2)
    assert mse < 1e-6, f"sample mse {mse} max {err}"


@requires_reference
def test_duration_prediction_parity(models):
    import torch

    ref, params, cfg = models
    prompt_features_lens = np.array([9, 7])
    with torch.no_grad():
        _, pad_mask_t = ref.forward_text_inference_ratio_duration(
            tokens=TOKENS,
            prompt_tokens=PROMPT_TOKENS,
            prompt_features_lens=torch.tensor(prompt_features_lens),
            speed=1.0,
        )
        ref_lens = (~pad_mask_t).sum(-1).numpy()

    lens = zv.predict_features_lens(
        prompt_features_lens,
        np.array([len(t) for t in PROMPT_TOKENS]),
        np.array([len(t) for t in TOKENS]),
        speed=1.0,
    )
    np.testing.assert_array_equal(lens, ref_lens)


def test_f32_closers_improves_bf16_fidelity():
    """ZipVoiceConfig(f32_closers=True) — f32 time-embed MLP, f32 velocity
    head, f32 Euler/CFG state — must strictly reduce the bf16-vs-f32 sampler
    mel MSE on the same weights/noise, without changing the output dtype or
    the f32 result (docs/parity.md bf16-headroom plan, VERDICT r3 next #6)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    cfg = ZipVoiceConfig(**TINY)
    params = zv.init_zipvoice(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    b, t, s = 1, 64, 18
    tokens = zv.pad_labels([list(rng.integers(1, cfg.vocab_size, s))],
                           cfg.pad_id)
    tl = np.array([s], np.int32)
    pf = np.zeros((b, t, cfg.feat_dim), np.float32)
    pf[0, :20] = rng.standard_normal((20, cfg.feat_dim)) * 0.1
    pl = np.array([20], np.int32)
    fl = np.array([t], np.int32)
    noise = rng.standard_normal((b, t, cfg.feat_dim)).astype(np.float32)

    def run(dtype, run_cfg):
        p = jax.tree.map(lambda a: jnp.asarray(a, dtype), params)
        out = zv.sample(
            p, run_cfg, tokens, tl, jnp.asarray(pf, dtype), pl, fl,
            jnp.asarray(noise, dtype), num_step=8, guidance_scale=1.0,
            t_shift=0.5,
        )
        assert out.dtype == dtype  # flag must not leak f32 outputs
        return np.asarray(out.astype(jnp.float32))[0]

    cfg_cl = dataclasses.replace(cfg, f32_closers=True)
    ref = run(jnp.float32, cfg)
    # the flag must be a no-op at f32 (closers were already f32)
    np.testing.assert_allclose(run(jnp.float32, cfg_cl), ref, atol=1e-6)
    mse_plain = float(np.mean((run(jnp.bfloat16, cfg) - ref) ** 2))
    mse_closers = float(np.mean((run(jnp.bfloat16, cfg_cl) - ref) ** 2))
    assert mse_closers < mse_plain, (mse_plain, mse_closers)
