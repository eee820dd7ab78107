"""ZipVoice-Dialog and ZipVoice-Dialog-Stereo.

Rebuild of ref zipvoice/models/zipvoice_dialog.py: two-party dialogue TTS
with speaker-turn tokens [S1]/[S2].  Differences from the base model:

* a 2-row speaker embedding added to the *text-encoder output* at positions
  owned by each speaker, computed from the cumulative parity of turn tokens
  (ref :118-158) — vectorized here as a cumsum + where;
* training masks the *suffix* of the features (mask_percent (0.5, 1.0),
  ref :187-191) rather than an interior span;
* the stereo variant swaps the fm_decoder for a two-stream backbone
  (5F/3F in, 2F/F out) and adds a speaker-exclusive "energy" penalty on the
  one-step denoised estimate (ref :218-358).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from zipvoice_tpu.config import ZipVoiceConfig
from zipvoice_tpu.models import zipvoice as zv
from zipvoice_tpu.nn.functional import make_pad_mask
from zipvoice_tpu.nn.zipformer import init_tts_zipformer_two_stream

Params = Dict[str, object]

SPK_A_ID_DEFAULT = 360
SPK_B_ID_DEFAULT = 361


def init_zipvoice_dialog(key, cfg: ZipVoiceConfig) -> Params:
    """Base params + spk_embed (2, feat_dim), init N(0, 0.1) (ref :115-116)."""
    k1, k2 = jax.random.split(key)
    params = zv.init_zipvoice(k1, cfg)
    params["spk_embed"] = {
        "weight": 0.1 * jax.random.normal(k2, (2, cfg.feat_dim), jnp.float32)
    }
    return params


def init_zipvoice_dialog_stereo(key, cfg: ZipVoiceConfig) -> Params:
    """Dialog params with a two-stream fm_decoder: stream 0 = stereo
    (in 5F -> out 2F), stream 1 = mixed mono (in 3F -> out F) (ref :241-256)."""
    k1, k2 = jax.random.split(key)
    params = init_zipvoice_dialog(k1, cfg)
    f = cfg.feat_dim
    params["fm_decoder"] = init_tts_zipformer_two_stream(
        k2, cfg.fm_decoder_config(), in_dims=(f * 5, f * 3), out_dims=(f * 2, f)
    )
    return params


def speaker_parity(
    tokens_padded: jax.Array,
    pad_id: int,
    spk_a_id: int = SPK_A_ID_DEFAULT,
    spk_b_id: int = SPK_B_ID_DEFAULT,
) -> jax.Array:
    """(B, S) -> (B, S) in {-1, 0, 1}: owner speaker of each token position
    by cumulative turn-token parity; -1 at padding (ref :118-125).

    Note the reference counts the turn token itself into the cumsum, so the
    [S1] token position itself flips parity (speaker A's [S1] yields count 1
    -> parity 1?  No: [S1] increments to odd, and parity 1 positions get
    spk_b... matching ref exactly: parity = cumsum % 2, speaker A == 0).
    """
    turn = (tokens_padded == spk_a_id) | (tokens_padded == spk_b_id)
    counts = jnp.cumsum(turn.astype(jnp.int32), axis=1)
    parity = counts % 2
    return jnp.where(tokens_padded == pad_id, -1, parity)


def forward_text_embed(
    params: Params,
    cfg: ZipVoiceConfig,
    tokens_padded: jax.Array,
    tokens_lens: jax.Array,
    dtype=jnp.float32,
    spk_a_id: int = SPK_A_ID_DEFAULT,
    spk_b_id: int = SPK_B_ID_DEFAULT,
    ctx=None,
) -> jax.Array:
    """Text encoder output + per-speaker embedding add (ref :127-159)."""
    embed = zv.forward_text_embed(
        params, cfg, tokens_padded, tokens_lens, dtype, ctx=ctx
    )
    spk = speaker_parity(tokens_padded, cfg.pad_id, spk_a_id, spk_b_id)
    spk_w = params["spk_embed"]["weight"].astype(embed.dtype)
    embed = embed + jnp.where((spk == 0)[:, :, None], spk_w[0], 0.0)
    embed = embed + jnp.where((spk == 1)[:, :, None], spk_w[1], 0.0)
    return embed


def condition_time_mask_suffix(
    key, features_lens: jax.Array, max_len: int,
    mask_percent: Tuple[float, float] = (0.5, 1.0),
) -> jax.Array:
    """Mask a random-size span anchored at the utterance end
    (ref common.py:360-392)."""
    b = features_lens.shape[0]
    fl = features_lens.astype(jnp.float32)
    size = (
        jax.random.uniform(key, (b,), minval=mask_percent[0], maxval=mask_percent[1])
        * fl
    ).astype(jnp.int32)
    start = features_lens.astype(jnp.int32) - size
    end = start + size
    seq = jnp.arange(max_len, dtype=jnp.int32)[None, :]
    return (seq >= start[:, None]) & (seq < end[:, None])


def compute_fm_loss_dialog(
    params: Params,
    cfg: ZipVoiceConfig,
    tokens_padded: jax.Array,
    tokens_lens: jax.Array,
    features: jax.Array,
    features_lens: jax.Array,
    noise: jax.Array,
    t: jax.Array,
    key,
    condition_drop_ratio: float = 0.0,
    se_weight: float = 0.0,
    stereo: bool = False,
    schedules=None,
) -> jax.Array:
    """Dialog CFM loss with suffix condition mask (ref :161-215); with
    stereo=True and se_weight>0 adds the speaker-exclusive energy loss on the
    2-channel one-step estimate (ref :258-350)."""
    num_frames = features.shape[1]
    k_mask, k_drop, k_text, k_fm = jax.random.split(key, 4)

    if schedules is None:
        text_ctx = fm_ctx = None
    else:
        from zipvoice_tpu.nn.zipformer import TrainCtx

        text_ctx = TrainCtx(k_text, schedules["text_encoder"])
        fm_ctx = TrainCtx(k_fm, schedules["fm_decoder"])

    embed = forward_text_embed(
        params, cfg, tokens_padded, tokens_lens, dtype=features.dtype,
        ctx=text_ctx,
    )
    text_condition, padding_mask = zv.forward_text_condition(
        embed, tokens_lens, features_lens, num_frames
    )

    speech_condition_mask = condition_time_mask_suffix(
        k_mask, features_lens, num_frames, (0.5, 1.0)
    )
    speech_condition = jnp.where(speech_condition_mask[:, :, None], 0.0, features)

    if condition_drop_ratio > 0.0:
        drop = jax.random.uniform(k_drop, (features.shape[0], 1, 1))
        text_condition = text_condition * (drop > condition_drop_ratio).astype(
            text_condition.dtype
        )

    # mix in the features' compute dtype (t rides in f32 — see
    # zipvoice.compute_fm_loss / train.step for the draw-precision contract)
    tm = t.astype(features.dtype)
    xt = features * tm + noise * (1.0 - tm)
    ut = features - noise

    vt = zv.forward_fm_decoder(
        params, cfg, t, xt, text_condition, speech_condition, padding_mask,
        ctx=fm_ctx,
    )

    loss_mask = speech_condition_mask & (~padding_mask)
    w = loss_mask[:, :, None].astype(jnp.float32)
    se = jnp.square((vt - ut).astype(jnp.float32)) * w
    fm_loss = jnp.sum(se) / jnp.maximum(jnp.sum(w) * features.shape[-1], 1.0)

    if stereo and se_weight > 0:
        f = cfg.feat_dim
        target = xt + vt * (1.0 - t)  # one-step denoised estimate (ref :315)
        energy_pen = energy_based_loss(
            target[:, :, :f], target[:, :, f:], features, f
        )
        wm = loss_mask.astype(jnp.float32)
        energy_loss = jnp.sum(energy_pen * wm) / jnp.maximum(jnp.sum(wm), 1.0)
        return fm_loss + se_weight * energy_loss
    return fm_loss


def energy_based_loss(fbank1, fbank2, gt_fbank, feat_dim: int):
    """Both-speaking penalty: product of over-threshold energies, threshold =
    median frame energy of the ground truth channels (ref :327-358)."""
    e1 = jnp.mean(fbank1.astype(jnp.float32), axis=-1)
    e2 = jnp.mean(fbank2.astype(jnp.float32), axis=-1)
    gt_both = jnp.concatenate(
        [gt_fbank[:, :, :feat_dim], gt_fbank[:, :, feat_dim:]], axis=1
    )
    frame_energy = jnp.mean(gt_both.astype(jnp.float32), axis=-1)  # (B, 2T)
    thresh = jnp.quantile(frame_energy, 0.5, axis=1)[:, None]
    both = ((e1 > thresh) & (e2 > thresh)).astype(jnp.float32)
    return both * (e1 - thresh) * (e2 - thresh)


def sample_dialog(
    params: Params,
    cfg: ZipVoiceConfig,
    tokens_padded: jax.Array,
    tokens_lens: jax.Array,
    prompt_features: jax.Array,
    prompt_features_lens: jax.Array,
    features_lens: jax.Array,
    noise: jax.Array,
    num_step: int = 16,
    guidance_scale: float = 1.5,
    t_shift: float = 0.5,
    spk_a_id: int = SPK_A_ID_DEFAULT,
    spk_b_id: int = SPK_B_ID_DEFAULT,
    timesteps=None,
) -> jax.Array:
    """Dialog sampling == base sampling with the speaker-aware text embed
    (ref: ZipVoiceDialog inherits ZipVoice.sample).  The mono/stereo
    backbone stream is selected by INPUT WIDTH auto-dispatch inside
    tts_zipformer_forward (a 2F prompt/noise pair routes to the stereo
    stream 0) — there is deliberately no stream argument here."""
    num_frames = prompt_features.shape[1]
    embed = forward_text_embed(
        params, cfg, tokens_padded, tokens_lens, dtype=prompt_features.dtype,
        spk_a_id=spk_a_id, spk_b_id=spk_b_id,
    )
    text_condition, padding_mask = zv.forward_text_condition(
        embed, tokens_lens, features_lens, num_frames
    )
    prompt_mask = make_pad_mask(prompt_features_lens, num_frames)
    speech_condition = jnp.where(prompt_mask[:, :, None], 0.0, prompt_features)
    return zv.euler_sample(
        params, cfg, noise, text_condition, speech_condition, padding_mask,
        num_step=num_step, guidance_scale=guidance_scale, t_shift=t_shift,
        timesteps=timesteps,
    )


# ---------------------------------------------------------------------------
# Surgical checkpoint transforms (numpy, host-side)
# ---------------------------------------------------------------------------


def extend_vocab_params(fresh_params: Params, loaded_params: Params) -> Params:
    """Initialize a dialog model from a base-ZipVoice checkpoint: copy every
    loaded tensor, keep the fresh model's spk_embed and its extra embed rows
    (+28 dialog tokens), overwriting the original rows with the loaded ones
    (ref checkpoint.py:149-172, train_zipvoice_dialog.py:783-788)."""
    import numpy as np

    from zipvoice_tpu.io.checkpoint import (
        params_to_state_dict,
        state_dict_to_params,
    )

    fresh = params_to_state_dict(jax.tree.map(np.asarray, fresh_params))
    loaded = params_to_state_dict(jax.tree.map(np.asarray, loaded_params))
    out = dict(fresh)
    for k, v in loaded.items():
        if k == "embed.weight":
            emb = fresh["embed.weight"].copy()
            emb[: v.shape[0]] = v
            out["embed.weight"] = emb
        elif k in fresh:
            out[k] = v
    return state_dict_to_params(out)


def duplicate_projections_stereo(params: Params, feat_dim: int) -> Params:
    """Mono fm_decoder in/out projections -> two-stream lists with the
    channel-averaging weight surgery of ref checkpoint.py:175-231:

    in:  stream0 W = [W_x/2, W_x/2, W_tc, W_sc/2, W_sc/2] (input 5F),
         stream1 = original (3F);
    out: stream0 W = [W; W] (output 2F), stream1 = original (F).

    Our weights are (in, out) so the splits apply to axis 0 (in) / axis 1 (out).
    """
    import numpy as np

    fm = dict(params["fm_decoder"])
    w = np.asarray(fm["in_proj"]["weight"])  # (3F, D)
    b = np.asarray(fm["in_proj"]["bias"])
    f = feat_dim
    w0 = np.concatenate(
        [w[:f] / 2, w[:f] / 2, w[f : 2 * f], w[2 * f :] / 2, w[2 * f :] / 2],
        axis=0,
    )  # (5F, D)
    fm["in_proj"] = {
        "0": {"weight": w0, "bias": b.copy()},
        "1": {"weight": w.copy(), "bias": b.copy()},
    }
    ow = np.asarray(fm["out_proj"]["weight"])  # (D, F)
    ob = np.asarray(fm["out_proj"]["bias"])
    fm["out_proj"] = {
        "0": {"weight": np.concatenate([ow, ow], axis=1),
              "bias": np.concatenate([ob, ob], axis=0)},
        "1": {"weight": ow.copy(), "bias": ob.copy()},
    }
    out = dict(params)
    out["fm_decoder"] = fm
    return out
