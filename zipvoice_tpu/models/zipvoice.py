"""ZipVoice flow-matching TTS model — functional JAX core.

Rebuild of ref zipvoice/models/zipvoice.py.  Everything here is pure and
shape-static so it jits into a single XLA program per (B, T, S) bucket:

* token -> text-condition expansion is vectorized (ref common.py:246-295 uses
  Python loops; here it's integer arithmetic + one gather);
* training loss takes explicit RNG keys instead of global torch RNG;
* ``sample`` integrates the whole CFG Euler loop in one jitted program; the
  timestep schedule is Python-static so the CFG t>0.5 branch
  (ref solver.py:90-98) resolves at trace time, costing nothing at runtime.

Host-side concerns (tokenizer, duration prediction, prompt stripping) live in
the CLI layer, keeping everything below this line compiled code.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from zipvoice_tpu.config import ZipVoiceConfig
from zipvoice_tpu.nn.functional import make_pad_mask
from zipvoice_tpu.nn.zipformer import init_tts_zipformer, tts_zipformer_forward

Params = Dict[str, object]


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------


def init_zipvoice(key, cfg: ZipVoiceConfig) -> Params:
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "embed": {
            "weight": jax.random.normal(
                k1, (cfg.vocab_size, cfg.text_embed_dim), jnp.float32
            )
        },
        "fm_decoder": init_tts_zipformer(k2, cfg.fm_decoder_config()),
        "text_encoder": init_tts_zipformer(k3, cfg.text_encoder_config()),
    }


# ---------------------------------------------------------------------------
# Host-side helpers
# ---------------------------------------------------------------------------


def pad_labels(tokens: List[List[int]], pad_id: int) -> np.ndarray:
    """Pad token id lists to (B, S).  NB: like the reference (common.py:255-268)
    this appends one extra pad to every sequence, which guarantees the
    duration-expansion index `tokens_lens` is always in-bounds."""
    tokens = [list(t) + [pad_id] for t in tokens]
    max_len = max(len(t) for t in tokens)
    return np.array(
        [t + [pad_id] * (max_len - len(t)) for t in tokens], dtype=np.int32
    )


# ---------------------------------------------------------------------------
# Forward pieces
# ---------------------------------------------------------------------------


def forward_fm_decoder(
    params: Params,
    cfg: ZipVoiceConfig,
    t: jax.Array,
    xt: jax.Array,
    text_condition: jax.Array,
    speech_condition: jax.Array,
    padding_mask: Optional[jax.Array] = None,
    guidance_scale: Optional[jax.Array] = None,
    ctx=None,
) -> jax.Array:
    """Velocity prediction (ref zipvoice.py:135-185).

    t / guidance_scale: scalar or (B,)-broadcastable, in [0, 1].
    xt, text_condition, speech_condition: (B, T, F).
    ctx: optional nn.zipformer.TrainCtx enabling training-time stochastics.
    """
    # xt may ride in f32 when cfg.f32_closers keeps the Euler state in f32;
    # the backbone bulk still runs at the conditions' compute dtype
    x = jnp.concatenate(
        [xt.astype(text_condition.dtype), text_condition, speech_condition],
        axis=-1,
    )
    b = x.shape[0]
    # t stays float32: the sinusoidal embedding needs full timestep precision
    # even under bf16 compute (embedding output is cast to x.dtype after).
    t = jnp.broadcast_to(jnp.asarray(t, jnp.float32).reshape(-1), (b,))
    if guidance_scale is not None:
        guidance_scale = jnp.broadcast_to(
            jnp.asarray(guidance_scale, jnp.float32).reshape(-1), (b,)
        )
    return tts_zipformer_forward(
        params["fm_decoder"],
        cfg.fm_decoder_config(),
        x,
        t=t,
        padding_mask=padding_mask,
        guidance_scale=guidance_scale,
        ctx=ctx,
    )


def forward_text_embed(
    params: Params,
    cfg: ZipVoiceConfig,
    tokens_padded: jax.Array,
    tokens_lens: jax.Array,
    dtype=jnp.float32,
    ctx=None,
) -> jax.Array:
    """Token embedding + text encoder (ref zipvoice.py:187-212).

    tokens_padded: (B, S) int32 (already padded host-side via pad_labels).
    Returns (B, S, feat_dim).
    """
    embed = params["embed"]["weight"].astype(dtype)[tokens_padded]
    mask = make_pad_mask(tokens_lens, tokens_padded.shape[1])
    return tts_zipformer_forward(
        params["text_encoder"],
        cfg.text_encoder_config(),
        embed,
        t=None,
        padding_mask=mask,
        ctx=ctx,
    )


def average_duration_token_index(
    tokens_lens: jax.Array, features_lens: jax.Array, num_frames: int
) -> jax.Array:
    """Vectorized uniform-duration frame->token index map.

    Replaces the Python loops of prepare_avg_tokens_durations/get_tokens_index
    (ref common.py:246-295): token i covers frames [i*avg, (i+1)*avg) with
    avg = features_len // tokens_len; leftover frames point at index
    tokens_len (the extra pad appended by pad_labels).

    Returns (B, num_frames) int32.
    """
    avg = features_lens // jnp.maximum(tokens_lens, 1)  # (B,)
    frames = jnp.arange(num_frames, dtype=jnp.int32)[None, :]
    idx = frames // jnp.maximum(avg, 1)[:, None]
    idx = jnp.minimum(idx, tokens_lens[:, None])
    # degenerate avg==0 -> every frame maps to the trailing pad embedding
    idx = jnp.where((avg == 0)[:, None], tokens_lens[:, None], idx)
    return idx.astype(jnp.int32)


def forward_text_condition(
    embed: jax.Array,
    tokens_lens: jax.Array,
    features_lens: jax.Array,
    num_frames: int,
) -> Tuple[jax.Array, jax.Array]:
    """Expand token embeddings to frame rate (ref zipvoice.py:214-251).

    embed: (B, S, F) text-encoder output.  Returns ((B, T, F), (B, T) mask).
    """
    padding_mask = make_pad_mask(features_lens, num_frames)
    idx = average_duration_token_index(tokens_lens, features_lens, num_frames)
    # leftover frames index tokens_lens — the extra pad column pad_labels
    # appends (ref common.py:255-269).  Clamp to the actual S so a caller
    # that padded exactly to tokens_lens degrades to the last embedding
    # instead of an out-of-bounds gather (NaN fill under jit).
    idx = jnp.minimum(idx, embed.shape[1] - 1)
    text_condition = jnp.take_along_axis(embed, idx[:, :, None], axis=1)
    return text_condition, padding_mask


def forward_text_train(
    params: Params,
    cfg: ZipVoiceConfig,
    tokens_padded: jax.Array,
    tokens_lens: jax.Array,
    features_lens: jax.Array,
    num_frames: int,
    dtype=jnp.float32,
    ctx=None,
) -> Tuple[jax.Array, jax.Array]:
    """(ref zipvoice.py:253-268)."""
    embed = forward_text_embed(
        params, cfg, tokens_padded, tokens_lens, dtype, ctx=ctx
    )
    return forward_text_condition(embed, tokens_lens, features_lens, num_frames)


# ---------------------------------------------------------------------------
# Training forward (conditional flow matching)
# ---------------------------------------------------------------------------


def condition_time_mask(
    key,
    features_lens: jax.Array,
    max_len: int,
    mask_percent: Tuple[float, float] = (0.7, 1.0),
) -> jax.Array:
    """Random interior span mask (ref common.py:325-358).  True = masked."""
    k1, k2 = jax.random.split(key)
    b = features_lens.shape[0]
    fl = features_lens.astype(jnp.float32)
    size = (
        jax.random.uniform(k1, (b,), minval=mask_percent[0], maxval=mask_percent[1])
        * fl
    ).astype(jnp.int32)
    start = (jax.random.uniform(k2, (b,)) * (fl - size.astype(jnp.float32))).astype(
        jnp.int32
    )
    end = start + size
    seq = jnp.arange(max_len, dtype=jnp.int32)[None, :]
    return (seq >= start[:, None]) & (seq < end[:, None])


def compute_fm_loss(
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
    schedules=None,
) -> jax.Array:
    """Conditional flow-matching MSE on velocity (ref zipvoice.py:332-386).

    features/noise: (B, T, F); t: (B, 1, 1) in (0, 1).
    schedules: optional pytree from train.schedules.zipvoice_schedules —
    {"fm_decoder": ..., "text_encoder": ...} (each backbone has its own
    layer structure, so layerdrop tables differ); when given, the backbones
    run with training-time stochastics live.
    Returns scalar loss (mean over unmasked, non-padded positions).
    """
    num_frames = features.shape[1]
    k_mask, k_drop, k_text, k_fm = jax.random.split(key, 4)

    if schedules is None:
        text_ctx = fm_ctx = None
    else:
        from zipvoice_tpu.nn.zipformer import TrainCtx

        text_ctx = TrainCtx(k_text, schedules["text_encoder"])
        fm_ctx = TrainCtx(k_fm, schedules["fm_decoder"])

    text_condition, padding_mask = forward_text_train(
        params, cfg, tokens_padded, tokens_lens, features_lens, num_frames,
        dtype=features.dtype, ctx=text_ctx,
    )

    speech_condition_mask = condition_time_mask(
        k_mask, features_lens, num_frames, (0.7, 1.0)
    )
    speech_condition = jnp.where(
        speech_condition_mask[:, :, None], 0.0, features
    )

    if condition_drop_ratio > 0.0:
        drop = jax.random.uniform(k_drop, (features.shape[0], 1, 1))
        text_condition = text_condition * (drop > condition_drop_ratio).astype(
            text_condition.dtype
        )

    # mix in the features' compute dtype (t may ride in f32 — drawn at
    # full precision in train/step.py — and must not promote x_t to f32)
    tm = t.astype(features.dtype)
    xt = features * tm + noise * (1.0 - tm)
    ut = features - noise

    vt = forward_fm_decoder(
        params, cfg, t, xt, text_condition, speech_condition, padding_mask,
        ctx=fm_ctx,
    )

    loss_mask = speech_condition_mask & (~padding_mask)
    w = loss_mask[:, :, None].astype(jnp.float32)
    se = jnp.square((vt - ut).astype(jnp.float32)) * w
    return jnp.sum(se) / jnp.maximum(jnp.sum(w) * features.shape[-1], 1.0)


# ---------------------------------------------------------------------------
# Sampling (Euler ODE + classifier-free guidance) — lives in sampling/euler.py;
# re-exported here because `sample` composes it with the model forward.
# ---------------------------------------------------------------------------

from zipvoice_tpu.sampling.euler import (  # noqa: E402,F401
    cfg_velocity,
    euler_sample,
    get_time_steps,
)


def sample(
    params: Params,
    cfg: ZipVoiceConfig,
    tokens_padded: jax.Array,
    tokens_lens: jax.Array,
    prompt_features: jax.Array,
    prompt_features_lens: jax.Array,
    features_lens: jax.Array,
    noise: jax.Array,
    num_step: int = 16,
    guidance_scale: float = 1.0,
    t_shift: float = 1.0,
    distill: bool = False,
    timesteps=None,
) -> jax.Array:
    """Generate mel features given concatenated prompt+target tokens
    (ref zipvoice.py:388-486), as one shape-static jittable program.

    Args:
      tokens_padded: (B, S) prompt+target token ids, padded via pad_labels.
      tokens_lens: (B,) true prompt+target token counts.
      prompt_features: (B, T, F) prompt mel, zero-padded to the full frame
        count T (the caller pads; T is static).
      prompt_features_lens: (B,) prompt frame counts.
      features_lens: (B,) total frame counts (prompt + generated); the caller
        predicts these host-side (duration='predict' arithmetic of
        ref zipvoice.py:323-325) or passes ground truth (duration='real').
      noise: (B, T, F) standard normal.

    Returns the full (B, T, F) feature matrix at t=1; the caller strips the
    prompt region [0, prompt_features_lens) and padding (ref zipvoice.py:469-484).
    """
    num_frames = prompt_features.shape[1]
    embed = forward_text_embed(
        params, cfg, tokens_padded, tokens_lens, dtype=prompt_features.dtype
    )
    text_condition, padding_mask = forward_text_condition(
        embed, tokens_lens, features_lens, num_frames
    )
    # Zero outside the prompt region: False positions of the prompt pad mask
    # are condition frames (ref zipvoice.py:441-451).
    prompt_mask = make_pad_mask(prompt_features_lens, num_frames)
    speech_condition = jnp.where(prompt_mask[:, :, None], 0.0, prompt_features)

    return euler_sample(
        params, cfg, noise, text_condition, speech_condition, padding_mask,
        num_step=num_step, guidance_scale=guidance_scale, t_shift=t_shift,
        distill=distill, timesteps=timesteps,
    )


def predict_features_lens(
    prompt_features_lens: np.ndarray,
    prompt_tokens_lens: np.ndarray,
    tokens_lens: np.ndarray,
    speed: float = 1.0,
) -> np.ndarray:
    """Duration prediction by token-count ratio (ref zipvoice.py:323-325).
    Host-side numpy."""
    extra = np.ceil(
        prompt_features_lens / np.maximum(prompt_tokens_lens, 1) * tokens_lens / speed
    ).astype(np.int64)
    return prompt_features_lens + extra
