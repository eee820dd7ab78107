"""ZipVoice-Distill: guidance-scale-embedded student + distillation losses.

Rebuild of ref zipvoice/models/zipvoice_distill.py (model) and
bin/train_zipvoice_distill.py:378-518 (two-stage distillation):

* the student's fm_decoder takes the guidance scale as an embedding input
  (use_guidance_scale_embed=True) so inference needs no CFG doubling;
* stage 1: fixed teacher = trained ZipVoice; stage 2: teacher = EMA of the
  student (decay 0.9999, ref :288, :652-653);
* per step: two chained 1-step teacher hops t -> t+d_fix -> t_dest and one
  student hop t -> t_dest; MSE on implied velocities.

Only fm_decoder params train (ref :967-975) — handled by a gradient mask.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from zipvoice_tpu.config import ZipVoiceConfig
from zipvoice_tpu.models import zipvoice as zv
from zipvoice_tpu.nn.functional import make_pad_mask

Params = Dict[str, object]


def distill_config(cfg: ZipVoiceConfig) -> ZipVoiceConfig:
    import dataclasses

    return dataclasses.replace(cfg, use_guidance_scale_embed=True)


def init_zipvoice_distill(key, cfg: ZipVoiceConfig) -> Params:
    return zv.init_zipvoice(key, distill_config(cfg))


def sample_intermediate(
    params: Params,
    cfg: ZipVoiceConfig,
    tokens_padded: jax.Array,
    tokens_lens: jax.Array,
    features: jax.Array,
    features_lens: jax.Array,
    noise: jax.Array,
    speech_condition_mask: jax.Array,
    t_start: float,
    t_end: float,
    num_step: int = 1,
    guidance_scale=None,
    distill: bool = True,
) -> jax.Array:
    """Integrate from t_start to t_end given conditioning built from ground
    truth (ref zipvoice.py:488-534).  guidance_scale: (B,1,1) array for the
    distill path, float for the CFG path."""
    if distill and guidance_scale is None:
        # the reference DistillDiffusionModel ALWAYS embeds the scale
        # (default 0.0, whose sinusoidal embedding is nonzero — cos(0)=1,
        # ref solver.py:127-165); None would silently skip the embedding
        # branch and change the network input
        guidance_scale = jnp.zeros((), jnp.float32)
    num_frames = features.shape[1]
    text_condition, padding_mask = zv.forward_text_train(
        params, cfg, tokens_padded, tokens_lens, features_lens, num_frames,
        dtype=features.dtype,
    )
    speech_condition = jnp.where(speech_condition_mask[:, :, None], 0.0, features)

    ts = zv.get_time_steps(t_start, t_end, num_step, 1.0)
    x = noise
    for i in range(num_step):
        if distill:
            v = zv.forward_fm_decoder(
                params, cfg, float(ts[i]), x, text_condition, speech_condition,
                padding_mask, guidance_scale=guidance_scale,
            )
        else:
            v = zv.cfg_velocity(
                params, cfg, float(ts[i]), x, text_condition, speech_condition,
                padding_mask, guidance_scale,
            )
        x = x + v * (float(ts[i + 1]) - float(ts[i]))
    return x


def _cfg_velocity_traced_t(
    params, cfg, t, x, text_condition, speech_condition, padding_mask,
    guidance_scale,
):
    """CFG velocity with a *traced* scalar t: the dual-condition t>0.5 branch
    becomes a select (ref solver.py:90-98).

    NOTE: the dual-condition CFG rule intentionally exists at three staging
    levels — sampling/euler.py:cfg_velocity (trace-time Python t),
    euler_sample's scan body (scanned t + hoisted conditions), and here
    (traced t outside a scan, for the distillation teacher's per-sample
    scales).  A change to the rule (the t==0.5 boundary, the (1+gs)·cond −
    gs·uncond combination, the x2/sc2 layout) must be applied at all three."""
    hi = t > 0.5
    x2 = jnp.concatenate([x, x], axis=0)
    pm2 = jnp.concatenate([padding_mask, padding_mask], axis=0)
    tc2 = jnp.concatenate([jnp.zeros_like(text_condition), text_condition], axis=0)
    sc_hi = jnp.concatenate(
        [jnp.zeros_like(speech_condition), speech_condition], axis=0
    )
    sc_lo = jnp.concatenate([speech_condition, speech_condition], axis=0)
    sc2 = jnp.where(hi, sc_hi, sc_lo)
    gs = jnp.where(hi, guidance_scale, 2.0 * guidance_scale).astype(x.dtype)
    v2 = zv.forward_fm_decoder(params, cfg, t, x2, tc2, sc2, pm2)
    v_uncond, v_cond = jnp.split(v2, 2, axis=0)
    return (1.0 + gs) * v_cond - gs * v_uncond


def compute_distill_loss(
    student_params: Params,
    teacher_params: Params,
    cfg: ZipVoiceConfig,
    tokens_padded: jax.Array,
    tokens_lens: jax.Array,
    features: jax.Array,
    features_lens: jax.Array,
    key,
    t_value,
    t_delta_fix,
    t_delta_ema,
    stage: str = "first",
    teacher_distill: bool = None,
) -> Tuple[jax.Array, jax.Array]:
    """One distillation loss eval (ref train_zipvoice_distill.py:378-518).

    t_value/t_delta_* may be traced scalars (drawn per step; passing them as
    inputs keeps a single compiled step like the reference's host-side
    random.random()/uniform draws at :420-429 but without retraces).
    stage 'first': teacher is the base CFG model; 'second': teacher is the
    EMA of the guidance-embedded student.  Returns (loss, ref_loss).
    """
    if teacher_distill is None:
        teacher_distill = stage != "first"
    b, num_frames, _ = features.shape
    k_noise, k_gs, k_mask = jax.random.split(key, 3)
    noise = jax.random.normal(k_noise, features.shape, features.dtype)
    if stage == "first":
        guidance_scale = jax.random.uniform(k_gs, (b, 1, 1)) * 2.0
    else:
        guidance_scale = jax.random.uniform(k_gs, (b, 1, 1)) * 2.0 + 1.0
    guidance_scale = guidance_scale.astype(features.dtype)

    t_value = jnp.asarray(t_value, jnp.float32)
    t_delta_fix = jnp.asarray(t_delta_fix, jnp.float32)
    t_delta_ema = jnp.asarray(t_delta_ema, jnp.float32)
    t_mid = t_value + t_delta_fix
    t_dest = t_mid + t_delta_ema

    t = jnp.asarray(t_value, features.dtype).reshape(1, 1, 1)
    xt = features * t + noise * (1.0 - t)

    speech_condition_mask = zv.condition_time_mask(
        k_mask, features_lens, num_frames, (0.7, 1.0)
    )
    speech_condition = jnp.where(
        speech_condition_mask[:, :, None], 0.0, features
    )

    def hop(params, x, t0, t1, distill_path):
        tc, pm = zv.forward_text_train(
            params, cfg, tokens_padded, tokens_lens, features_lens,
            num_frames, dtype=features.dtype,
        )
        if distill_path:
            v = zv.forward_fm_decoder(
                params, cfg, t0, x, tc, speech_condition, pm,
                guidance_scale=guidance_scale[:, 0, 0],
            )
        else:
            v = _cfg_velocity_traced_t(
                params, cfg, t0, x, tc, speech_condition, pm, guidance_scale
            )
        return x + v * (t1 - t0).astype(v.dtype)

    # teacher: two chained one-step hops, no gradient
    sg = jax.lax.stop_gradient
    x_mid = hop(teacher_params, xt, t_value, t_mid, teacher_distill)
    target_x1 = sg(hop(teacher_params, sg(x_mid), t_mid, t_dest, teacher_distill))

    # student: one hop across the whole span (always the distill path)
    pred_x1 = hop(student_params, xt, t_value, t_dest, True)

    denom = (t_dest - t_value).astype(jnp.float32)
    pred_v = (pred_x1 - xt).astype(jnp.float32) / denom
    target_v = (target_x1 - xt).astype(jnp.float32) / denom

    padding_mask = make_pad_mask(features_lens, num_frames)
    loss_mask = speech_condition_mask & (~padding_mask)
    w = loss_mask[:, :, None].astype(jnp.float32)
    n = jnp.maximum(jnp.sum(w) * features.shape[-1], 1.0)
    loss = jnp.sum(jnp.square(pred_v - target_v) * w) / n
    ut = (features - noise).astype(jnp.float32)
    ref_loss = jnp.sum(jnp.square(pred_v - ut) * w) / n
    return loss, ref_loss


def ema_update(teacher_params: Params, student_params: Params,
               decay: float = 0.9999) -> Params:
    """teacher <- decay * teacher + (1-decay) * student (stage 2, ref :365)."""
    return jax.tree.map(
        lambda t, s: t * decay + s.astype(t.dtype) * (1.0 - decay),
        teacher_params, student_params,
    )


def fm_decoder_grad_mask(params: Params) -> Params:
    """1.0 for fm_decoder leaves, 0.0 elsewhere (only the fm_decoder trains
    during distillation, ref train_zipvoice_distill.py:967-975)."""
    return {
        k: jax.tree.map(lambda _: 1.0 if k == "fm_decoder" else 0.0, v)
        for k, v in params.items()
    }
