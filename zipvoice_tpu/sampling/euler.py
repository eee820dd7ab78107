"""Euler ODE sampling with classifier-free guidance — the solver layer.

Rebuild of ref zipvoice/models/modules/solver.py (EulerSolver,
DiffusionModel/DistillDiffusionModel CFG wrappers, get_time_steps).  All
solver math is shape-static and jittable; the per-step dual-condition CFG
branch (drop the speech condition for t > 0.5, else double the guidance
scale — ref solver.py:90-98) rides through `lax.scan` as a scanned flag so
one backbone trace covers every step.

The functions take the model's velocity head (`forward_fm_decoder`) via the
`zipvoice_tpu.models.zipvoice` params/config pair; they are re-exported from
that module for backwards compatibility.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from zipvoice_tpu.config import ZipVoiceConfig

Params = Dict[str, object]


def get_time_steps(
    t_start: float = 0.0,
    t_end: float = 1.0,
    num_step: int = 10,
    t_shift: float = 1.0,
) -> np.ndarray:
    """Shifted linear schedule t' = s*t / (1 + (s-1)*t) (ref solver.py:256-281).

    Python-static: evaluated at trace time.
    """
    ts = np.linspace(t_start, t_end, num_step + 1, dtype=np.float64)
    ts = t_shift * ts / (1.0 + (t_shift - 1.0) * ts)
    return ts.astype(np.float32)


def validate_time_steps(timesteps, t_start: float = 0.0,
                        t_end: float = 1.0) -> np.ndarray:
    """Normalize an explicit timestep grid (EPSS-style pruned schedules,
    arXiv 2505.19931: non-uniform, empirically tuned step placements can
    match many-step quality with far fewer evaluations).  Must be a
    strictly-increasing 1-D grid with >= 2 knots COVERING [t_start, t_end]
    exactly — a grid starting past t_start would treat pure noise as a
    partially-integrated state, one stopping short of t_end would return an
    unfinished sample, both silently degraded audio."""
    ts = np.asarray(timesteps, np.float32).reshape(-1)
    if ts.size < 2:
        raise ValueError(f"timesteps needs >= 2 knots, got {ts.size}")
    if not np.all(np.diff(ts) > 0):
        raise ValueError(f"timesteps must strictly increase: {ts}")
    if not (abs(ts[0] - t_start) < 1e-6 and abs(ts[-1] - t_end) < 1e-6):
        raise ValueError(
            f"timesteps must span [{t_start}, {t_end}] exactly, got "
            f"[{ts[0]}, {ts[-1]}]"
        )
    return ts


def cfg_velocity(
    params: Params,
    cfg: ZipVoiceConfig,
    t: float,
    x: jax.Array,
    text_condition: jax.Array,
    speech_condition: jax.Array,
    padding_mask: jax.Array,
    guidance_scale: float,
    distill: bool = False,
) -> jax.Array:
    """One classifier-free-guidance velocity eval (ref solver.py:40-110, 127-165).

    `t` is a Python float -> the dual-condition branch (drop speech cond for
    t>0.5, else double the scale) is resolved at trace time and the
    unconditioned/conditioned passes run as one 2B batch.  guidance_scale may
    be a float or a per-sample (B, 1, 1) array (the reference allows tensors
    at solver.py:66-69; the distillation teacher uses per-sample scales).

    NOTE: the CFG rule also lives in euler_sample's scan body (scanned t)
    and models/distill._cfg_velocity_traced_t (traced t) — change all three.
    """
    from zipvoice_tpu.models.zipvoice import forward_fm_decoder

    if distill:
        gs = jnp.asarray(guidance_scale, jnp.float32)
        return forward_fm_decoder(
            params, cfg, jnp.float32(t), x, text_condition, speech_condition,
            padding_mask, guidance_scale=gs,
        )
    if isinstance(guidance_scale, float) and guidance_scale == 0.0:
        return forward_fm_decoder(
            params, cfg, jnp.float32(t), x, text_condition, speech_condition,
            padding_mask,
        )

    x2 = jnp.concatenate([x, x], axis=0)
    pm2 = jnp.concatenate([padding_mask, padding_mask], axis=0)
    tc2 = jnp.concatenate([jnp.zeros_like(text_condition), text_condition], axis=0)
    gs = jnp.asarray(guidance_scale, x.dtype)
    if t > 0.5:
        sc2 = jnp.concatenate(
            [jnp.zeros_like(speech_condition), speech_condition], axis=0
        )
    else:
        sc2 = jnp.concatenate([speech_condition, speech_condition], axis=0)
        gs = gs * 2.0
    v2 = forward_fm_decoder(params, cfg, jnp.float32(t), x2, tc2, sc2, pm2)
    v_uncond, v_cond = jnp.split(v2, 2, axis=0)
    return (1.0 + gs) * v_cond - gs * v_uncond


def euler_sample(
    params: Params,
    cfg: ZipVoiceConfig,
    x: jax.Array,
    text_condition: jax.Array,
    speech_condition: jax.Array,
    padding_mask: jax.Array,
    num_step: int = 16,
    guidance_scale: float = 1.0,
    t_start: float = 0.0,
    t_end: float = 1.0,
    t_shift: float = 1.0,
    distill: bool = False,
    timesteps=None,
) -> jax.Array:
    """Euler ODE integration (ref solver.py:182-240) as a lax.scan.

    One backbone trace regardless of num_step (compile time stays flat);
    the per-step timestep, delta and dual-condition flag (t > 0.5 drops the
    speech condition, else doubles the scale — ref solver.py:90-98) ride in
    as scanned scalars, selected with jnp.where.

    timesteps: optional explicit trace-time grid overriding
    num_step/t_shift — supports empirically pruned step schedules
    (EPSS, arXiv 2505.19931), beyond the reference's shift family.
    """
    from zipvoice_tpu.models.zipvoice import forward_fm_decoder

    if timesteps is not None:
        ts = validate_time_steps(timesteps, t_start, t_end)
    else:
        ts = get_time_steps(t_start, t_end, num_step, t_shift)
    t_steps = jnp.asarray(ts[:-1], jnp.float32)
    dts = jnp.asarray(ts[1:] - ts[:-1], jnp.float32)
    drop_speech = jnp.asarray(ts[:-1] > 0.5)

    out_dtype = x.dtype
    if cfg.f32_closers:
        # f32 Euler state + f32 CFG combination (the fm_decoder's out_proj
        # also emits f32 under this flag): the accumulated x and the
        # cancellation-prone (1+gs)·cond − gs·uncond keep full precision
        # while the backbone bulk stays at the conditions' compute dtype
        x = x.astype(jnp.float32)

    def integrate(xc, v, dt):
        return xc + (v * dt.astype(v.dtype))

    if distill:
        gs = jnp.asarray(guidance_scale, jnp.float32)

        def body(xc, per_step):
            t, dt, _ = per_step
            v = forward_fm_decoder(
                params, cfg, t, xc, text_condition, speech_condition,
                padding_mask, guidance_scale=gs,
            )
            return integrate(xc, v, dt), None

    elif isinstance(guidance_scale, float) and guidance_scale == 0.0:

        def body(xc, per_step):
            t, dt, _ = per_step
            v = forward_fm_decoder(
                params, cfg, t, xc, text_condition, speech_condition,
                padding_mask,
            )
            return integrate(xc, v, dt), None

    else:
        # loop-invariant CFG batching, hoisted out of the scan
        pm2 = jnp.concatenate([padding_mask, padding_mask], axis=0)
        tc2 = jnp.concatenate(
            [jnp.zeros_like(text_condition), text_condition], axis=0
        )
        sc2_hi = jnp.concatenate(
            [jnp.zeros_like(speech_condition), speech_condition], axis=0
        )
        sc2_lo = jnp.concatenate([speech_condition, speech_condition], axis=0)

        def body(xc, per_step):
            t, dt, hi = per_step
            x2 = jnp.concatenate([xc, xc], axis=0)
            sc2 = jnp.where(hi, sc2_hi, sc2_lo)
            gs = jnp.where(hi, guidance_scale, 2.0 * guidance_scale).astype(
                xc.dtype
            )
            v2 = forward_fm_decoder(params, cfg, t, x2, tc2, sc2, pm2)
            v_uncond, v_cond = jnp.split(v2, 2, axis=0)
            v = (1.0 + gs) * v_cond - gs * v_uncond
            return integrate(xc, v, dt), None

    x, _ = jax.lax.scan(body, x, (t_steps, dts, drop_speech))
    return x.astype(out_dtype)
