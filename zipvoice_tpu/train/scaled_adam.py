"""ScaledAdam optimizer as a pure-JAX gradient transformation.

Behavioral rebuild of the reference ScaledAdam (ref zipvoice/utils/optim.py):
Adam whose tensor updates are scaled by each tensor's parameter RMS, with an
extra learned per-tensor scale, plus median-of-history global gradient
clipping.  Differences from the torch implementation that do NOT change the
math:

* no parameter batching by (dtype, shape) (ref optim.py:42-120) — that trick
  only reduces CUDA kernel launches; XLA fuses the per-tensor lattice anyway;
* the clipping threshold / ring buffer / size-update-period logic is
  expressed with lax.select on a step counter instead of Python branching, so
  the whole update is one compiled program;
* state lives in an explicit pytree (works with jit / shard_map / orbax).

API: ``opt = scaled_adam(...); state = opt.init(params);
updates, state = opt.update(grads, state, params, lr)`` — ``lr`` is a scalar
passed per step (Eden schedule lives outside, see lr_schedule.py).
Apply with ``params = jax.tree.map(lambda p, u: p + u, params, updates)``
(updates are deltas, like optax).
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple, Tuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class ScaledAdamConfig:
    betas: Tuple[float, float] = (0.9, 0.98)
    scalar_lr_scale: float = 0.1
    eps: float = 1.0e-08
    param_min_rms: float = 1.0e-05
    param_max_rms: float = 3.0
    scalar_max: float = 10.0
    size_update_period: int = 4
    clipping_scale: float | None = 2.0
    clipping_update_period: int = 100


class ScaledAdamState(NamedTuple):
    step: jax.Array  # () int32
    exp_avg_sq: Any  # pytree, like params
    delta: Any  # pytree, momentum buffer
    param_rms: Any  # pytree of () f32 per tensor leaf (0 for scalar leaves)
    scale_grads: Any  # pytree of (size_update_period,) f32 per tensor leaf
    scale_exp_avg_sq: Any  # pytree of () f32 per tensor leaf
    model_norms: jax.Array  # (clipping_update_period,) ring buffer
    model_norm_threshold: jax.Array  # () f32 (+inf until first estimate)


def _is_scalar(p) -> bool:
    # ref optim.py:127/154: "p.numel() == p.shape[0]" on (batch,)-stacked
    # scalars == 0-dim parameters in unbatched form.
    return p.ndim == 0


def _rms(p):
    return jnp.sqrt(jnp.mean(jnp.square(p.astype(jnp.float32))))


class ScaledAdam:
    def __init__(self, cfg: ScaledAdamConfig = ScaledAdamConfig()):
        self.cfg = cfg

    def init(self, params) -> ScaledAdamState:
        c = self.cfg
        zeros_like = lambda p: jnp.zeros(p.shape, jnp.float32)  # noqa: E731
        return ScaledAdamState(
            step=jnp.zeros((), jnp.int32),
            exp_avg_sq=jax.tree.map(zeros_like, params),
            delta=jax.tree.map(zeros_like, params),
            param_rms=jax.tree.map(
                lambda p: jnp.zeros((), jnp.float32) if _is_scalar(p) else _rms(p),
                params,
            ),
            scale_grads=jax.tree.map(
                lambda p: jnp.zeros((c.size_update_period,), jnp.float32), params
            ),
            scale_exp_avg_sq=jax.tree.map(
                lambda p: jnp.zeros((), jnp.float32), params
            ),
            model_norms=jnp.zeros((c.clipping_update_period,), jnp.float32),
            model_norm_threshold=jnp.asarray(jnp.inf, jnp.float32),
        )

    # ------------------------------------------------------------ clipping

    def _clipping(self, grads, state: ScaledAdamState, params):
        """Median-of-history clipping (ref optim.py:520-631).  Returns
        (clip_factor, new_model_norms, new_threshold, dominant) where
        dominant = (leaf_index, fraction): which tensor contributes the
        largest share of the rms-scaled squared gradient norm — the
        in-graph equivalent of the reference's dominant-parameter
        diagnostic (ref optim.py:633-748), surfaced through the step
        metrics so the trainer can name the culprit when clipping bites."""
        c = self.cfg
        zero_dom = (jnp.int32(0), jnp.float32(0.0))
        if c.clipping_scale is None:
            one = jnp.float32(1.0)
            return one, state.model_norms, state.model_norm_threshold, zero_dom

        step = state.step
        leaves_g, treedef = jax.tree.flatten(grads)
        leaves_p = treedef.flatten_up_to(params)
        leaves_rms = treedef.flatten_up_to(state.param_rms)

        per_leaf = []
        for g, p, rms in zip(leaves_g, leaves_p, leaves_rms):
            g32 = g.astype(jnp.float32)
            if _is_scalar(p):
                per_leaf.append(jnp.square(g32) * (c.scalar_lr_scale**2))
            else:
                per_leaf.append(jnp.sum(jnp.square(g32 * rms)))
        per_leaf = jnp.stack(per_leaf)
        tot_sumsq = jnp.sum(per_leaf)
        dom_idx = jnp.argmax(per_leaf).astype(jnp.int32)
        dom_frac = per_leaf[dom_idx] / jnp.maximum(tot_sumsq, 1e-20)
        tot_norm = jnp.sqrt(tot_sumsq)

        # step 0 returns early in the reference without recording the norm
        # (ref optim.py:539-543), so the buffer only fills from step 1.
        norms = jnp.where(
            step > 0,
            state.model_norms.at[step % c.clipping_update_period].set(tot_norm),
            state.model_norms,
        )

        # threshold refresh at step % period == 0 and at steps 10/20/40
        # (ref optim.py:568-601).  Early irregular estimates use only the
        # largest `step` entries of the (mostly zero) buffer — equivalent to
        # the norms collected so far — and a 2x safety factor.
        period = jnp.int32(c.clipping_update_period)
        is_periodic = (step % period == 0) & (step > 0)
        is_irregular = (step == 10) | (step == 20) | (step == 40)
        n_valid = jnp.where(is_periodic, period, step)
        factor = jnp.where(is_irregular, 2.0, 1.0).astype(jnp.float32)

        s_full = jnp.sort(norms)  # ascending, length = period
        # median of the top-n_valid window: sorted[min(n-1, (n//4)*2)] within
        # the window starting at (period - n_valid) (ref optim.py:577-582)
        med_idx = (period - n_valid) + jnp.minimum(
            n_valid - 1, (n_valid // 4) * 2
        )
        med = s_full[med_idx]
        refreshed = c.clipping_scale * med * factor
        # a non-finite refreshed median means the recent window is full of
        # blown-up norms — EXACTLY when clipping matters.  Keep the previous
        # finite threshold instead of silently disabling clipping (the
        # reference raises here, ref optim.py:585-586; inside jit we clamp
        # and let the trainer's non-finite-loss watchdogs do the failing).
        refreshed = jnp.where(
            jnp.isfinite(refreshed), refreshed, state.model_norm_threshold
        )
        new_thresh = jnp.where(
            is_periodic | is_irregular, refreshed, state.model_norm_threshold
        )

        raw = new_thresh / (tot_norm + 1.0e-20)
        clip = jnp.minimum(jnp.float32(1.0), raw)
        clip = jnp.where(jnp.isnan(clip), jnp.float32(0.0), clip)
        # step == 0 or threshold not yet estimated -> no clipping
        clip = jnp.where(
            (step == 0) | jnp.isinf(new_thresh), jnp.float32(1.0), clip
        )
        return clip, norms, new_thresh, (dom_idx, dom_frac)

    # ------------------------------------------------------------ update

    def _leaf_update(self, g, p, eas, delta, prms, sgrads, seas, step, lr):
        """Per-tensor momentum_step(scaling_step(basic_step)) (ref
        optim.py:123-259).  Returns (new_delta-as-update, new state leaves)."""
        c = self.cfg
        beta1, beta2 = c.betas
        g = g.astype(jnp.float32)
        p32 = p.astype(jnp.float32)

        scalar = _is_scalar(p)
        leaf_lr = lr * (c.scalar_lr_scale if scalar else 1.0)

        # basic_step
        eas = beta2 * eas + (1 - beta2) * jnp.square(g)
        bias_correction2 = 1 - beta2 ** (step.astype(jnp.float32) + 1.0)
        eas_hat = jnp.where(bias_correction2 < 0.99, eas / bias_correction2, eas)
        denom = jnp.sqrt(eas_hat) + c.eps
        step_delta = -leaf_lr * g / denom

        if not scalar:
            # scaling_step
            is_update_step = step % c.size_update_period == c.size_update_period - 1
            sgrads = sgrads.at[step % c.size_update_period].set(
                jnp.sum(p32 * g)
            )
            new_prms = jnp.where(is_update_step, _rms(p32), prms)
            step_delta = step_delta * jnp.maximum(new_prms, c.param_min_rms)

            # learned-scale step every size_update_period steps
            beta2_corr = beta2**c.size_update_period
            seas_new = beta2_corr * seas + (1 - beta2_corr) * jnp.mean(
                jnp.square(sgrads)
            )
            size_step_idx = (step + 1) // c.size_update_period
            bc2 = 1 - beta2_corr ** size_step_idx.astype(jnp.float32)
            size_lr = lr * c.scalar_lr_scale
            scale_step = (
                -size_lr * (bc2**0.5) * jnp.sum(sgrads) / (jnp.sqrt(seas_new) + c.eps)
            )
            scale_step = jnp.where(new_prms < c.param_min_rms, 0.0, scale_step)
            scale_step = jnp.clip(scale_step, -0.1, 0.1)
            scale_step = jnp.minimum(
                scale_step,
                (c.param_max_rms - new_prms) / jnp.maximum(new_prms, 1e-20),
            )
            do_scale = is_update_step & (step > 0)
            step_delta = step_delta + jnp.where(do_scale, scale_step, 0.0) * p32
            seas = jnp.where(is_update_step, seas_new, seas)
            prms = new_prms

        # momentum_step
        delta = beta1 * delta + (1 - beta1) * step_delta

        update = delta
        if scalar:
            # clamp the *parameter* to +-scalar_max (ref optim.py:511-514):
            # expressed as an update clamp relative to current value.
            update = jnp.clip(p32 + delta, -c.scalar_max, c.scalar_max) - p32
        return update, eas, delta, prms, sgrads, seas

    def update(self, grads, state: ScaledAdamState, params, lr, lr_scales=None,
               with_diagnostics: bool = False):
        """lr_scales: optional pytree (or prefix-matched flat dict from
        parameter_lr_scales) of per-leaf LR multipliers — the equivalent of
        the reference's get_parameter_groups_with_lrs per-module lr_scale
        (ref utils/common.py:579-664).  A scale of 0 freezes a tensor.

        with_diagnostics=True returns a third element {"grad_clip",
        "grad_dominant_idx", "grad_dominant_frac"} (traced scalars): the
        clip factor applied this step and the leaf (tree-flatten order)
        dominating the rms-scaled gradient norm — the reference logs this
        when clipping becomes extreme (ref optim.py:615-631, 633-748)."""
        lr = jnp.asarray(lr, jnp.float32)
        clip, norms, thresh, dom = self._clipping(grads, state, params)
        # non-finite median collapse -> clip==0 zeroes all grads
        grads = jax.tree.map(lambda g: g.astype(jnp.float32) * clip, grads)

        leaves_g, treedef = jax.tree.flatten(grads)
        leaves = [
            treedef.flatten_up_to(t)
            for t in (
                params, state.exp_avg_sq, state.delta, state.param_rms,
                state.scale_grads, state.scale_exp_avg_sq,
            )
        ]
        if lr_scales is None:
            leaves_s = [1.0] * len(leaves_g)
        else:
            leaves_s = treedef.flatten_up_to(lr_scales)
        updates, n_eas, n_delta, n_prms, n_sg, n_seas = [], [], [], [], [], []
        for g, p, eas, delta, prms, sg, seas, s in zip(
            leaves_g, *leaves, leaves_s
        ):
            u, eas, delta, prms, sg, seas = self._leaf_update(
                g, p, eas, delta, prms, sg, seas, state.step, lr * s
            )
            updates.append(u.astype(p.dtype))
            n_eas.append(eas)
            n_delta.append(delta)
            n_prms.append(prms)
            n_sg.append(sg)
            n_seas.append(seas)

        unflat = treedef.unflatten
        new_state = ScaledAdamState(
            step=state.step + 1,
            exp_avg_sq=unflat(n_eas),
            delta=unflat(n_delta),
            param_rms=unflat(n_prms),
            scale_grads=unflat(n_sg),
            scale_exp_avg_sq=unflat(n_seas),
            model_norms=norms,
            model_norm_threshold=thresh,
        )
        if with_diagnostics:
            diag = {
                "grad_clip": clip,
                "grad_dominant_idx": dom[0],
                "grad_dominant_frac": dom[1],
            }
            return unflat(updates), new_state, diag
        return unflat(updates), new_state


def scaled_adam(
    clipping_scale: float | None = 2.0, **kw
) -> ScaledAdam:
    return ScaledAdam(ScaledAdamConfig(clipping_scale=clipping_scale, **kw))


def apply_updates(params, updates):
    return jax.tree.map(lambda p, u: (p + u.astype(p.dtype)), params, updates)


def leaf_names(params):
    """Dotted parameter names in jax.tree.flatten order — maps the
    grad_dominant_idx diagnostic back to a human-readable tensor name."""
    paths, _ = jax.tree.flatten_with_path(params)
    return [
        ".".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path)
        for path, _ in paths
    ]


def parameter_lr_scales(params, rules):
    """Build an lr_scales pytree from {name-prefix: scale} rules matched on
    dotted parameter paths (longest prefix wins); default scale 1.0."""
    import numpy as _np

    from zipvoice_tpu.io.checkpoint import (
        params_to_state_dict,
        state_dict_to_params,
    )

    flat = params_to_state_dict(jax.tree.map(_np.asarray, params))
    out = {}
    for name in flat:
        scale = 1.0
        best = -1
        for prefix, s in rules.items():
            if name.startswith(prefix) and len(prefix) > best:
                scale, best = float(s), len(prefix)
        out[name] = _np.float32(scale)
    # reuse the nesting logic; scalars pass through the layout transforms
    tree = state_dict_to_params({k: _np.asarray(v) for k, v in out.items()})
    return tree
