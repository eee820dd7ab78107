"""Gradient-shaping regularizers (training only; identity in forward).

Rebuild of the reference "scaling kit" training behaviors as jax.custom_vjp
functions (ref zipvoice/models/modules/scaling.py):

* balancer       — per-channel mean/RMS constraint gradients (ref :485-567,
                   571-697); the abs->rms / proportion->mean conversions are
                   done host-side in nn/zipformer.py like the reference's
                   forward();
* whiten         — covariance-whitening metric penalty (ref :739-888).  The
                   reference's adaptive prob (min<->max based on last metric)
                   is stateful across steps; we gate at max_prob and rely on
                   the backward's metric<limit branch to no-op, which is
                   semantically identical and stateless;
* penalize_abs_values_gt — attention-score failsafe (ref :699-726);
* limit_param_value — sign-flipping gradient clamp for parameters (ref
                   :911-946);
* dropout_shared — Dropout2/Dropout3 (ref :948-1017).

All take an explicit boolean `gate` (drawn from jax.random by the caller)
replacing the reference's `random.random() < prob` python gating, and scalar
constraint values that may be traced (schedule outputs).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Balancer
# ---------------------------------------------------------------------------


@jax.custom_vjp
def _balancer(x, gate, min_mean, max_mean, min_rms, max_rms, grad_scale):
    return x


def _balancer_fwd(x, gate, min_mean, max_mean, min_rms, max_rms, grad_scale):
    return x, (x, gate, min_mean, max_mean, min_rms, max_rms, grad_scale)


def _balancer_bwd(res, g):
    x, gate, min_mean, max_mean, min_rms, max_rms, grad_scale = res
    x32 = x.astype(jnp.float32)

    def penalty(xv):
        # mean over all dims except the channel (last) dim (ref :527-544)
        dims = tuple(range(xv.ndim - 1))
        uncentered_var = jnp.mean(xv * xv, axis=dims, keepdims=True)
        mean = jnp.mean(xv, axis=dims, keepdims=True)
        stddev = jnp.sqrt(jnp.clip(uncentered_var - mean * mean, min=1.0e-20))
        rms = jnp.sqrt(jnp.clip(uncentered_var, min=1.0e-20))
        m = mean / stddev
        m_loss = jnp.abs(m - jnp.clip(m, min_mean, max_mean))
        rms_clamped = jnp.clip(rms, min_rms, max_rms)
        r_loss = jnp.abs(jnp.log(rms_clamped / rms))
        return jnp.sum(m_loss + r_loss)

    loss_grad = jax.grad(penalty)(x32)
    dims = tuple(range(x32.ndim - 1))
    loss_grad_rms = jnp.clip(
        jnp.sqrt(jnp.mean(loss_grad * loss_grad, axis=dims, keepdims=True)),
        min=1.0e-20,
    )
    loss_grad = loss_grad * (grad_scale / loss_grad_rms)
    g32 = g.astype(jnp.float32)
    g_mod = g32 + jnp.abs(g32) * loss_grad
    g_out = jnp.where(gate, g_mod, g32).astype(g.dtype)
    zero = jnp.zeros(())
    return (g_out, zero, zero, zero, zero, zero, zero)


_balancer.defvjp(_balancer_fwd, _balancer_bwd)


def balancer(
    x,
    gate,
    min_positive: float = 0.05,
    max_positive: float = 0.95,
    min_abs=0.2,
    max_abs=100.0,
    grad_scale=0.04,
):
    """Apply Balancer semantics with the reference's unit conversions
    (ref scaling.py:641-686): abs -> rms via sqrt(pi/2); proportion-positive
    -> mean/stddev via an approximate inverse erf."""
    c = 1.25331413732

    def prop_to_mean(p):
        eps = 1.0e-10
        p2 = -1.0 + 2.0 * jnp.asarray(p, jnp.float32)
        atanh = (jnp.log(1.0 + p2 + eps) - jnp.log(1.0 - p2 + eps)) / 2.0
        return 0.8139535143 * atanh

    return _balancer(
        x,
        gate,
        prop_to_mean(min_positive),
        prop_to_mean(max_positive),
        c * jnp.asarray(min_abs, jnp.float32),
        c * jnp.asarray(max_abs, jnp.float32),
        jnp.asarray(grad_scale, jnp.float32),
    )


# ---------------------------------------------------------------------------
# Whiten
# ---------------------------------------------------------------------------


def _whitening_metric(x: jax.Array, num_groups: int) -> jax.Array:
    """1.0 iff each group's centered covariance is lambda*I with the same
    lambda across groups (ref scaling.py:739-775)."""
    x = x.reshape(-1, x.shape[-1])
    num_frames, num_channels = x.shape
    cpg = num_channels // num_groups
    xg = x.reshape(num_frames, num_groups, cpg).transpose(1, 0, 2)
    xg = xg - jnp.mean(xg, axis=1, keepdims=True)
    covar = jnp.einsum("gtc,gtd->gcd", xg, xg)
    mean_diag = jnp.mean(
        jnp.diagonal(covar, axis1=1, axis2=2)
    )
    covarsq_mean_diag = jnp.sum(covar * covar) / (num_groups * cpg)
    return covarsq_mean_diag / (mean_diag**2 + 1.0e-20)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _whiten(x, gate_limit_scale, num_groups):
    return x


def _whiten_fwd(x, gate_limit_scale, num_groups):
    return x, (x, gate_limit_scale)


def _whiten_bwd(num_groups, res, g):
    x, (gate, limit, grad_scale) = res
    x32 = x.astype(jnp.float32)
    metric, pgrad = jax.value_and_grad(
        lambda xv: _whitening_metric(xv, num_groups)
    )(x32)
    g32 = g.astype(jnp.float32)
    scale = grad_scale * (
        jnp.linalg.norm(g32) / (jnp.linalg.norm(pgrad) + 1.0e-20)
    )
    apply = gate & (metric >= limit)
    g_out = jnp.where(apply, g32 + pgrad * scale, g32).astype(g.dtype)
    zero = jnp.zeros(())
    return (g_out, (jnp.zeros((), bool), zero, zero))


_whiten.defvjp(_whiten_fwd, _whiten_bwd)


def whiten(x, gate, num_groups: int, whitening_limit, grad_scale):
    return _whiten(
        x,
        (gate, jnp.asarray(whitening_limit, jnp.float32),
         jnp.asarray(grad_scale, jnp.float32)),
        num_groups,
    )


# ---------------------------------------------------------------------------
# penalize_abs_values_gt / limit_param_value
# ---------------------------------------------------------------------------


@jax.custom_vjp
def _penalize_abs_gt(x, gate, limit, penalty):
    return x


def _penalize_fwd(x, gate, limit, penalty):
    return x, (x, gate, limit, penalty)


def _penalize_bwd(res, g):
    x, gate, limit, penalty = res
    over = (jnp.abs(x) - limit) > 0
    extra = penalty * jnp.sign(x) * over.astype(g.dtype)
    g_out = jnp.where(gate, g + extra.astype(g.dtype), g)
    zero = jnp.zeros(())
    return (g_out, zero, zero, zero)


_penalize_abs_gt.defvjp(_penalize_fwd, _penalize_bwd)


def penalize_abs_values_gt(x, gate, limit: float = 25.0, penalty: float = 1.0e-04):
    """Failsafe attention-score penalty (ref scaling.py:699-726, applied
    w.p. 0.1 at zipformer.py:1254-1269)."""
    return _penalize_abs_gt(
        x, gate, jnp.asarray(limit, jnp.float32), jnp.asarray(penalty, jnp.float32)
    )


@jax.custom_vjp
def _limit_param(x, gate, lo, hi):
    return x


def _limit_fwd(x, gate, lo, hi):
    return x, (x, gate, lo, hi)


def _limit_bwd(res, g):
    x, gate, lo, hi = res
    g1 = g * jnp.where((g > 0) & (x < lo), -1.0, 1.0)
    g1 = g1 * jnp.where((g1 < 0) & (x > hi), -1.0, 1.0)
    g_out = jnp.where(gate, g1, g)
    zero = jnp.zeros(())
    return (g_out, zero, zero, zero)


_limit_param.defvjp(_limit_fwd, _limit_bwd)


def limit_param_value(x, gate, lo, hi):
    """Keep a parameter's elements in [lo, hi] by flipping outward gradients
    (ref scaling.py:911-946; the reference applies it w.p. 0.6)."""
    return _limit_param(
        x, gate, jnp.asarray(lo, jnp.float32), jnp.asarray(hi, jnp.float32)
    )


# ---------------------------------------------------------------------------
# Dropout
# ---------------------------------------------------------------------------


def dropout_shared(x, key, rate, shared_dim: Optional[int] = None):
    """Dropout with an optional mask-shared dimension (Dropout2/Dropout3,
    ref scaling.py:948-1017).  rate may be traced."""
    shape = list(x.shape)
    if shared_dim is not None:
        shape[shared_dim] = 1
    keep = jax.random.uniform(key, shape) >= rate
    scale = 1.0 / jnp.maximum(1.0 - rate, 1e-6)
    return x * keep.astype(x.dtype) * jnp.asarray(scale, x.dtype)


def sequence_dropout(x, key, rate):
    """Drop whole sequences, mask shape (B, 1, 1) on (B, T, C)
    (ref zipformer.py:464-487)."""
    keep = jax.random.uniform(key, (x.shape[0], 1, 1)) > rate
    return x * keep.astype(x.dtype)
