"""Fused relative-position attention-weights kernel (Pallas, TPU).

The Zipformer attention computes probs = softmax(q k^T + rel_pos_scores)
where rel_pos_scores[i, j] = pq[i] . pe[j - i + T - 1]  (ref zipformer.py:
1205-1250 uses an as_strided shear).  The XLA formulation materializes a
(B, H, T, 2T-1) float32 tensor in HBM, shears it (another full copy), adds,
then runs softmax as a separate pass — at T~1000 that is ~180 MB of HBM
traffic per layer for ~0 FLOPs.

This kernel computes everything tile-wise in VMEM: for each 128-row tile it
does the (TI, qd) x (qd, T) qk matmul on the MXU, the (TI, pd) x (pd, T+TI)
positional matmul against a *band* of pe rows, applies the shear as a
zero-copy flatten/reshape inside VMEM, adds the -1000 key-padding fill, and
writes out softmaxed probabilities — one HBM write of the final (TI, T) tile
and nothing else.

Numerics match the XLA path: scores accumulate in f32, softmax in f32 (the
max-subtracted form; exp(-1000) underflows to 0 exactly like the reference's
masked softmax).  The output dtype is selectable (bf16 halves the consumer
traffic).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 128


def _tile_scores(q_ref, k_ref, pq_ref, pe_ref):
    """Pre-mask scores (TILE, T) f32 for the current grid tile.

    q_ref:   (1, TILE, qd)   row-tile queries
    k_ref:   (1, T, qd)      all keys of this (b, h)
    pq_ref:  (1, TILE, pd)   positional queries
    pe_ref:  (1, 2T, pd)     projected positional encodings of this h
                             (row n encodes offset n - (T-1); row 2T-1 pad)
    """
    t = k_ref.shape[1]
    ti = q_ref.shape[1]
    i0 = pl.program_id(1) * ti

    qk = jax.lax.dot_general(
        q_ref[0], k_ref[0],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (TILE, T)

    # positional band: global pe row for (r, j) is j - (i0 + r) + T - 1;
    # rows [T - TILE - i0, T - TILE - i0 + T + TILE) cover the whole tile.
    band_start = pl.multiple_of(t - ti - i0, TILE)
    band = pe_ref[0, pl.ds(band_start, t + ti), :]  # (T+TILE, pd)
    pos_full = jax.lax.dot_general(
        pq_ref[0], band,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (TILE, T+TILE)

    # shear: pos[r, j] = pos_full[r, j - r + (TILE-1)].  Expressed as a
    # global left-roll by TILE-1 followed by a per-row right-roll by r,
    # where the per-row roll is binary-decomposed into log2(TILE) static
    # roll+select stages (Mosaic has no arbitrary reshape or per-row
    # dynamic slice; static concat-rolls and selects lower cleanly).  The
    # index j - r + TILE - 1 always lands in [0, T+TILE-1), so the
    # wraparound of the rolls is never observed in columns < T.
    w = t + ti

    def roll_right(v, s):
        return jnp.concatenate([v[:, w - s :], v[:, : w - s]], axis=1)

    x = jnp.concatenate(
        [pos_full[:, ti - 1 :], pos_full[:, : ti - 1]], axis=1
    )  # left-roll by TILE-1
    rows = jax.lax.broadcasted_iota(jnp.int32, (ti, 1), 0)
    nbits = max(1, (ti - 1).bit_length())
    for bbit in range(nbits):
        s = 1 << bbit
        rolled = roll_right(x, s)
        take = (rows >> bbit) & 1
        x = jnp.where(take == 1, rolled, x)
    return qk + x[:, :t]


def _tile_softmax(scores):
    scores = scores - jnp.max(scores, axis=1, keepdims=True)
    e = jnp.exp(scores)
    return e / jnp.sum(e, axis=1, keepdims=True)


def _kernel(q_ref, k_ref, pq_ref, pe_ref, mask_ref, out_ref):
    """Forward. Grid: (B*H, T // TILE); refs carry a leading singleton block
    dim (see _tile_scores).  mask_ref: (1, 1, T) f32 additive key-padding
    bias (-1000 at masked); out_ref: (1, TILE, T) softmaxed probabilities."""
    scores = _tile_scores(q_ref, k_ref, pq_ref, pe_ref)
    probs = _tile_softmax(scores + mask_ref[0, 0, :][None, :])
    out_ref[0] = probs.astype(out_ref.dtype)


def _bwd_kernel(q_ref, k_ref, pq_ref, pe_ref, mask_ref, g_ref, pen_ref,
                ds_ref, *, limit, valid_cols):
    """Backward: recompute scores tile-wise (same math as _kernel) and emit
    the score cotangent ds in one pass — softmax VJP fused with the
    attention-score failsafe penalty (ref scaling.py:699-726 adds
    penalty * sign(s) * (|s| > limit) to the PRE-mask score gradient, w.p.
    0.1; pen_ref holds gate * penalty, zero when ungated).  Fusing here
    avoids writing the (B, H, T, T) f32 probs to HBM and reading them back
    for the elementwise VJP.

    valid_cols bounds the penalty to real key columns: the pad-and-slice
    wrapper appends phantom columns whose pre-mask scores (pq . real pe
    rows at offsets < t) can exceed the limit; the XLA path never sees
    those pairs, so they must not contribute penalty gradient.  (User key-
    padding columns j < valid_cols DO get penalty, matching the XLA path's
    pre-mask application.)
    """
    s_pre = _tile_scores(q_ref, k_ref, pq_ref, pe_ref)  # what the penalty sees
    probs = _tile_softmax(s_pre + mask_ref[0, 0, :][None, :])

    g = g_ref[0].astype(jnp.float32)
    ds = probs * (g - jnp.sum(g * probs, axis=1, keepdims=True))
    pen = pen_ref[0, 0]
    pen_term = pen * jnp.sign(s_pre) * ((jnp.abs(s_pre) - limit) > 0)
    t = s_pre.shape[1]
    if valid_cols < t:
        col = jax.lax.broadcasted_iota(jnp.int32, s_pre.shape, 1)
        pen_term = jnp.where(col < valid_cols, pen_term, 0.0)
    ds = ds + pen_term
    ds_ref[0] = ds.astype(ds_ref.dtype)


def _pallas_rel_ds(q, k, pq, pe, bias, g, pen, limit, valid_cols, interpret):
    """ds = d(loss)/d(scores) for the fused attention, shape (B, H, T, T) in
    q.dtype (the einsum adjoints consume it in compute dtype anyway)."""
    b, t, h, qd = q.shape
    pd = pq.shape[-1]
    qh = q.transpose(0, 2, 1, 3).reshape(b * h, t, qd)
    kh = k.transpose(0, 2, 1, 3).reshape(b * h, t, qd)
    pqh = pq.transpose(0, 2, 1, 3).reshape(b * h, t, pd)
    peh = jnp.pad(pe, ((0, 1), (0, 0), (0, 0))).transpose(1, 0, 2)
    gh = g.reshape(b * h, t, t)
    pen2 = pen.reshape(1, 1).astype(jnp.float32)

    ds = pl.pallas_call(
        functools.partial(_bwd_kernel, limit=limit, valid_cols=valid_cols),
        grid=(b * h, t // TILE),
        in_specs=[
            pl.BlockSpec((1, TILE, qd), lambda bh, ti: (bh, ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, qd), lambda bh, ti: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE, pd), lambda bh, ti: (bh, ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * t, pd), lambda bh, ti: (bh % h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, t), lambda bh, ti: (bh // h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE, t), lambda bh, ti: (bh, ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda bh, ti: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, TILE, t), lambda bh, ti: (bh, ti, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, t, t), q.dtype),
        interpret=interpret,
    )(qh, kh, pqh, peh, bias, gh, pen2)
    return ds.reshape(b, h, t, t)


def _xla_rel_probs(q, k, pq, pe, bias, out_dtype):
    """Pure-XLA twin of the kernel (same math incl. the additive mask bias);
    its VJP is the kernel's backward."""
    t = q.shape[1]
    attn = jnp.einsum("bthd,bshd->bhts", q, k,
                      preferred_element_type=jnp.float32)
    pos = jnp.einsum("bthd,nhd->bhtn", pq, pe,
                     preferred_element_type=jnp.float32)
    # rel shift (same as nn.zipformer._rel_shift)
    b, h = pos.shape[0], pos.shape[1]
    flat = pos.reshape(b, h, t * (2 * t - 1))
    flat = jax.lax.slice_in_dim(flat, t - 1, t - 1 + t * (2 * t - 2), axis=2)
    shifted = flat.reshape(b, h, t, 2 * t - 2)[..., :t]
    scores = attn + shifted + bias[:, None, :, :]
    return jax.nn.softmax(scores, axis=-1).astype(out_dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9))
def _rel_probs_ad(q, k, pq, pe, bias, pen, limit, valid_cols, out_dtype,
                  interpret):
    return _pallas_rel_probs(q, k, pq, pe, bias, out_dtype, interpret)


def _rel_probs_fwd(q, k, pq, pe, bias, pen, limit, valid_cols, out_dtype,
                   interpret):
    return (
        _pallas_rel_probs(q, k, pq, pe, bias, out_dtype, interpret),
        (q, k, pq, pe, bias, pen),
    )


def _unshear(ds: jax.Array) -> jax.Array:
    """Inverse of the rel shift: (B, H, T, T) -> (B, H, T, 2T-1) with
    out[..., i, (T-1) + j - i] = ds[..., i, j], zeros elsewhere.  Pure
    pad/flatten/reshape (exact adjoint of _rel_shift's slicing)."""
    b, h, t, _ = ds.shape
    rows = jnp.pad(ds, ((0, 0), (0, 0), (0, 0), (0, t - 2)))  # (B,H,T,2T-2)
    flat = rows.reshape(b, h, t * (2 * t - 2))
    flat = jnp.pad(flat, ((0, 0), (0, 0), (t - 1, 1)))
    return flat.reshape(b, h, t, 2 * t - 1)


def _rel_probs_bwd(limit, valid_cols, out_dtype, interpret, res, g):
    """Analytic backward: one Pallas pass recomputes scores and emits the
    score cotangent ds (softmax VJP + the gated failsafe penalty on pre-mask
    scores), then the three matmul adjoints — neither the (2T-1) f32
    positional tensor nor the f32 probs ever round-trip through HBM.

    The bias cotangent includes the penalty term (true d/d bias is the
    softmax part only), but bias always derives from a boolean padding mask,
    so its cotangent is never propagated; pen's cotangent is zero (the
    penalty enters the loss, not the output)."""
    q, k, pq, pe, bias, pen = res
    dsb = _pallas_rel_ds(q, k, pq, pe, bias, g, pen, limit, valid_cols,
                         interpret)

    dq = jnp.einsum("bhts,bshd->bthd", dsb, k,
                    preferred_element_type=jnp.float32).astype(q.dtype)
    dk = jnp.einsum("bhts,bthd->bshd", dsb, q,
                    preferred_element_type=jnp.float32).astype(k.dtype)

    dpos = _unshear(dsb)  # (B, H, T, 2T-1)
    dpq = jnp.einsum("bhtn,nhd->bthd", dpos, pe,
                     preferred_element_type=jnp.float32).astype(pq.dtype)
    dpe = jnp.einsum("bhtn,bthd->nhd", dpos, pq,
                     preferred_element_type=jnp.float32).astype(pe.dtype)
    dbias = jnp.sum(dsb.astype(jnp.float32), axis=(1, 2))[:, None, :].astype(
        bias.dtype
    )
    return dq, dk, dpq, dpe, dbias, jnp.zeros((), pen.dtype)


_rel_probs_ad.defvjp(_rel_probs_fwd, _rel_probs_bwd)


@functools.partial(
    jax.jit,
    static_argnames=("out_dtype", "interpret", "penalty_limit",
                     "penalty_valid_cols"),
)
def rel_attention_probs(
    q: jax.Array,  # (B, T, H, qd)
    k: jax.Array,  # (B, T, H, qd)
    pq: jax.Array,  # (B, T, H, pd)
    pe: jax.Array,  # (2T-1, H, pd)  projected positional encodings
    key_padding_mask: Optional[jax.Array],  # (B, T) bool or None
    out_dtype=jnp.float32,
    interpret: bool = False,
    score_penalty: Optional[jax.Array] = None,  # scalar gate*penalty, f32
    penalty_limit: float = 25.0,
    penalty_valid_cols: Optional[int] = None,  # penalty col bound (pad wrapper)
) -> jax.Array:
    """Fused attention probabilities (B, H, T, T); differentiable (forward =
    Pallas kernel, backward = fused Pallas ds kernel + matmul adjoints).  T
    must be a multiple of TILE; other shapes use the XLA fallback in
    nn/zipformer.py.  The key-padding mask enters as an additive -1000 bias
    (identical softmax output for any row with >=1 unmasked key; fully-padded
    rows attend uniformly over real scores instead of uniformly over
    constants — those outputs are never consumed).

    score_penalty implements penalize_abs_values_gt on the pre-mask scores
    (ref zipformer.py:1254-1269): pass where(gate, penalty, 0.0) and the
    backward adds score_penalty * sign(s) * (|s| > penalty_limit) to the
    score cotangent, exactly like the XLA training path."""
    b, t = q.shape[0], q.shape[1]
    if key_padding_mask is None:
        bias = jnp.zeros((b, 1, t), jnp.float32)
    else:
        bias = jnp.where(key_padding_mask, -1000.0, 0.0).astype(jnp.float32)[
            :, None, :
        ]
    if score_penalty is None:
        score_penalty = jnp.zeros((), jnp.float32)
    if penalty_valid_cols is None:
        penalty_valid_cols = t
    return _rel_probs_ad(q, k, pq, pe, bias, score_penalty,
                         float(penalty_limit), int(penalty_valid_cols),
                         out_dtype, interpret)


def rel_attention_probs_any(
    q: jax.Array,
    k: jax.Array,
    pq: jax.Array,
    pe: jax.Array,
    key_padding_mask: Optional[jax.Array],
    out_dtype=jnp.float32,
    interpret: bool = False,
    score_penalty: Optional[jax.Array] = None,
    penalty_limit: float = 25.0,
) -> jax.Array:
    """rel_attention_probs for ANY t: pads time to the next TILE multiple,
    masks the padded keys, and slices the (t, t) block back out.

    Correctness: padded key columns carry the -1000 additive bias, so real
    rows normalize exactly as the unpadded softmax (exp(-1000) underflows);
    padded query rows are sliced away, and their cotangents are discarded by
    the pad VJP.  Padded pe rows are zero, so the pre-mask scores against
    padded keys are 0 — below any penalty limit, contributing nothing to the
    failsafe gradient.  This keeps the fused kernel live for the downsampled
    interior stacks (t/2, t/4) whose lengths are rarely TILE-aligned."""
    t = q.shape[1]
    t_pad = ((t + TILE - 1) // TILE) * TILE
    if t_pad == t:
        return rel_attention_probs(
            q, k, pq, pe, key_padding_mask, out_dtype, interpret,
            score_penalty, penalty_limit,
        )
    d = t_pad - t
    b = q.shape[0]
    qp = jnp.pad(q, ((0, 0), (0, d), (0, 0), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, d), (0, 0), (0, 0)))
    pqp = jnp.pad(pq, ((0, 0), (0, d), (0, 0), (0, 0)))
    # pe row n encodes offset n-(t-1); re-center for t_pad by padding d rows
    # of zeros on both sides: (2t-1) + 2d = 2*t_pad - 1
    pep = jnp.pad(pe, ((d, d), (0, 0), (0, 0)))
    if key_padding_mask is None:
        key_padding_mask = jnp.zeros((b, t), bool)
    maskp = jnp.pad(
        key_padding_mask, ((0, 0), (0, d)), constant_values=True
    )
    probs = rel_attention_probs(
        qp, kp, pqp, pep, maskp, out_dtype, interpret,
        score_penalty, penalty_limit, penalty_valid_cols=t,
    )
    return probs[:, :, :t, :t]


def _pallas_rel_probs(q, k, pq, pe, bias, out_dtype, interpret):
    b, t, h, qd = q.shape
    pd = pq.shape[-1]
    assert t % TILE == 0, t

    qh = q.transpose(0, 2, 1, 3).reshape(b * h, t, qd)
    kh = k.transpose(0, 2, 1, 3).reshape(b * h, t, qd)
    pqh = pq.transpose(0, 2, 1, 3).reshape(b * h, t, pd)
    peh = jnp.pad(pe, ((0, 1), (0, 0), (0, 0))).transpose(1, 0, 2)  # (H,2T,pd)
    maskb = bias

    out = pl.pallas_call(
        _kernel,
        grid=(b * h, t // TILE),
        in_specs=[
            pl.BlockSpec((1, TILE, qd), lambda bh, ti: (bh, ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, qd), lambda bh, ti: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE, pd), lambda bh, ti: (bh, ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * t, pd), lambda bh, ti: (bh % h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, t), lambda bh, ti: (bh // h, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TILE, t), lambda bh, ti: (bh, ti, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, t, t), out_dtype),
        interpret=interpret,
    )(qh, kh, pqh, peh, maskb)
    return out.reshape(b, h, t, t)
