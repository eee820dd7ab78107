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

# Shear implementation: "roll" lowers the per-row shift to ONE hardware
# strided dynamic-rotate (tpu.DynamicRotate via pltpu.roll(stride=...));
# "binary" is the log2(TILE)-stage roll+select decomposition.  Both are
# numerically identical (pure permutations); "roll" removes the dominant
# VPU cost of the probs kernel (measured r3: the binary shear made the
# kernel ~10x slower than its bandwidth roofline at T=1024).
_SHEAR_MODE = "roll"


def set_shear_mode(mode: str) -> None:
    """'roll' (default) or 'binary' — see _shear/_tile_unshear.

    The mode is bound at TRACE time (it is not part of any jit cache key),
    so already-compiled programs would keep serving the old mode; clear the
    jit caches so the next call retraces.  The setter is a test/tool toggle,
    never a hot-path call, so the global cache clear is acceptable."""
    global _SHEAR_MODE
    assert mode in ("roll", "binary"), mode
    if mode != _SHEAR_MODE:
        _SHEAR_MODE = mode
        jax.clear_caches()


def _effective_shear(interpret: bool) -> str:
    # Interpret mode always uses the binary decomposition: the strided-roll
    # fallback lowering expands to a TILE-way split+concat per call, which
    # is pathologically large for the CPU backend (observed flaky segfaults
    # in long test runs).  Compiled parity of the roll path is asserted on
    # real hardware by tools/tpu_kernel_check.py.
    return "binary" if interpret else _SHEAR_MODE


# Backward shear-adjoint formulation (see _apply_bwd_kernel's roll branch):
# "matmul" conjugates the stride=+1 rotate with anti-identity MXU reversals
# (r3 design); "flip" expresses the same row reversals as lax.rev on the
# sublane axis (MEASURED UNSUPPORTED on v5e Mosaic: 'Unimplemented
# primitive ... rev', KERNEL_CHECK.json r5); "rollw" expresses the
# DECREASING per-row rotate the unshear needs directly as one
# tpu.dynamic_rotate with stride = w-1 (≡ -1 mod w), eliminating every
# reversal — whether the hardware rotate accepts a large stride is probed
# on chip the same way.  A/B via tools/profile_train.py --bwd-shear-adj
# (VERDICT r4 next #2: the attention backward is the prime bwd/fwd
# suspect).
_BWD_SHEAR_ADJ = "matmul"


def set_bwd_shear_adj(mode: str) -> None:
    """'matmul' (default), 'flip', or 'rollw'.  Trace-time binding; clears
    jit caches on change (test/tool toggle only — see set_shear_mode)."""
    global _BWD_SHEAR_ADJ
    assert mode in ("matmul", "flip", "rollw"), mode
    if mode != _BWD_SHEAR_ADJ:
        _BWD_SHEAR_ADJ = mode
        jax.clear_caches()


def _tile_scores(q_ref, k_ref, pq_ref, pe_ref, shear="roll"):
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

    # shear: pos[r, j] = pos_full[r, j - r + (TILE-1)], i.e. row r right-
    # rotated by (r - (TILE-1)) mod w.  The index j - r + TILE - 1 always
    # lands in [0, T+TILE-1), so rotation wraparound is never observed in
    # columns < T.
    w = t + ti
    if shear == "roll":
        # one hardware strided rotate: row r right-rotates by
        # (w - (ti-1)) + r  ==  r - (ti-1)  (mod w)
        from jax.experimental.pallas import tpu as _pltpu

        x = _pltpu.roll(pos_full, w - (ti - 1), 1, stride=1, stride_axis=0)
    else:
        # global left-roll by TILE-1 followed by a per-row right-roll by r,
        # binary-decomposed into log2(TILE) static roll+select stages.
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


def _kernel(q_ref, k_ref, pq_ref, pe_ref, mask_ref, out_ref, *, shear):
    """Forward. Grid: (B*H, T // TILE); refs carry a leading singleton block
    dim (see _tile_scores).  mask_ref: (1, 1, T) f32 additive key-padding
    bias (-1000 at masked); out_ref: (1, TILE, T) softmaxed probabilities."""
    scores = _tile_scores(q_ref, k_ref, pq_ref, pe_ref, shear)
    probs = _tile_softmax(scores + mask_ref[0, 0, :][None, :])
    out_ref[0] = probs.astype(out_ref.dtype)


def _bwd_kernel(q_ref, k_ref, pq_ref, pe_ref, mask_ref, g_ref, pen_ref,
                ds_ref, *, limit, valid_cols, shear):
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
    s_pre = _tile_scores(q_ref, k_ref, pq_ref, pe_ref, shear)  # what the penalty sees
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
        functools.partial(_bwd_kernel, limit=limit, valid_cols=valid_cols,
                          shear=_effective_shear(interpret)),
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
    bias = _bias_from_mask(key_padding_mask, b, t)
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
    the pad VJP.  NOTE: pre-mask scores against padded key columns are NOT
    zero in general (a real query row at offset <= t-1 from a phantom
    column indexes REAL pe rows) — that is exactly why penalty_valid_cols=t
    bounds the failsafe gradient to real columns; do not remove that
    plumbing.  This keeps the fused kernel live for the downsampled
    interior stacks (t/2, t/4) whose lengths are rarely TILE-aligned."""
    t = q.shape[1]
    if t % TILE == 0:
        return rel_attention_probs(
            q, k, pq, pe, key_padding_mask, out_dtype, interpret,
            score_penalty, penalty_limit,
        )
    _, (qp, kp, pqp), pep, maskp, _ = _pad_time_to_tile(
        t, q.shape[0], (q, k, pq), pe, key_padding_mask
    )
    probs = rel_attention_probs(
        qp, kp, pqp, pep, maskp, out_dtype, interpret,
        score_penalty, penalty_limit, penalty_valid_cols=t,
    )
    return probs[:, :, :t, :t]


# ---------------------------------------------------------------------------
# Fused attention APPLY: out = softmax(scores) @ v, never materializing the
# (B, H, T, T) probabilities in HBM.
#
# The probs kernel above fixed the *score* side of the bandwidth problem but
# still wrote the full probability tensor out for the consumers
# (nn/zipformer.py: nonlin_attention head-0 contraction and the two
# SelfAttention modules, ref zipformer.py:1359-1396, 1499-1544) — at
# B=8, H=4, T=1024 that is ~4 full (B, H, T, T) HBM passes per layer.  Here
# each consumer instead recomputes the scores tile-wise (cheap: the qk/pos
# matmuls are ~48 MACs/element vs ~6 bytes/element of avoided traffic) and
# contracts softmax(scores) with its value stream entirely in VMEM; only the
# (TILE, vd) output tile is written.  The backward is flash-style: one Pallas
# pass recomputes probabilities and emits dq/dk/dpq/dpe/dv per tile — no
# (T, T) tensor ever reaches HBM in either direction.
# ---------------------------------------------------------------------------


def _tile_unshear(ds, t, ti):
    """Adjoint of the shear in _tile_scores: (TILE, T) score-cotangent tile ->
    (TILE, T+TILE) band cotangent with out[r, c] = ds[r, c + r - (TILE-1)]
    (zero where the index falls outside [0, T)).  Implemented as zero-pad to
    width T+TILE, a global right-roll by TILE-1, then a binary-decomposed
    per-row LEFT-roll by r; wrapped indices always land in the zero-padded
    columns, so the circular rolls never alias real data.

    NOTE: only the "binary" decomposition lives here — the "roll" path's
    unshear needs a DECREASING per-row rotate, which tpu.dynamic_rotate
    cannot express (non-negative stride, per-vreg shifts < lane width), so
    _apply_bwd_kernel instead conjugates a stride=+1 rotate with
    anti-identity MXU reversals and pushes the reversals onto the pd-wide
    adjoint products (see the roll branch there)."""
    w = t + ti
    x = jnp.concatenate(
        [ds, jnp.zeros((ds.shape[0], w - t), ds.dtype)], axis=1
    )
    # global right-roll by TILE-1, then per-row left-roll by r
    s0 = ti - 1
    x = jnp.concatenate([x[:, w - s0:], x[:, : w - s0]], axis=1)
    rows = jax.lax.broadcasted_iota(jnp.int32, (ti, 1), 0)
    nbits = max(1, (ti - 1).bit_length())
    for bbit in range(nbits):
        s = 1 << bbit
        rolled = jnp.concatenate([x[:, s:], x[:, :s]], axis=1)  # left-roll
        take = (rows >> bbit) & 1
        x = jnp.where(take == 1, rolled, x)
    return x


def _apply_probs(q_ref, k_ref, pq_ref, pe_ref, mask_ref, gate_ref, shear):
    """probs (TILE, T) f32 for the current tile + the pre-mask scores.

    gate_ref (SMEM, (1, 1)) holds the const-attention gate (0.0 or 1.0,
    ref zipformer.py:545-556): when 1, probabilities are replaced by the
    row-normalized support indicator of the softmax (detached in backward)."""
    s_pre = _tile_scores(q_ref, k_ref, pq_ref, pe_ref, shear)
    probs = _tile_softmax(s_pre + mask_ref[0, 0, :][None, :])
    gate = gate_ref[0, 0]
    binary = (probs > 0.0).astype(jnp.float32)
    const = binary / jnp.maximum(
        jnp.sum(binary, axis=1, keepdims=True), 1e-20
    )
    used = jnp.where(gate > 0.0, const, probs)
    return s_pre, probs, used


def _apply_kernel(q_ref, k_ref, pq_ref, pe_ref, mask_ref, v_ref, gate_ref,
                  out_ref, *, shear):
    """Forward. Grid (B*H, T // TILE); v_ref (1, T, vd); out (1, TILE, vd)."""
    _, _, used = _apply_probs(q_ref, k_ref, pq_ref, pe_ref, mask_ref, gate_ref,
                              shear)
    v = v_ref[0]
    out_ref[0] = jax.lax.dot_general(
        used.astype(v.dtype), v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(out_ref.dtype)


def _apply_bwd_kernel(q_ref, k_ref, pq_ref, pe_ref, mask_ref, v_ref, g_ref,
                      gate_ref, pen_ref,
                      dq_ref, dk_ref, dpq_ref, dpe_ref, dv_ref,
                      *, limit, valid_cols, shear):
    """Flash-style backward: recompute probs tile-wise, then emit all five
    cotangents without materializing any (T, T) tensor in HBM.

    dk/dpe/dv are accumulated across the (sequential, innermost) row-tile
    grid dimension into full per-(b,h) blocks that stay resident in VMEM;
    dq/dpq are written per tile.  The gated const-attention branch is
    detached (ds = 0) exactly like the reference's .detach() (ref
    zipformer.py:545-556); the score-failsafe penalty (pen_ref = gate *
    penalty) is added to ds unconditionally, matching
    penalize_abs_values_gt's behavior of contributing gradient even when the
    consumer's cotangent is zero (ref scaling.py:699-726)."""
    ti = q_ref.shape[1]
    t = k_ref.shape[1]
    i0 = pl.program_id(1) * ti

    @pl.when(pl.program_id(1) == 0)
    def _init():
        dk_ref[0] = jnp.zeros_like(dk_ref[0])
        dpe_ref[0] = jnp.zeros_like(dpe_ref[0])
        dv_ref[0] = jnp.zeros_like(dv_ref[0])

    s_pre, probs, used = _apply_probs(
        q_ref, k_ref, pq_ref, pe_ref, mask_ref, gate_ref, shear
    )
    g = g_ref[0].astype(jnp.float32)  # (TILE, vd)
    v = v_ref[0].astype(jnp.float32)  # (T, vd)

    # dv += used^T @ g
    dv_ref[0] += jax.lax.dot_general(
        used, g, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    # dP = g @ v^T; softmax VJP (zero when the const branch was taken)
    dp = jax.lax.dot_general(
        g, v, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (TILE, T)
    ds = probs * (dp - jnp.sum(dp * probs, axis=1, keepdims=True))
    ds = jnp.where(gate_ref[0, 0] > 0.0, 0.0, ds)

    pen = pen_ref[0, 0]
    pen_term = pen * jnp.sign(s_pre) * ((jnp.abs(s_pre) - limit) > 0)
    if valid_cols < t:
        col = jax.lax.broadcasted_iota(jnp.int32, s_pre.shape, 1)
        pen_term = jnp.where(col < valid_cols, pen_term, 0.0)
    ds = ds + pen_term

    k = k_ref[0].astype(jnp.float32)
    q = q_ref[0].astype(jnp.float32)
    dq_ref[0] = jax.lax.dot_general(
        ds, k, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dk_ref[0] += jax.lax.dot_general(
        ds, q, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    # positional adjoints through the shear
    band_start = pl.multiple_of(t - ti - i0, TILE)
    band = pe_ref[0, pl.ds(band_start, t + ti), :].astype(jnp.float32)
    if shear == "roll" and _BWD_SHEAR_ADJ == "rollw":
        # the unshear IS one hardware rotate: ds_sh[r, c] =
        # ds_pad[r, (c + r - (ti-1)) mod w] = right-rotate row r by
        # (ti-1) - r, and with stride = w-1 the rotate's per-row shift
        # (ti-1) + (w-1) r ≡ (ti-1) - r (mod w).  No reversals, no MXU
        # passes, ds stays exact f32.  Wrapped indices land in the
        # zero-padded columns (same argument as _tile_unshear).
        from jax.experimental.pallas import tpu as _pltpu

        w = t + ti
        ds_pad = jnp.concatenate(
            [ds, jnp.zeros((ti, w - t), ds.dtype)], axis=1
        )
        ds_sh = _pltpu.roll(ds_pad, ti - 1, 1, stride=w - 1, stride_axis=0)
        dpq_ref[0] = jax.lax.dot_general(
            ds_sh, band, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dband = jax.lax.dot_general(
            ds_sh, pq_ref[0].astype(jnp.float32),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (T+TILE, pd)
    elif shear == "roll" and _BWD_SHEAR_ADJ == "flip":
        # same math as the matmul branch below with every anti-identity
        # product R @ x replaced by a sublane reverse: R is a permutation,
        # so rev(x, axis=0) == R @ x exactly — no MXU passes, no rounding.
        # The wide rev(ds_pad) replaces the branch's single largest matmul
        # (a 128-deep contraction over T+TILE columns).
        from jax.experimental.pallas import tpu as _pltpu

        w = t + ti
        ds_pad = jnp.concatenate(
            [ds, jnp.zeros((ti, w - t), ds.dtype)], axis=1
        )
        y = jax.lax.rev(ds_pad, (0,))
        y = _pltpu.roll(y, 0, 1, stride=1, stride_axis=0)
        z = jax.lax.dot_general(
            y, band, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (TILE, pd)
        dpq_ref[0] = jax.lax.rev(z, (0,))
        rpq = jax.lax.rev(pq_ref[0].astype(jnp.float32), (0,))
        dband = jax.lax.dot_general(
            y, rpq, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (T+TILE, pd)
    elif shear == "roll":
        # ds_sh = R @ roll(R @ ds_pad)  (see _tile_unshear), but only two
        # pd-wide products consume ds_sh, so push R onto THEM instead of
        # materializing ds_sh:
        #     dpq  = ds_sh @ band   = R @ (y @ band)
        #     dpe += ds_sh^T @ pq   = y^T @ (R @ pq)      (R is symmetric)
        # One wide reverse (default matmul precision — the downstream
        # contractions truncate operands to bf16 anyway, so an exact f32
        # reverse buys nothing) plus two hp reverses on (*, pd) tiles that
        # are MXU noise.  The two wide HIGHEST-precision reverses of the
        # naive formulation were 54% of this kernel's runtime (measured
        # r3: 1518 -> 691 us with the unshear stubbed, B=8, T=1024).
        from jax.experimental.pallas import tpu as _pltpu

        w = t + ti
        ii = jax.lax.broadcasted_iota(jnp.int32, (ti, ti), 0)
        jj = jax.lax.broadcasted_iota(jnp.int32, (ti, ti), 1)
        rev = (ii + jj == ti - 1).astype(jnp.float32)
        hp = jax.lax.Precision.HIGHEST
        ds_pad = jnp.concatenate(
            [ds, jnp.zeros((ti, w - t), ds.dtype)], axis=1
        )
        y = jax.lax.dot_general(
            rev, ds_pad, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        y = _pltpu.roll(y, 0, 1, stride=1, stride_axis=0)
        z = jax.lax.dot_general(
            y, band, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (TILE, pd)
        dpq_ref[0] = jax.lax.dot_general(
            rev, z, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=hp,
        )
        rpq = jax.lax.dot_general(
            rev, pq_ref[0].astype(jnp.float32), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=hp,
        )
        dband = jax.lax.dot_general(
            y, rpq, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (T+TILE, pd)
    else:
        ds_sh = _tile_unshear(ds, t, ti)  # (TILE, T+TILE)
        dpq_ref[0] = jax.lax.dot_general(
            ds_sh, band, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dband = jax.lax.dot_general(
            ds_sh, pq_ref[0].astype(jnp.float32),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (T+TILE, pd)
    dpe_ref[0, pl.ds(band_start, t + ti), :] += dband


def _heads_layout(q, k, pq, pe, v):
    b, t, h, qd = q.shape
    pd = pq.shape[-1]
    vd = v.shape[-1]
    qh = q.transpose(0, 2, 1, 3).reshape(b * h, t, qd)
    kh = k.transpose(0, 2, 1, 3).reshape(b * h, t, qd)
    pqh = pq.transpose(0, 2, 1, 3).reshape(b * h, t, pd)
    peh = jnp.pad(pe, ((0, 1), (0, 0), (0, 0))).transpose(1, 0, 2)  # (H,2T,pd)
    vh = v.transpose(0, 2, 1, 3).reshape(b * h, t, vd)
    return qh, kh, pqh, peh, vh


def _pallas_rel_apply(q, k, pq, pe, bias, v, gate, out_dtype, interpret):
    b, t, h, qd = q.shape
    pd = pq.shape[-1]
    vd = v.shape[-1]
    assert t % TILE == 0, t
    qh, kh, pqh, peh, vh = _heads_layout(q, k, pq, pe, v)
    gate2 = gate.reshape(1, 1).astype(jnp.float32)

    out = pl.pallas_call(
        functools.partial(_apply_kernel, shear=_effective_shear(interpret)),
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
            pl.BlockSpec((1, t, vd), lambda bh, ti: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda bh, ti: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, TILE, vd), lambda bh, ti: (bh, ti, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, t, vd), out_dtype),
        interpret=interpret,
    )(qh, kh, pqh, peh, bias, vh, gate2)
    return out.reshape(b, h, t, vd).transpose(0, 2, 1, 3)


def _pallas_rel_apply_bwd(q, k, pq, pe, bias, v, gate, pen, g, limit,
                          valid_cols, interpret):
    b, t, h, qd = q.shape
    pd = pq.shape[-1]
    vd = v.shape[-1]
    # lane-pad the value/cotangent streams to the 128-lane vreg width: the
    # dv and dp dots keep their MXU pass count (N=12 / K=12 already cost
    # full lane tiles) but every DMA becomes contiguous; the padded lanes
    # are exact zeros (g_pad * v_pad contributes 0 to dp) and dv's pad
    # lanes are sliced off below.
    vdp = ((vd + TILE - 1) // TILE) * TILE
    qh, kh, pqh, peh, vh = _heads_layout(q, k, pq, pe, v)
    vh = jnp.pad(vh, ((0, 0), (0, 0), (0, vdp - vd)))
    gh = jnp.pad(
        g.transpose(0, 2, 1, 3).reshape(b * h, t, vd),
        ((0, 0), (0, 0), (0, vdp - vd)),
    )
    gate2 = gate.reshape(1, 1).astype(jnp.float32)
    pen2 = pen.reshape(1, 1).astype(jnp.float32)

    spec_tile = lambda d: pl.BlockSpec((1, TILE, d), lambda bh, ti: (bh, ti, 0),
                                       memory_space=pltpu.VMEM)
    spec_full = lambda n, d: pl.BlockSpec((1, n, d), lambda bh, ti: (bh, 0, 0),
                                          memory_space=pltpu.VMEM)
    dq, dk, dpq, dpe_p, dv = pl.pallas_call(
        functools.partial(_apply_bwd_kernel, limit=limit,
                          valid_cols=valid_cols,
                          shear=_effective_shear(interpret)),
        grid=(b * h, t // TILE),
        in_specs=[
            spec_tile(qd),
            spec_full(t, qd),
            spec_tile(pd),
            pl.BlockSpec((1, 2 * t, pd), lambda bh, ti: (bh % h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, t), lambda bh, ti: (bh // h, 0, 0),
                         memory_space=pltpu.VMEM),
            spec_full(t, vdp),
            spec_tile(vdp),
            pl.BlockSpec((1, 1), lambda bh, ti: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda bh, ti: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=[
            spec_tile(qd),
            spec_full(t, qd),
            spec_tile(pd),
            pl.BlockSpec((1, 2 * t, pd), lambda bh, ti: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            spec_full(t, vdp),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b * h, t, qd), jnp.float32),
            jax.ShapeDtypeStruct((b * h, t, qd), jnp.float32),
            jax.ShapeDtypeStruct((b * h, t, pd), jnp.float32),
            jax.ShapeDtypeStruct((b * h, 2 * t, pd), jnp.float32),
            jax.ShapeDtypeStruct((b * h, t, vdp), jnp.float32),
        ],
        interpret=interpret,
    )(qh, kh, pqh, peh, bias, vh, gh, gate2, pen2)

    unhead = lambda x, d: x.reshape(b, h, t, d).transpose(0, 2, 1, 3)
    dq = unhead(dq, qd).astype(q.dtype)
    dk = unhead(dk, qd).astype(k.dtype)
    dpq = unhead(dpq, pd).astype(pq.dtype)
    dv = unhead(dv[..., :vd], vd).astype(v.dtype)
    # dpe_p: (B*H, 2T, pd) partial sums -> sum over batch, drop the pad row
    dpe = (
        dpe_p.reshape(b, h, 2 * t, pd).sum(0).transpose(1, 0, 2)[: 2 * t - 1]
    ).astype(pe.dtype)
    return dq, dk, dpq, dpe, dv


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10))
def _rel_apply_ad(q, k, pq, pe, bias, v, pen_gate, limit, valid_cols,
                  out_dtype, interpret):
    return _pallas_rel_apply(q, k, pq, pe, bias, v, pen_gate[1], out_dtype,
                             interpret)


def _rel_apply_fwd(q, k, pq, pe, bias, v, pen_gate, limit, valid_cols,
                   out_dtype, interpret):
    return (
        _pallas_rel_apply(q, k, pq, pe, bias, v, pen_gate[1], out_dtype,
                          interpret),
        (q, k, pq, pe, bias, v, pen_gate),
    )


def _rel_apply_bwd(limit, valid_cols, out_dtype, interpret, res, g):
    """bias' cotangent is returned as zeros: bias always derives from a
    boolean padding mask (see rel_attention_apply), so nothing consumes it.
    pen/gate are loss-side scalars with no output cotangent either."""
    q, k, pq, pe, bias, v, pen_gate = res
    pen, gate = pen_gate
    dq, dk, dpq, dpe, dv = _pallas_rel_apply_bwd(
        q, k, pq, pe, bias, v, gate, pen, g, limit, valid_cols, interpret
    )
    zero = jnp.zeros((), jnp.float32)
    return dq, dk, dpq, dpe, jnp.zeros_like(bias), dv, (zero, zero)


_rel_apply_ad.defvjp(_rel_apply_fwd, _rel_apply_bwd)


@functools.partial(
    jax.jit,
    static_argnames=("out_dtype", "interpret", "penalty_limit",
                     "penalty_valid_cols"),
)
def rel_attention_apply(
    q: jax.Array,  # (B, T, H, qd)
    k: jax.Array,  # (B, T, H, qd)
    pq: jax.Array,  # (B, T, H, pd)
    pe: jax.Array,  # (2T-1, H, pd)
    key_padding_mask: Optional[jax.Array],  # (B, T) bool or None
    v: jax.Array,  # (B, T, H, vd)
    out_dtype=jnp.bfloat16,
    interpret: bool = False,
    score_penalty: Optional[jax.Array] = None,  # scalar gate*penalty, f32
    penalty_limit: float = 25.0,
    penalty_valid_cols: Optional[int] = None,
    const_gate: Optional[jax.Array] = None,  # scalar 0/1 const-attention gate
) -> jax.Array:
    """Fused softmax(rel-pos scores) @ v -> (B, T, H, vd), differentiable.

    The TPU answer to the reference's three probability consumers (ref
    zipformer.py:1359-1396 SelfAttention x2, :1499-1544 NonlinAttention):
    each consumer re-derives its score tiles in VMEM instead of sharing one
    HBM-resident (B, H, T, T) tensor.  T must be a multiple of TILE; use
    rel_attention_apply_any otherwise.  score_penalty must be attached to
    exactly ONE apply call per attention-weights module so the failsafe
    gradient (ref zipformer.py:1254-1269) is counted once.  const_gate
    implements the detached const-attention branch for the head-0/nonlin
    consumer (ref zipformer.py:545-556)."""
    b, t = q.shape[0], q.shape[1]
    bias = _bias_from_mask(key_padding_mask, b, t)
    if score_penalty is None:
        score_penalty = jnp.zeros((), jnp.float32)
    if const_gate is None:
        const_gate = jnp.zeros((), jnp.float32)
    if penalty_valid_cols is None:
        penalty_valid_cols = t
    return _rel_apply_ad(
        q, k, pq, pe, bias, v,
        (score_penalty.astype(jnp.float32), const_gate.astype(jnp.float32)),
        float(penalty_limit), int(penalty_valid_cols), out_dtype, interpret,
    )


def rel_attention_apply_any(
    q: jax.Array,
    k: jax.Array,
    pq: jax.Array,
    pe: jax.Array,
    key_padding_mask: Optional[jax.Array],
    v: jax.Array,
    out_dtype=jnp.bfloat16,
    interpret: bool = False,
    score_penalty: Optional[jax.Array] = None,
    penalty_limit: float = 25.0,
    const_gate: Optional[jax.Array] = None,
) -> jax.Array:
    """rel_attention_apply for ANY t via the same pad-and-slice scheme as
    rel_attention_probs_any: padded key columns carry the -1000 bias so they
    get zero probability (and contribute 0 * v to the output); padded query
    rows are sliced away; the penalty is bounded to real key columns."""
    t = q.shape[1]
    if t % TILE == 0:
        return rel_attention_apply(
            q, k, pq, pe, key_padding_mask, v, out_dtype, interpret,
            score_penalty, penalty_limit, None, const_gate,
        )
    _, (qp, kp, pqp, vp), pep, maskp, _ = _pad_time_to_tile(
        t, q.shape[0], (q, k, pq, v), pe, key_padding_mask
    )
    out = rel_attention_apply(
        qp, kp, pqp, pep, maskp, vp, out_dtype, interpret,
        score_penalty, penalty_limit, t, const_gate,
    )
    return out[:, :t]


# ---------------------------------------------------------------------------
# Shared-probs forward + flash backward ("consume").
#
# Measured on v5e (123M fm_decoder, T=1024): the apply kernel's forward is
# SLOWER than the probs kernel + XLA einsums at every batch size (B=2:
# 34.8 -> 37.2 ms, B=8: 47.3 -> 55.3, B=16: 63.9 -> 82.3) — the probs kernel
# already eliminated the dominant f32 (B,H,T,2T-1) traffic in round 2, and
# recomputing the VPU-bound shear+softmax once per consumer costs more than
# the remaining bf16-probs reads.  The apply BACKWARD however is a 21%
# step win (fwd+bwd 195 -> 154 ms at B=8): it replaces three materialized
# (B,H,T,T) dprobs adjoints + the ds pass with per-tile recompute.
#
# rel_attention_consume keeps the best of both: forward contracts the
# layer's SHARED materialized probabilities (computed once by the probs
# kernel, stop-gradient) with this consumer's value stream in XLA; backward
# ignores the probs residual and runs the flash kernel (_apply_bwd_kernel),
# emitting dq/dk/dpq/dpe/dv per tile with no (T, T) tensor in HBM.
# ---------------------------------------------------------------------------


def _pad_t(x, d):
    return jnp.pad(x, ((0, 0), (0, d), (0, 0), (0, 0)))


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9))
def _rel_consume_ad(q, k, pq, pe, bias, probs, v, pen_gate, limit, interpret):
    # TRAINING forward keeps the XLA einsum: inside the big fwd+bwd program
    # at B=8 XLA fuses this contraction well, and routing it through the
    # Pallas matmul (rel_attention_probs_apply) MEASURED SLOWER — loss_fwd
    # 18.96 ms (r4, einsum) vs 26.9 ms (r5 first capture, kernel): the
    # pad/transpose glue around the custom call breaks fusion with the
    # surrounding layer ops.  The kernel's win is the small-batch EVAL
    # path, where it is wired at the zipformer call sites instead.
    return jnp.einsum(
        "bhts,bshd->bthd", probs.astype(v.dtype), v,
        preferred_element_type=v.dtype,
    )


def _rel_consume_fwd(q, k, pq, pe, bias, probs, v, pen_gate, limit,
                     interpret):
    out = _rel_consume_ad(q, k, pq, pe, bias, probs, v, pen_gate, limit,
                          interpret)
    return out, (q, k, pq, pe, bias, v, pen_gate)


def _rel_consume_bwd(limit, interpret, res, g):
    """Flash backward with internal pad-to-TILE: q/k/pq/pe/v/g are padded,
    the kernel recomputes probabilities tile-wise, and the cotangents are
    sliced back.  probs' cotangent is zeros (a broadcast XLA DCEs under the
    caller's stop_gradient) — all score gradients flow through the
    recompute; bias' cotangent is zeros for the same reason as the apply op
    (always derived from a boolean mask)."""
    q, k, pq, pe, bias, v, pen_gate = res
    pen, gate = pen_gate
    t = q.shape[1]
    t_pad = ((t + TILE - 1) // TILE) * TILE
    d = t_pad - t
    if d:
        qp, kp, pqp, vp, gp = (_pad_t(a, d) for a in (q, k, pq, v, g))
        pep = jnp.pad(pe, ((d, d), (0, 0), (0, 0)))
        biasp = jnp.pad(bias, ((0, 0), (0, 0), (0, d)),
                        constant_values=-1000.0)
    else:
        qp, kp, pqp, vp, gp, pep, biasp = q, k, pq, v, g, pe, bias
    dq, dk, dpq, dpe, dv = _pallas_rel_apply_bwd(
        qp, kp, pqp, pep, biasp, vp, gate, pen, gp, limit, t, interpret
    )
    if d:
        dq, dk, dpq, dv = (a[:, :t] for a in (dq, dk, dpq, dv))
        dpe = dpe[d:d + 2 * t - 1]
    zero = jnp.zeros((), jnp.float32)
    b, h = q.shape[0], q.shape[2]
    dprobs = jnp.zeros((b, h, t, t), v.dtype)
    return (dq, dk, dpq, dpe, jnp.zeros_like(bias), dprobs, dv, (zero, zero))


_rel_consume_ad.defvjp(_rel_consume_fwd, _rel_consume_bwd)


def rel_attention_consume(
    q: jax.Array,  # (B, T, H, qd)
    k: jax.Array,
    pq: jax.Array,
    pe: jax.Array,  # (2T-1, H, pd)
    key_padding_mask: Optional[jax.Array],
    probs: jax.Array,  # (B, H, T, T) — SHARED, stop-gradient
    v: jax.Array,  # (B, T, H, vd)
    score_penalty: Optional[jax.Array] = None,
    penalty_limit: float = 25.0,
    const_gate: Optional[jax.Array] = None,
    interpret: bool = False,
) -> jax.Array:
    """probs @ v with flash backward; any t (padding handled in backward).

    probs MUST be stop_gradient(...) of probabilities computed from exactly
    (q, k, pq, pe, mask) — the backward recomputes them tile-wise, so a
    mismatched probs input silently yields wrong gradients.  score_penalty
    attaches the failsafe gradient (exactly one consumer per layer);
    const_gate marks the probs as the detached const-attention branch
    (ds = 0, dv through the recomputed const probabilities)."""
    b, t = q.shape[0], q.shape[1]
    bias = _bias_from_mask(key_padding_mask, b, t)
    if score_penalty is None:
        score_penalty = jnp.zeros((), jnp.float32)
    if const_gate is None:
        const_gate = jnp.zeros((), jnp.float32)
    return _rel_consume_ad(
        q, k, pq, pe, bias, probs, v,
        (score_penalty.astype(jnp.float32), const_gate.astype(jnp.float32)),
        float(penalty_limit), interpret,
    )


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
        functools.partial(_kernel, shear=_effective_shear(interpret)),
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


# ---------------------------------------------------------------------------
# Eval-only fused variants (no VJP) — round-4 inference-MFU work.
#
# In eval the layer consumes one shared materialized probability tensor
# three times (nonlin head-0, SelfAttention 1, SelfAttention 2 — ref
# zipformer.py:1359-1396, 1499-1544); the probs kernel writes it and every
# consumer reads it back, so the (B, H, T, T) tensor crosses HBM four times
# per layer.  Two structural fixes, both pure forwards:
#
# * rel_attention_probs_consume — the probs kernel grows a fused first
#   consumer: each (TILE, T) probability tile is contracted with that
#   consumer's value stream in VMEM right after softmax and BOTH the probs
#   tile and the (TILE, vd) output tile are written.  Used for
#   SelfAttention-1 by deferring the probs kernel to its call site (the
#   scores depend only on the LAYER INPUT, so computing them after ff1/
#   nonlin is the same math); its 16 MB probs read disappears.
# * rel_attention_head0_consume — NonlinAttention runs before the deferred
#   probs kernel, but it only needs head 0: recompute the head-0 scores
#   tile-wise (1/H of the probs kernel's work) and contract with the gated
#   value stream in VMEM; the head-0 slice never touches HBM.
#
# SelfAttention-2 still reads the materialized probs — with the shared-probs
# design that read is exactly the bf16 traffic that beat per-consumer
# softmax recompute (see the consume section above).
# ---------------------------------------------------------------------------


def _probs_apply_kernel(p_ref, v_ref, out_ref):
    """Grid (B*H, T//TT): one probs row-tile (TT, T) contracted with the
    full lane-padded value block (T, vdp) — a plain MXU matmul whose every
    operand is vreg-aligned."""
    out_ref[0] = jax.lax.dot_general(
        p_ref[0], v_ref[0],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(out_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _probs_apply_ad(probs, v, interpret):
    return _pallas_probs_apply(probs, v, interpret)


def _probs_apply_fwd(probs, v, interpret):
    return _pallas_probs_apply(probs, v, interpret), (probs, v)


def _probs_apply_bwd(interpret, res, g):
    """Plain einsum adjoints: this op is the EVAL consume (the training
    path uses rel_attention_consume's flash backward), but grad-of-eval
    is reachable — e.g. a schedules=None loss — and a missing VJP on the
    custom call would make those paths error out on TPU."""
    probs, v = res
    dprobs = jnp.einsum("bthd,bshd->bhts", g, v,
                        preferred_element_type=jnp.float32).astype(probs.dtype)
    dv = jnp.einsum("bhts,bthd->bshd", probs, g,
                    preferred_element_type=jnp.float32).astype(v.dtype)
    return dprobs, dv


_probs_apply_ad.defvjp(_probs_apply_fwd, _probs_apply_bwd)


def rel_attention_probs_apply(
    probs: jax.Array,  # (B, H, T, T) — materialized probabilities
    v: jax.Array,  # (B, T, H, vd)
    interpret: bool = False,
) -> jax.Array:
    """Eval einsum('bhts,bshd->bthd', probs, v) as a Pallas batched
    matmul with the value stream lane-padded to the 128-lane vreg width
    and laid out heads-major.

    Why not XLA: with value_head_dim 12 the einsum's RHS/output minor dim
    is 12 — PROFILE_r4 measured XLA's lowering of exactly this contraction
    at 1.3-8.6% of bf16 peak (self_attn rows) because both the (T, 12)
    value loads and the (B, T, H, 12) interleaved stores are far off the
    native (8, 128) tile.  Padding vd -> 128 does NOT add MXU passes (an
    N=12 output tile already costs one full 128-lane pass), it only makes
    every DMA contiguous; the pad/slice live outside the kernel where the
    custom call keeps XLA's simplifier from pushing the slice back into
    the dot (recreating the 12-lane form).  The padded lanes are exact
    zeros, so the real lanes are bit-identical to the unpadded contraction.

    T must be a multiple of TILE (serving frame buckets are); callers fall
    back to the XLA einsum otherwise.  Accumulates f32, returns v.dtype.
    Differentiable (einsum-adjoint VJP — the flash training backward lives
    in rel_attention_consume).  (Ref consumers: zipformer.py:1359-1396.)"""
    return _probs_apply_ad(probs, v, interpret)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _pallas_probs_apply(probs, v, interpret):
    b, h, t, _ = probs.shape
    vd = v.shape[-1]
    assert t % TILE == 0, t
    vdp = ((vd + TILE - 1) // TILE) * TILE
    vh = v.transpose(0, 2, 1, 3).reshape(b * h, t, vd)
    vh = jnp.pad(vh, ((0, 0), (0, 0), (0, vdp - vd)))
    ph = probs.reshape(b * h, t, t)
    # row tile: whole (T, T) block up to T=1024 (2 MB bf16 in VMEM, the
    # value block is then read once per (b, h)); above that, the largest
    # row tile that DIVIDES t — a non-divisor leaves the tail rows of
    # every (b, h) block unwritten (t=1152 with tt=256 covered only rows
    # 0-1023; the 128-frame buckets make t%256==128 reachable in serving)
    if t <= 1024:
        tt = t
    else:
        tt = next(c for c in (512, 384, 256, 128) if t % c == 0)
    out = pl.pallas_call(
        _probs_apply_kernel,
        grid=(b * h, t // tt),
        in_specs=[
            pl.BlockSpec((1, tt, t), lambda bh, ti: (bh, ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, vdp), lambda bh, ti: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tt, vdp), lambda bh, ti: (bh, ti, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, t, vdp), v.dtype),
        interpret=interpret,
    )(ph, vh)
    return out.reshape(b, h, t, vdp)[..., :vd].transpose(0, 2, 1, 3)


def _probs_consume_kernel(q_ref, k_ref, pq_ref, pe_ref, mask_ref, v_ref,
                          probs_ref, out_ref, *, shear):
    """Grid (B*H, T//TILE): probs tile + fused probs @ v epilogue."""
    scores = _tile_scores(q_ref, k_ref, pq_ref, pe_ref, shear)
    probs = _tile_softmax(scores + mask_ref[0, 0, :][None, :])
    pb = probs.astype(probs_ref.dtype)
    probs_ref[0] = pb
    out_ref[0] = jax.lax.dot_general(
        pb, v_ref[0],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(out_ref.dtype)


def _head0_consume_kernel(q_ref, k_ref, pq_ref, pe_ref, mask_ref, v_ref,
                          out_ref, *, shear):
    """Grid (B, T//TILE): head-0 probs tile @ wide value stream, no probs
    output."""
    scores = _tile_scores(q_ref, k_ref, pq_ref, pe_ref, shear)
    probs = _tile_softmax(scores + mask_ref[0, 0, :][None, :])
    out_ref[0] = jax.lax.dot_general(
        probs.astype(v_ref.dtype), v_ref[0],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(out_ref.dtype)


def _bias_from_mask(key_padding_mask, b, t):
    if key_padding_mask is None:
        return jnp.zeros((b, 1, t), jnp.float32)
    return jnp.where(key_padding_mask, -1000.0, 0.0).astype(jnp.float32)[
        :, None, :
    ]


def _pad_time_to_tile(t, b, bthd, pe, key_padding_mask, btc=()):
    """Shared pad-and-slice preamble: pad the time axis of the (B, T, H, D)
    arrays in ``bthd`` (and the (B, T, C) arrays in ``btc``) to the next
    TILE multiple, re-center pe ((2t-1) + 2d = 2*t_pad - 1), and extend the
    key-padding mask with True over the phantom keys (the -1000 bias makes
    real rows normalize exactly as the unpadded softmax; padded query rows
    are sliced away by the callers).  Returns
    (t_pad, bthd, pe, mask, btc)."""
    t_pad = ((t + TILE - 1) // TILE) * TILE
    d = t_pad - t
    if d:
        bthd = tuple(
            jnp.pad(a, ((0, 0), (0, d), (0, 0), (0, 0))) for a in bthd
        )
        btc = tuple(jnp.pad(a, ((0, 0), (0, d), (0, 0))) for a in btc)
        pe = jnp.pad(pe, ((d, d), (0, 0), (0, 0)))
        if key_padding_mask is None:
            key_padding_mask = jnp.zeros((b, t), bool)
        key_padding_mask = jnp.pad(
            key_padding_mask, ((0, 0), (0, d)), constant_values=True
        )
    return t_pad, bthd, pe, key_padding_mask, btc


@functools.partial(jax.jit, static_argnames=("out_dtype", "interpret"))
def rel_attention_probs_consume(
    q: jax.Array,  # (B, T, H, qd)
    k: jax.Array,
    pq: jax.Array,  # (B, T, H, pd)
    pe: jax.Array,  # (2T-1, H, pd)
    key_padding_mask,  # (B, T) bool or None
    v: jax.Array,  # (B, T, H, vd) — the fused consumer's value stream
    out_dtype=jnp.bfloat16,
    interpret: bool = False,
):
    """Eval-only: (probs (B, H, T, T) in out_dtype, out (B, T, H, vd) in
    v.dtype).  out == einsum('bhts,bshd->bthd', probs, v) with f32
    accumulation; any t (pad-and-slice, same correctness argument as
    rel_attention_probs_any)."""
    b, t, h, qd = q.shape
    t_pad, (q, k, pq, v), pe, key_padding_mask, _ = _pad_time_to_tile(
        t, b, (q, k, pq, v), pe, key_padding_mask
    )
    d = t_pad - t
    tp = t_pad
    pd = pq.shape[-1]
    vd = v.shape[-1]
    # lane-pad the value stream to the 128-lane vreg width: same MXU pass
    # count (N=12 already costs a full lane tile), aligned DMAs instead of
    # 12-lane-minor strided loads/stores; padded lanes are exact zeros and
    # are sliced off below (see rel_attention_probs_apply).
    vdp = ((vd + TILE - 1) // TILE) * TILE
    bias = _bias_from_mask(key_padding_mask, b, tp)
    qh = q.transpose(0, 2, 1, 3).reshape(b * h, tp, qd)
    kh = k.transpose(0, 2, 1, 3).reshape(b * h, tp, qd)
    pqh = pq.transpose(0, 2, 1, 3).reshape(b * h, tp, pd)
    peh = jnp.pad(pe, ((0, 1), (0, 0), (0, 0))).transpose(1, 0, 2)
    vh = jnp.pad(
        v.transpose(0, 2, 1, 3).reshape(b * h, tp, vd),
        ((0, 0), (0, 0), (0, vdp - vd)),
    )

    probs, out = pl.pallas_call(
        functools.partial(
            _probs_consume_kernel, shear=_effective_shear(interpret)
        ),
        grid=(b * h, tp // TILE),
        in_specs=[
            pl.BlockSpec((1, TILE, qd), lambda bh, ti: (bh, ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tp, qd), lambda bh, ti: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE, pd), lambda bh, ti: (bh, ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * tp, pd), lambda bh, ti: (bh % h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tp), lambda bh, ti: (bh // h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tp, vdp), lambda bh, ti: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, TILE, tp), lambda bh, ti: (bh, ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE, vdp), lambda bh, ti: (bh, ti, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b * h, tp, tp), out_dtype),
            jax.ShapeDtypeStruct((b * h, tp, vdp), v.dtype),
        ],
        interpret=interpret,
    )(qh, kh, pqh, peh, bias, vh)
    probs = probs.reshape(b, h, tp, tp)
    out = out.reshape(b, h, tp, vdp)[..., :vd].transpose(0, 2, 1, 3)
    if d:
        probs = probs[:, :, :t, :t]
        out = out[:, :t]
    return probs, out


@functools.partial(jax.jit, static_argnames=("interpret",))
def rel_attention_head0_consume(
    q: jax.Array,  # (B, T, H, qd) — only head 0 is used
    k: jax.Array,
    pq: jax.Array,
    pe: jax.Array,  # (2T-1, H, pd)
    key_padding_mask,  # (B, T) bool or None
    v: jax.Array,  # (B, T, C) — gated nonlin value stream (wide C)
    interpret: bool = False,
) -> jax.Array:
    """Eval-only: einsum('bts,bsc->btc', softmax-head0-probs, v) with the
    head-0 probabilities recomputed tile-wise in VMEM (1/H of the probs
    kernel work), never materialized.  Accumulates f32; returns v.dtype.
    The probs it recomputes are numerically identical to the probs kernel's
    head 0 (same tile ops on the same inputs)."""
    b, t, h, qd = q.shape
    t_pad, (q, k, pq), pe, key_padding_mask, (v,) = _pad_time_to_tile(
        t, b, (q, k, pq), pe, key_padding_mask, btc=(v,)
    )
    d = t_pad - t
    tp = t_pad
    pd = pq.shape[-1]
    c = v.shape[-1]
    # lane-pad the gated value stream (3*encoder_dim/4 = 288 at 123M) to a
    # 128-multiple so its DMA and the output store are vreg-aligned; exact
    # zeros, sliced off below (see rel_attention_probs_apply).
    cp = ((c + TILE - 1) // TILE) * TILE
    v = jnp.pad(v, ((0, 0), (0, 0), (0, cp - c)))
    bias = _bias_from_mask(key_padding_mask, b, tp)
    q0 = q[:, :, 0, :]
    k0 = k[:, :, 0, :]
    pq0 = pq[:, :, 0, :]
    pe0 = jnp.pad(pe, ((0, 1), (0, 0), (0, 0)))[None, :, 0, :]  # (1, 2T, pd)

    out = pl.pallas_call(
        functools.partial(
            _head0_consume_kernel, shear=_effective_shear(interpret)
        ),
        grid=(b, tp // TILE),
        in_specs=[
            pl.BlockSpec((1, TILE, qd), lambda bi, ti: (bi, ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tp, qd), lambda bi, ti: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE, pd), lambda bi, ti: (bi, ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * tp, pd), lambda bi, ti: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tp), lambda bi, ti: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tp, cp), lambda bi, ti: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TILE, cp), lambda bi, ti: (bi, ti, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, tp, cp), v.dtype),
        interpret=interpret,
    )(q0, k0, pq0, pe0, bias, v)
    out = out[..., :c]
    return out[:, :t] if d else out
