"""Fused ConvolutionModule middle: GLU gate -> depthwise conv -> SwooshR ->
out projection, one Pallas kernel (eval path).

The reference conv module (ref zipformer.py:1638-1680) is
    in_proj -> sigmoid-gate -> [mask] -> depthwise conv -> SwooshR -> out_proj
and in XLA each elementwise stage between the two GEMMs costs a full
(B, T, C)-tensor HBM round trip: PROFILE_r3 measured the module at 33-43%
of bf16 peak with ~20 us/call of slack over its GEMM+conv roofline at
B=2/T=1024/C=512 — almost all of it inter-stage traffic.

The kernel is tiled over time (grid (B, T/TT)) so its VMEM footprint is
bounded at ~TT rows regardless of sequence length (v5e VMEM is ~16 MB/core;
an untiled variant at T=1024/C=512 needs ~15+ MB of temporaries alone and
export shapes reach 3072 frames).  The depthwise conv needs K//2 rows of
context on each side of a tile, which BlockSpec's disjoint blocks cannot
express — so the kernel reads the SAME proj array through three specs
(previous / current / next tile, neighbor indices clamped at the edges),
recomputes the cheap GLU gate on the 2*(K//2) halo rows, and zeroes the
halos at the true sequence edges with program_id predicates.  Per tile it:
computes the gate in f32, applies the key-padding mask, runs the K-tap
depthwise conv as K static-sliced VPU fmas over the halo-extended (TT+K-1,
C) window, adds the conv bias, applies SwooshR, and contracts with the
out-projection weight on the MXU — writing only the (1, TT, D) tile of the
module output.  HBM traffic drops from ~6 tensor passes to 3x-read-proj +
write-out.

Sequence lengths that are not a tile multiple are zero-padded up front and
sliced back (the pad rows are forced to keep=0, reproducing the zero
time-padding of the SAME conv at the true boundary).

The training path keeps the XLA grouped-conv formulation (balancers/whiten
hook between the stages, and the backward there was already measured fast
in r3); this kernel is forward/eval only.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gate(block, mask, c):
    """f32 GLU gate of one (TT, 2C) proj block, masked."""
    v = block[:, :c].astype(jnp.float32)
    s = block[:, c:].astype(jnp.float32)
    return v * jax.nn.sigmoid(s) * mask


def _conv_glu_kernel(prev_ref, cur_ref, nxt_ref, mprev_ref, mcur_ref,
                     mnxt_ref, w_ref, b_ref, wout_ref, bout_ref, out_ref,
                     *, kernel_size: int, c: int):
    """Grid (B, nT).  prev/cur/nxt_ref (1, TT, 2C) are the SAME proj array
    at tile ti-1 / ti / ti+1 (clamped); m*_ref (1, TT, 1) f32 keep masks at
    the same tiles; w_ref (K, C) f32; b_ref (1, C) f32; wout_ref (C, D);
    bout_ref (1, D) f32; out_ref (1, TT, D)."""
    tt = cur_ref.shape[1]
    pad = kernel_size // 2

    ti = pl.program_id(1)
    nt = pl.num_programs(1)

    g = _gate(cur_ref[0], mcur_ref[0], c)
    # halo rows: last `pad` of the previous tile, first `pad` of the next;
    # the clamped neighbor at the true edges is zeroed by predicate
    left = _gate(
        jax.lax.slice_in_dim(prev_ref[0], tt - pad, tt, axis=0),
        jax.lax.slice_in_dim(mprev_ref[0], tt - pad, tt, axis=0),
        c,
    ) * jnp.where(ti == 0, 0.0, 1.0)
    right = _gate(
        jax.lax.slice_in_dim(nxt_ref[0], 0, pad, axis=0),
        jax.lax.slice_in_dim(mnxt_ref[0], 0, pad, axis=0),
        c,
    ) * jnp.where(ti == nt - 1, 0.0, 1.0)

    gp = jnp.concatenate([left, g, right], axis=0)  # (TT + K - 1, C)
    acc = jnp.zeros((tt, c), jnp.float32)
    for kk in range(kernel_size):
        acc = acc + w_ref[kk] * jax.lax.slice_in_dim(gp, kk, kk + tt, axis=0)

    y = acc + b_ref[0]
    # SwooshR (ref scaling.py:1098), f32 like nn.functional.swoosh_r
    y = jnp.logaddexp(0.0, y - 1.0) - 0.08 * y - 0.313261687

    out = jax.lax.dot_general(
        y.astype(wout_ref.dtype), wout_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    out_ref[0] = (out + bout_ref[0]).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def conv_glu_swoosh_out(
    proj: jax.Array,  # (B, T, 2C) — in_proj output
    w: jax.Array,  # (K, C) depthwise taps
    b: jax.Array,  # (C,) depthwise bias
    key_padding_mask,  # (B, T) bool (True = padded) or None
    w_out: jax.Array,  # (C, D) out-projection weight (input-major)
    b_out,  # (D,) or None
    interpret: bool = False,
) -> jax.Array:
    """Fused eval ConvolutionModule tail: returns
    linear(w_out, swoosh_r(depthwise_conv(glu(proj) * keep) + b)) as
    (B, T, D) in proj.dtype.  Matches the XLA formulation in
    nn/zipformer._conv_module (f32 gate/conv/swoosh, f32-accumulated
    output GEMM)."""
    bsz, t, c2 = proj.shape
    c = c2 // 2
    d = w_out.shape[1]
    kernel_size = int(w.shape[0])

    # time tile: VMEM-bounded; 256 when it divides the padded length,
    # else 128 (the tile must exceed the K//2 halo — K<=31 everywhere)
    t_pad = ((t + 127) // 128) * 128
    tt = 256 if t_pad % 256 == 0 else 128
    nt = t_pad // tt

    if key_padding_mask is None:
        keep = jnp.ones((bsz, t, 1), jnp.float32)
    else:
        keep = jnp.where(key_padding_mask, 0.0, 1.0).astype(jnp.float32)[
            :, :, None
        ]
    if t_pad != t:
        proj = jnp.pad(proj, ((0, 0), (0, t_pad - t), (0, 0)))
        keep = jnp.pad(keep, ((0, 0), (0, t_pad - t), (0, 0)))
    if b_out is None:
        b_out = jnp.zeros((d,), jnp.float32)

    def at(ti_off):
        # neighbor tile, clamped into range; the kernel zeroes the halo at
        # the true edges so the clamped duplicate is never observed
        def index(bi, ti):
            return (bi, jnp.clip(ti + ti_off, 0, nt - 1), 0)

        return index

    out = pl.pallas_call(
        functools.partial(
            _conv_glu_kernel, kernel_size=kernel_size, c=c
        ),
        grid=(bsz, nt),
        in_specs=[
            pl.BlockSpec((1, tt, c2), at(-1), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tt, c2), at(0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tt, c2), at(+1), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tt, 1), at(-1), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tt, 1), at(0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tt, 1), at(+1), memory_space=pltpu.VMEM),
            pl.BlockSpec((kernel_size, c), lambda bi, ti: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda bi, ti: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, d), lambda bi, ti: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda bi, ti: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tt, d), lambda bi, ti: (bi, ti, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, t_pad, d), proj.dtype),
        interpret=interpret,
    )(
        proj, proj, proj,
        keep, keep, keep,
        w.astype(jnp.float32),
        b.astype(jnp.float32)[None, :],
        w_out.astype(proj.dtype),
        b_out.astype(jnp.float32)[None, :],
    )
    return out[:, :t] if t_pad != t else out
