"""Fused ConvolutionModule middle: GLU gate -> depthwise conv -> SwooshR ->
out projection, one Pallas kernel (eval path).

The reference conv module (ref zipformer.py:1638-1680) is
    in_proj -> sigmoid-gate -> [mask] -> depthwise conv -> SwooshR -> out_proj
and in XLA each elementwise stage between the two GEMMs costs a full
(B, T, C)-tensor HBM round trip: PROFILE_r3 measured the module at 33-43%
of bf16 peak with ~20 us/call of slack over its GEMM+conv roofline at
B=2/T=1024/C=512 — almost all of it inter-stage traffic.

This kernel keeps one batch row entirely in VMEM: it reads the in_proj
output (1, T, 2C) once, computes the gate in f32, applies the key-padding
mask, runs the K-tap depthwise conv as K static-sliced VPU fmas over a
zero-padded (T+K-1, C) scratch, adds the conv bias, applies SwooshR, and
contracts the result with the out-projection weight on the MXU — writing
only the (1, T, D) module output.  HBM traffic drops from ~6 tensor passes
to read-proj + write-out.

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


def _conv_glu_kernel(proj_ref, w_ref, b_ref, mask_ref, wout_ref, bout_ref,
                     out_ref, *, kernel_size: int, c: int):
    """Grid (B,).  proj_ref (1, T, 2C); w_ref (K, C) f32; b_ref (1, C) f32;
    mask_ref (1, T, 1) f32 multiplicative keep; wout_ref (C, D); bout_ref
    (1, D) f32; out_ref (1, T, D)."""
    t = proj_ref.shape[1]
    pad = kernel_size // 2

    p2 = proj_ref[0]
    v = p2[:, :c].astype(jnp.float32)
    s = p2[:, c:].astype(jnp.float32)
    g = v * jax.nn.sigmoid(s)
    g = g * mask_ref[0]  # (T, 1) broadcast over channels

    # zero-padded time axis; K static slices -> K VPU fmas, all in VMEM
    zeros = jnp.zeros((pad, c), jnp.float32)
    gp = jnp.concatenate([zeros, g, zeros], axis=0)  # (T + K - 1, C)
    acc = jnp.zeros((t, c), jnp.float32)
    for kk in range(kernel_size):
        acc = acc + w_ref[kk] * jax.lax.slice_in_dim(gp, kk, kk + t, axis=0)

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
    if key_padding_mask is None:
        keep = jnp.ones((bsz, t, 1), jnp.float32)
    else:
        keep = jnp.where(key_padding_mask, 0.0, 1.0).astype(jnp.float32)[
            :, :, None
        ]
    if b_out is None:
        b_out = jnp.zeros((d,), jnp.float32)
    kernel_size = int(w.shape[0])

    return pl.pallas_call(
        functools.partial(
            _conv_glu_kernel, kernel_size=kernel_size, c=c
        ),
        grid=(bsz,),
        in_specs=[
            pl.BlockSpec((1, t, c2), lambda bi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kernel_size, c), lambda bi: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda bi: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, 1), lambda bi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, d), lambda bi: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda bi: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, t, d), lambda bi: (bi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, t, d), proj.dtype),
        interpret=interpret,
    )(
        proj,
        w.astype(jnp.float32),
        b.astype(jnp.float32)[None, :],
        keep,
        w_out.astype(proj.dtype),
        b_out.astype(jnp.float32)[None, :],
    )
