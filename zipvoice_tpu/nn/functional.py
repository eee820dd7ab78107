"""Core numerics for the Zipformer backbone, as pure JAX functions.

This is the TPU-native replacement for the inference-relevant subset of the
reference "scaling kit" (ref: zipvoice/models/modules/scaling.py).  The
training-only gradient shapers (Balancer, Whiten, penalize_abs_values_gt) are
identity in the forward pass; their gradient-shaping variants live in
zipvoice_tpu/nn/regularizers.py.

All functions are batch-first (B, T, C) and dtype-polymorphic: reductions that
are precision-sensitive (BiasNorm statistics, softmax) are computed in float32
and cast back, which is the right call on TPU where bf16 is the compute dtype.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def swoosh_l(x: jax.Array) -> jax.Array:
    """SwooshL(x) = log(1 + exp(x-4)) - 0.08 x - 0.035  (ref scaling.py:1021).

    On TPU this is a handful of VPU ops that XLA fuses into the surrounding
    matmul epilogue/prologue; the reference needed a CUDA kernel (k2.swoosh_l)
    only to compress the stored gradient to uint8 — unnecessary here because
    we rematerialize the cheap forward in the backward pass instead.
    """
    return _swoosh_l_remat(x)


def swoosh_r(x: jax.Array) -> jax.Array:
    """SwooshR(x) = log(1 + exp(x-1)) - 0.08 x - 0.313261687  (ref scaling.py:1098)."""
    return _swoosh_r_remat(x)


@jax.checkpoint
def _swoosh_l_remat(x: jax.Array) -> jax.Array:
    x32 = x.astype(jnp.float32)
    y = jnp.logaddexp(0.0, x32 - 4.0) - 0.08 * x32 - 0.035
    return y.astype(x.dtype)


@jax.checkpoint
def _swoosh_r_remat(x: jax.Array) -> jax.Array:
    x32 = x.astype(jnp.float32)
    y = jnp.logaddexp(0.0, x32 - 1.0) - 0.08 * x32 - 0.313261687
    return y.astype(x.dtype)


def bias_norm(x: jax.Array, bias: jax.Array, log_scale: jax.Array) -> jax.Array:
    """BiasNorm: x * rsqrt(mean((x - bias)^2, ch)) * exp(log_scale).

    LayerNorm replacement with a trainable bias used only inside the scale
    statistic, plus a scalar log-scale (ref scaling.py:322-457).  Channel dim
    is the last dim.  Statistics in float32.
    """
    x32 = x.astype(jnp.float32)
    d = x32 - bias.astype(jnp.float32)
    scales = jax.lax.rsqrt(jnp.mean(d * d, axis=-1, keepdims=True)) * jnp.exp(
        log_scale.astype(jnp.float32)
    )
    return (x32 * scales).astype(x.dtype)


_INT8_DYNAMIC: bool = False


def set_int8_dynamic(enabled: bool):
    """Trace-time binding (like zipformer.set_fused_apply): when True,
    linear() on an int8-exported tree also quantizes ACTIVATIONS per row
    and runs the s8xs8->s32 MXU path.  Clears jit caches on change so a
    stale traced program is never served."""
    global _INT8_DYNAMIC
    if enabled != _INT8_DYNAMIC:
        _INT8_DYNAMIC = enabled
        jax.clear_caches()


def linear(p: dict, x: jax.Array) -> jax.Array:
    """Dense layer; p['weight'] is (in, out) (transposed from torch at load).

    Also accepts the int8 weight-only form from ops/quant.py
    ({'weight_int8', 'weight_scale'}): the int8->compute-dtype cast fuses
    into the matmul and the per-output-channel scale into its epilogue.
    Under set_int8_dynamic(True) the activations are ALSO quantized —
    symmetric per-row (per-token) dynamic scales, matching the reference's
    onnxruntime dynamic MatMul quantization (ref onnx_export.py:384-400:
    quantize_dynamic) — and the product runs int8 x int8 -> int32 on the
    MXU (2x bf16 peak on v5e), dequantized in the f32 epilogue by
    row_scale * channel_scale."""
    if "weight_int8" in p:
        if _INT8_DYNAMIC:
            x32 = x.astype(jnp.float32)
            s_x = jnp.maximum(
                jnp.max(jnp.abs(x32), axis=-1, keepdims=True) / 127.0, 1e-12
            )
            qx = jnp.clip(jnp.round(x32 / s_x), -127, 127).astype(jnp.int8)
            y = jax.lax.dot_general(
                qx, p["weight_int8"],
                (((qx.ndim - 1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            y = (
                y.astype(jnp.float32)
                * s_x
                * p["weight_scale"].astype(jnp.float32)
            ).astype(x.dtype)
            b = p.get("bias")
            if b is not None:
                y = y + b.astype(x.dtype)
            return y
        # f32 accumulator + f32 per-channel scale in the epilogue, THEN the
        # cast to compute dtype: rounding the scale to bf16 first would
        # throw away half the precision the int8 quantization preserved
        y = jnp.dot(x, p["weight_int8"].astype(x.dtype),
                    preferred_element_type=jnp.float32)
        y = (y * p["weight_scale"].astype(jnp.float32)).astype(x.dtype)
    else:
        w = p["weight"].astype(x.dtype)
        y = jnp.dot(x, w, preferred_element_type=x.dtype)
    b = p.get("bias")
    if b is not None:
        y = y + b.astype(x.dtype)
    return y


def masked_softmax(
    scores: jax.Array,
    key_padding_mask: Optional[jax.Array],
    axis: int = -1,
) -> jax.Array:
    """Softmax over attention scores with the reference's -1000 mask fill.

    The reference uses -1000 rather than -inf so that fully-masked rows give
    uniform (tiny) rather than NaN weights (ref zipformer.py:1273-1289).
    Computed in float32.
    """
    scores = scores.astype(jnp.float32)
    if key_padding_mask is not None:
        # key_padding_mask: (B, S) True = masked.  scores: (B, H, T, S)
        scores = jnp.where(key_padding_mask[:, None, None, :], -1000.0, scores)
    return jax.nn.softmax(scores, axis=axis)


def timestep_embedding(t: jax.Array, dim: int, max_period: float = 10000.0) -> jax.Array:
    """Sinusoidal embedding of diffusion time (ref zipformer.py:47-69).

    t: (B,) -> (B, dim);  t: (B, T) -> (T, B, dim) in the reference; we keep
    batch-first and return (B, T, dim) for 2-D t.
    Layout: concat([cos(t*f), sin(t*f)]) with f = exp(-log(max_period)*i/half).
    """
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = t[..., None].astype(jnp.float32) * freqs
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[..., :1])], axis=-1)
    return emb


@functools.lru_cache(maxsize=64)
def _compact_rel_pe_np(seq_len: int, pos_dim: int, length_factor: float) -> "np.ndarray":
    """Host-side float64 computation of the PE table (then rounded to f32).

    seq_len/pos_dim are static under jit, so this runs once at trace time and
    is embedded as a constant; float64 keeps the high-frequency columns
    (error amplified by freq index, up to pos_dim/2) at f32 accuracy.
    """
    x = np.arange(-(seq_len - 1), seq_len, dtype=np.float64)[:, None]
    freqs = 1.0 + np.arange(pos_dim // 2, dtype=np.float64)
    compression_length = pos_dim**0.5
    x_compressed = (
        compression_length
        * np.sign(x)
        * (np.log(np.abs(x) + compression_length) - math.log(compression_length))
    )
    length_scale = length_factor * pos_dim / (2.0 * math.pi)
    x_atan = np.arctan(x_compressed / length_scale)
    pe = np.zeros((2 * seq_len - 1, pos_dim), dtype=np.float64)
    pe[:, 0::2] = np.cos(x_atan * freqs)
    pe[:, 1::2] = np.sin(x_atan * freqs)
    pe[:, -1] = 1.0  # bias column (ref zipformer.py:1030)
    return pe.astype(np.float32)


def compact_rel_positional_encoding(
    seq_len: int, pos_dim: int, length_factor: float = 1.0
) -> jax.Array:
    """Relative positional encoding table for offsets -(T-1)..(T-1).

    atan-compressed Fourier features (ref zipformer.py:938-1056).  Returns
    (2*T-1, pos_dim) float32; row n encodes relative offset n - (T-1).
    Computed host-side and constant-folded under jit.
    """
    return jnp.asarray(_compact_rel_pe_np(seq_len, pos_dim, length_factor))


def make_pad_mask(lengths: jax.Array, max_len: int) -> jax.Array:
    """(B,) lengths -> (B, max_len) bool mask, True at padding positions
    (ref zipvoice/utils/common.py:395-420)."""
    seq = jnp.arange(max_len, dtype=lengths.dtype)
    return seq[None, :] >= lengths[:, None]
