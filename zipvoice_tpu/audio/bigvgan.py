"""BigVGAN v2 vocoder (mel -> waveform) in JAX.

JAX rebuild of the alternative vocoder the reference loads as an external
torch package (ref zipvoice/bin/infer_zipvoice.py:261-269 —
`bigvgan.BigVGAN.from_pretrained("nvidia/bigvgan_v2_24khz_100band_256x",
use_cuda_kernel=False)`).  Architecture (24 kHz / 100-band / 256x config):

* conv_pre Conv1d(n_mels, C0=1536, k=7)
* 6 upsample stages: ConvTranspose1d(C, C/2, k=2*stride, stride) with
  rates (4,4,2,2,2,2), each followed by 3 AMP resblocks (kernel 3/7/11,
  dilations (1,3,5)) summed and averaged;
* activations are **anti-aliased snake-beta**: 2x upsample with a
  kaiser-windowed sinc filter -> snakebeta(x) = x + exp(-beta) sin^2(
  exp(alpha) x) -> 2x filtered downsample (alias-free activation);
* activation_post + conv_post Conv1d(C_last, 1, k=7), clamp to [-1, 1]
  (v2: no bias at final, no tanh).

The published checkpoint stores weight-normalized conv weights (weight_g /
weight_v); `load_bigvgan_params` fuses them (w = g * v / ||v||) into plain
kernels in our (K, Cin, Cout) layout.
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, object]


@dataclasses.dataclass(frozen=True)
class BigVGANConfig:
    num_mels: int = 100
    upsample_initial_channel: int = 1536
    upsample_rates: Tuple[int, ...] = (4, 4, 2, 2, 2, 2)
    upsample_kernel_sizes: Tuple[int, ...] = (8, 8, 4, 4, 4, 4)
    resblock_kernel_sizes: Tuple[int, ...] = (3, 7, 11)
    resblock_dilations: Tuple[Tuple[int, ...], ...] = ((1, 3, 5),) * 3
    snake_logscale: bool = True
    # anti-aliasing (alias-free activation) filter
    aa_kernel_size: int = 12
    use_tanh_at_final: bool = False
    use_bias_at_final: bool = False


# ---------------------------------------------------------------------------
# Anti-aliasing filters (alias-free activation, kaiser sinc design)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=8)
def kaiser_sinc_filter(cutoff: float, half_width: float,
                       kernel_size: int) -> np.ndarray:
    """Kaiser-windowed sinc low-pass, DC gain 1 (alias-free-torch
    kaiser_sinc_filter1d semantics)."""
    half_size = kernel_size // 2
    delta_f = 4 * half_width
    a = 2.285 * (half_size - 1) * math.pi * delta_f + 7.95
    if a > 50.0:
        beta = 0.1102 * (a - 8.7)
    elif a >= 21.0:
        beta = 0.5842 * (a - 21) ** 0.4 + 0.07886 * (a - 21.0)
    else:
        beta = 0.0
    if kernel_size % 2 == 0:
        t = np.arange(-half_size, half_size) + 0.5
    else:
        t = np.arange(kernel_size) - half_size
    window = np.kaiser(kernel_size, beta)
    f = 2 * cutoff * window * np.sinc(2 * cutoff * t)
    return (f / f.sum()).astype(np.float32)


def _replicate_pad_time(x: jax.Array, left: int, right: int) -> jax.Array:
    return jnp.pad(x, ((0, 0), (left, right), (0, 0)), mode="edge")


def _up2(x: jax.Array, kernel_size: int) -> jax.Array:
    """UpSample1d(ratio=2): replicate-pad, transposed conv with the kaiser
    sinc filter, x2 gain, crop (alias-free-torch).  (B, T, C) -> (B, 2T, C)."""
    b, t, c = x.shape
    ratio = 2
    pad = kernel_size // ratio - 1
    pad_left = pad * ratio + (kernel_size - ratio) // 2
    pad_right = pad * ratio + (kernel_size - ratio + 1) // 2
    filt = ratio * kaiser_sinc_filter(0.5 / ratio, 0.6 / ratio, kernel_size)

    xp = _replicate_pad_time(x, pad, pad)  # (B, T+2*pad, C)
    tp = t + 2 * pad
    # conv_transpose(stride 2) == lhs-dilated (zero-stuffed) correlation
    # with the flipped filter; one grouped conv instead of K tap-shifts
    # (XLA's conv emitter beats the fma cascade on TPU, cf. _conv_module)
    w = jnp.asarray(filt, x.dtype)
    kern = jnp.tile(w[::-1][:, None, None], (1, 1, c))  # (K, 1, C)
    out = jax.lax.conv_general_dilated(
        xp, kern, window_strides=(1,),
        padding=[(kernel_size - 1, kernel_size - 1)],
        lhs_dilation=(ratio,), dimension_numbers=("NHC", "HIO", "NHC"),
        feature_group_count=c,
    )
    full_len = ratio * (tp - 1) + kernel_size
    return out[:, pad_left : full_len - pad_right, :]


def _down2(x: jax.Array, kernel_size: int) -> jax.Array:
    """DownSample1d(ratio=2) == LowPassFilter1d(stride=2, replicate pad).
    (B, 2T, C) -> (B, T, C)."""
    b, t2, c = x.shape
    ratio = 2
    even = kernel_size % 2 == 0
    pad_left = kernel_size // 2 - int(even)
    pad_right = kernel_size // 2
    filt = kaiser_sinc_filter(0.5 / ratio, 0.6 / ratio, kernel_size)
    xp = _replicate_pad_time(x, pad_left, pad_right)
    w = jnp.asarray(filt, x.dtype)
    kern = jnp.tile(w[:, None, None], (1, 1, c))  # (K, 1, C)
    return jax.lax.conv_general_dilated(
        xp, kern, window_strides=(ratio,), padding=[(0, 0)],
        dimension_numbers=("NHC", "HIO", "NHC"), feature_group_count=c,
    )


def snakebeta(x: jax.Array, alpha: jax.Array, beta: jax.Array,
              logscale: bool = True) -> jax.Array:
    """snakebeta(x) = x + 1/(beta') sin^2(alpha' x), params per channel
    (alpha'=exp(alpha) when log-scale)."""
    a = jnp.exp(alpha) if logscale else alpha
    b = jnp.exp(beta) if logscale else beta
    a = a.astype(x.dtype)
    b = b.astype(x.dtype)
    return x + (1.0 / (b + 1e-9)) * jnp.square(jnp.sin(a * x))


def aa_snakebeta(x: jax.Array, alpha: jax.Array, beta: jax.Array,
                 kernel_size: int = 12) -> jax.Array:
    """Alias-free activation: up2 -> snakebeta -> down2 (Activation1d)."""
    return _down2(snakebeta(_up2(x, kernel_size), alpha, beta), kernel_size)


# ---------------------------------------------------------------------------
# Convs
# ---------------------------------------------------------------------------


def _conv1d(x: jax.Array, w: jax.Array, b, dilation: int = 1) -> jax.Array:
    """(B, T, Cin) 'same' conv; w (K, Cin, Cout)."""
    k = w.shape[0]
    pad = (k - 1) * dilation // 2
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=(1,), padding=[(pad, pad)],
        rhs_dilation=(dilation,), dimension_numbers=("NHC", "HIO", "NHC"),
    )
    return y if b is None else y + b.astype(x.dtype)


def _conv_transpose1d(x: jax.Array, w: jax.Array, b, stride: int) -> jax.Array:
    """(B, T, Cin) transposed conv; w (K, Cout, Cin) torch layout transposed
    to (K, Cin, Cout) at load; output length T*stride (torch padding
    (k-stride)//2 convention)."""
    k = w.shape[0]
    pad = (k - stride) // 2
    y = jax.lax.conv_transpose(
        x, w.astype(x.dtype), strides=(stride,),
        padding=[(k - 1 - pad, k - 1 - pad)],
        dimension_numbers=("NHC", "HIO", "NHC"),
        transpose_kernel=True,
    )
    return y if b is None else y + b.astype(x.dtype)


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _amp_block(p: Params, x: jax.Array, dilations: Sequence[int],
               aa_k: int) -> jax.Array:
    """AMPBlock1: for each dilation d: aa-act -> conv(d) -> aa-act -> conv(1),
    residual after each pair (bigvgan.AMPBlock1 with snakebeta)."""
    for j, d in enumerate(dilations):
        a1 = p["activations"][str(2 * j)]
        xt = aa_snakebeta(x, a1["alpha"], a1["beta"], aa_k)
        xt = _conv1d(xt, p["convs1"][str(j)]["weight"],
                     p["convs1"][str(j)].get("bias"), dilation=d)
        a2 = p["activations"][str(2 * j + 1)]
        xt = aa_snakebeta(xt, a2["alpha"], a2["beta"], aa_k)
        xt = _conv1d(xt, p["convs2"][str(j)]["weight"],
                     p["convs2"][str(j)].get("bias"), dilation=1)
        x = x + xt
    return x


def bigvgan_decode(params: Params, mel: jax.Array,
                   cfg: BigVGANConfig = BigVGANConfig()) -> jax.Array:
    """mel (B, T, n_mels) -> waveform (B, T * prod(rates))."""
    x = _conv1d(mel, params["conv_pre"]["weight"],
                params["conv_pre"].get("bias"))
    num_kernels = len(cfg.resblock_kernel_sizes)
    for i, rate in enumerate(cfg.upsample_rates):
        up = params["ups"][str(i)]["0"]
        x = _conv_transpose1d(x, up["weight"], up.get("bias"), rate)
        acc = None
        for j in range(num_kernels):
            blk = params["resblocks"][str(i * num_kernels + j)]
            y = _amp_block(blk, x, cfg.resblock_dilations[j], cfg.aa_kernel_size)
            acc = y if acc is None else acc + y
        x = acc / num_kernels
    ap = params["activation_post"]
    x = aa_snakebeta(x, ap["alpha"], ap["beta"], cfg.aa_kernel_size)
    x = _conv1d(x, params["conv_post"]["weight"],
                params["conv_post"].get("bias"))
    wav = x[..., 0]
    if cfg.use_tanh_at_final:
        return jnp.tanh(wav)
    return jnp.clip(wav, -1.0, 1.0)


# ---------------------------------------------------------------------------
# Loader
# ---------------------------------------------------------------------------


def _fuse_weight_norm(g: np.ndarray, v: np.ndarray) -> np.ndarray:
    """w = g * v / ||v||, norm over all dims except dim 0 (torch weight_norm)."""
    norm = np.sqrt(
        np.sum(v.astype(np.float64) ** 2, axis=tuple(range(1, v.ndim)),
               keepdims=True)
    )
    return (g.astype(np.float64) * v.astype(np.float64) / norm).astype(
        np.float32
    )


def load_bigvgan_params(state_dict: Dict[str, np.ndarray]) -> Params:
    """Map the published BigVGAN generator state_dict into our tree.

    Conv1d weight (Cout, Cin, K) -> (K, Cin, Cout); ConvTranspose1d weight
    (Cin, Cout, K) -> (K, Cin, Cout); weight_g/weight_v fused; snake
    activation params `alpha`/`beta` kept (C,).
    Torch key examples:
      conv_pre.weight_g / conv_pre.weight_v
      ups.0.0.weight_g / ups.0.0.weight_v
      resblocks.3.convs1.2.weight_v / resblocks.3.activations.5.act.alpha
      activation_post.act.alpha / conv_post.weight_v
    """
    merged: Dict[str, np.ndarray] = {}
    keys = set(state_dict)
    for k in sorted(keys):
        arr = np.asarray(state_dict[k])
        if k.endswith("weight_v"):
            base = k[: -len("weight_v")]
            g = np.asarray(state_dict[base + "weight_g"])
            merged[base + "weight"] = _fuse_weight_norm(g, arr)
        elif k.endswith("weight_g"):
            continue
        elif ".act." in k:
            merged[k.replace(".act.", ".")] = arr  # activations.N.act.alpha
        else:
            merged[k] = arr

    root: Params = {}
    for k, arr in merged.items():
        parts = k.split(".")
        if parts[-1] == "weight" and arr.ndim == 3:
            if parts[0] == "ups":
                # torch ConvTranspose1d (Cin, Cout, K) -> (K, Cout, Cin):
                # lax.conv_transpose(transpose_kernel=True) wants the kernel
                # in the corresponding forward conv's HIO layout
                arr = np.transpose(arr, (2, 1, 0))
            else:
                arr = np.transpose(arr, (2, 1, 0))  # (Cout,Cin,K)->(K,Cin,Cout)
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = arr
    return root
