"""STFT / ISTFT for TPU.

Instead of translating torch.stft, the transform is expressed as framing +
a real-DFT **matmul** against a precomputed cos/sin basis: for n_fft=1024 the
basis is a (1024, 513) pair (~4 MB) that lives in VMEM and runs on the MXU —
on TPU this beats generic FFT lowering at these sizes and is exactly the
structure a fused Pallas kernel wants (framing DMA + two matmuls).  The
overlap-add inverse is k=n_fft/hop shifted adds (static unroll).

Conventions match torch.stft / torch.istft (ref usage:
zipvoice/utils/feature.py:47-60, _bigvgan_mel_feature.py:94-106, and the
Vocos ISTFT head): onesided, un-normalized, Hann (periodic) window.
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def hann_window(win_length: int, periodic: bool = True) -> np.ndarray:
    """torch.hann_window semantics (periodic=True by default)."""
    n = win_length if periodic else win_length - 1
    t = np.arange(win_length, dtype=np.float64)
    return (0.5 - 0.5 * np.cos(2.0 * math.pi * t / n)).astype(np.float32)


@functools.lru_cache(maxsize=8)
def _dft_basis(n_fft: int) -> Tuple[np.ndarray, np.ndarray]:
    """Real-DFT basis: X[k] = sum_n x[n] (cos - i sin)(2 pi k n / N).

    Returns (cos, sin) each (n_fft, n_fft//2+1) float32, computed in f64.
    """
    n = np.arange(n_fft, dtype=np.float64)[:, None]
    k = np.arange(n_fft // 2 + 1, dtype=np.float64)[None, :]
    ang = 2.0 * math.pi * n * k / n_fft
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


@functools.lru_cache(maxsize=8)
def _idft_basis(n_fft: int) -> Tuple[np.ndarray, np.ndarray]:
    """Inverse real-DFT basis mapping onesided (re, im) -> time frame.

    x[n] = (1/N) * sum_k w_k (re[k] cos + im[k] sin)(2 pi k n / N),
    with w_k = 1 for k in {0, N/2} and 2 otherwise (hermitian fold).
    Returns (cos_i, sin_i) each (n_fft//2+1, n_fft) float32.
    """
    half = n_fft // 2 + 1
    k = np.arange(half, dtype=np.float64)[:, None]
    n = np.arange(n_fft, dtype=np.float64)[None, :]
    ang = 2.0 * math.pi * k * n / n_fft
    w = np.full((half, 1), 2.0)
    w[0, 0] = 1.0
    if n_fft % 2 == 0:
        w[-1, 0] = 1.0
    cos_i = (w * np.cos(ang) / n_fft).astype(np.float32)
    sin_i = (w * np.sin(ang) / n_fft).astype(np.float32)
    return cos_i, sin_i


def _reflect_pad_1d(y: jax.Array, pad: int) -> jax.Array:
    return jnp.pad(y, [(0, 0)] * (y.ndim - 1) + [(pad, pad)], mode="reflect")


def frame_signal(y: jax.Array, n_fft: int, hop_length: int) -> jax.Array:
    """(..., L) -> (..., F, n_fft) frames at stride hop (no padding here).

    F = 1 + (L - n_fft) // hop, matching torch.stft's frame count.
    """
    length = y.shape[-1]
    num_frames = 1 + (length - n_fft) // hop_length
    # Gather frames as a strided slice: indices are static.
    idx = (
        np.arange(num_frames)[:, None] * hop_length + np.arange(n_fft)[None, :]
    )
    return y[..., idx]


def stft_magnitude(
    y: jax.Array,
    n_fft: int,
    hop_length: int,
    window: np.ndarray,
    center: bool = True,
    eps: float = 0.0,
) -> jax.Array:
    """|STFT(y)|: (..., L) -> (..., F, n_fft//2+1).

    center=True reflect-pads n_fft//2 like torch.stft; eps>0 reproduces the
    HiFi-GAN sqrt(power + 1e-9) flavor (ref _bigvgan_mel_feature.py:106).
    """
    if center:
        y = _reflect_pad_1d(y, n_fft // 2)
    frames = frame_signal(y, n_fft, hop_length) * jnp.asarray(
        window, dtype=y.dtype
    )
    cos, sin = _dft_basis(n_fft)
    re = jnp.dot(frames, jnp.asarray(cos), preferred_element_type=jnp.float32)
    im = -jnp.dot(frames, jnp.asarray(sin), preferred_element_type=jnp.float32)
    power = re * re + im * im
    if eps:
        power = power + eps
    return jnp.sqrt(power).astype(y.dtype)


def stft_complex(
    y: jax.Array,
    n_fft: int,
    hop_length: int,
    window: np.ndarray,
    center: bool = True,
):
    """STFT returning (re, im), each (..., F, n_fft//2+1)."""
    if center:
        y = _reflect_pad_1d(y, n_fft // 2)
    frames = frame_signal(y, n_fft, hop_length) * jnp.asarray(
        window, dtype=y.dtype
    )
    cos, sin = _dft_basis(n_fft)
    re = jnp.dot(frames, jnp.asarray(cos), preferred_element_type=jnp.float32)
    im = -jnp.dot(frames, jnp.asarray(sin), preferred_element_type=jnp.float32)
    return re, im


def istft(
    re: jax.Array,
    im: jax.Array,
    n_fft: int,
    hop_length: int,
    window: np.ndarray,
    center: bool = True,
    length_eps: float = 1e-11,
) -> jax.Array:
    """torch.istft-compatible inverse: (..., F, n_fft//2+1) re/im -> (..., L).

    L = (F - 1) * hop (center=True trims n_fft//2 both sides).  Overlap-add
    is n_fft/hop static shifted adds; the window-square envelope divisor is
    a trace-time constant.
    """
    assert n_fft % hop_length == 0, (n_fft, hop_length)
    k_overlap = n_fft // hop_length
    num_frames = re.shape[-2]
    cos_i, sin_i = _idft_basis(n_fft)
    frames = jnp.dot(
        re, jnp.asarray(cos_i), preferred_element_type=jnp.float32
    ) - jnp.dot(im, jnp.asarray(sin_i), preferred_element_type=jnp.float32)
    frames = frames * jnp.asarray(window, dtype=frames.dtype)

    # Overlap-add: output sample region is [(F-1)*hop + n_fft] long before trim.
    total = (num_frames - 1) * hop_length + n_fft
    batch_shape = frames.shape[:-2]
    out = jnp.zeros(batch_shape + (total,), frames.dtype)
    # frame f contributes at offset f*hop; split each frame into k_overlap
    # hop-sized chunks; chunk c of frame f lands at (f + c) * hop.
    fr = frames.reshape(batch_shape + (num_frames, k_overlap, hop_length))
    for c in range(k_overlap):
        seg = fr[..., :, c, :].reshape(batch_shape + (num_frames * hop_length,))
        out = out.at[..., c * hop_length : c * hop_length + num_frames * hop_length].add(seg)

    # window-square envelope (static)
    wsq = np.asarray(window, np.float64) ** 2
    env = np.zeros(total, np.float64)
    for f in range(num_frames):
        env[f * hop_length : f * hop_length + n_fft] += wsq
    env = np.maximum(env, length_eps).astype(np.float32)
    out = out / jnp.asarray(env, dtype=out.dtype)

    if center:
        out = out[..., n_fft // 2 : total - n_fft // 2]
    return out
