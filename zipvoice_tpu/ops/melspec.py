"""Fused mel-spectrogram kernel (Pallas, TPU): framing + windowed real-DFT +
mel projection + log in one VMEM-resident pass.

The XLA path (audio/stft.py + audio/mel.py) frames via gather (4x read
amplification at hop=256/n_fft=1024), materializes (F, 1024) frames and a
(F, 513) magnitude in HBM, then runs the mel matmul.  Here each grid step
processes a 128-frame tile: the contiguous audio window is loaded once,
framing is 4 static slices of its (tile+3, hop) view, and the window-mult,
two DFT matmuls, |.|, mel matmul and log all stay in VMEM — one HBM write of
the final (128, n_mels) tile.

Used by the on-device fbank path when frames are tile-aligned; the XLA
composition remains the reference implementation and the fallback.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from zipvoice_tpu.audio.mel import mel_filterbank
from zipvoice_tpu.audio.stft import _dft_basis, hann_window

TILE = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(n_fft, hop, log_clamp, audio_ref, win_ref, cos_ref, sin_ref,
            fb_ref, out_ref):
    """Grid: (B, F // TILE).

    audio_ref: (1, 1, L)                  this batch row's full audio
                                          (3-D: Mosaic requires the last
                                          TWO block dims to tile or equal
                                          the array dims — a (1, L) block
                                          on a (B, L) array fails to lower
                                          for B > 1)
    win_ref:   (1, n_fft)                 hann window
    cos_ref/sin_ref: (n_fft, half_pad)    real-DFT basis (freq padded to 128x)
    fb_ref:    (half_pad, n_mels_pad)     mel filterbank (zero padded)
    out_ref:   (1, TILE, n_mels_pad)      log-mel tile
    """
    k = n_fft // hop  # frames overlap factor (4 for 1024/256)
    ti = pl.program_id(1)
    start = pl.multiple_of(ti * TILE * hop, TILE * hop)
    # one load per overlap part, each reshaped (TILE, hop) from its own
    # hop-aligned window.  (Slicing one shared (TILE+k-1, hop) reshape at
    # k sublane offsets and concatenating does NOT lower: Mosaic rejects
    # concatenation of vectors with mismatched sublane offsets —
    # 'result/input offset mismatch on non-concat dimension'.)
    parts = [
        audio_ref[0, 0, pl.ds(start + i * hop, TILE * hop)].reshape(TILE, hop)
        for i in range(k)
    ]
    frames = jnp.concatenate(parts, axis=1)  # (TILE, n_fft)
    frames = frames * win_ref[0]
    re = jax.lax.dot_general(
        frames, cos_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    im = jax.lax.dot_general(
        frames, sin_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    mag = jnp.sqrt(re * re + im * im)
    mel = jax.lax.dot_general(
        mag, fb_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    out_ref[0] = jnp.log(jnp.maximum(mel, log_clamp)).astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("sample_rate", "n_fft", "hop", "n_mels", "interpret"),
)
def fused_log_mel(
    wav: jax.Array,  # (B, L) pre-padded: L = (F-1)*hop + n_fft, F % TILE == 0
    sample_rate: int = 24000,
    n_fft: int = 1024,
    hop: int = 256,
    n_mels: int = 100,
    interpret: bool = False,
) -> jax.Array:
    """VocosFbank-semantics log-mel of center-padded audio.

    The caller reflect-pads n_fft//2 on both sides (center=True) and
    zero-pads so the frame count is a TILE multiple; returns (B, F, n_mels).
    """
    b, length = wav.shape
    num_frames = (length - n_fft) // hop + 1
    assert num_frames % TILE == 0, num_frames
    # the last tile's window reads (TILE+k-1)*hop = TILE*hop + n_fft - hop
    # samples from its start; L provides exactly that (plus hop slack)
    assert length >= (num_frames - 1) * hop + n_fft, (length, num_frames)
    half = n_fft // 2 + 1
    half_pad = _round_up(half, 128)
    mels_pad = _round_up(n_mels, 128)

    cos, sin = _dft_basis(n_fft)
    cosp = np.zeros((n_fft, half_pad), np.float32)
    cosp[:, :half] = cos
    sinp = np.zeros((n_fft, half_pad), np.float32)
    sinp[:, :half] = -sin  # im = -sum x sin
    fb = mel_filterbank(sample_rate, n_fft, n_mels, scale="htk", norm=None)
    fbp = np.zeros((half_pad, mels_pad), np.float32)
    fbp[:half, :n_mels] = fb
    win = hann_window(n_fft)[None, :]

    kernel = functools.partial(_kernel, n_fft, hop, 1e-7)
    out = pl.pallas_call(
        kernel,
        grid=(b, num_frames // TILE),
        in_specs=[
            # full row per batch index; the kernel slices its tile window
            # (overlapping windows can't be expressed as disjoint blocks)
            pl.BlockSpec((1, 1, length), lambda bi, ti: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_fft), lambda bi, ti: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft, half_pad), lambda bi, ti: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft, half_pad), lambda bi, ti: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((half_pad, mels_pad), lambda bi, ti: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TILE, mels_pad), lambda bi, ti: (bi, ti, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, num_frames, mels_pad), wav.dtype),
        interpret=interpret,
    )(
        wav[:, None, :], jnp.asarray(win), jnp.asarray(cosp),
        jnp.asarray(sinp), jnp.asarray(fbp),
    )
    return out[..., :n_mels]
