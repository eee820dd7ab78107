"""Log-mel feature extraction (Vocos & BigVGAN flavors) in JAX.

Rebuilds the two reference frontends without torchaudio/librosa:

* VocosFbank (ref zipvoice/utils/feature.py:28-121): torchaudio
  MelSpectrogram semantics — center=True reflect pad, Hann(periodic),
  power=1 magnitude, **HTK** mel scale, no filter norm, log(clamp 1e-7).
* BigVGANFbank (ref feature.py:122-204, _bigvgan_mel_feature.py:42-111):
  HiFi-GAN style — manual (n_fft-hop)/2 reflect pad, center=False,
  sqrt(power+1e-9), **Slaney** mel scale + slaney norm, log(clamp 1e-5).

Mel filter matrices are built host-side in float64 and enter the jitted
graph as constants; the mel projection is a single (F, 513) @ (513, 100)
matmul on the MXU right after the DFT matmuls in stft.py.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from zipvoice_tpu.audio.stft import hann_window, stft_magnitude
from zipvoice_tpu.config import FeatureConfig


def _hz_to_mel_htk(f):
    return 2595.0 * np.log10(1.0 + np.asarray(f, np.float64) / 700.0)


def _mel_to_hz_htk(m):
    return 700.0 * (10.0 ** (np.asarray(m, np.float64) / 2595.0) - 1.0)


def _hz_to_mel_slaney(f):
    f = np.asarray(f, np.float64)
    f_sp = 200.0 / 3.0
    min_log_hz = 1000.0
    logstep = np.log(6.4) / 27.0
    mel = f / f_sp
    above = f >= min_log_hz
    mel = np.where(above, min_log_hz / f_sp + np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep, mel)
    return mel


def _mel_to_hz_slaney(m):
    m = np.asarray(m, np.float64)
    f_sp = 200.0 / 3.0
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    f = m * f_sp
    above = m >= min_log_mel
    return np.where(above, min_log_hz * np.exp(logstep * (m - min_log_mel)), f)


@functools.lru_cache(maxsize=16)
def mel_filterbank(
    sample_rate: int,
    n_fft: int,
    n_mels: int,
    f_min: float = 0.0,
    f_max: Optional[float] = None,
    scale: str = "htk",
    norm: Optional[str] = None,
) -> np.ndarray:
    """Triangular mel filterbank, (n_fft//2+1, n_mels) float32.

    scale='htk', norm=None  == torchaudio melscale_fbanks defaults.
    scale='slaney', norm='slaney' == librosa.filters.mel defaults.
    """
    if f_max is None:
        f_max = sample_rate / 2.0
    n_freqs = n_fft // 2 + 1
    all_freqs = np.linspace(0.0, sample_rate / 2.0, n_freqs)

    if scale == "htk":
        m_min, m_max = _hz_to_mel_htk(f_min), _hz_to_mel_htk(f_max)
        m_pts = np.linspace(m_min, m_max, n_mels + 2)
        f_pts = _mel_to_hz_htk(m_pts)
    elif scale == "slaney":
        m_min, m_max = _hz_to_mel_slaney(f_min), _hz_to_mel_slaney(f_max)
        m_pts = np.linspace(m_min, m_max, n_mels + 2)
        f_pts = _mel_to_hz_slaney(m_pts)
    else:
        raise ValueError(scale)

    # triangle filters: rising edge f_pts[i]..f_pts[i+1], falling to f_pts[i+2]
    f_diff = np.diff(f_pts)  # (n_mels+1,)
    slopes = f_pts[None, :] - all_freqs[:, None]  # (n_freqs, n_mels+2)
    down = -slopes[:, :-2] / f_diff[None, :-1]
    up = slopes[:, 2:] / f_diff[None, 1:]
    fb = np.maximum(0.0, np.minimum(down, up))  # (n_freqs, n_mels)

    if norm == "slaney":
        enorm = 2.0 / (f_pts[2 : n_mels + 2] - f_pts[:n_mels])
        fb = fb * enorm[None, :]
    elif norm is not None:
        raise ValueError(norm)
    return fb.astype(np.float32)


def stft_pad_amount(cfg: FeatureConfig) -> int:
    """Per-side reflect padding the extractor applies internally: vocos
    (center=True) pads n_fft//2, bigvgan pads (n_fft - hop)//2.  A caller
    that reflect-pads the signal host-side by this amount and extracts
    with pre_padded=True gets sample-identical frames — the hook the
    serving pipeline uses to bucket prompt lengths without changing the
    feature values."""
    if cfg.type == "vocos":
        return cfg.n_fft // 2
    return (cfg.n_fft - cfg.hop_length) // 2


def vocos_log_mel(
    wav: jax.Array, cfg: FeatureConfig = FeatureConfig(),
    pre_padded: bool = False,
) -> jax.Array:
    """(..., L) waveform -> (..., F, n_mels) log-mel, VocosFbank semantics."""
    mag = stft_magnitude(
        wav, cfg.n_fft, cfg.hop_length,
        hann_window(cfg.n_fft, periodic=True), center=not pre_padded,
    )
    fb = jnp.asarray(
        mel_filterbank(
            cfg.sampling_rate, cfg.n_fft, cfg.n_mels, scale="htk", norm=None
        )
    )
    mel = jnp.dot(mag, fb, preferred_element_type=jnp.float32)
    return jnp.log(jnp.clip(mel, min=1e-7)).astype(wav.dtype)


def bigvgan_log_mel(
    wav: jax.Array,
    cfg: FeatureConfig = FeatureConfig(),
    f_min: float = 0.0,
    f_max: Optional[float] = None,
    pre_padded: bool = False,
) -> jax.Array:
    """(..., L) waveform -> (..., F, n_mels) log-mel, BigVGANFbank semantics."""
    if pre_padded:
        wav_p = wav
    else:
        pad = (cfg.n_fft - cfg.hop_length) // 2
        wav_p = jnp.pad(
            wav, [(0, 0)] * (wav.ndim - 1) + [(pad, pad)], mode="reflect"
        )
    mag = stft_magnitude(
        wav_p, cfg.n_fft, cfg.hop_length,
        hann_window(cfg.n_fft, periodic=True), center=False, eps=1e-9,
    )
    fb = jnp.asarray(
        mel_filterbank(
            cfg.sampling_rate, cfg.n_fft, cfg.n_mels,
            f_min=f_min, f_max=f_max, scale="slaney", norm="slaney",
        )
    )
    mel = jnp.dot(mag, fb, preferred_element_type=jnp.float32)
    return jnp.log(jnp.clip(mel, min=1e-5)).astype(wav.dtype)


def compute_num_frames(num_samples: int, hop_length: int) -> int:
    """lhotse's frame-count contract: round-half-up of samples/hop
    (ref feature.py:101-111 crops/pads the STFT output to this)."""
    return int((num_samples + hop_length // 2) // hop_length)


def fix_num_frames(mel: jax.Array, num_frames: int) -> jax.Array:
    """Crop or replicate-pad (..., F, n_mels) to exactly num_frames frames."""
    f = mel.shape[-2]
    if f > num_frames:
        return mel[..., :num_frames, :]
    if f < num_frames:
        pad = jnp.broadcast_to(
            mel[..., -1:, :], mel.shape[:-2] + (num_frames - f, mel.shape[-1])
        )
        return jnp.concatenate([mel, pad], axis=-2)
    return mel


def extract_features(
    wav: np.ndarray,
    cfg: FeatureConfig,
    num_channels: int = 1,
    pre_padded: bool = False,
) -> jax.Array:
    """Full extractor matching {Vocos,BigVGAN}Fbank.extract (ref feature.py:69-116,
    150-204): channel handling, mel, frame-count fixup.

    wav: (C, L) or (L,) numpy/JAX array.  Returns (F, n_mels * C').

    pre_padded=True: the caller already applied stft_pad_amount reflect
    padding (plus optional right-zeros to a bucketed length); the STFT
    runs center=False and ALL frames are returned — the caller owns the
    frame-count contract (slice to compute_num_frames of the true length).
    """
    wav = jnp.asarray(wav)
    if wav.ndim == 1:
        wav = wav[None, :]
    if num_channels == 1 and wav.shape[0] == 2:
        wav = jnp.mean(wav, axis=0, keepdims=True)

    if cfg.type == "vocos":
        mel = vocos_log_mel(wav, cfg, pre_padded=pre_padded)
    elif cfg.type == "bigvgan":
        mel = bigvgan_log_mel(wav, cfg, pre_padded=pre_padded)
    else:
        raise ValueError(cfg.type)

    if not pre_padded:
        n = compute_num_frames(wav.shape[-1], cfg.hop_length)
        mel = fix_num_frames(mel, n)
    # (C, F, M) -> (F, C*M) with channel-major feature concat
    # (ref feature.py:96-99: reshape(-1, time).t())
    c, f, m = mel.shape
    return jnp.transpose(mel, (1, 0, 2)).reshape(f, c * m)
