"""Fused Pallas mel-spectrogram kernel vs the XLA vocos path (interpret)."""

import numpy as np

import jax.numpy as jnp

from zipvoice_tpu.audio.mel import vocos_log_mel
from zipvoice_tpu.config import FeatureConfig
from zipvoice_tpu.ops.melspec import TILE, fused_log_mel


def test_fused_log_mel_matches_xla():
    rng = np.random.default_rng(0)
    n_fft, hop = 1024, 256
    frames = 2 * TILE
    raw_len = frames * hop
    wav = (rng.standard_normal((2, raw_len)) * 0.1).astype(np.float32)
    need = (frames - 1) * hop + n_fft
    wc = np.pad(wav, ((0, 0), (n_fft // 2, n_fft // 2)), mode="reflect")
    wc = wc[:, :need]
    out = np.asarray(fused_log_mel(jnp.asarray(wc), interpret=True))
    ref = np.asarray(vocos_log_mel(jnp.asarray(wav), FeatureConfig()))
    n = min(out.shape[1], ref.shape[1])
    err = np.abs(out[:, :n] - ref[:, :n]).max()
    assert err < 1e-4, err
