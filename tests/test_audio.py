"""STFT/ISTFT and mel-frontend tests.

torch.stft (core torch, no torchaudio needed) is the oracle for the
transform; the mel filterbanks are validated against their defining
mathematical properties and the composed pipelines against a torch.stft
re-implementation of the reference extractors (feature.py:47-60,
_bigvgan_mel_feature.py:89-109).
"""

import numpy as np
import pytest

from zipvoice_tpu.audio.mel import (
    bigvgan_log_mel,
    compute_num_frames,
    extract_features,
    mel_filterbank,
    vocos_log_mel,
)
from zipvoice_tpu.audio.stft import hann_window, istft, stft_complex, stft_magnitude
from zipvoice_tpu.config import FeatureConfig

torch = pytest.importorskip("torch")


def _rand_wav(n, seed=0, channels=None):
    rng = np.random.default_rng(seed)
    shape = (n,) if channels is None else (channels, n)
    return (rng.standard_normal(shape) * 0.1).astype(np.float32)


def test_hann_window_matches_torch():
    np.testing.assert_allclose(
        hann_window(1024), torch.hann_window(1024).numpy(), atol=1e-6
    )


@pytest.mark.parametrize("center", [True, False])
def test_stft_matches_torch(center):
    n_fft, hop = 256, 64
    wav = _rand_wav(2000)
    ref = torch.stft(
        torch.from_numpy(wav),
        n_fft,
        hop_length=hop,
        window=torch.hann_window(n_fft),
        center=center,
        pad_mode="reflect",
        normalized=False,
        onesided=True,
        return_complex=True,
    )
    re, im = stft_complex(wav, n_fft, hop, hann_window(n_fft), center=center)
    # torch returns (freq, frames); ours (frames, freq)
    np.testing.assert_allclose(np.asarray(re).T, ref.real.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(im).T, ref.imag.numpy(), atol=2e-4)
    mag = stft_magnitude(wav, n_fft, hop, hann_window(n_fft), center=center)
    np.testing.assert_allclose(np.asarray(mag).T, ref.abs().numpy(), atol=2e-4)


def test_istft_matches_torch():
    n_fft, hop = 256, 64
    wav = _rand_wav(1984, seed=3)
    spec = torch.stft(
        torch.from_numpy(wav), n_fft, hop_length=hop,
        window=torch.hann_window(n_fft), center=True, return_complex=True,
    )
    ref = torch.istft(
        spec, n_fft, hop_length=hop, window=torch.hann_window(n_fft),
        center=True,
    ).numpy()
    re, im = np.asarray(spec.real).T, np.asarray(spec.imag).T
    out = np.asarray(istft(re, im, n_fft, hop, hann_window(n_fft), center=True))
    n = min(len(out), len(ref))
    np.testing.assert_allclose(out[:n], ref[:n], atol=2e-4)


def test_stft_istft_roundtrip():
    n_fft, hop = 1024, 256
    wav = _rand_wav(256 * 40, seed=1)
    re, im = stft_complex(wav, n_fft, hop, hann_window(n_fft), center=True)
    rec = np.asarray(istft(np.asarray(re), np.asarray(im), n_fft, hop,
                           hann_window(n_fft), center=True))
    n = min(len(rec), len(wav))
    np.testing.assert_allclose(rec[:n], wav[:n], atol=1e-4)


def test_mel_filterbank_properties():
    # HTK scale, no norm (torchaudio defaults used by VocosFbank)
    fb = mel_filterbank(24000, 1024, 100, scale="htk", norm=None)
    assert fb.shape == (513, 100)
    assert fb.min() >= 0.0
    # every filter has nonzero support and peak <= 1 (triangles, no norm)
    assert (fb.sum(0) > 0).all()
    assert fb.max() <= 1.0 + 1e-6
    # Slaney scale + norm (librosa defaults used by BigVGANFbank)
    fbs = mel_filterbank(24000, 1024, 100, scale="slaney", norm="slaney")
    assert fbs.shape == (513, 100)
    # slaney-normed filter areas ~ equal (discretized triangles): area ~= 1
    df = 24000 / 2 / 512
    areas = fbs.sum(0) * df
    assert abs(areas.mean() - 1.0) < 0.02
    assert np.abs(areas - 1.0).max() < 0.2


def test_vocos_log_mel_matches_torch_composition():
    """Oracle: torch.stft + the same HTK filterbank == torchaudio
    MelSpectrogram(power=1, center=True) as used by VocosFbank."""
    cfg = FeatureConfig()
    wav = _rand_wav(24000, seed=2)
    spec = torch.stft(
        torch.from_numpy(wav), cfg.n_fft, hop_length=cfg.hop_length,
        window=torch.hann_window(cfg.n_fft), center=True, pad_mode="reflect",
        normalized=False, onesided=True, return_complex=True,
    ).abs()
    fb = torch.from_numpy(mel_filterbank(24000, 1024, 100, scale="htk"))
    ref = torch.log(torch.clamp(fb.T @ spec, min=1e-7)).numpy()  # (M, F)
    out = np.asarray(vocos_log_mel(wav, cfg))  # (F, M)
    np.testing.assert_allclose(out.T, ref, atol=2e-4)


def test_bigvgan_log_mel_matches_reference_composition():
    """Oracle: the exact op sequence of _bigvgan_mel_feature.mel_spectrogram
    (manual pad, center=False, sqrt(power+1e-9), slaney fb, log clamp 1e-5)."""
    cfg = FeatureConfig(type="bigvgan")
    wav = _rand_wav(24000, seed=4)
    pad = (cfg.n_fft - cfg.hop_length) // 2
    y = torch.nn.functional.pad(
        torch.from_numpy(wav)[None, None], (pad, pad), mode="reflect"
    )[0, 0]
    spec = torch.stft(
        y, cfg.n_fft, hop_length=cfg.hop_length,
        window=torch.hann_window(cfg.n_fft), center=False,
        normalized=False, onesided=True, return_complex=True,
    )
    spec = torch.sqrt(torch.view_as_real(spec).pow(2).sum(-1) + 1e-9)
    fb = torch.from_numpy(
        mel_filterbank(24000, 1024, 100, scale="slaney", norm="slaney")
    )
    ref = torch.log(torch.clamp(fb.T @ spec, min=1e-5)).numpy()
    out = np.asarray(bigvgan_log_mel(wav, cfg))
    np.testing.assert_allclose(out.T, ref, atol=2e-4)


def test_extract_features_shapes_and_frames():
    cfg = FeatureConfig()
    for n in [24000, 24000 + 100, 24000 - 100]:
        feats = np.asarray(extract_features(_rand_wav(n, seed=5), cfg))
        assert feats.shape == (compute_num_frames(n, cfg.hop_length), 100)
    # stereo 2-channel concat
    feats2 = np.asarray(
        extract_features(_rand_wav(24000, seed=6, channels=2), cfg, num_channels=2)
    )
    assert feats2.shape == (compute_num_frames(24000, 256), 200)
    # stereo downmix
    w = _rand_wav(24000, seed=7, channels=2)
    a = np.asarray(extract_features(w, cfg, num_channels=1))
    b = np.asarray(extract_features(w.mean(0), cfg, num_channels=1))
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_probe_wav_header_only(tmp_path):
    """probe_wav reads only headers and accepts every format read_wav does
    (incl. IEEE float, which the stdlib wave module rejects)."""
    import struct

    from zipvoice_tpu.audio.wav import probe_wav, read_wav, write_wav

    rng = np.random.default_rng(0)
    x = (rng.standard_normal((2, 12345)) * 0.1).astype(np.float32)
    p16 = tmp_path / "pcm16.wav"
    write_wav(p16, x, 24000)
    assert probe_wav(p16) == (24000, 12345, 2)

    # hand-build an IEEE-float WAV (format code 3)
    body = x.T.astype("<f4").tobytes()
    hdr = b"RIFF" + struct.pack("<I", 36 + len(body)) + b"WAVE"
    hdr += b"fmt " + struct.pack("<IHHIIHH", 16, 3, 2, 16000, 16000 * 8, 8, 32)
    hdr += b"data" + struct.pack("<I", len(body))
    pf = tmp_path / "float.wav"
    pf.write_bytes(hdr + body)
    assert probe_wav(pf) == (16000, 12345, 2)
    wav, sr = read_wav(pf)  # and read_wav agrees
    assert sr == 16000 and wav.shape == (2, 12345)


def test_wav_extensible_float_decodes_correctly(tmp_path):
    """WAVE_FORMAT_EXTENSIBLE resolves the real format from the SubFormat
    GUID — an extensible IEEE-float file must decode as float, not be
    reinterpreted as int32 PCM."""
    import struct

    from zipvoice_tpu.audio.wav import read_wav

    rng = np.random.default_rng(1)
    x = (rng.standard_normal((1, 4096)) * 0.3).astype(np.float32)
    body = x.T.astype("<f4").tobytes()
    # fmt chunk: WAVE_FORMAT_EXTENSIBLE (0xFFFE) + 22-byte extension whose
    # SubFormat GUID starts with 0x0003 (IEEE float)
    guid = struct.pack("<H", 3) + b"\x00\x00" + bytes(
        [0x00, 0x00, 0x10, 0x00, 0x80, 0x00, 0x00, 0xAA,
         0x00, 0x38, 0x9B, 0x71]
    )
    fmt = struct.pack("<HHIIHHH", 0xFFFE, 1, 24000, 24000 * 4, 4, 32, 22)
    fmt += struct.pack("<HI", 32, 0x4) + guid
    hdr = b"RIFF" + struct.pack("<I", 36 + len(fmt) - 16 + len(body))
    hdr += b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    hdr += b"data" + struct.pack("<I", len(body))
    p = tmp_path / "ext_float.wav"
    p.write_bytes(hdr + body)
    wav, sr = read_wav(p)
    assert sr == 24000
    np.testing.assert_allclose(wav, x, atol=1e-7)
