"""Native C++ audio-IO runtime tests (build-on-demand; skipped without g++)."""

import shutil

import numpy as np
import pytest

from zipvoice_tpu.audio.wav import read_wav, resample, write_wav

native = pytest.importorskip("zipvoice_tpu.ops.native")

pytestmark = pytest.mark.skipif(
    shutil.which("g++") is None or not native.available(),
    reason="native io lib unavailable",
)


@pytest.fixture()
def wav_files(tmp_path):
    rng = np.random.default_rng(0)
    paths = []
    for i, sr in enumerate([24000, 16000, 48000]):
        wav = (rng.standard_normal((1, sr)) * 0.1).astype(np.float32)
        p = tmp_path / f"{i}.wav"
        write_wav(p, wav, sr)
        paths.append(str(p))
    return paths


def test_batch_load_matches_numpy_same_rate(wav_files):
    audio, lens = native.batch_load_wav([wav_files[0]], 24000, 25000)
    ref, sr = read_wav(wav_files[0])
    assert sr == 24000 and lens[0] == ref.shape[-1]
    np.testing.assert_allclose(audio[0, : lens[0]], ref[0], atol=1e-6)


def test_batch_load_resamples(wav_files):
    audio, lens = native.batch_load_wav(wav_files, 24000, 26000, num_threads=3)
    assert list(lens) == [24000, 24000, 24000]
    # speech-band fidelity vs the scipy reference resampler (interior region;
    # filter designs differ near Nyquist which white noise exaggerates)
    w, sr = read_wav(wav_files[1])
    ref = resample(w, sr, 24000)[0]
    n = min(len(ref), lens[1])
    err = np.sqrt(np.mean((audio[1, 200 : n - 200] - ref[200 : n - 200]) ** 2))
    assert err < 0.02, err


def test_wav_info(wav_files):
    sr, ch, n = native.wav_info(wav_files[2])
    assert (sr, ch, n) == (48000, 1, 48000)


def test_batch_load_missing_file(tmp_path, wav_files):
    with pytest.raises(IOError):
        native.batch_load_wav([str(tmp_path / "nope.wav")], 24000, 1000)


def test_prefetch_iterator():
    from zipvoice_tpu.data.prefetch import PrefetchIterator

    out = list(PrefetchIterator(iter(range(10)), depth=3))
    assert out == list(range(10))

    def boom():
        yield 1
        raise ValueError("x")

    it = PrefetchIterator(boom(), depth=2)
    assert next(it) == 1
    with pytest.raises(ValueError):
        next(it)
        next(it)
