"""ctypes bridge to the native audio-IO runtime (ops/cpp/zipvoice_io.cc).

Builds libzipvoice_io.so on demand with g++ (cached next to the source) and
exposes `batch_load_wav` — thread-pooled decode+downmix+resample of a whole
batch of wav files, the host-side hot path of training data loading.  Falls
back cleanly (returns None / raises NativeUnavailable) when no compiler is
present, in which case the pure-numpy path in audio/wav.py is used.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from pathlib import Path
from typing import List, Optional, Tuple

import numpy as np

_SRC = Path(__file__).parent / "cpp" / "zipvoice_io.cc"
_LIB = Path(__file__).parent / "cpp" / "libzipvoice_io.so"
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


class NativeUnavailable(RuntimeError):
    pass


def _build() -> bool:
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
        "-o", str(_LIB), str(_SRC), "-lpthread",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=300)
        return True
    except (OSError, subprocess.SubprocessError) as ex:
        logging.info("native io build failed (%s); using numpy fallback", ex)
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        try:
            stale = (not _LIB.exists()
                     or (_SRC.exists()
                         and _LIB.stat().st_mtime < _SRC.stat().st_mtime))
        except OSError:
            stale = True
        if stale:
            if not _SRC.exists() or not _build():
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(str(_LIB))
        except OSError as ex:  # stale .so for the wrong arch/OS
            logging.info("native io load failed (%s); numpy fallback", ex)
            _build_failed = True
            return None
        lib.batch_load_wav.restype = ctypes.c_int
        lib.batch_load_wav.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int,
        ]
        lib.wav_info.restype = ctypes.c_int
        lib.wav_info.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int64),
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None


def batch_load_wav(
    paths: List[str],
    target_sr: int,
    max_len: int,
    num_threads: int = 0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Decode+downmix+resample `paths` in parallel native threads.

    Returns (audio (N, max_len) float32 zero-padded, lens (N,) int64).
    Raises NativeUnavailable if the library can't be built.
    """
    lib = get_lib()
    if lib is None:
        raise NativeUnavailable("libzipvoice_io.so not available")
    blob = b"".join(p.encode() + b"\0" for p in paths)
    offsets = np.zeros(len(paths), np.int64)
    pos = 0
    for i, p in enumerate(paths):
        offsets[i] = pos
        pos += len(p.encode()) + 1
    out = np.zeros((len(paths), max_len), np.float32)
    lens = np.zeros(len(paths), np.int64)
    rc = lib.batch_load_wav(
        blob,
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(paths),
        target_sr,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        max_len,
        lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        num_threads,
    )
    if rc != 0:
        bad = [paths[i] for i in range(len(paths)) if lens[i] == 0]
        raise IOError(f"native wav decode failed for: {bad[:5]}")
    return out, lens


def wav_info(path: str) -> Tuple[int, int, int]:
    """(sample_rate, channels, num_frames) without decoding samples twice."""
    lib = get_lib()
    if lib is None:
        raise NativeUnavailable("libzipvoice_io.so not available")
    sr = ctypes.c_int()
    ch = ctypes.c_int()
    n = ctypes.c_int64()
    rc = lib.wav_info(path.encode(), ctypes.byref(sr), ctypes.byref(ch),
                      ctypes.byref(n))
    if rc != 0:
        raise IOError(f"cannot parse {path}")
    return sr.value, ch.value, n.value
