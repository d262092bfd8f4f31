"""ctypes wrapper for the native batch WAV loader (native/wavio.cpp).

The C++ side parses RIFF/WAVE, converts PCM16/PCM32/uint8/float32 to
float32 in [-1, 1] (the load_wav semantics, data/dataset.py:37-53), and
decodes a whole batch in parallel straight into one (B, cap) buffer —
the data-pipeline counterpart of the reference's 8 DataLoader worker
processes (train_standalone.py:546-554).  Falls back to the pure-Python
reader when no compiler is available.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional, Sequence, Tuple

import numpy as np

_lib: Optional[ctypes.CDLL] = None
_lib_failed = False

_STATUS = {0: "ok", 1: "open failed", 2: "not RIFF/WAVE",
           3: "missing fmt/data chunk", 4: "unsupported encoding"}


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    try:
        from matcha_tts_tpu.native.build import build_wavio

        lib = ctypes.CDLL(str(build_wavio()))
        lib.wav_header_info.restype = ctypes.c_int
        lib.wav_header_info.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.wav_load_batch.restype = None
        lib.wav_load_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32,
        ]
        _lib = lib
    except Exception:
        _lib_failed = True
        _lib = None
    return _lib


def native_available() -> bool:
    return _load() is not None


def wav_lengths(paths: Sequence) -> Tuple[np.ndarray, np.ndarray]:
    """Header-only scan: (n_samples, sample_rate) per file.  Used to pick
    the frame bucket before decoding."""
    lib = _load()
    n_samples = np.zeros(len(paths), np.int64)
    srs = np.zeros(len(paths), np.int32)
    if lib is None:
        from matcha_tts_tpu.data.dataset import load_wav

        for i, p in enumerate(paths):
            wav, sr = load_wav(p)
            n_samples[i], srs[i] = len(wav), sr
        return n_samples, srs
    ns = ctypes.c_int64()
    sr = ctypes.c_int32()
    for i, p in enumerate(paths):
        rc = lib.wav_header_info(os.fsencode(str(p)),
                                 ctypes.byref(ns), ctypes.byref(sr))
        if rc != 0:
            raise IOError(f"{p}: {_STATUS.get(rc, rc)}")
        n_samples[i], srs[i] = ns.value, sr.value
    return n_samples, srs


def load_wav_batch_into(paths: Sequence, out: np.ndarray,
                        n_threads: int = 0) -> Tuple[np.ndarray, np.ndarray]:
    """Decode `paths` into the preallocated float32 C-contiguous (B, cap)
    buffer `out` (truncated/zero-padded per row).  Returns (true_lengths,
    sample_rates).  Raises IOError naming the first bad file."""
    lib = _load()
    b, cap = out.shape
    assert len(paths) == b and out.dtype == np.float32
    assert out.flags["C_CONTIGUOUS"]
    if lib is None:
        from matcha_tts_tpu.data.dataset import load_wav

        lens = np.zeros(b, np.int64)
        srs = np.zeros(b, np.int32)
        for i, p in enumerate(paths):
            wav, sr = load_wav(p)
            m = min(len(wav), cap)
            out[i, :m] = wav[:m]
            out[i, m:] = 0.0
            lens[i], srs[i] = len(wav), sr
        return lens, srs

    if n_threads <= 0:
        n_threads = min(8, os.cpu_count() or 1)
    c_paths = (ctypes.c_char_p * b)(*[os.fsencode(str(p)) for p in paths])
    lens = np.zeros(b, np.int64)
    srs = np.zeros(b, np.int32)
    statuses = np.zeros(b, np.int32)
    lib.wav_load_batch(
        c_paths, b,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), cap,
        lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        srs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        statuses.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        n_threads,
    )
    bad = np.nonzero(statuses)[0]
    if bad.size:
        i = int(bad[0])
        raise IOError(f"{paths[i]}: {_STATUS.get(int(statuses[i]), statuses[i])}")
    return lens, srs
