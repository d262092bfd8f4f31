"""ctypes wrapper for the native MAS kernel (host CPU).

`maximum_path_native(neg_cent, mask)` has the same contract as
`ops.mas.maximum_path` / `maximum_path_numpy`; it is the C++ counterpart
of the reference's Numba kernel (train_standalone.py:241-277) and falls
back to the NumPy oracle when no compiler is available.
"""

from __future__ import annotations

import ctypes
from typing import Optional

import numpy as np

_lib: Optional[ctypes.CDLL] = None
_lib_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    try:
        from matcha_tts_tpu.native.build import build

        path = build()
        lib = ctypes.CDLL(str(path))
        lib.maximum_path_batch.restype = None
        lib.maximum_path_batch.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.c_int32,
        ]
        _lib = lib
    except Exception:
        _lib_failed = True
        _lib = None
    return _lib


def native_available() -> bool:
    return _load() is not None


def maximum_path_native(neg_cent: np.ndarray, mask: np.ndarray) -> np.ndarray:
    lib = _load()
    if lib is None:
        from matcha_tts_tpu.ops.mas import maximum_path_numpy

        return maximum_path_numpy(neg_cent, mask)

    values = np.ascontiguousarray(neg_cent, dtype=np.float32)
    m = np.asarray(mask)
    b, t_x, t_y = values.shape
    t_xs = np.ascontiguousarray(m.sum(axis=1)[:, 0], dtype=np.int32)
    t_ys = np.ascontiguousarray(m.sum(axis=2)[:, 0], dtype=np.int32)
    paths = np.zeros_like(values)

    lib.maximum_path_batch(
        paths.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        values.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        t_xs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        t_ys.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        b, t_x, t_y,
    )
    return paths
