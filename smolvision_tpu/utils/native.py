"""ctypes bindings for the native host runtime (native/smolvision_host.c).

Loads libsmolvision_host.so if present (build with `make -C native`); every
entry point has a pure-Python fallback, so the library is an optimization,
never a requirement.  Set SMOLVISION_NATIVE=0 to force the Python paths.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_CANDIDATES = [
    os.path.join(_REPO, "native", "libsmolvision_host.so"),
    os.path.join(os.path.dirname(__file__), "libsmolvision_host.so"),
]


def load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("SMOLVISION_NATIVE", "1") == "0":
        return None
    for path in _CANDIDATES:
        if os.path.exists(path):
            try:
                lib = ctypes.CDLL(path)
            except OSError:
                continue
            lib.sv_resample_len.restype = ctypes.c_long
            lib.sv_resample_len.argtypes = [ctypes.c_long] * 3
            lib.sv_resample_sinc.restype = None
            lib.sv_resample_sinc.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_long,
                ctypes.c_long, ctypes.c_long, ctypes.POINTER(ctypes.c_float)]
            lib.sv_bpe_encode.restype = ctypes.c_int
            lib.sv_bpe_encode.argtypes = [
                ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_long),
                ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32), ctypes.c_long]
            lib.sv_silence_mask.restype = None
            lib.sv_silence_mask.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_long,
                ctypes.POINTER(ctypes.c_uint8)]
            if hasattr(lib, "sv_expf_vec"):  # absent in pre-round-3 builds
                lib.sv_expf_vec.restype = None
                lib.sv_expf_vec.argtypes = [
                    ctypes.POINTER(ctypes.c_float), ctypes.c_long]
            _LIB = lib
            break
    return _LIB


def available() -> bool:
    return load() is not None


def resample_sinc(samples: np.ndarray, in_rate: int, out_rate: int) -> Optional[np.ndarray]:
    lib = load()
    if lib is None:
        return None
    x = np.ascontiguousarray(samples, dtype=np.float32)
    n = len(x)
    out_n = lib.sv_resample_len(n, in_rate, out_rate)
    out = np.empty(out_n, dtype=np.float32)
    lib.sv_resample_sinc(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n, in_rate, out_rate,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out


def bpe_encode(initial_ids: np.ndarray, keys: np.ndarray, ranks: np.ndarray,
               results: np.ndarray) -> Optional[np.ndarray]:
    """initial_ids int32 [n]; merge table pre-sorted by key=(a<<32)|b."""
    lib = load()
    if lib is None:
        return None
    buf = np.ascontiguousarray(initial_ids, dtype=np.int32).copy()
    n = ctypes.c_long(len(buf))
    rc = lib.sv_bpe_encode(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), ctypes.byref(n),
        keys.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ranks.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        results.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        len(keys))
    if rc != 0:
        return None
    return buf[: n.value]


def silence_keep_mask(samples: np.ndarray) -> Optional[np.ndarray]:
    lib = load()
    if lib is None:
        return None
    x = np.ascontiguousarray(samples, dtype=np.float32)
    n_win = (len(x) + 159) // 160
    keep = np.zeros(n_win, dtype=np.uint8)
    lib.sv_silence_mask(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(x),
        keep.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return keep.astype(bool)
