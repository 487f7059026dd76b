"""ctypes loader/builder for the native host-side fast paths
(native/blockify.cpp). Falls back to NumPy when g++ or the source tree is
unavailable (e.g. installed-package scenarios)."""

from __future__ import annotations

import ctypes
import functools
import subprocess
from pathlib import Path

import numpy as np

_REPO = Path(__file__).resolve().parents[2]
_SRC = _REPO / "native" / "blockify.cpp"
_OUT = _REPO / "build" / "libckblockify.so"


@functools.lru_cache(maxsize=1)
def _lib():
    try:
        if not _SRC.exists():
            return None
        if not _OUT.exists() or _OUT.stat().st_mtime < _SRC.stat().st_mtime:
            _OUT.parent.mkdir(exist_ok=True)
            subprocess.run(
                ["g++", "-O3", "-fPIC", "-shared", str(_SRC), "-o",
                 str(_OUT)], check=True, capture_output=True)
        return ctypes.CDLL(str(_OUT))
    except Exception:
        return None


def available() -> bool:
    return _lib() is not None


def blockify(image: np.ndarray) -> np.ndarray:
    h, w, _ = image.shape
    bh, bw = (h + 3) // 4, (w + 3) // 4
    out = np.empty((bh * bw, 16, 4), dtype=np.uint8)
    _lib().ck_blockify(
        image.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int64(h), ctypes.c_int64(w),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out


def unblockify(blocks: np.ndarray, h: int, w: int) -> np.ndarray:
    out = np.empty((h, w, 4), dtype=np.uint8)
    _lib().ck_unblockify(
        np.ascontiguousarray(blocks, dtype=np.uint8).ctypes.data_as(
            ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int64(h), ctypes.c_int64(w),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out
