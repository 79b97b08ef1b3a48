"""ctypes bindings for the native DSP library (native/m2m_dsp.cpp).

Loads native/libm2m_dsp.so, building it with `make` on first use if the
toolchain is available.  Every binding has a pure-numpy fallback
(music2midi_tpu.dsp / data prep code), so the framework works without a
compiler — the native path is the performance path for the host data
loader (SURVEY.md §2.1: the reference's native surfaces were all
third-party; these are first-party).
"""

from __future__ import annotations

import ctypes
import subprocess
import threading
from pathlib import Path
from typing import Optional

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parent.parent / "native"
_LIB_PATH = _NATIVE_DIR / "libm2m_dsp.so"
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_load_failed = False


def _try_build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", str(_NATIVE_DIR)],
            capture_output=True, check=True, timeout=120,
        )
        return _LIB_PATH.exists()
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """The loaded library, or None if unavailable (no compiler etc.)."""
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    with _lock:
        if _lib is not None or _load_failed:
            return _lib
        if not _LIB_PATH.exists() and not _try_build():
            _load_failed = True
            return None
        try:
            lib = ctypes.CDLL(str(_LIB_PATH))
        except OSError:
            _load_failed = True
            return None
        f32p = ctypes.POINTER(ctypes.c_float)
        f64p = ctypes.POINTER(ctypes.c_double)
        lib.m2m_resample.argtypes = [
            f32p, ctypes.c_int64, ctypes.c_int, ctypes.c_int, f32p,
            ctypes.c_double,
        ]
        lib.m2m_resample.restype = ctypes.c_int
        lib.m2m_pitch_shift.argtypes = [
            f32p, ctypes.c_int64, ctypes.c_int, ctypes.c_double, f32p,
        ]
        lib.m2m_pitch_shift.restype = None
        lib.m2m_fix_invalid_offsets.argtypes = [f64p, ctypes.c_int64]
        lib.m2m_fix_invalid_offsets.restype = None
        i64p = ctypes.POINTER(ctypes.c_int64)
        lib.m2m_dtw_band.argtypes = [
            f32p, f32p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            i64p, i64p, ctypes.c_double, ctypes.c_double, ctypes.c_double,
            i64p,
        ]
        lib.m2m_dtw_band.restype = ctypes.c_int64
        lib.m2m_version.restype = ctypes.c_int
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None


def pitch_shift(y: np.ndarray, sr: int, n_steps: float) -> np.ndarray:
    """Native phase-vocoder pitch shift; raises if the library is absent
    (callers dispatch via dsp.pitch_shift which falls back to numpy)."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native library unavailable")
    x = np.ascontiguousarray(y, dtype=np.float32)
    out = np.empty_like(x)
    lib.m2m_pitch_shift(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        x.size, int(sr), float(n_steps),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out


def resample(x: np.ndarray, up: int, down: int,
             beta: float = 14.769656459379492) -> np.ndarray:
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native library unavailable")
    xin = np.ascontiguousarray(x, dtype=np.float32)
    out = np.empty((xin.size * up + down - 1) // down + 8, dtype=np.float32)
    n = lib.m2m_resample(
        xin.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        xin.size, up, down,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), beta,
    )
    return out[:n]


def dtw_band(
    fa: np.ndarray,
    fb: np.ndarray,
    lo: Optional[np.ndarray] = None,
    hi: Optional[np.ndarray] = None,
    weights=(1.5, 1.5, 2.0),
) -> np.ndarray:
    """Banded weighted-step DTW over cosine cost (native kernel).

    fa: (d, n), fb: (d, m) — time on axis 1, matching data/align.py.
    lo/hi: per-row-of-fa allowed column range [lo[i], hi[i]); defaults to
    the full rectangle.  Returns the warp path (2, L), start to end.
    """
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native library unavailable")
    a = np.ascontiguousarray(fa.T, dtype=np.float32)  # (n, d)
    b = np.ascontiguousarray(fb.T, dtype=np.float32)  # (m, d)
    n, d = a.shape
    m = b.shape[0]
    lo_arr = (
        np.zeros(n, np.int64) if lo is None
        else np.ascontiguousarray(lo, np.int64)
    )
    hi_arr = (
        np.full(n, m, np.int64) if hi is None
        else np.ascontiguousarray(hi, np.int64)
    )
    out = np.empty(2 * (n + m), dtype=np.int64)
    i64p = ctypes.POINTER(ctypes.c_int64)
    length = lib.m2m_dtw_band(
        a.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        b.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        d, n, m,
        lo_arr.ctypes.data_as(i64p), hi_arr.ctypes.data_as(i64p),
        float(weights[0]), float(weights[1]), float(weights[2]),
        out.ctypes.data_as(i64p),
    )
    if length < 0:
        raise ValueError("m2m_dtw_band failed (empty input or bad band)")
    return out[: 2 * length].reshape(length, 2).T.copy()


def fix_invalid_offsets(notes: np.ndarray) -> np.ndarray:
    """In-place clamp of offsets to the next same-pitch onset (native);
    returns the array."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native library unavailable")
    arr = np.ascontiguousarray(notes, dtype=np.float64)
    lib.m2m_fix_invalid_offsets(
        arr.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), arr.shape[0]
    )
    return arr
