"""ctypes bindings + build for the C++ audio DSP library.

``lib()`` compiles ``audio_dsp.cpp`` on first use (g++, -O3 -march=native)
and memoises the handle; all entry points fall back cleanly when no compiler
is available (callers catch ImportError/OSError and use the scipy/numpy
paths).
"""

from __future__ import annotations

import ctypes
import functools
import math
import os
import subprocess
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "audio_dsp.cpp")
_SO = os.path.join(_DIR, "libaudio_dsp.so")


def build(force: bool = False) -> str:
    if force or not os.path.exists(_SO) or (
        os.path.getmtime(_SO) < os.path.getmtime(_SRC)
    ):
        cmd = [
            "g++", "-O3", "-march=native", "-shared", "-fPIC",
            _SRC, "-o", _SO,
        ]
        subprocess.run(cmd, check=True, capture_output=True)
    return _SO


@functools.lru_cache(maxsize=1)
def lib() -> ctypes.CDLL:
    so = build()
    l = ctypes.CDLL(so)
    f32p = ctypes.POINTER(ctypes.c_float)
    l.ud_resample_poly.restype = ctypes.c_int64
    l.ud_resample_poly.argtypes = [
        f32p, ctypes.c_int64, ctypes.c_int, ctypes.c_int, f32p, ctypes.c_int64,
    ]
    l.ud_biquad_lowpass.argtypes = [
        f32p, ctypes.c_int64, ctypes.c_float, ctypes.c_float, ctypes.c_int, f32p,
    ]
    l.ud_biquad_bandpass.argtypes = [
        f32p, ctypes.c_int64, ctypes.c_float, ctypes.c_float, ctypes.c_float,
        ctypes.c_int, f32p,
    ]
    l.ud_mulaw_roundtrip.argtypes = [f32p, ctypes.c_int64, f32p]
    l.ud_alaw_roundtrip.argtypes = [f32p, ctypes.c_int64, f32p]
    return l


def _f32(a: np.ndarray):
    a = np.ascontiguousarray(a, dtype=np.float32)
    return a, a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def resample_poly(audio: np.ndarray, orig_sr: int, target_sr: int) -> np.ndarray:
    g = math.gcd(int(orig_sr), int(target_sr))
    up, down = target_sr // g, orig_sr // g
    if up == down:
        return np.asarray(audio, np.float32)
    src, src_p = _f32(audio)
    n_out = (len(src) * up + down - 1) // down
    out = np.empty(n_out, np.float32)
    written = lib().ud_resample_poly(
        src_p, len(src), up, down,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n_out,
    )
    return out[:written]


def biquad_lowpass(
    audio: np.ndarray, cutoff_hz: float, sample_rate: float, order: int = 4
) -> np.ndarray:
    src, src_p = _f32(audio)
    out = np.empty_like(src)
    lib().ud_biquad_lowpass(
        src_p, len(src), cutoff_hz, sample_rate, order,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out


def biquad_bandpass(
    audio: np.ndarray, low_hz: float, high_hz: float,
    sample_rate: float, order: int = 4,
) -> np.ndarray:
    src, src_p = _f32(audio)
    out = np.empty_like(src)
    lib().ud_biquad_bandpass(
        src_p, len(src), low_hz, high_hz, sample_rate, order,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out


def mulaw_roundtrip(audio: np.ndarray) -> np.ndarray:
    src, src_p = _f32(audio)
    out = np.empty_like(src)
    lib().ud_mulaw_roundtrip(
        src_p, len(src), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    )
    return out


def alaw_roundtrip(audio: np.ndarray) -> np.ndarray:
    src, src_p = _f32(audio)
    out = np.empty_like(src)
    lib().ud_alaw_roundtrip(
        src_p, len(src), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    )
    return out


def available() -> bool:
    try:
        lib()
        return True
    except (OSError, subprocess.CalledProcessError, FileNotFoundError):
        return False
