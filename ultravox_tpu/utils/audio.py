"""Host-side audio DSP: resampling.

Replaces the reference's librosa/soxr resample dependency
(inference/infer.py:288-290) with scipy polyphase resampling (scipy ships as
a JAX dependency) and a numpy linear fallback. A C++ SIMD resampler in
``ultravox_tpu/native`` can be swapped in for high-throughput data pipelines.
"""

from __future__ import annotations

import math

import numpy as np


_USE_NATIVE = None


def _native_dsp():
    """Memoised handle to the C++ DSP library (None if unbuildable)."""
    global _USE_NATIVE
    if _USE_NATIVE is None:
        try:
            from ultravox_tpu.native import audio_dsp

            _USE_NATIVE = audio_dsp if audio_dsp.available() else False
        except Exception:  # noqa: BLE001
            _USE_NATIVE = False
    return _USE_NATIVE or None


def resample(audio: np.ndarray, orig_sr: int, target_sr: int) -> np.ndarray:
    if orig_sr == target_sr:
        return np.asarray(audio, dtype=np.float32)
    native = _native_dsp()
    if native is not None:
        return native.resample_poly(audio, orig_sr, target_sr)
    try:
        from scipy.signal import resample_poly

        g = math.gcd(int(orig_sr), int(target_sr))
        out = resample_poly(
            np.asarray(audio, dtype=np.float32), target_sr // g, orig_sr // g
        )
        return out.astype(np.float32)
    except ImportError:
        n_out = int(round(len(audio) * target_sr / orig_sr))
        x_old = np.linspace(0.0, 1.0, num=len(audio), endpoint=False)
        x_new = np.linspace(0.0, 1.0, num=n_out, endpoint=False)
        return np.interp(x_new, x_old, audio).astype(np.float32)
