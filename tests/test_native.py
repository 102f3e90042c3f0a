"""C++ audio DSP library tests (skipped when g++ is unavailable)."""

import numpy as np
import pytest

from ultravox_tpu.native import audio_dsp

pytestmark = pytest.mark.skipif(
    not audio_dsp.available(), reason="no C++ toolchain"
)


def test_resample_preserves_tone():
    t = np.arange(16000) / 16000
    audio = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    down = audio_dsp.resample_poly(audio, 16000, 8000)
    assert len(down) == 8000
    # tone energy preserved (mid region; edges differ by filter warm-up)
    rms_in = np.sqrt((audio[1000:15000] ** 2).mean())
    rms_out = np.sqrt((down[500:7500] ** 2).mean())
    assert abs(rms_in - rms_out) < 0.02
    up = audio_dsp.resample_poly(down, 8000, 16000)
    assert len(up) == 16000


def test_lowpass_attenuates_high_band():
    t = np.arange(16000) / 16000
    hi = (0.5 * np.sin(2 * np.pi * 6000 * t)).astype(np.float32)
    lo = (0.5 * np.sin(2 * np.pi * 300 * t)).astype(np.float32)
    hi_f = audio_dsp.biquad_lowpass(hi, 2000.0, 16000.0)
    lo_f = audio_dsp.biquad_lowpass(lo, 2000.0, 16000.0)
    assert np.sqrt((hi_f[2000:] ** 2).mean()) < 0.01
    assert np.sqrt((lo_f[2000:] ** 2).mean()) > 0.3


def test_bandpass():
    t = np.arange(16000) / 16000
    mid = (0.5 * np.sin(2 * np.pi * 1000 * t)).astype(np.float32)
    out = audio_dsp.biquad_bandpass(mid, 300.0, 3400.0, 16000.0)
    assert np.sqrt((out[2000:] ** 2).mean()) > 0.3


def test_companding_matches_numpy():
    from ultravox_tpu.data.aug.transforms import _alaw, _mulaw

    rng = np.random.default_rng(0)
    audio = (rng.standard_normal(4000) * 0.3).astype(np.float32)
    np.testing.assert_allclose(
        audio_dsp.mulaw_roundtrip(audio), _mulaw(audio), atol=1e-6
    )
    np.testing.assert_allclose(
        audio_dsp.alaw_roundtrip(audio), _alaw(audio), atol=1e-6
    )
