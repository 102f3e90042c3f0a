"""Augmentation implementations.

Reference: data/aug/{noise,gain,resampling,filter,compression}.py — colored
noise, random gain, down-up resampling, Butterworth band/low-pass, and μ-law /
a-law codec round-trips. All host-side numpy/scipy (the data pipeline runs on
CPU; none of this sits on the TPU critical path).
"""

from __future__ import annotations

import numpy as np

from ultravox_tpu.data.aug.base import Augmentation
from ultravox_tpu.utils.audio import resample


class GainAugmentation(Augmentation):
    """Random gain in dB (reference: aug/gain.py:9-45)."""

    def __init__(self, *args, min_gain_db: float = -6.0, max_gain_db: float = 6.0, **kw):
        super().__init__(*args, **kw)
        self.min_gain_db = min_gain_db
        self.max_gain_db = max_gain_db

    def _apply(self, audio: np.ndarray) -> np.ndarray:
        gain_db = self._rng.uniform(self.min_gain_db, self.max_gain_db)
        return (audio * (10.0 ** (gain_db / 20.0))).astype(np.float32)


class ColoredNoiseAugmentation(Augmentation):
    """Additive colored noise at a random SNR. ``exponent`` sets the spectral
    slope: 0 = white, 1 = pink, 2 = brown (reference: aug/noise.py:9-41)."""

    def __init__(
        self, *args,
        min_snr_db: float = 5.0, max_snr_db: float = 30.0,
        exponent: float = 0.0, **kw,
    ):
        super().__init__(*args, **kw)
        self.min_snr_db = min_snr_db
        self.max_snr_db = max_snr_db
        self.exponent = exponent

    def _apply(self, audio: np.ndarray) -> np.ndarray:
        n = len(audio)
        rng = np.random.default_rng(self._rng.randrange(2**31))
        white = rng.standard_normal(n).astype(np.float32)
        if self.exponent > 0:
            spec = np.fft.rfft(white)
            freqs = np.fft.rfftfreq(n)
            freqs[0] = freqs[1] if n > 1 else 1.0
            spec = spec / (freqs ** (self.exponent / 2.0))
            white = np.fft.irfft(spec, n).astype(np.float32)
        noise_rms = np.sqrt(np.mean(white**2)) + 1e-9
        signal_rms = np.sqrt(np.mean(audio**2)) + 1e-9
        snr_db = self._rng.uniform(self.min_snr_db, self.max_snr_db)
        target_noise_rms = signal_rms / (10.0 ** (snr_db / 20.0))
        return (audio + white * (target_noise_rms / noise_rms)).astype(np.float32)


class ResamplingAugmentation(Augmentation):
    """Downsample to a random rate and back (lossy) — reference:
    aug/resampling.py:10-35."""

    def __init__(self, *args, min_rate: int = 8000, max_rate: int = 16000, **kw):
        super().__init__(*args, **kw)
        self.min_rate = min_rate
        self.max_rate = max_rate

    def _apply(self, audio: np.ndarray) -> np.ndarray:
        rate = self._rng.randrange(self.min_rate, self.max_rate + 1, 1000)
        sr = self.args.sample_rate
        if rate >= sr:
            return audio
        down = resample(audio, sr, rate)
        return resample(down, rate, sr)[: len(audio)].astype(np.float32)


class ButterworthFilterAugmentation(Augmentation):
    """Band-pass / low-pass Butterworth filter (reference: aug/filter.py:10-44)."""

    def __init__(
        self, *args,
        btype: str = "lowpass",
        min_cutoff_hz: float = 2000.0, max_cutoff_hz: float = 7500.0,
        order: int = 4, **kw,
    ):
        super().__init__(*args, **kw)
        self.btype = btype
        self.min_cutoff_hz = min_cutoff_hz
        self.max_cutoff_hz = max_cutoff_hz
        self.order = order

    def _apply(self, audio: np.ndarray) -> np.ndarray:
        from scipy.signal import butter, sosfilt

        nyq = self.args.sample_rate / 2.0
        if self.btype == "bandpass":
            low = self._rng.uniform(50.0, 300.0)
            high = self._rng.uniform(self.min_cutoff_hz, self.max_cutoff_hz)
            wn = [low / nyq, min(high / nyq, 0.99)]
        else:
            wn = min(
                self._rng.uniform(self.min_cutoff_hz, self.max_cutoff_hz) / nyq,
                0.99,
            )
        sos = butter(self.order, wn, btype=self.btype, output="sos")
        return sosfilt(sos, audio).astype(np.float32)


def _mulaw(audio: np.ndarray, mu: float = 255.0) -> np.ndarray:
    x = np.clip(audio, -1.0, 1.0)
    comp = np.sign(x) * np.log1p(mu * np.abs(x)) / np.log1p(mu)
    q = np.round((comp + 1.0) / 2.0 * mu) / mu * 2.0 - 1.0  # 8-bit quantise
    return (np.sign(q) * ((1.0 + mu) ** np.abs(q) - 1.0) / mu).astype(np.float32)


def _alaw(audio: np.ndarray, A: float = 87.6) -> np.ndarray:
    x = np.clip(audio, -1.0, 1.0)
    ax = np.abs(x)
    lnA = 1.0 + np.log(A)
    with np.errstate(divide="ignore"):
        comp = np.sign(x) * np.where(
            ax < 1.0 / A, A * ax / lnA, (1.0 + np.log(np.maximum(A * ax, 1e-30))) / lnA
        )
    q = np.round((comp + 1.0) / 2.0 * 255.0) / 255.0 * 2.0 - 1.0
    aq = np.abs(q)
    return (
        np.sign(q)
        * np.where(aq < 1.0 / lnA, aq * lnA / A, np.exp(aq * lnA - 1.0) / A)
    ).astype(np.float32)


class CompressionAugmentation(Augmentation):
    """Telephony codec round-trip: μ-law or a-law 8-bit companding
    (reference: aug/compression.py:16-57 — the audioop path, re-implemented
    since ``audioop`` is removed in Python 3.13; the ffmpeg-subprocess codecs
    are out of scope for the TPU build's data path)."""

    def __init__(self, *args, codec: str = "mulaw", **kw):
        super().__init__(*args, **kw)
        assert codec in ("mulaw", "alaw")
        self.codec = codec

    def _apply(self, audio: np.ndarray) -> np.ndarray:
        return _mulaw(audio) if self.codec == "mulaw" else _alaw(audio)
