"""Mel-frontend parity vs HF WhisperFeatureExtractor (the reference's audio
frontend, ultravox_processing.py:295-303)."""

import numpy as np
import pytest

from ultravox_tpu.ops import mel


def _hf_features(audio, num_mel_filters=80):
    from transformers import WhisperFeatureExtractor

    fe = WhisperFeatureExtractor(feature_size=num_mel_filters)
    out = fe(
        audio,
        sampling_rate=16000,
        padding="longest",
        pad_to_multiple_of=160,
        truncation=False,
        return_attention_mask=True,
        return_tensors="np",
    )
    return out["input_features"], out["attention_mask"]


@pytest.mark.parametrize("n_samples", [16000 * 3 + 7, 16000, 400])
@pytest.mark.parametrize("n_mels", [80, 128])
def test_np_parity(n_samples, n_mels):
    rng = np.random.default_rng(0)
    audio = (rng.standard_normal(n_samples) * 0.1).astype(np.float32)
    ref, _ = _hf_features(audio, n_mels)

    pad = (160 - n_samples % 160) % 160
    padded = np.pad(audio, (0, pad))
    ours = mel.log_mel_spectrogram_np(padded, num_mel_filters=n_mels)
    assert ours.shape == ref[0].shape
    np.testing.assert_allclose(ours, ref[0], atol=5e-6)


def test_jax_matches_np():
    import jax.numpy as jnp

    rng = np.random.default_rng(1)
    audio = (rng.standard_normal(16000 * 2) * 0.3).astype(np.float32)
    ref = mel.log_mel_spectrogram_np(audio)
    ours = np.asarray(mel.log_mel_spectrogram(jnp.asarray(audio)[None])[0])
    np.testing.assert_allclose(ours, ref, atol=5e-5)


def test_filter_bank_matches_hf():
    from transformers.audio_utils import mel_filter_bank as hf_fb

    ref = hf_fb(
        num_frequency_bins=201,
        num_mel_filters=80,
        min_frequency=0.0,
        max_frequency=8000.0,
        sampling_rate=16000,
        norm="slaney",
        mel_scale="slaney",
    )
    ours = mel.mel_filter_bank()
    np.testing.assert_allclose(ours, ref, atol=1e-7)
