"""Data layer: VoiceSample, streaming datasets, registry, augmentations."""

from ultravox_tpu.data.sample import SAMPLE_RATE, VoiceSample  # noqa: F401
