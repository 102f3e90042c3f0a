"""Inference layer: offline & streaming generation, continuous batching."""

from ultravox_tpu.inference.base import (  # noqa: F401
    InferenceChunk,
    InferenceStats,
    VoiceInference,
    VoiceOutput,
)
