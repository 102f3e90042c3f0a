"""Model layer: configs, encoder, projector, decoder LLMs, composite model,
processor, and HF weight conversion."""

from ultravox_tpu.models.config import (  # noqa: F401
    DecoderConfig,
    LoraConfig,
    LossConfig,
    LossFunction,
    LossMaskType,
    UltravoxConfig,
    WhisperEncoderConfig,
)
