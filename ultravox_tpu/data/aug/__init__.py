"""Audio augmentations (reference: data/aug/)."""

from ultravox_tpu.data.aug.base import Augmentation, AugmentationArgs  # noqa: F401
from ultravox_tpu.data.aug.registry import (  # noqa: F401
    AugRegistry,
    AugmentationConfig,
    create_augmentation,
)
