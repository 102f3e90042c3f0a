"""W&B checkpoint addressing and artifact logging.

Re-design of the reference's ``model/wandb_utils.py:10-52`` +
``file_utils.py:5-21`` + the ``WANDB_LOG_MODEL`` train flow: checkpoints are
addressable as ``wandb://entity/project/artifact:vN`` and training can log
checkpoint directories back as W&B artifacts. Everything degrades gracefully
when the ``wandb`` package is absent (it is an optional dependency)."""

from __future__ import annotations

import logging
import os
from typing import Optional

logger = logging.getLogger(__name__)

WANDB_PREFIX = "wandb://"


def is_wandb_url(model_path: str) -> bool:
    return model_path.startswith(WANDB_PREFIX)


def _api():
    try:
        import wandb
    except ImportError as e:  # pragma: no cover — exercised via mock in tests
        raise ImportError(
            "wandb:// checkpoint paths require the wandb package"
        ) from e
    return wandb.Api()


def get_artifact(model_url: str):
    """``wandb://entity/project/artifact:vN`` -> wandb Artifact."""
    assert is_wandb_url(model_url), model_url
    return _api().artifact(model_url[len(WANDB_PREFIX):])


def download_model_from_wandb(model_url: str) -> str:
    """Download a model artifact and return the local checkpoint dir."""
    artifact = get_artifact(model_url)
    path = artifact.download()
    if path is None:
        raise ValueError(f"artifact {model_url} has no files")
    return path


def log_checkpoint_artifact(
    run, checkpoint_dir: str, name: Optional[str] = None
) -> None:
    """Log a checkpoint directory as a W&B model artifact (reference:
    WANDB_LOG_MODEL=checkpoint flow, train.py:167-175)."""
    import wandb

    artifact = wandb.Artifact(
        name=name or f"model-{os.path.basename(checkpoint_dir)}",
        type="model",
    )
    artifact.add_dir(checkpoint_dir)
    run.log_artifact(artifact)
    logger.info("logged checkpoint artifact %s", artifact.name)
