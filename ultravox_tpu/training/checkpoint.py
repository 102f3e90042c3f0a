"""Checkpointing: adapter-sized diff checkpoints + resume.

Re-design of the reference's checkpoint story (SURVEY.md §5): the reference
saves a *diff state dict* — only trainable/explicitly-loaded params — so
checkpoints are adapter-sized (ultravox_model.py:565-591), with resume
handled by HF Trainer. Here:

- ``save_checkpoint`` writes the TrainState's trainable subtree + optimizer
  state + step with orbax (the frozen backbone is NOT saved — it reloads from
  its source checkpoint);
- ``restore_checkpoint`` restores into a same-shaped TrainState;
- ``export_safetensors`` writes the trainable subtree in HF/fixie naming so
  the reference implementation can load it (push-to-hub parity).
"""

from __future__ import annotations

import os
import re
from typing import Any, Dict, Optional

import jax
import numpy as np

from ultravox_tpu.training.train_step import TrainState


def _ckpt_dir(base: str, step: int) -> str:
    return os.path.join(os.path.abspath(base), f"checkpoint-{step}")


def save_checkpoint(base_dir: str, state: TrainState) -> str:
    import orbax.checkpoint as ocp

    step = int(state.step)
    path = _ckpt_dir(base_dir, step)
    if os.path.exists(path):  # idempotent per step (e.g. save_steps + final)
        return path
    ckptr = ocp.StandardCheckpointer()
    payload = {
        "step": np.asarray(step),
        "trainable": dict(state.trainable),
        "opt_state": state.opt_state,
    }
    ckptr.save(path, payload)
    ckptr.wait_until_finished()
    return path


def latest_checkpoint(base_dir: str) -> Optional[str]:
    if not os.path.isdir(base_dir):
        return None
    best, best_step = None, -1
    for name in os.listdir(base_dir):
        m = re.fullmatch(r"checkpoint-(\d+)", name)
        if m and int(m.group(1)) > best_step:
            best, best_step = os.path.join(base_dir, name), int(m.group(1))
    return best


def restore_checkpoint(path: str, state: TrainState) -> TrainState:
    """Restore into the (abstract or concrete) structure of ``state``."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    template = {
        "step": np.asarray(0),
        "trainable": dict(state.trainable),
        "opt_state": state.opt_state,
    }
    restored = ckptr.restore(path, target=template)
    import jax.numpy as jnp

    return TrainState(
        step=jnp.asarray(int(restored["step"]), jnp.int32),
        trainable=restored["trainable"],
        frozen=state.frozen,
        opt_state=restored["opt_state"],
    )


# -- HF-compatible export ----------------------------------------------------

_EXPORT_MAP = [
    # (our flat-path regex, hf renamer)
    (
        r"projector/ln_pre",
        lambda m, i=None: "multi_modal_projector.ln_pre.weight",
    ),
    (
        r"projector/ln_mid",
        lambda m, i=None: "multi_modal_projector.ln_mid.weight",
    ),
    (
        r"projector/ln_post",
        lambda m, i=None: "multi_modal_projector.ln_post.weight",
    ),
]


def export_safetensors(state_or_params: Any, out_path: str) -> Dict[str, Any]:
    """Write the trainable subtree as an HF-naming safetensors file the
    reference can load (projector keys under ``multi_modal_projector.``)."""
    import safetensors.numpy

    if isinstance(state_or_params, TrainState):
        flat = dict(state_or_params.trainable)
    else:
        flat = state_or_params

    import logging

    out: Dict[str, np.ndarray] = {}
    skipped = []
    for path, leaf in flat.items():
        # only the projector subtree has a faithful HF-name mapping here;
        # layer-stacked decoder/encoder leaves and LoRA factors need the full
        # un-stacking export in tools/publish.save_pretrained
        if not path.startswith("projector/"):
            skipped.append(path)
            continue
        arr = np.asarray(jax.device_get(leaf), dtype=np.float32)
        name = _hf_name(path)
        if name.endswith((".linear_1.weight", ".linear_2.weight")):
            arr = arr.T  # our kernels are (in, out); HF stores (out, in)
        out[name] = arr
    if skipped:
        logging.getLogger(__name__).warning(
            "export_safetensors: %d non-projector trainable leaves not "
            "exported in HF naming (use tools.publish.save_pretrained for a "
            "full checkpoint): %s", len(skipped), skipped[:4],
        )
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    safetensors.numpy.save_file(out, out_path)
    return out


def _hf_name(path: str) -> str:
    """Map our flat param path to the reference's state-dict name."""
    name = path
    name = name.replace("projector/", "multi_modal_projector.")
    name = name.replace("audio_tower/", "audio_tower.")
    name = name.replace("language_model/", "language_model.model.")
    name = name.replace("/kernel", ".weight").replace("/bias", ".bias")
    name = name.replace("/", ".")
    if name.startswith("multi_modal_projector.") and not name.endswith(
        (".weight", ".bias")
    ):
        name = name + ".weight"  # bare rmsnorm leaves
    return name
