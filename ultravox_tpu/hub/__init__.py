"""Standalone torch model code shipped INTO published checkpoints.

These files are copied verbatim into every published repo (auto_map in
config.json points at them) so a checkpoint loads with
``transformers.AutoModel.from_pretrained(repo, trust_remote_code=True)``
with no extra package installed — the role the reference fills by syncing
its ultravox_*.py files into each repo
(reference: tools/update_hf_models.py:21-47).

The implementations here are torch transcriptions of this framework's own
JAX modules (models/projector.py, models/whisper_encoder.py,
models/ultravox.py) against the checkpoint key layout emitted by
tools/publish.py — NOT copies of the reference's model code.
"""

import os

HUB_CODE_DIR = os.path.dirname(os.path.abspath(__file__))
HUB_CODE_FILES = (
    "ultravox_config.py",
    "ultravox_model.py",
    "ultravox_processing.py",
    "ultravox_tokenizer.py",
    "ultravox_pipeline.py",
)

AUTO_MAP = {
    "AutoConfig": "ultravox_config.UltravoxConfig",
    "AutoModel": "ultravox_model.UltravoxModel",
    "AutoProcessor": "ultravox_processing.UltravoxProcessor",
}
