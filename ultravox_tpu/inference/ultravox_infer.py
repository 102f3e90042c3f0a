"""UltravoxInference: checkpoint resolution + engine assembly
(reference: inference/ultravox_infer.py:15-98).

Loads a published Ultravox checkpoint directory (config.json + safetensors +
tokenizer) into a ``LocalInference`` engine, optionally sharded over a mesh.
"""

from __future__ import annotations

import logging
import os
from typing import Optional

import jax.numpy as jnp

from ultravox_tpu.inference.infer import LocalInference
from ultravox_tpu.models import weights as weights_lib
from ultravox_tpu.models import ultravox as uv
from ultravox_tpu.models.config import UltravoxConfig
from ultravox_tpu.models.processor import UltravoxProcessor

logger = logging.getLogger(__name__)


def resolve_checkpoint(path: str) -> str:
    """Resolve a checkpoint reference to a local directory.

    Supports local paths and ``hf://repo`` (downloads when the environment
    has egress — reference: model/file_utils.py:5-21; wandb:// artifact
    resolution is not supported on the TPU build).
    """
    if path.startswith("hf://"):
        from huggingface_hub import snapshot_download

        return snapshot_download(path[len("hf://"):])
    if os.path.isdir(path):
        return path
    raise FileNotFoundError(f"checkpoint {path!r} not found")


class UltravoxInference(LocalInference):
    def __init__(
        self,
        model_path: str,
        *,
        dtype=jnp.bfloat16,
        max_cache_len: int = 4096,
        conversation_mode: bool = False,
        mesh=None,
        fused_greedy_decode: bool = False,
    ):
        import transformers

        model_dir = resolve_checkpoint(model_path)
        cfg = UltravoxConfig.from_pretrained_dir(model_dir)
        params = uv.init_params(cfg, __import__("jax").random.key(0), dtype)
        sd = weights_lib.load_safetensors_dir(model_dir)
        params = weights_lib.convert_ultravox(sd, cfg, dtype, base=params)

        # sub-model weights referenced by id (diff checkpoints)
        for attr, key, convert in (
            ("text_model_id", "language_model", None),
            ("audio_model_id", "audio_tower", None),
        ):
            model_id = getattr(cfg, attr)
            if model_id and os.path.isdir(model_id):
                sub_sd = weights_lib.load_safetensors_dir(model_id)
                if key == "language_model":
                    params[key] = weights_lib.convert_decoder(
                        sub_sd, cfg.text_config, dtype
                    )
                else:
                    for prefix in ("model.encoder.", "encoder.", ""):
                        sub = {
                            k[len(prefix):]: v
                            for k, v in sub_sd.items()
                            if k.startswith(prefix)
                        }
                        if "conv1.weight" in sub:
                            params[key] = weights_lib.convert_whisper_encoder(
                                sub, cfg.audio_config, dtype
                            )
                            break

        if mesh is not None:
            from ultravox_tpu.parallel import shard_params

            params = shard_params(params, mesh)

        tokenizer = transformers.AutoTokenizer.from_pretrained(model_dir)
        tokenizer.padding_side = "right"
        if tokenizer.pad_token_id is None:
            tokenizer.pad_token = tokenizer.eos_token
        processor = UltravoxProcessor(
            tokenizer,
            num_mel_bins=cfg.audio_config.num_mel_bins,
            stack_factor=cfg.stack_factor,
        )
        super().__init__(
            params,
            cfg,
            processor,
            max_cache_len=max_cache_len,
            conversation_mode=conversation_mode,
            cache_dtype=dtype,
            fused_greedy_decode=fused_greedy_decode,
        )
