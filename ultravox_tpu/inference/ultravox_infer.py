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

    Supports local paths, ``hf://repo``, and
    ``wandb://entity/project/artifact:vN`` (downloads when the environment
    has egress + credentials — reference: model/file_utils.py:5-21,
    wandb_utils.py:10-52).
    """
    from ultravox_tpu.utils import wandb_utils

    if wandb_utils.is_wandb_url(path):
        return wandb_utils.download_model_from_wandb(path)
    if path.startswith("hf://"):
        from huggingface_hub import snapshot_download

        return snapshot_download(path[len("hf://"):])
    if os.path.isdir(path):
        return path
    raise FileNotFoundError(f"checkpoint {path!r} not found")


def load_ultravox_checkpoint(
    model_path: str,
    dtype=jnp.bfloat16,
    *,
    seed: int = 0,
    strict: bool = True,
):
    """Resolve + load a published Ultravox checkpoint into (cfg, params, dir).

    Load order matches the reference's construct-then-load_state_dict
    semantics (ultravox_infer.py:55-64, model_types.py:227-282): sub-model
    *base* weights referenced by ``text_model_id``/``audio_model_id`` load
    first, then the checkpoint state dict is applied LAST so trained /
    LoRA-merged tower weights in a full checkpoint win over the bases.

    With ``strict`` (default), raises when the language model or audio tower
    would be left at random init — a diff (adapter-only) checkpoint without
    resolvable base models must fail loudly, not serve garbage.
    """
    import jax

    model_dir = resolve_checkpoint(model_path)
    cfg = UltravoxConfig.from_pretrained_dir(model_dir)
    params = uv.init_params(cfg, jax.random.key(seed), dtype)
    have_lm = have_enc = False

    # 1) base sub-model weights referenced by id (diff checkpoints)
    if cfg.text_model_id and os.path.isdir(cfg.text_model_id):
        sub_sd = weights_lib.load_safetensors_dir(cfg.text_model_id)
        if sub_sd:
            params["language_model"] = weights_lib.convert_decoder(
                sub_sd, cfg.text_config, dtype
            )
            have_lm = True
    if cfg.audio_model_id and os.path.isdir(cfg.audio_model_id):
        sub_sd = weights_lib.load_safetensors_dir(cfg.audio_model_id)
        tower = weights_lib.convert_audio_tower_checkpoint(
            sub_sd, cfg.audio_config, dtype
        )
        if tower is not None:
            params["audio_tower"] = tower
            have_enc = True

    # 2) the checkpoint itself, LAST (wins over the bases)
    sd = weights_lib.load_safetensors_dir(model_dir)
    lm_sd = {k for k in sd if k.startswith("language_model.")}
    enc_sd = {k for k in sd if k.startswith("audio_tower.")}
    have_lm = have_lm or weights_lib._covers_decoder(
        {k[len("language_model."):]: sd[k] for k in lm_sd}, cfg.text_config
    )
    have_enc = have_enc or weights_lib._covers_encoder(
        {k[len("audio_tower."):]: sd[k] for k in enc_sd}, cfg.audio_config
    )
    have_proj = any(k.startswith("multi_modal_projector.") for k in sd)
    params = weights_lib.convert_ultravox(sd, cfg, dtype, base=params)

    if strict:
        missing = [
            name
            for name, ok in (
                ("language_model", have_lm),
                ("audio_tower", have_enc or cfg.llm_only_training),
                ("multi_modal_projector", have_proj or cfg.llm_only_training),
            )
            if not ok
        ]
        if missing:
            raise ValueError(
                f"checkpoint {model_dir!r} leaves {missing} at random init: "
                "the state dict does not cover them and no local "
                "text_model_id/audio_model_id base resolves. Refusing to "
                "load (pass strict=False to override)."
            )
    return cfg, params, model_dir


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
        strict: bool = True,
        quantize: Optional[str] = None,
    ):
        import transformers

        cfg, params, model_dir = load_ultravox_checkpoint(
            model_path, dtype, strict=strict
        )

        if mesh is not None:
            from ultravox_tpu.parallel import shard_params

            params = shard_params(params, mesh)

        tokenizer = transformers.AutoTokenizer.from_pretrained(model_dir)
        tokenizer.padding_side = "right"
        if tokenizer.pad_token_id is None:
            tokenizer.pad_token = tokenizer.eos_token
        processor = UltravoxProcessor(
            tokenizer,
            num_mel_bins=getattr(cfg.audio_config, "num_mel_bins", 80),
            stack_factor=cfg.stack_factor,
            audio_arch=cfg.audio_arch,
            wav2vec2_config=(
                cfg.audio_config if cfg.audio_arch == "wav2vec2" else None
            ),
        )
        super().__init__(
            params,
            cfg,
            processor,
            max_cache_len=max_cache_len,
            conversation_mode=conversation_mode,
            cache_dtype=dtype,
            fused_greedy_decode=fused_greedy_decode,
            quantize=quantize if mesh is None else None,
        )
