"""Checkpoint publishing: full HF-layout export and hub upload.

Re-design of the reference's ``tools/push_to_hub.py``: writes a checkpoint
directory (config.json + model.safetensors + tokenizer files) in the fixie
naming scheme so both this framework (``UltravoxInference``) and the
reference implementation can load it.

Verification caveat (honest scope): published directories are crosschecked
against the reference's own mounted model code — our checkpoints load in the
reference ``UltravoxModel`` with matching fp32 logits
(tests/test_reference_crosscheck.py) and, with ``include_code=True``, via
``trust_remote_code`` through the shipped standalone torch modules
(ultravox_tpu/hub/). What is NOT verified here is vLLM servability (the
reference ecosystem's other consumer, reference
``tools/update_vllm_impl.py``): vLLM's ultravox plugin cannot be exercised
in this zero-egress build environment. The exported layout matches what the
reference publishes (same tensor names, config keys, and processor/tokenizer
files), so vLLM is *expected* to load it, but that edge is untested — if you
serve published checkpoints with vLLM, smoke-test one generation first.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Optional

import numpy as np

import jax

from ultravox_tpu.models import weights as weights_lib
from ultravox_tpu.models.config import UltravoxConfig


def config_to_hf_dict(cfg: UltravoxConfig) -> dict:
    audio = cfg.audio_config
    text = cfg.text_config
    if cfg.audio_arch == "wav2vec2":
        audio_dict = {
            "model_type": "wav2vec2",
            "_name_or_path": cfg.audio_model_id or "wav2vec2-encoder",
            "hidden_size": audio.hidden_size,
            "num_hidden_layers": audio.num_layers,
            "num_attention_heads": audio.num_heads,
            "intermediate_size": audio.ffn_dim,
            "conv_dim": list(audio.conv_dim),
            "conv_kernel": list(audio.conv_kernel),
            "conv_stride": list(audio.conv_stride),
            "conv_bias": audio.conv_bias,
            "feat_extract_norm": audio.feat_extract_norm,
            "do_stable_layer_norm": audio.do_stable_layer_norm,
            "num_conv_pos_embeddings": audio.num_conv_pos_embeddings,
            "num_conv_pos_embedding_groups": audio.num_conv_pos_embedding_groups,
            "layer_norm_eps": audio.layer_norm_eps,
        }
        return {
            "model_type": "ultravox",
            "audio_model_id": cfg.audio_model_id,
            "text_model_id": cfg.text_model_id,
            "ignore_index": cfg.ignore_index,
            "audio_token_index": cfg.audio_token_index,
            "hidden_size": cfg.hidden_size,
            "stack_factor": cfg.stack_factor,
            "norm_init": cfg.norm_init,
            "projector_act": cfg.projector_act,
            "projector_ln_mid": cfg.projector_ln_mid,
            "audio_latency_block_size": cfg.audio_latency_block_size,
            "llm_only_training": cfg.llm_only_training,
            "audio_config": audio_dict,
            "text_config": _text_config_to_hf(text),
        }
    return {
        "model_type": "ultravox",
        "audio_model_id": cfg.audio_model_id,
        "text_model_id": cfg.text_model_id,
        "ignore_index": cfg.ignore_index,
        "audio_token_index": cfg.audio_token_index,
        "hidden_size": cfg.hidden_size,
        "stack_factor": cfg.stack_factor,
        "norm_init": cfg.norm_init,
        "projector_act": cfg.projector_act,
        "projector_ln_mid": cfg.projector_ln_mid,
        "audio_latency_block_size": cfg.audio_latency_block_size,
        "llm_only_training": cfg.llm_only_training,
        "audio_config": {
            "model_type": "whisper",
            # the reference selects its ModifiedWhisperEncoder path by
            # substring-matching _name_or_path (ultravox_model.py:470)
            "_name_or_path": cfg.audio_model_id or "whisper-encoder",
            "num_mel_bins": audio.num_mel_bins,
            "d_model": audio.d_model,
            "encoder_layers": audio.num_layers,
            "encoder_attention_heads": audio.num_heads,
            "encoder_ffn_dim": audio.ffn_dim,
            # decoder dims kept consistent so a full WhisperModel is also
            # constructible from this config
            "decoder_layers": audio.num_layers,
            "decoder_attention_heads": audio.num_heads,
            "decoder_ffn_dim": audio.ffn_dim,
            "max_source_positions": audio.max_source_positions,
            "activation_function": audio.activation,
        },
        "text_config": _text_config_to_hf(text),
    }


def _text_config_to_hf(text) -> dict:
    """Full DecoderConfig -> HF config.json dict round-trip (everything
    DecoderConfig.from_hf_dict reads must be written)."""
    out = {
        "model_type": text.arch if text.arch != "gemma3" else "gemma3_text",
        "vocab_size": text.vocab_size,
        "hidden_size": text.hidden_size,
        "intermediate_size": text.intermediate_size,
        "num_hidden_layers": text.num_layers,
        "num_attention_heads": text.num_heads,
        "num_key_value_heads": text.num_kv_heads,
        "head_dim": text.head_dim,
        "rms_norm_eps": text.rms_norm_eps,
        "rope_theta": text.rope_theta,
        "max_position_embeddings": text.max_position_embeddings,
        "tie_word_embeddings": text.tie_word_embeddings,
        "attention_bias": text.attention_bias,
        "hidden_act": text.hidden_act,
        "sliding_window": text.sliding_window,
        "sliding_window_pattern": text.sliding_window_pattern,
        "layer_types": (
            [
                "sliding_attention" if loc else "full_attention"
                for loc in text.layer_is_local
            ]
            if text.layer_is_local is not None
            else None
        ),
        "query_pre_attn_scalar": text.query_pre_attn_scalar,
        "rope_local_base_freq": text.rope_local_base_freq,
        "final_logit_softcapping": text.final_logit_softcapping,
        "attn_logit_softcapping": text.attn_logit_softcapping,
    }
    if text.rope_scaling is not None:
        factor, low_ff, high_ff, orig_max = text.rope_scaling
        out["rope_scaling"] = {
            "rope_type": "llama3",
            "factor": factor,
            "low_freq_factor": low_ff,
            "high_freq_factor": high_ff,
            "original_max_position_embeddings": orig_max,
        }
    return out


def save_pretrained(
    params: Any,
    cfg: UltravoxConfig,
    out_dir: str,
    tokenizer=None,
    *,
    diff_only: bool = False,
    include_code: bool = False,
) -> str:
    """Write a loadable checkpoint directory. ``diff_only`` saves just the
    projector (adapter-sized, reference diff_state_dict semantics).
    ``include_code`` additionally ships the standalone torch model code
    (ultravox_tpu/hub) plus auto_map entries, so the directory loads with
    ``AutoModel.from_pretrained(dir, trust_remote_code=True)`` with only
    transformers installed (the reference syncs its ultravox_*.py the same
    way, tools/update_hf_models.py:21-27)."""
    import safetensors.numpy

    from ultravox_tpu.models.lora import merge_lora

    # fold any LoRA adapters into the kernels before publishing (reference
    # merges via merge_and_unload before push_to_hub, ultravox_model.py:561)
    params = merge_lora(params)
    os.makedirs(out_dir, exist_ok=True)
    hf_dict = config_to_hf_dict(cfg)
    if include_code:
        import shutil

        from ultravox_tpu import hub

        hf_dict["auto_map"] = dict(hub.AUTO_MAP)
        for fname in hub.HUB_CODE_FILES:
            shutil.copyfile(
                os.path.join(hub.HUB_CODE_DIR, fname),
                os.path.join(out_dir, fname),
            )
    with open(os.path.join(out_dir, "config.json"), "w") as f:
        json.dump(hf_dict, f, indent=2)

    sd: dict = {}
    if "projector" in params:
        for k, v in weights_lib.projector_to_hf(params["projector"]).items():
            sd[f"multi_modal_projector.{k}"] = v
    if not diff_only:
        if "language_model" in params:
            for k, v in weights_lib.decoder_to_hf(
                params["language_model"], cfg.text_config
            ).items():
                sd[f"language_model.{k}"] = v
        if "audio_tower" in params:
            enc_to_hf = (
                _wav2vec2_to_hf if cfg.audio_arch == "wav2vec2" else _encoder_to_hf
            )
            for k, v in enc_to_hf(params["audio_tower"], cfg).items():
                sd[f"audio_tower.{k}"] = v
    sd = {k: np.ascontiguousarray(v) for k, v in sd.items()}
    safetensors.numpy.save_file(sd, os.path.join(out_dir, "model.safetensors"))
    if tokenizer is not None:
        tokenizer.save_pretrained(out_dir)
    return out_dir


def _encoder_to_hf(params: Any, cfg: UltravoxConfig) -> dict:
    out = {}
    L = cfg.audio_config.num_layers

    def unstack(pattern, arr, transpose=False):
        a = np.asarray(jax.device_get(arr), np.float32)
        for i in range(L):
            out[pattern.format(i=i)] = a[i].T if transpose else a[i]

    out["conv1.weight"] = np.asarray(params["conv1"]["kernel"], np.float32).transpose(2, 1, 0)
    out["conv1.bias"] = np.asarray(params["conv1"]["bias"], np.float32)
    out["conv2.weight"] = np.asarray(params["conv2"]["kernel"], np.float32).transpose(2, 1, 0)
    out["conv2.bias"] = np.asarray(params["conv2"]["bias"], np.float32)
    out["embed_positions.weight"] = np.asarray(params["embed_positions"], np.float32)
    out["layer_norm.weight"] = np.asarray(params["layer_norm"]["scale"], np.float32)
    out["layer_norm.bias"] = np.asarray(params["layer_norm"]["bias"], np.float32)
    ly = params["layers"]
    for hf, mine, bias in [
        ("self_attn.q_proj", "q_proj", True),
        ("self_attn.k_proj", "k_proj", False),
        ("self_attn.v_proj", "v_proj", True),
        ("self_attn.out_proj", "out_proj", True),
        ("fc1", "fc1", True),
        ("fc2", "fc2", True),
    ]:
        unstack("layers.{i}." + hf + ".weight", ly[mine]["kernel"], transpose=True)
        if bias:
            unstack("layers.{i}." + hf + ".bias", ly[mine]["bias"])
    for hf, mine in [
        ("self_attn_layer_norm", "attn_ln"),
        ("final_layer_norm", "final_ln"),
    ]:
        unstack("layers.{i}." + hf + ".weight", ly[mine]["scale"])
        unstack("layers.{i}." + hf + ".bias", ly[mine]["bias"])
    return out


def _wav2vec2_to_hf(params: Any, cfg: UltravoxConfig) -> dict:
    """Reverse of weights.convert_wav2vec2_encoder (HF Wav2Vec2Model naming).
    The weight-normalised pos-conv is exported as weight_v = kernel,
    weight_g = ||kernel|| so g·v/||v|| reproduces the kernel exactly."""
    audio = cfg.audio_config
    out: dict = {}
    for i, conv in enumerate(params["feature_extractor"]):
        stem = f"feature_extractor.conv_layers.{i}"
        out[f"{stem}.conv.weight"] = np.asarray(
            conv["kernel"], np.float32
        ).transpose(2, 1, 0)
        if "bias" in conv:
            out[f"{stem}.conv.bias"] = np.asarray(conv["bias"], np.float32)
        if "norm" in conv:
            out[f"{stem}.layer_norm.weight"] = np.asarray(
                conv["norm"]["scale"], np.float32
            )
            out[f"{stem}.layer_norm.bias"] = np.asarray(
                conv["norm"]["bias"], np.float32
            )
    fp = params["feature_projection"]
    out["feature_projection.layer_norm.weight"] = np.asarray(fp["ln"]["scale"], np.float32)
    out["feature_projection.layer_norm.bias"] = np.asarray(fp["ln"]["bias"], np.float32)
    out["feature_projection.projection.weight"] = np.asarray(
        fp["projection"]["kernel"], np.float32
    ).T
    out["feature_projection.projection.bias"] = np.asarray(
        fp["projection"]["bias"], np.float32
    )
    pos_kernel = np.asarray(params["pos_conv"]["kernel"], np.float32).transpose(2, 1, 0)
    norm = np.sqrt((pos_kernel**2).sum(axis=(0, 1), keepdims=True))
    out["encoder.pos_conv_embed.conv.weight_v"] = pos_kernel
    out["encoder.pos_conv_embed.conv.weight_g"] = norm
    out["encoder.pos_conv_embed.conv.bias"] = np.asarray(
        params["pos_conv"]["bias"], np.float32
    )
    out["encoder.layer_norm.weight"] = np.asarray(params["encoder_ln"]["scale"], np.float32)
    out["encoder.layer_norm.bias"] = np.asarray(params["encoder_ln"]["bias"], np.float32)
    ly = params["layers"]
    L = audio.num_layers

    def unstack(pattern, arr, transpose=False):
        a = np.asarray(jax.device_get(arr), np.float32)
        for i in range(L):
            out[pattern.format(i=i)] = a[i].T if transpose else a[i]

    for hf, mine in [
        ("attention.q_proj", "q_proj"), ("attention.k_proj", "k_proj"),
        ("attention.v_proj", "v_proj"), ("attention.out_proj", "out_proj"),
        ("feed_forward.intermediate_dense", "fc1"),
        ("feed_forward.output_dense", "fc2"),
    ]:
        unstack("encoder.layers.{i}." + hf + ".weight", ly[mine]["kernel"], True)
        unstack("encoder.layers.{i}." + hf + ".bias", ly[mine]["bias"])
    for hf, mine in [("layer_norm", "attn_ln"), ("final_layer_norm", "final_ln")]:
        unstack("encoder.layers.{i}." + hf + ".weight", ly[mine]["scale"])
        unstack("encoder.layers.{i}." + hf + ".bias", ly[mine]["bias"])
    return out


def push_to_hub(checkpoint_dir: str, repo_id: str, private: bool = True) -> None:
    """Upload a saved checkpoint dir to the HF Hub (requires egress +
    credentials; reference: tools/push_to_hub.py)."""
    from huggingface_hub import HfApi

    api = HfApi()
    api.create_repo(repo_id, private=private, exist_ok=True)
    api.upload_folder(folder_path=checkpoint_dir, repo_id=repo_id)
