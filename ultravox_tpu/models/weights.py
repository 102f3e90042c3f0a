"""HF checkpoint ↔ JAX parameter-tree conversion.

The parity anchor of the framework: fixie-ai Ultravox checkpoints (and the
underlying Whisper / Llama / Mistral / Gemma / Qwen checkpoints) load into the
stacked-layer pytrees used by ``ultravox_tpu.models.*`` with fp32
bit-comparable outputs.

Works from a flat ``{name: np.ndarray}`` state dict, which can come from
- safetensors files in a checkpoint directory (``load_safetensors_dir``), or
- an in-memory torch ``state_dict()`` (tests), via ``from_torch_state_dict``.

Linear weights are transposed from torch's (out, in) to (in, out); per-layer
tensors are stacked on a leading layer axis for ``lax.scan``.
"""

from __future__ import annotations

import json
import logging
import os
import re
from typing import Any, Callable, Dict, Optional

import jax.numpy as jnp
import numpy as np

from ultravox_tpu.models.config import DecoderConfig, UltravoxConfig, WhisperEncoderConfig

logger = logging.getLogger(__name__)

FlatDict = Dict[str, np.ndarray]
Params = Dict[str, Any]


def load_safetensors_dir(model_dir: str) -> FlatDict:
    """Load all ``*.safetensors`` in a checkpoint dir into one flat dict."""
    from safetensors import safe_open

    index_path = os.path.join(model_dir, "model.safetensors.index.json")
    if os.path.exists(index_path):
        with open(index_path) as f:
            index = json.load(f)
        files = sorted(set(index["weight_map"].values()))
    else:
        files = sorted(
            f for f in os.listdir(model_dir) if f.endswith(".safetensors")
        )
    out: FlatDict = {}
    for fname in files:
        with safe_open(os.path.join(model_dir, fname), framework="np") as f:
            for key in f.keys():
                out[key] = f.get_tensor(key)
    return out


def from_torch_state_dict(state_dict) -> FlatDict:
    return {k: v.float().numpy() for k, v in state_dict.items()}


def _strip_prefix(sd: FlatDict, prefix: str) -> FlatDict:
    return {
        k[len(prefix) :]: v for k, v in sd.items() if k.startswith(prefix)
    }


class _Reader:
    """Flat-dict reader with dtype casting and layer stacking."""

    def __init__(self, sd: FlatDict, dtype):
        self.sd = sd
        self.dtype = dtype

    def __call__(self, name: str, transpose: bool = False):
        arr = self.sd[name]
        if transpose:
            arr = arr.T
        return jnp.asarray(arr, dtype=self.dtype)

    def has(self, name: str) -> bool:
        return name in self.sd

    def stack(self, pattern: str, num_layers: int, transpose: bool = False):
        arrs = []
        for i in range(num_layers):
            a = self.sd[pattern.format(i=i)]
            arrs.append(a.T if transpose else a)
        return jnp.asarray(np.stack(arrs), dtype=self.dtype)


def convert_whisper_encoder(
    sd: FlatDict, cfg: WhisperEncoderConfig, dtype=jnp.float32
) -> Params:
    """HF WhisperEncoder state dict (keys like ``conv1.weight``,
    ``layers.0.self_attn.q_proj.weight``) -> encoder param tree."""
    r = _Reader(sd, dtype)
    L = cfg.num_layers

    def ln(stem):
        return {
            "scale": r.stack(stem + ".weight", L),
            "bias": r.stack(stem + ".bias", L),
        }

    def lin(stem, bias=True):
        p = {"kernel": r.stack(stem + ".weight", L, transpose=True)}
        if bias:
            p["bias"] = r.stack(stem + ".bias", L)
        return p

    return {
        # torch Conv1d weight (out, in, k) -> lax 'HIO' (k, in, out)
        "conv1": {
            "kernel": r("conv1.weight").transpose(2, 1, 0),
            "bias": r("conv1.bias"),
        },
        "conv2": {
            "kernel": r("conv2.weight").transpose(2, 1, 0),
            "bias": r("conv2.bias"),
        },
        "embed_positions": r("embed_positions.weight"),
        "layers": {
            "attn_ln": ln("layers.{i}.self_attn_layer_norm"),
            "q_proj": lin("layers.{i}.self_attn.q_proj"),
            "k_proj": lin("layers.{i}.self_attn.k_proj", bias=False),
            "v_proj": lin("layers.{i}.self_attn.v_proj"),
            "out_proj": lin("layers.{i}.self_attn.out_proj"),
            "final_ln": ln("layers.{i}.final_layer_norm"),
            "fc1": lin("layers.{i}.fc1"),
            "fc2": lin("layers.{i}.fc2"),
        },
        "layer_norm": {
            "scale": r("layer_norm.weight"),
            "bias": r("layer_norm.bias"),
        },
    }


def convert_wav2vec2_encoder(sd: FlatDict, cfg, dtype=jnp.float32) -> Params:
    """HF Wav2Vec2Model state dict (prefix stripped — keys like
    ``feature_extractor.conv_layers.0.conv.weight``) -> wav2vec2 encoder
    param tree (models/wav2vec2_encoder.py)."""
    r = _Reader(sd, dtype)
    L = cfg.num_layers

    convs = []
    for i in range(len(cfg.conv_dim)):
        stem = f"feature_extractor.conv_layers.{i}"
        conv: Params = {
            # torch Conv1d (out, in, k) -> lax WIO (k, in, out)
            "kernel": r(f"{stem}.conv.weight").transpose(2, 1, 0)
        }
        if f"{stem}.conv.bias" in sd:
            conv["bias"] = r(f"{stem}.conv.bias")
        if f"{stem}.layer_norm.weight" in sd:
            conv["norm"] = {
                "scale": r(f"{stem}.layer_norm.weight"),
                "bias": r(f"{stem}.layer_norm.bias"),
            }
        convs.append(conv)

    # weight-normalised positional conv: weight = g * v / ||v||_(dims 0,1)
    # (torch weight_norm dim=2); keys are weight_g/weight_v or the newer
    # parametrizations.weight.original0/original1
    pc = "encoder.pos_conv_embed.conv"
    if f"{pc}.weight_g" in sd:
        g, v = sd[f"{pc}.weight_g"], sd[f"{pc}.weight_v"]
    else:
        g = sd[f"{pc}.parametrizations.weight.original0"]
        v = sd[f"{pc}.parametrizations.weight.original1"]
    norm = np.sqrt((v.astype(np.float64) ** 2).sum(axis=(0, 1), keepdims=True))
    pos_kernel = (g * v / np.maximum(norm, 1e-12)).astype(np.float32)

    def ln(stem):
        return {"scale": r.stack(stem + ".weight", L),
                "bias": r.stack(stem + ".bias", L)}

    def lin(stem):
        return {"kernel": r.stack(stem + ".weight", L, transpose=True),
                "bias": r.stack(stem + ".bias", L)}

    return {
        "feature_extractor": convs,
        "feature_projection": {
            "ln": {
                "scale": r("feature_projection.layer_norm.weight"),
                "bias": r("feature_projection.layer_norm.bias"),
            },
            "projection": {
                "kernel": r("feature_projection.projection.weight", transpose=True),
                "bias": r("feature_projection.projection.bias"),
            },
        },
        "pos_conv": {
            "kernel": jnp.asarray(pos_kernel.transpose(2, 1, 0), dtype),
            "bias": r(f"{pc}.bias"),
        },
        "encoder_ln": {
            "scale": r("encoder.layer_norm.weight"),
            "bias": r("encoder.layer_norm.bias"),
        },
        "layers": {
            "attn_ln": ln("encoder.layers.{i}.layer_norm"),
            "q_proj": lin("encoder.layers.{i}.attention.q_proj"),
            "k_proj": lin("encoder.layers.{i}.attention.k_proj"),
            "v_proj": lin("encoder.layers.{i}.attention.v_proj"),
            "out_proj": lin("encoder.layers.{i}.attention.out_proj"),
            "final_ln": ln("encoder.layers.{i}.final_layer_norm"),
            "fc1": lin("encoder.layers.{i}.feed_forward.intermediate_dense"),
            "fc2": lin("encoder.layers.{i}.feed_forward.output_dense"),
        },
    }


def convert_audio_tower_checkpoint(
    sd: FlatDict, audio_cfg, dtype=jnp.float32
) -> Optional[Params]:
    """Standalone audio-model checkpoint -> tower params, handling the
    common key prefixes (WhisperModel nests the encoder under
    ``model.encoder.``; Wav2Vec2ForCTC under ``wav2vec2.``). Returns None
    when the state dict doesn't look like the configured tower."""
    if type(audio_cfg).__name__ == "Wav2Vec2EncoderConfig":
        for prefix in ("wav2vec2.", ""):
            sub = _strip_prefix(sd, prefix) if prefix else sd
            if "feature_extractor.conv_layers.0.conv.weight" in sub:
                return convert_wav2vec2_encoder(sub, audio_cfg, dtype)
        return None
    for prefix in ("model.encoder.", "encoder.", ""):
        sub = _strip_prefix(sd, prefix) if prefix else sd
        if "conv1.weight" in sub:
            return convert_whisper_encoder(sub, audio_cfg, dtype)
    return None


def convert_decoder(
    sd: FlatDict, cfg: DecoderConfig, dtype=jnp.float32
) -> Params:
    """HF CausalLM state dict (``model.embed_tokens.weight``,
    ``model.layers.{i}...``, ``lm_head.weight``) -> decoder param tree."""
    r = _Reader(sd, dtype)
    L = cfg.num_layers
    pre = "model."

    def lin(stem, bias=False):
        p = {"kernel": r.stack(pre + stem + ".weight", L, transpose=True)}
        if bias and r.has(pre + stem.format(i=0) + ".bias"):
            p["bias"] = r.stack(pre + stem + ".bias", L)
        return p

    layers: Params = {
        "input_ln": r.stack(pre + "layers.{i}.input_layernorm.weight", L),
        "q_proj": lin("layers.{i}.self_attn.q_proj", bias=cfg.attention_bias),
        "k_proj": lin("layers.{i}.self_attn.k_proj", bias=cfg.attention_bias),
        "v_proj": lin("layers.{i}.self_attn.v_proj", bias=cfg.attention_bias),
        "o_proj": lin("layers.{i}.self_attn.o_proj"),
        "post_attn_ln": r.stack(
            pre + "layers.{i}.post_attention_layernorm.weight", L
        ),
        "gate_proj": lin("layers.{i}.mlp.gate_proj"),
        "up_proj": lin("layers.{i}.mlp.up_proj"),
        "down_proj": lin("layers.{i}.mlp.down_proj"),
    }
    if cfg.qk_norm:
        layers["q_norm"] = r.stack(pre + "layers.{i}.self_attn.q_norm.weight", L)
        layers["k_norm"] = r.stack(pre + "layers.{i}.self_attn.k_norm.weight", L)
    if cfg.use_post_norms:
        layers["pre_ffn_ln"] = r.stack(
            pre + "layers.{i}.pre_feedforward_layernorm.weight", L
        )
        layers["post_ffn_ln"] = r.stack(
            pre + "layers.{i}.post_feedforward_layernorm.weight", L
        )

    params: Params = {
        "embed_tokens": r(pre + "embed_tokens.weight"),
        "layers": layers,
        "norm": r(pre + "norm.weight"),
    }
    if not cfg.tie_word_embeddings and "lm_head.weight" in sd:
        params["lm_head"] = {"kernel": r("lm_head.weight", transpose=True)}
    return params


def convert_projector(sd: FlatDict, cfg: UltravoxConfig, dtype=jnp.float32) -> Params:
    """Fixie checkpoint projector keys (``ln_pre.weight``, ``linear_1.weight``,
    ``ln_mid.weight`` / ``ln_post.weight``, ``linear_2.weight``)."""
    r = _Reader(sd, dtype)
    params: Params = {
        "ln_pre": r("ln_pre.weight"),
        "linear_1": {"kernel": r("linear_1.weight", transpose=True)},
        "linear_2": {"kernel": r("linear_2.weight", transpose=True)},
    }
    if "ln_mid.weight" in sd:
        params["ln_mid"] = r("ln_mid.weight")
    if "ln_post.weight" in sd:
        params["ln_post"] = r("ln_post.weight")
    return params


def convert_ultravox(
    sd: FlatDict,
    cfg: UltravoxConfig,
    dtype=jnp.float32,
    *,
    base: Optional[Params] = None,
) -> Params:
    """Convert a fixie-ai Ultravox state dict (possibly a *diff* checkpoint
    holding only trainable params — reference diff_state_dict,
    ultravox_model.py:565-584) into the composite param tree.

    ``base`` provides pre-loaded sub-model params (e.g. the frozen LLM and
    encoder loaded from their own checkpoints); keys present in ``sd``
    override it. A state dict that only *partially* covers a tower (e.g.
    ``unfreeze_layers`` diff checkpoints or selective ``model_load_parameters``)
    is overlaid per-key onto the base tower when one exists, and loudly
    skipped otherwise.
    """
    params: Params = dict(base or {})
    proj_sd = _strip_prefix(sd, "multi_modal_projector.")
    if proj_sd:
        params["projector"] = convert_projector(proj_sd, cfg, dtype)
    audio_sd = _strip_prefix(sd, "audio_tower.")
    if audio_sd:
        if _covers_encoder(audio_sd, cfg.audio_config):
            params["audio_tower"] = (
                convert_wav2vec2_encoder(audio_sd, cfg.audio_config, dtype)
                if cfg.audio_arch == "wav2vec2"
                else convert_whisper_encoder(audio_sd, cfg.audio_config, dtype)
            )
        elif "audio_tower" in params:
            params["audio_tower"] = _overlay_encoder(
                params["audio_tower"], audio_sd, cfg.audio_config, dtype
            )
        else:
            logger.warning(
                "state dict holds %d audio_tower keys that neither cover the "
                "encoder nor have a base to overlay — IGNORED: %s",
                len(audio_sd), sorted(audio_sd)[:8],
            )
    lm_sd = _strip_prefix(sd, "language_model.")
    if lm_sd:
        if _covers_decoder(lm_sd, cfg.text_config):
            params["language_model"] = convert_decoder(
                lm_sd, cfg.text_config, dtype
            )
        elif "language_model" in params:
            params["language_model"] = _overlay_decoder(
                params["language_model"], lm_sd, cfg.text_config, dtype
            )
        else:
            logger.warning(
                "state dict holds %d language_model keys that neither cover "
                "the decoder nor have a base to overlay — IGNORED: %s",
                len(lm_sd), sorted(lm_sd)[:8],
            )
    return params


_DEC_LIN = {
    "self_attn.q_proj": "q_proj", "self_attn.k_proj": "k_proj",
    "self_attn.v_proj": "v_proj", "self_attn.o_proj": "o_proj",
    "mlp.gate_proj": "gate_proj", "mlp.up_proj": "up_proj",
    "mlp.down_proj": "down_proj",
}
_DEC_NORM = {
    "input_layernorm": "input_ln",
    "post_attention_layernorm": "post_attn_ln",
    "pre_feedforward_layernorm": "pre_ffn_ln",
    "post_feedforward_layernorm": "post_ffn_ln",
    "self_attn.q_norm": "q_norm",
    "self_attn.k_norm": "k_norm",
}
_ENC_LIN = {
    "self_attn.q_proj": "q_proj", "self_attn.k_proj": "k_proj",
    "self_attn.v_proj": "v_proj", "self_attn.out_proj": "out_proj",
    "fc1": "fc1", "fc2": "fc2",
}
_ENC_NORM = {"self_attn_layer_norm": "attn_ln", "final_layer_norm": "final_ln"}


def _decoder_key_to_path(name: str):
    """HF decoder key -> (tree path, layer idx or None, 'T' transpose flag)."""
    if name == "model.embed_tokens.weight":
        return ("embed_tokens",), None, False
    if name == "model.norm.weight":
        return ("norm",), None, False
    if name == "lm_head.weight":
        return ("lm_head", "kernel"), None, True
    m = re.match(r"^model\.layers\.(\d+)\.(.+)\.(weight|bias)$", name)
    if not m:
        return None
    idx, stem, leaf = int(m.group(1)), m.group(2), m.group(3)
    if stem in _DEC_NORM and leaf == "weight":
        return ("layers", _DEC_NORM[stem]), idx, False
    if stem in _DEC_LIN:
        sub = "kernel" if leaf == "weight" else "bias"
        return ("layers", _DEC_LIN[stem], sub), idx, leaf == "weight"
    return None


def _encoder_key_to_path(name: str):
    """HF whisper-encoder key -> (path, layer idx, transform in {None,'T','conv'})."""
    if name == "embed_positions.weight":
        return ("embed_positions",), None, None
    m = re.match(r"^(conv[12])\.(weight|bias)$", name)
    if m:
        conv, leaf = m.groups()
        if leaf == "weight":
            return (conv, "kernel"), None, "conv"
        return (conv, "bias"), None, None
    m = re.match(r"^layer_norm\.(weight|bias)$", name)
    if m:
        return ("layer_norm", "scale" if m.group(1) == "weight" else "bias"), None, None
    m = re.match(r"^layers\.(\d+)\.(.+)\.(weight|bias)$", name)
    if not m:
        return None
    idx, stem, leaf = int(m.group(1)), m.group(2), m.group(3)
    if stem in _ENC_NORM:
        return ("layers", _ENC_NORM[stem],
                "scale" if leaf == "weight" else "bias"), idx, None
    if stem in _ENC_LIN:
        sub = "kernel" if leaf == "weight" else "bias"
        return ("layers", _ENC_LIN[stem], sub), idx, "T" if leaf == "weight" else None
    return None


def _tree_set(tree: Params, path, layer_idx, value):
    node = tree
    for p in path[:-1]:
        if p not in node:
            raise KeyError(f"overlay target {'.'.join(path)} absent from base tree")
        node = node[p]
    leaf = path[-1]
    if leaf not in node:
        raise KeyError(f"overlay target {'.'.join(path)} absent from base tree")
    if layer_idx is None:
        node[leaf] = value.astype(node[leaf].dtype)
    else:
        node[leaf] = node[leaf].at[layer_idx].set(value.astype(node[leaf].dtype))


def _copy_one_level(base: Params) -> Params:
    """Shallow-copy the dict spine so overlay writes don't mutate the input."""
    out = dict(base)
    for k, v in out.items():
        if isinstance(v, dict):
            out[k] = dict(v)
    return out


def _overlay_tower(base: Params, sd: FlatDict, key_to_path, what: str) -> Params:
    """Per-key merge of a partial HF state dict onto an existing stacked-layer
    tree (supports diff checkpoints with ``unfreeze_layers`` / selective
    ``model_load_parameters`` — reference: ultravox_model.py:565-584)."""
    out = _copy_one_level(base)
    if "layers" in out and isinstance(out["layers"], dict):
        out["layers"] = {
            k: (dict(v) if isinstance(v, dict) else v)
            for k, v in base["layers"].items()
        }
    applied, ignored = 0, []
    for name, arr in sd.items():
        mapped = key_to_path(name)
        if mapped is None:
            ignored.append(name)
            continue
        path, idx, transform = mapped
        val = jnp.asarray(arr)
        if transform == "conv":
            val = val.transpose(2, 1, 0)  # torch (out,in,k) -> lax HIO
        elif transform in (True, "T"):
            val = val.T
        _tree_set(out, path, idx, val)
        applied += 1
    if ignored:
        logger.warning(
            "partial %s overlay ignored %d unmapped keys: %s",
            what, len(ignored), ignored[:8],
        )
    logger.info("partial %s overlay applied %d keys", what, applied)
    return out


def _overlay_decoder(base: Params, sd: FlatDict, cfg: DecoderConfig, dtype) -> Params:
    return _overlay_tower(base, sd, _decoder_key_to_path, "decoder")


_W2V_LIN = {
    "attention.q_proj": "q_proj", "attention.k_proj": "k_proj",
    "attention.v_proj": "v_proj", "attention.out_proj": "out_proj",
    "feed_forward.intermediate_dense": "fc1",
    "feed_forward.output_dense": "fc2",
}
_W2V_NORM = {"layer_norm": "attn_ln", "final_layer_norm": "final_ln"}


def _wav2vec2_key_to_path(name: str):
    """HF wav2vec2 key -> overlay path (weight-normalised pos-conv pieces and
    conv-stack leaves are left to the full converter — they're never in
    trainable diffs)."""
    m = re.match(r"^feature_projection\.layer_norm\.(weight|bias)$", name)
    if m:
        return ("feature_projection", "ln",
                "scale" if m.group(1) == "weight" else "bias"), None, None
    m = re.match(r"^feature_projection\.projection\.(weight|bias)$", name)
    if m:
        leaf = "kernel" if m.group(1) == "weight" else "bias"
        return (("feature_projection", "projection", leaf), None,
                "T" if leaf == "kernel" else None)
    m = re.match(r"^encoder\.layer_norm\.(weight|bias)$", name)
    if m:
        return ("encoder_ln",
                "scale" if m.group(1) == "weight" else "bias"), None, None
    m = re.match(r"^encoder\.layers\.(\d+)\.(.+)\.(weight|bias)$", name)
    if not m:
        return None
    idx, stem, leaf = int(m.group(1)), m.group(2), m.group(3)
    if stem in _W2V_NORM:
        return ("layers", _W2V_NORM[stem],
                "scale" if leaf == "weight" else "bias"), idx, None
    if stem in _W2V_LIN:
        sub = "kernel" if leaf == "weight" else "bias"
        return (("layers", _W2V_LIN[stem], sub), idx,
                "T" if leaf == "weight" else None)
    return None


def _overlay_encoder(base: Params, sd: FlatDict, cfg, dtype) -> Params:
    if type(cfg).__name__ == "Wav2Vec2EncoderConfig":
        return _overlay_tower(base, sd, _wav2vec2_key_to_path, "wav2vec2")
    return _overlay_tower(base, sd, _encoder_key_to_path, "encoder")


def _covers_encoder(sd: FlatDict, cfg) -> bool:
    """True only when the state dict holds EVERYTHING the full converter
    reads — layer stacks AND the non-layer leaves (a diff checkpoint that
    unfreezes every layer but not the conv stack must take the per-key
    overlay path, not crash the full convert)."""
    if type(cfg).__name__ == "Wav2Vec2EncoderConfig":
        return (
            "feature_extractor.conv_layers.0.conv.weight" in sd
            and "feature_projection.projection.weight" in sd
            and "encoder.layer_norm.weight" in sd
            and all(
                f"encoder.layers.{i}.attention.q_proj.weight" in sd
                for i in range(cfg.num_layers)
            )
        )
    return (
        "conv1.weight" in sd
        and "embed_positions.weight" in sd
        and "layer_norm.weight" in sd
        and all(
            f"layers.{i}.self_attn.q_proj.weight" in sd
            for i in range(cfg.num_layers)
        )
    )


def _covers_decoder(sd: FlatDict, cfg: DecoderConfig) -> bool:
    return (
        "model.embed_tokens.weight" in sd
        and "model.norm.weight" in sd
        and all(
            f"model.layers.{i}.self_attn.q_proj.weight" in sd
            for i in range(cfg.num_layers)
        )
    )


# --------------------------------------------------------------------------
# Reverse conversion (for publishing checkpoints loadable by the reference)
# --------------------------------------------------------------------------


def decoder_to_hf(params: Params, cfg: DecoderConfig) -> FlatDict:
    out: FlatDict = {}
    ly = params["layers"]

    def unstack(name_pattern, arr, transpose=False):
        a = np.asarray(arr, dtype=np.float32)
        for i in range(cfg.num_layers):
            out[name_pattern.format(i=i)] = a[i].T if transpose else a[i]

    out["model.embed_tokens.weight"] = np.asarray(params["embed_tokens"], np.float32)
    out["model.norm.weight"] = np.asarray(params["norm"], np.float32)
    if "lm_head" in params:
        out["lm_head.weight"] = np.asarray(
            params["lm_head"]["kernel"], np.float32
        ).T
    unstack("model.layers.{i}.input_layernorm.weight", ly["input_ln"])
    unstack("model.layers.{i}.post_attention_layernorm.weight", ly["post_attn_ln"])
    for hf, mine in [
        ("self_attn.q_proj", "q_proj"),
        ("self_attn.k_proj", "k_proj"),
        ("self_attn.v_proj", "v_proj"),
        ("self_attn.o_proj", "o_proj"),
        ("mlp.gate_proj", "gate_proj"),
        ("mlp.up_proj", "up_proj"),
        ("mlp.down_proj", "down_proj"),
    ]:
        unstack(
            "model.layers.{i}." + hf + ".weight", ly[mine]["kernel"], transpose=True
        )
        if "bias" in ly[mine]:
            unstack("model.layers.{i}." + hf + ".bias", ly[mine]["bias"])
    if "q_norm" in ly:
        unstack("model.layers.{i}.self_attn.q_norm.weight", ly["q_norm"])
        unstack("model.layers.{i}.self_attn.k_norm.weight", ly["k_norm"])
    if "pre_ffn_ln" in ly:
        unstack("model.layers.{i}.pre_feedforward_layernorm.weight", ly["pre_ffn_ln"])
        unstack("model.layers.{i}.post_feedforward_layernorm.weight", ly["post_ffn_ln"])
    return out


def projector_to_hf(params: Params) -> FlatDict:
    out: FlatDict = {
        "ln_pre.weight": np.asarray(params["ln_pre"], np.float32),
        "linear_1.weight": np.asarray(params["linear_1"]["kernel"], np.float32).T,
        "linear_2.weight": np.asarray(params["linear_2"]["kernel"], np.float32).T,
    }
    if "ln_mid" in params:
        out["ln_mid.weight"] = np.asarray(params["ln_mid"], np.float32)
    if "ln_post" in params:
        out["ln_post.weight"] = np.asarray(params["ln_post"], np.float32)
    return out
