"""Wav2Vec2-family audio encoder (raw-waveform tower).

The reference accepts any HF AutoModel as the audio tower and special-cases
Whisper; Wav2Vec2 is the documented alternative family
(reference: ultravox_model.py:440-497). This is a pure-JAX implementation of
the classic Wav2Vec2 encoder (wav2vec2-base / -large configs):

  raw waveform -> conv feature extractor (7 strided 1-D convs, ~320x
  downsample) -> feature projection -> conv positional embedding ->
  transformer encoder.

Both norm styles are covered: ``feat_extract_norm="group"`` +
post-layer-norm encoder blocks (base) and ``"layer"`` +
``do_stable_layer_norm`` pre-norm blocks (large-lv60).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ultravox_tpu.ops.attention import length_mask_bias, mha

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class Wav2Vec2EncoderConfig:
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    ffn_dim: int = 3072
    conv_dim: Tuple[int, ...] = (512, 512, 512, 512, 512, 512, 512)
    conv_kernel: Tuple[int, ...] = (10, 3, 3, 3, 3, 2, 2)
    conv_stride: Tuple[int, ...] = (5, 2, 2, 2, 2, 2, 2)
    conv_bias: bool = False
    feat_extract_norm: str = "group"  # "group" (base) | "layer" (large)
    do_stable_layer_norm: bool = False
    num_conv_pos_embeddings: int = 128
    num_conv_pos_embedding_groups: int = 16
    layer_norm_eps: float = 1e-5

    @property
    def d_model(self) -> int:  # uniform tower interface
        return self.hidden_size

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    def feature_lengths(self, sample_lengths):
        """Conv-stack output length for raw-sample input length(s)."""
        lens = sample_lengths
        for k, s in zip(self.conv_kernel, self.conv_stride):
            lens = (lens - k) // s + 1
        return lens

    @property
    def downsample_factor(self) -> int:
        f = 1
        for s in self.conv_stride:
            f *= s
        return f

    @property
    def min_samples(self) -> int:
        """Receptive field: smallest input yielding one conv output frame."""
        n = 1
        for k, s in reversed(list(zip(self.conv_kernel, self.conv_stride))):
            n = (n - 1) * s + k
        return n

    @classmethod
    def from_hf_dict(cls, d: Dict[str, Any]) -> "Wav2Vec2EncoderConfig":
        return cls(
            hidden_size=d.get("hidden_size", 768),
            num_layers=d.get("num_hidden_layers", 12),
            num_heads=d.get("num_attention_heads", 12),
            ffn_dim=d.get("intermediate_size", 3072),
            conv_dim=tuple(d.get("conv_dim", (512,) * 7)),
            conv_kernel=tuple(d.get("conv_kernel", (10, 3, 3, 3, 3, 2, 2))),
            conv_stride=tuple(d.get("conv_stride", (5, 2, 2, 2, 2, 2, 2))),
            conv_bias=d.get("conv_bias", False),
            feat_extract_norm=d.get("feat_extract_norm", "group"),
            do_stable_layer_norm=d.get("do_stable_layer_norm", False),
            num_conv_pos_embeddings=d.get("num_conv_pos_embeddings", 128),
            num_conv_pos_embedding_groups=d.get(
                "num_conv_pos_embedding_groups", 16
            ),
            layer_norm_eps=d.get("layer_norm_eps", 1e-5),
        )


def init_params(
    cfg: Wav2Vec2EncoderConfig, rng: jax.Array, dtype=jnp.float32
) -> Params:
    keys = iter(jax.random.split(rng, 64))
    dn = lambda *s: jax.random.normal(next(keys), s, dtype) * 0.02
    D, F, L = cfg.hidden_size, cfg.ffn_dim, cfg.num_layers

    convs = []
    in_dim = 1
    for i, (out_dim, k) in enumerate(zip(cfg.conv_dim, cfg.conv_kernel)):
        conv: Params = {"kernel": dn(k, in_dim, out_dim)}
        if cfg.conv_bias:
            conv["bias"] = jnp.zeros(out_dim, dtype)
        if (cfg.feat_extract_norm == "group" and i == 0) or (
            cfg.feat_extract_norm == "layer"
        ):
            conv["norm"] = {
                "scale": jnp.ones(out_dim, dtype),
                "bias": jnp.zeros(out_dim, dtype),
            }
        convs.append(conv)
        in_dim = out_dim

    def ln():
        return {"scale": jnp.ones((L, D), dtype), "bias": jnp.zeros((L, D), dtype)}

    def lin(d_in, d_out):
        return {"kernel": dn(L, d_in, d_out), "bias": jnp.zeros((L, d_out), dtype)}

    return {
        "feature_extractor": convs,
        "feature_projection": {
            "ln": {
                "scale": jnp.ones(cfg.conv_dim[-1], dtype),
                "bias": jnp.zeros(cfg.conv_dim[-1], dtype),
            },
            "projection": {
                "kernel": dn(cfg.conv_dim[-1], D),
                "bias": jnp.zeros(D, dtype),
            },
        },
        "pos_conv": {
            "kernel": dn(
                cfg.num_conv_pos_embeddings,
                D // cfg.num_conv_pos_embedding_groups,
                D,
            ),
            "bias": jnp.zeros(D, dtype),
        },
        "encoder_ln": {"scale": jnp.ones(D, dtype), "bias": jnp.zeros(D, dtype)},
        "layers": {
            "attn_ln": ln(),
            "q_proj": lin(D, D),
            "k_proj": lin(D, D),
            "v_proj": lin(D, D),
            "out_proj": lin(D, D),
            "final_ln": ln(),
            "fc1": lin(D, F),
            "fc2": lin(F, D),
        },
    }


def _layer_norm(x, p, eps):
    mean = x.mean(-1, keepdims=True)
    var = ((x - mean) ** 2).mean(-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def _group_norm(x, p, num_groups, eps):
    """GroupNorm over channels (x: (B, T, C), groups over C) — wav2vec2 uses
    num_groups == num_channels, i.e. per-channel instance norm over time."""
    B, T, C = x.shape
    g = num_groups
    xg = x.reshape(B, T, g, C // g).transpose(0, 2, 3, 1)  # (B, g, C/g, T)
    mean = xg.mean((-2, -1), keepdims=True)
    var = ((xg - mean) ** 2).mean((-2, -1), keepdims=True)
    xg = (xg - mean) * jax.lax.rsqrt(var + eps)
    x = xg.transpose(0, 3, 1, 2).reshape(B, T, C)
    return x * p["scale"] + p["bias"]


def feature_extractor(params, cfg: Wav2Vec2EncoderConfig, audio: jax.Array):
    """Raw waveform (B, T_samples) -> conv features (B, T_frames, C)."""
    x = audio[..., None]  # (B, T, 1)
    for i, conv in enumerate(params["feature_extractor"]):
        x = jax.lax.conv_general_dilated(
            x,
            conv["kernel"].astype(x.dtype),
            window_strides=(cfg.conv_stride[i],),
            padding="VALID",
            dimension_numbers=("NWC", "WIO", "NWC"),
        )
        if "bias" in conv:
            x = x + conv["bias"]
        if "norm" in conv:
            if cfg.feat_extract_norm == "group" and i == 0:
                x = _group_norm(
                    x, conv["norm"], cfg.conv_dim[0], cfg.layer_norm_eps
                )
            else:
                x = _layer_norm(x, conv["norm"], cfg.layer_norm_eps)
        x = jax.nn.gelu(x, approximate=False)
    return x


def _pos_conv_embedding(params, cfg: Wav2Vec2EncoderConfig, x: jax.Array):
    """Grouped conv positional embedding (kernel 128, groups 16, SAME-ish
    padding with one-element trim for even kernels)."""
    k = cfg.num_conv_pos_embeddings
    pad = k // 2
    pos = jax.lax.conv_general_dilated(
        x,
        params["pos_conv"]["kernel"].astype(x.dtype),
        window_strides=(1,),
        padding=[(pad, pad)],
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=cfg.num_conv_pos_embedding_groups,
    )
    pos = pos + params["pos_conv"]["bias"]
    if k % 2 == 0:
        pos = pos[:, :-1]
    return jax.nn.gelu(pos, approximate=False)


def encoder_forward(
    params: Params,
    cfg: Wav2Vec2EncoderConfig,
    audio: jax.Array,  # (B, T_samples) raw waveform (zero-mean/unit-var)
    sample_lens: Optional[jax.Array] = None,  # (B,) valid samples per row
) -> jax.Array:
    """Returns encoder hidden states (B, T_frames, D)."""
    feats = feature_extractor(params, cfg, audio)
    B, T, _ = feats.shape
    fp = params["feature_projection"]
    h = _layer_norm(feats, fp["ln"], cfg.layer_norm_eps)
    h = h @ fp["projection"]["kernel"] + fp["projection"]["bias"]

    if sample_lens is not None:
        feat_lens = cfg.feature_lengths(sample_lens)
        # zero padded positions before the pos-conv (HF zeroes masked frames)
        valid = jnp.arange(T)[None, :] < feat_lens[:, None]
        h = jnp.where(valid[..., None], h, 0.0)
        bias = length_mask_bias(feat_lens, T)
    else:
        bias = None

    h = h + _pos_conv_embedding(params, cfg, h)
    if not cfg.do_stable_layer_norm:
        h = _layer_norm(h, params["encoder_ln"], cfg.layer_norm_eps)

    scale = cfg.head_dim**-0.5

    def layer_fn(x, p):
        if cfg.do_stable_layer_norm:  # pre-norm (large)
            a = _layer_norm(x, p["attn_ln"], cfg.layer_norm_eps)
        else:
            a = x
        q = (a @ p["q_proj"]["kernel"] + p["q_proj"]["bias"]).reshape(
            B, T, cfg.num_heads, cfg.head_dim
        )
        k = (a @ p["k_proj"]["kernel"] + p["k_proj"]["bias"]).reshape(
            B, T, cfg.num_heads, cfg.head_dim
        )
        v = (a @ p["v_proj"]["kernel"] + p["v_proj"]["bias"]).reshape(
            B, T, cfg.num_heads, cfg.head_dim
        )
        attn = mha(q, k, v, bias=bias, scale=scale).reshape(B, T, -1)
        attn = attn @ p["out_proj"]["kernel"] + p["out_proj"]["bias"]
        x = x + attn
        if not cfg.do_stable_layer_norm:
            x = _layer_norm(x, p["attn_ln"], cfg.layer_norm_eps)
            f = x
        else:
            f = _layer_norm(x, p["final_ln"], cfg.layer_norm_eps)
        ff = jax.nn.gelu(
            f @ p["fc1"]["kernel"] + p["fc1"]["bias"], approximate=False
        )
        ff = ff @ p["fc2"]["kernel"] + p["fc2"]["bias"]
        x = x + ff
        if not cfg.do_stable_layer_norm:
            x = _layer_norm(x, p["final_ln"], cfg.layer_norm_eps)
        return x, None

    h, _ = jax.lax.scan(layer_fn, h, params["layers"])
    if cfg.do_stable_layer_norm:
        h = _layer_norm(h, params["encoder_ln"], cfg.layer_norm_eps)
    return h
