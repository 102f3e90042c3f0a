"""Audio→text multimodal projector.

Functional re-design of the reference ``UltravoxProjector`` +
``StackAudioFrames`` (ultravox_model.py:712-800):

    stack(stack_factor) -> RMSNorm(ln_pre) -> Linear -> SwiGLU
        -> [RMSNorm(ln_mid) if projector_ln_mid] -> Linear
        -> [RMSNorm(ln_post) if not projector_ln_mid]

Linears are biasless. SwiGLU follows the reference convention
(ultravox_model.py:739-742): the *first* half is the value, the *second* half
the gate: ``silu(gate) * value``.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from ultravox_tpu.models.config import UltravoxConfig
from ultravox_tpu.ops.norms import rms_norm

Params = Dict[str, Any]


def stack_audio_frames(x: jax.Array, stack_factor: int) -> jax.Array:
    """(B, T, C) -> (B, ceil(T / S), C * S), zero-padding T up to a multiple
    of S (reference: StackAudioFrames, ultravox_model.py:712-730)."""
    B, T, C = x.shape
    T_pad = (T + stack_factor - 1) // stack_factor * stack_factor
    x = jnp.pad(x, ((0, 0), (0, T_pad - T), (0, 0)))
    return x.reshape(B, T_pad // stack_factor, C * stack_factor)


def init_params(cfg: UltravoxConfig, rng: jax.Array, dtype=jnp.float32) -> Params:
    k1, k2 = jax.random.split(rng)
    dim_in = cfg.audio_config.d_model * cfg.stack_factor
    hidden = cfg.hidden_size
    dim_mid = hidden // 2 if cfg.projector_act == "swiglu" else hidden
    dim_out = cfg.text_config.hidden_size
    # torch.nn.Linear default init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))
    lin = lambda key, fi, fo: jax.random.uniform(
        key, (fi, fo), dtype, -(fi**-0.5), fi**-0.5
    )
    params: Params = {
        "ln_pre": jnp.full((dim_in,), cfg.norm_init, dtype),
        "linear_1": {"kernel": lin(k1, dim_in, hidden)},
        "linear_2": {"kernel": lin(k2, dim_mid, dim_out)},
    }
    if cfg.projector_ln_mid:
        params["ln_mid"] = jnp.full((dim_mid,), cfg.norm_init, dtype)
    else:
        params["ln_post"] = jnp.full((dim_out,), cfg.norm_init, dtype)
    return params


def projector_forward(
    params: Params, cfg: UltravoxConfig, audio_features: jax.Array
) -> jax.Array:
    """(B, T_enc, C) encoder states -> (B, ceil(T_enc / S), D_text)."""
    x = stack_audio_frames(audio_features, cfg.stack_factor)
    x = rms_norm(x, params["ln_pre"])
    x = x @ params["linear_1"]["kernel"]
    if cfg.projector_act == "swiglu":
        val, gate = jnp.split(x, 2, axis=-1)
        x = jax.nn.silu(gate) * val
    elif cfg.projector_act == "silu":
        x = jax.nn.silu(x)
    elif cfg.projector_act == "gelu":
        x = jax.nn.gelu(x, approximate=False)
    else:
        raise ValueError(f"unsupported projector_act {cfg.projector_act}")
    if "ln_mid" in params:
        x = rms_norm(x, params["ln_mid"])
    x = x @ params["linear_2"]["kernel"]
    if "ln_post" in params:
        x = rms_norm(x, params["ln_post"])
    return x


def num_audio_tokens(mel_len, compression: int):
    """ceil(mel_len / (encoder_ds × stack)) — the number of LLM positions one
    audio chunk occupies (reference: ultravox_processing.py:316-318)."""
    return -(-mel_len // compression)
