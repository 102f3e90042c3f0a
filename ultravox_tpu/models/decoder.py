"""Decoder-only text LLM (Llama / Mistral / Gemma-3 / Qwen-2/3 families).

TPU-native functional design replacing the reference's delegation to HF
``AutoModelForCausalLM`` (ultravox_model.py:499-526): a single pure function
over a parameter pytree with per-layer weights stacked on a leading axis and
iterated with ``lax.scan``; KV caches are static-shape arrays carried through
the scan; all masking is additive bias with static shapes.

Family differences are config flags (see ``DecoderConfig``):
- Gemma-3: plus-one RMSNorm, embedding scaling, post-attention/FFN norms,
  QK-norm, alternating local(sliding-window)/global layers with separate rope
  bases.
- Qwen-2: attention bias. Qwen-3: QK-norm.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ultravox_tpu.models.config import DecoderConfig
from ultravox_tpu.ops.attention import NEG_INF, mha
from ultravox_tpu.ops.norms import rms_norm
from ultravox_tpu.ops.rope import apply_rope, rope_cos_sin, rope_frequencies

Params = Dict[str, Any]


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class KVCache:
    """Static-shape per-layer KV cache: (L, B, S_max, Hkv, Dh)."""

    k: jax.Array
    v: jax.Array

    @property
    def max_len(self) -> int:
        return self.k.shape[2]

    @classmethod
    def zeros(
        cls, cfg: DecoderConfig, batch: int, max_len: int, dtype=jnp.bfloat16
    ) -> "KVCache":
        shape = (cfg.num_layers, batch, max_len, cfg.num_kv_heads, cfg.head_dim)
        return cls(k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype))


def is_local_layer(cfg: DecoderConfig) -> np.ndarray:
    """(L,) bool — which layers use sliding-window attention. An explicit
    per-layer schedule (HF 'layer_types') wins; otherwise the Gemma-3
    pattern (every ``sliding_window_pattern``-th layer is global); otherwise
    mistral-style all-local when a window is set."""
    if cfg.layer_is_local is not None:
        assert len(cfg.layer_is_local) == cfg.num_layers, (
            f"layer_is_local has {len(cfg.layer_is_local)} entries for "
            f"{cfg.num_layers} layers"
        )
        return np.asarray(cfg.layer_is_local, dtype=bool)
    if cfg.sliding_window is None:
        return np.zeros(cfg.num_layers, dtype=bool)
    if cfg.sliding_window_pattern is None:
        return np.ones(cfg.num_layers, dtype=bool)  # mistral-style all-local
    idx = np.arange(cfg.num_layers)
    return (idx + 1) % cfg.sliding_window_pattern != 0


def init_params(cfg: DecoderConfig, rng: jax.Array, dtype=jnp.float32) -> Params:
    k = iter(jax.random.split(rng, 24))
    D, I, L = cfg.hidden_size, cfg.intermediate_size, cfg.num_layers
    Hq, Hkv, Dh = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    dn = lambda *s: jax.random.normal(next(k), s, dtype) * 0.02

    layers: Params = {
        "input_ln": jnp.ones((L, D), dtype),
        "q_proj": {"kernel": dn(L, D, Hq * Dh)},
        "k_proj": {"kernel": dn(L, D, Hkv * Dh)},
        "v_proj": {"kernel": dn(L, D, Hkv * Dh)},
        "o_proj": {"kernel": dn(L, Hq * Dh, D)},
        "post_attn_ln": jnp.ones((L, D), dtype),
        "gate_proj": {"kernel": dn(L, D, I)},
        "up_proj": {"kernel": dn(L, D, I)},
        "down_proj": {"kernel": dn(L, I, D)},
    }
    if cfg.attention_bias:
        layers["q_proj"]["bias"] = jnp.zeros((L, Hq * Dh), dtype)
        layers["k_proj"]["bias"] = jnp.zeros((L, Hkv * Dh), dtype)
        layers["v_proj"]["bias"] = jnp.zeros((L, Hkv * Dh), dtype)
    if cfg.qk_norm:
        layers["q_norm"] = jnp.ones((L, Dh), dtype)
        layers["k_norm"] = jnp.ones((L, Dh), dtype)
    if cfg.use_post_norms:
        layers["pre_ffn_ln"] = jnp.ones((L, D), dtype)
        layers["post_ffn_ln"] = jnp.ones((L, D), dtype)

    params: Params = {
        "embed_tokens": dn(cfg.vocab_size, D),
        "layers": layers,
        "norm": jnp.ones(D, dtype),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = {"kernel": dn(D, cfg.vocab_size)}
    return params


def _act(cfg: DecoderConfig, x: jax.Array) -> jax.Array:
    if cfg.hidden_act == "silu":
        return jax.nn.silu(x)
    if cfg.hidden_act in ("gelu_pytorch_tanh", "gelu"):
        return jax.nn.gelu(x, approximate=True)
    raise ValueError(f"unsupported activation {cfg.hidden_act}")


def _proj(x: jax.Array, p: Params) -> jax.Array:
    from ultravox_tpu.models.lora import proj_apply

    return proj_apply(x, p)


def _decoder_layer(
    cfg: DecoderConfig,
    x: jax.Array,  # (B, T, D)
    p: Params,  # one layer's params (leading L axis removed)
    cos_g, sin_g, cos_l, sin_l,  # rope tables (B, T, Dh)
    bias_global, bias_local,  # additive (B, 1, T, S) or None
    layer_is_local: jax.Array,  # scalar bool
    cache_k: Optional[jax.Array],  # (B, S_max, Hkv, Dh) or None
    cache_v: Optional[jax.Array],
    write_pos: Optional[jax.Array],  # (B,) int32 write offset into cache
    return_kv: bool = False,
    decode_kernel: bool = False,
    decode_lengths: Optional[jax.Array] = None,  # (B,) valid cache entries
) -> Tuple[jax.Array, Optional[jax.Array], Optional[jax.Array]]:
    B, T, D = x.shape
    Hq, Hkv, Dh = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    plus_one = cfg.arch == "gemma3"

    h = rms_norm(x, p["input_ln"], cfg.rms_norm_eps, plus_one=plus_one)
    q = _proj(h, p["q_proj"]).reshape(B, T, Hq, Dh)
    k = _proj(h, p["k_proj"]).reshape(B, T, Hkv, Dh)
    v = _proj(h, p["v_proj"]).reshape(B, T, Hkv, Dh)

    if cfg.qk_norm:
        q = rms_norm(q, p["q_norm"], cfg.rms_norm_eps, plus_one=plus_one)
        k = rms_norm(k, p["k_norm"], cfg.rms_norm_eps, plus_one=plus_one)

    if cfg.rope_local_base_freq is not None:
        cos = jnp.where(layer_is_local, cos_l, cos_g)
        sin = jnp.where(layer_is_local, sin_l, sin_g)
    else:
        cos, sin = cos_g, sin_g
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)

    if cache_k is not None:
        # Write this step's k/v into the cache at per-sequence offsets, then
        # attend over the whole (masked) cache.
        def write(cache, new):
            return jax.vmap(
                lambda c, n, i: jax.lax.dynamic_update_slice(
                    c, n.astype(c.dtype), (i, 0, 0)
                )
            )(cache, new, write_pos)

        cache_k = write(cache_k, k)
        cache_v = write(cache_v, v)
        k_all, v_all = cache_k, cache_v
    else:
        k_all, v_all = k, v
        if return_kv:
            cache_k, cache_v = k, v

    if bias_local is not None:
        bias = jnp.where(layer_is_local, bias_local, bias_global)
    else:
        bias = bias_global

    if decode_kernel and T == 1 and cache_k is not None:
        # flash-decoding Pallas kernel: reads only the valid cache prefix
        from ultravox_tpu.ops.pallas.decode_attention import decode_attention

        window = (
            jnp.where(layer_is_local, cfg.sliding_window, 0)
            if cfg.sliding_window is not None
            else jnp.asarray(0, jnp.int32)
        )
        attn = decode_attention(
            q[:, 0], k_all, v_all, decode_lengths, window,
            scale=cfg.attn_scale,
        )[:, None]
    else:
        attn = mha(q, k_all, v_all, bias=bias, scale=cfg.attn_scale)
    attn = _proj(attn.reshape(B, T, Hq * Dh), p["o_proj"])
    if cfg.use_post_norms:
        attn = rms_norm(attn, p["post_attn_ln"], cfg.rms_norm_eps, plus_one=plus_one)
        x = x + attn
        h = rms_norm(x, p["pre_ffn_ln"], cfg.rms_norm_eps, plus_one=plus_one)
    else:
        x = x + attn
        h = rms_norm(x, p["post_attn_ln"], cfg.rms_norm_eps, plus_one=plus_one)

    mlp = _proj(
        _act(cfg, _proj(h, p["gate_proj"])) * _proj(h, p["up_proj"]),
        p["down_proj"],
    )
    if cfg.use_post_norms:
        mlp = rms_norm(mlp, p["post_ffn_ln"], cfg.rms_norm_eps, plus_one=plus_one)
    x = x + mlp
    return x, cache_k, cache_v


def make_attention_bias(
    cfg: DecoderConfig,
    q_positions: jax.Array,  # (B, T) int32 absolute positions of queries
    kv_len: int,  # S — static length of the key axis
    kv_valid_len: jax.Array,  # (B,) number of valid cache/key positions
) -> Tuple[jax.Array, Optional[jax.Array]]:
    """Additive causal (+ optional sliding-window) bias (B, 1, T, S).

    A key at absolute position j (= its index in the cache) is visible to the
    query at absolute position i iff j <= i and j < kv_valid_len.
    """
    kpos = jnp.arange(kv_len, dtype=jnp.int32)[None, None, :]  # (1,1,S)
    qpos = q_positions[:, :, None]  # (B,T,1)
    ok = (kpos <= qpos) & (kpos < kv_valid_len[:, None, None])
    bias_global = jnp.where(ok, 0.0, NEG_INF)[:, None].astype(jnp.float32)
    bias_local = None
    if cfg.sliding_window is not None:
        ok_l = ok & (qpos - kpos < cfg.sliding_window)
        bias_local = jnp.where(ok_l, 0.0, NEG_INF)[:, None].astype(jnp.float32)
    return bias_global, bias_local


def decoder_forward(
    params: Params,
    cfg: DecoderConfig,
    *,
    input_ids: Optional[jax.Array] = None,  # (B, T) int32
    inputs_embeds: Optional[jax.Array] = None,  # (B, T, D)
    positions: jax.Array,  # (B, T) int32 absolute positions
    kv_valid_len: jax.Array,  # (B,) valid key length (incl. current tokens)
    cache: Optional[KVCache] = None,
    write_pos: Optional[jax.Array] = None,  # (B,) cache write offset
    remat: bool = False,
    return_hidden: bool = False,
    return_kv: bool = False,
    decode_kernel: bool = False,
) -> Tuple[jax.Array, Optional[KVCache]]:
    """Run the decoder. Returns (logits (B, T, V) fp32, updated cache).

    With ``cache``: attends over the full cache (after writing the current
    k/v at ``write_pos``); without: self-attention over the T inputs.
    ``return_kv`` (cache-less mode) additionally returns the per-layer k/v
    computed for these tokens as a KVCache of shape (L, B, T, Hkv, Dh) — used
    by the serving engine to prefill into an external slot cache.
    """
    if inputs_embeds is None:
        inputs_embeds = jnp.take(params["embed_tokens"], input_ids, axis=0)
    x = inputs_embeds
    if cfg.scale_embeddings:
        x = x * jnp.asarray(cfg.hidden_size**0.5, dtype=x.dtype)

    kv_len = cache.max_len if cache is not None else x.shape[1]
    bias_global, bias_local = make_attention_bias(
        cfg, positions, kv_len, kv_valid_len
    )

    inv_freq = jnp.asarray(
        rope_frequencies(cfg.head_dim, cfg.rope_theta, cfg.rope_scaling)
    )
    cos_g, sin_g = rope_cos_sin(positions, inv_freq)
    if cfg.rope_local_base_freq is not None:
        inv_freq_l = jnp.asarray(
            rope_frequencies(cfg.head_dim, cfg.rope_local_base_freq)
        )
        cos_l, sin_l = rope_cos_sin(positions, inv_freq_l)
    else:
        cos_l, sin_l = cos_g, sin_g

    local_flags = jnp.asarray(is_local_layer(cfg))

    use_decode_kernel = (
        decode_kernel and cache is not None and x.shape[1] == 1
    )

    def layer_fn(carry, xs):
        h = carry
        p, is_loc, ck, cv = xs
        h, ck, cv = _decoder_layer(
            cfg, h, p, cos_g, sin_g, cos_l, sin_l,
            bias_global, bias_local, is_loc, ck, cv, write_pos,
            return_kv=return_kv,
            decode_kernel=use_decode_kernel,
            decode_lengths=kv_valid_len,
        )
        return h, (ck, cv)

    if remat:
        layer_fn = jax.checkpoint(layer_fn)

    if cache is not None:
        xs = (params["layers"], local_flags, cache.k, cache.v)
    else:
        xs = (params["layers"], local_flags, None, None)

    x, (new_k, new_v) = jax.lax.scan(layer_fn, x, xs)
    x = rms_norm(x, params["norm"], cfg.rms_norm_eps, plus_one=cfg.arch == "gemma3")
    if return_hidden:
        return x, None

    if cfg.tie_word_embeddings or "lm_head" not in params:
        logits = x @ params["embed_tokens"].T
    else:
        logits = x @ params["lm_head"]["kernel"]
    logits = logits.astype(jnp.float32)
    if cfg.final_logit_softcapping:
        cap = cfg.final_logit_softcapping
        logits = jnp.tanh(logits / cap) * cap

    new_cache = (
        KVCache(k=new_k, v=new_v)
        if (cache is not None or return_kv)
        else None
    )
    return logits, new_cache
