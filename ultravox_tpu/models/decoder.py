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


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PagedKVCache:
    """Paged per-layer KV cache: pools (L, num_pages, page_size, Hkv, Dh)
    shared by every sequence, indirected through an external
    (B, pages_per_seq) page table (vLLM paged-KV counterpart; see
    ops/pallas/paged_attention.py).

    Table convention: entry i of row b holds the pool page of logical block
    i of sequence b; UNALLOCATED entries hold the sentinel ``num_pages``
    (out of range), so stray writes are dropped by scatter ``mode="drop"``
    and stray gathers clip to a garbage page that the length mask hides."""

    k: jax.Array
    v: jax.Array

    @property
    def page_size(self) -> int:
        return self.k.shape[2]

    @property
    def num_pages(self) -> int:
        return self.k.shape[1]

    @property
    def max_len(self) -> int:
        # tokens resident if one sequence owned the whole pool
        return self.k.shape[1] * self.k.shape[2]

    @classmethod
    def zeros(
        cls,
        cfg: DecoderConfig,
        num_pages: int,
        page_size: int,
        dtype=jnp.bfloat16,
    ) -> "PagedKVCache":
        shape = (
            cfg.num_layers, num_pages, page_size, cfg.num_kv_heads,
            cfg.head_dim,
        )
        return cls(k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype))


def paged_write_indices(
    page_table: jax.Array,  # (B, pages_per_seq) int32, sentinel-padded
    write_pos: jax.Array,  # (B,) first logical position to write
    T: int,
    page_size: int,
    num_pages: int,
):
    """(write_page, write_off), each (B, T): pool page and in-page offset for
    the T new tokens, with out-of-range logical positions (and positions in
    unallocated table entries) redirected to ``num_pages`` so the scatter
    drops them — the paged counterpart of the contiguous path's
    out-of-bounds write redirection."""
    pos = write_pos[:, None] + jnp.arange(T, dtype=jnp.int32)[None]  # (B, T)
    return paged_positions_to_indices(page_table, pos, page_size, num_pages)


def paged_positions_to_indices(
    page_table: jax.Array,  # (B, pages_per_seq) int32, sentinel-padded
    pos: jax.Array,  # (B, T) logical positions; negative = drop
    page_size: int,
    num_pages: int,
):
    """Arbitrary-position variant of :func:`paged_write_indices`: callers
    with per-token validity (e.g. publishing only the ACCEPTED prefix of a
    speculative block) mark positions negative to drop them."""
    B, n_per = page_table.shape
    T = pos.shape[1]
    blk = pos // page_size
    in_range = (pos >= 0) & (blk < n_per)
    pid = jnp.take_along_axis(
        page_table, jnp.clip(blk, 0, n_per - 1), axis=1
    )
    valid = in_range & (pid < num_pages)
    # DISTINCT out-of-range destinations per (b, t): duplicate indices under
    # unique_indices are undefined behaviour even when dropped
    bidx = jnp.arange(B, dtype=jnp.int32)[:, None]
    t = jnp.arange(T, dtype=jnp.int32)[None]
    oob = num_pages + bidx * T + t
    write_page = jnp.where(valid, pid, oob)
    return write_page, pos % page_size


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
    layer_idx: Optional[jax.Array],  # scalar int32 (cache mode only)
    cos_g, sin_g, cos_l, sin_l,  # rope tables (B, T, Dh)
    bias_global, bias_local,  # additive (B, 1, T, S) or None
    layer_is_local: jax.Array,  # scalar bool
    cache_k: Optional[jax.Array],  # FULL (L, B, S_max, Hkv, Dh) or None
    cache_v: Optional[jax.Array],
    write_pos: Optional[jax.Array],  # (B,) int32 write offset into cache
    decode_kernel: bool = False,
    prefill_kernel: bool = False,
    decode_lengths: Optional[jax.Array] = None,  # (B,) valid cache entries
    flash_kernel: bool = False,  # cache-less (training) differentiable kernel
    paged_table: Optional[jax.Array] = None,  # (B, pages_per_seq) — paged mode
    write_page: Optional[jax.Array] = None,  # (B, T) pool page per new token
    write_off: Optional[jax.Array] = None,  # (B, T) in-page offset
) -> Tuple[jax.Array, Optional[jax.Array], Optional[jax.Array]]:
    B, T, D = x.shape
    Hq, Hkv, Dh = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    plus_one = cfg.arch in ("gemma2", "gemma3")

    h = rms_norm(x, p["input_ln"], cfg.rms_norm_eps, plus_one=plus_one)
    q, k, v = _qkv(cfg, h, p)

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

    paged_attn = None
    if cache_k is not None and paged_table is not None:
        # PAGED cache: scatter the new tokens into the pool at
        # (page, offset) destinations computed once per step by
        # paged_write_indices (invalid positions land out of range and drop)
        cache_k = cache_k.at[layer_idx, write_page, write_off].set(
            k.astype(cache_k.dtype), mode="drop", unique_indices=True
        )
        cache_v = cache_v.at[layer_idx, write_page, write_off].set(
            v.astype(cache_v.dtype), mode="drop", unique_indices=True
        )
        pool_k = jax.lax.dynamic_index_in_dim(
            cache_k, layer_idx, 0, keepdims=False
        )
        pool_v = jax.lax.dynamic_index_in_dim(
            cache_v, layer_idx, 0, keepdims=False
        )
        if decode_kernel and T == 1:
            # paged flash-decoding: DMAs exactly the live pages
            from ultravox_tpu.ops.pallas.paged_attention import (
                paged_decode_attention,
            )

            window = (
                jnp.where(layer_is_local, cfg.sliding_window, 0)
                if cfg.sliding_window is not None
                else jnp.asarray(0, jnp.int32)
            )
            paged_attn = paged_decode_attention(
                q[:, 0], pool_k, pool_v, paged_table, decode_lengths,
                window, scale=cfg.attn_scale,
            )[:, None]
        else:
            # XLA path: gather the pages into a contiguous view; the usual
            # biases (built against the view length) apply unchanged.
            # mode="clip": sentinel (unallocated) entries read SOME in-range
            # page — garbage but finite, and hidden by the length mask; the
            # default "fill" mode would inject NaN, which no additive mask
            # can remove
            k_all = jnp.take(pool_k, paged_table, axis=0, mode="clip").reshape(
                B, -1, Hkv, Dh
            )
            v_all = jnp.take(pool_v, paged_table, axis=0, mode="clip").reshape(
                B, -1, Hkv, Dh
            )
    elif cache_k is not None:
        # Scatter ONLY the new tokens into the full (carried, donated) cache
        # at per-sequence offsets, then attend over this layer's slab.
        # Writing just T slots (instead of copying the whole slab through a
        # dynamic_update_slice) keeps the decode step's HBM traffic at one
        # cache read — the dominant cost at long contexts.
        bidx = jnp.arange(B, dtype=jnp.int32)[:, None]
        tpos = write_pos[:, None] + jnp.arange(T, dtype=jnp.int32)[None]
        cache_k = cache_k.at[layer_idx, bidx, tpos].set(
            k.astype(cache_k.dtype), mode="drop", unique_indices=True
        )
        cache_v = cache_v.at[layer_idx, bidx, tpos].set(
            v.astype(cache_v.dtype), mode="drop", unique_indices=True
        )
        k_all = jax.lax.dynamic_index_in_dim(
            cache_k, layer_idx, 0, keepdims=False
        )
        v_all = jax.lax.dynamic_index_in_dim(
            cache_v, layer_idx, 0, keepdims=False
        )
    else:
        k_all, v_all = k, v

    if bias_local is not None:
        bias = jnp.where(layer_is_local, bias_local, bias_global)
    else:
        bias = bias_global

    if paged_attn is not None:
        attn = paged_attn
    elif decode_kernel and T == 1 and cache_k is not None and paged_table is None:
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
    elif (
        prefill_kernel and T > 1 and cache_k is not None
        and bias_local is None and paged_table is None
    ):
        # Pallas prefill: causal + valid-length + absolute-position masks
        # computed in-kernel — the XLA path materialises a (B, H, T, S) fp32
        # logits tensor in HBM (4.3 GB for a 2K batch-8 prefill)
        from ultravox_tpu.ops.pallas.fused_attention import fused_attention

        attn = fused_attention(
            q, k_all, v_all, decode_lengths, write_pos,
            causal=True, scale=cfg.attn_scale,
        )
    elif flash_kernel and cache_k is None:
        # training path: differentiable Pallas kernel (custom VJP), causal +
        # per-sequence lengths + per-layer sliding window in-kernel; assumes
        # query row index == absolute position (cache-less full sequences)
        from ultravox_tpu.ops.pallas.flash_attention import flash_attention

        window = (
            jnp.where(layer_is_local, cfg.sliding_window, 0)
            if cfg.sliding_window is not None
            else 0
        )
        attn = flash_attention(
            q, k_all, v_all, decode_lengths,
            causal=True, window=window, scale=cfg.attn_scale,
        )
    else:
        attn = mha(
            q, k_all, v_all, bias=bias, scale=cfg.attn_scale,
            softcap=cfg.attn_logit_softcapping,
        )
    attn = _proj(attn.reshape(B, T, Hq * Dh), p["o_proj"])
    if cfg.use_post_norms:
        attn = rms_norm(attn, p["post_attn_ln"], cfg.rms_norm_eps, plus_one=plus_one)
        x = x + attn
        h = rms_norm(x, p["pre_ffn_ln"], cfg.rms_norm_eps, plus_one=plus_one)
    else:
        x = x + attn
        h = rms_norm(x, p["post_attn_ln"], cfg.rms_norm_eps, plus_one=plus_one)

    mlp = _mlp(cfg, h, p)
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
    cache: Optional[KVCache | PagedKVCache] = None,
    page_table: Optional[jax.Array] = None,  # (B, pages_per_seq) — required
    # with a PagedKVCache; logical block i of row b lives in pool page
    # table[b, i] (unallocated entries hold the num_pages sentinel)
    write_pos: Optional[jax.Array] = None,  # (B,) cache write offset
    remat: bool = False,
    return_hidden: bool = False,
    decode_kernel: bool = False,
    prefill_kernel: bool = False,
    attn_impl: str = "xla",  # "flash" = differentiable Pallas (cache-less)
) -> Tuple[jax.Array, Optional[KVCache]]:
    """Run the decoder. Returns (logits (B, T, V) fp32, updated cache);
    with ``return_hidden``, (final hidden states (B, T, D), updated cache).

    With ``cache``: attends over the full cache (after scattering the current
    k/v at ``write_pos``); without: self-attention over the T inputs.
    """
    if inputs_embeds is None:
        inputs_embeds = embed_lookup(params, input_ids)
    x = inputs_embeds
    if cfg.scale_embeddings:
        x = x * jnp.asarray(cfg.hidden_size**0.5, dtype=x.dtype)

    use_flash = False
    if attn_impl == "flash" and cache is None and x.shape[1] > 1 and (
        cfg.attn_logit_softcapping is None
    ):
        from ultravox_tpu.ops.pallas.flash_attention import supports_shape

        use_flash = supports_shape(x.shape[1], cfg.head_dim)

    paged = isinstance(cache, PagedKVCache)
    if paged:
        assert page_table is not None, "PagedKVCache requires a page_table"
        # the XLA path attends over the gathered (pages_per_seq * page_size)
        # view; biases are built against that view length
        kv_len = page_table.shape[1] * cache.page_size
        write_page, write_off = paged_write_indices(
            page_table, write_pos, x.shape[1], cache.page_size,
            cache.num_pages,
        )
    else:
        kv_len = cache.max_len if cache is not None else x.shape[1]
        write_page = write_off = None
        page_table = None
    if use_flash:
        # masks are computed inside the kernel; no bias tensor is built
        bias_global = bias_local = None
    else:
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
        and cfg.attn_logit_softcapping is None
    )
    use_prefill_kernel = False
    if prefill_kernel and cache is not None and x.shape[1] > 1 and (
        cfg.sliding_window is None and cfg.attn_logit_softcapping is None
    ):
        from ultravox_tpu.ops.pallas.fused_attention import supports_shape

        use_prefill_kernel = supports_shape(cache.max_len, cfg.head_dim)

    if cache is not None and x.shape[1] == 1:
        # DECODE: unroll the layer loop. Each layer scatters its single new
        # k/v token into the (donated) full cache at a STATIC layer index and
        # reads its slab once — XLA chains the scatters in place, so the
        # step's cache traffic is exactly one cache read. A lax.scan here
        # ping-pongs the carried cache between two buffers, adding full
        # cache copies per step (measured 3-4x the HBM traffic).
        ck, cv = cache.k, cache.v
        for l in range(cfg.num_layers):
            p_l = jax.tree.map(lambda a: a[l], params["layers"])
            x, ck, cv = _decoder_layer(
                cfg, x, p_l, l, cos_g, sin_g, cos_l, sin_l,
                bias_global, bias_local, local_flags[l], ck, cv, write_pos,
                decode_kernel=use_decode_kernel,
                decode_lengths=kv_valid_len,
                paged_table=page_table,
                write_page=write_page,
                write_off=write_off,
            )
        new_cache = type(cache)(k=ck, v=cv)
    elif cache is not None:
        # PREFILL into a cache: per-layer T-token scatters; the cache rides
        # the scan carry (one write of the prompt region per layer).
        def layer_fn(carry, xs):
            h, ck, cv = carry
            p, is_loc, l = xs
            h, ck, cv = _decoder_layer(
                cfg, h, p, l, cos_g, sin_g, cos_l, sin_l,
                bias_global, bias_local, is_loc, ck, cv, write_pos,
                decode_kernel=False,
                prefill_kernel=use_prefill_kernel,
                decode_lengths=kv_valid_len,
                paged_table=page_table,
                write_page=write_page,
                write_off=write_off,
            )
            return (h, ck, cv), None

        if remat:
            layer_fn = jax.checkpoint(layer_fn)
        xs = (
            params["layers"],
            local_flags,
            jnp.arange(cfg.num_layers, dtype=jnp.int32),
        )
        (x, new_k, new_v), _ = jax.lax.scan(
            layer_fn, (x, cache.k, cache.v), xs
        )
        new_cache = type(cache)(k=new_k, v=new_v)
    else:

        def layer_fn(carry, xs):
            h = carry
            p, is_loc = xs
            h, _, _ = _decoder_layer(
                cfg, h, p, None, cos_g, sin_g, cos_l, sin_l,
                bias_global, bias_local, is_loc, None, None, None,
                flash_kernel=use_flash,
                decode_lengths=kv_valid_len,
            )
            return h, None

        if remat:
            layer_fn = jax.checkpoint(layer_fn)
        x, _ = jax.lax.scan(layer_fn, x, (params["layers"], local_flags))
        new_cache = None

    x = rms_norm(x, params["norm"], cfg.rms_norm_eps, plus_one=cfg.arch in ("gemma2", "gemma3"))
    if return_hidden:
        return x, new_cache

    logits = compute_logits(params, cfg, x)
    return logits, new_cache


def compute_logits(params: Params, cfg: DecoderConfig, hidden: jax.Array) -> jax.Array:
    """LM head: hidden (..., D) -> fp32 logits (..., V), with Gemma
    softcapping. Callers that only need one position (prefill TTFT) pass the
    gathered hidden state — computing the full (B, T, V) logits for a long
    prompt wastes ~V×T×D FLOPs and O(GB) of HBM."""
    head = params.get("lm_head")
    # tied models use the embedding matrix — EXCEPT the quantized
    # inference tree, which materializes a pre-transposed int8 head
    # (quantize_decoder_int8) so decode skips the per-step .T view; a
    # tied model's stray bf16 lm_head (some HF exports duplicate it)
    # still routes through the embedding so training gradients tie
    use_head = head is not None and (
        not cfg.tie_word_embeddings or "kernel_q" in head
    )
    if not use_head:
        if "embed_tokens_q" in params:
            logits = _proj(
                hidden,
                {
                    "kernel_q": params["embed_tokens_q"].T,
                    "scale": params["embed_scale"][None],
                },
            ).astype(jnp.float32)
        else:
            logits = (hidden @ params["embed_tokens"].T).astype(jnp.float32)
    else:
        if "kernel_q" in head:
            logits = _proj(hidden, head).astype(jnp.float32)
        else:
            logits = (hidden @ head["kernel"]).astype(jnp.float32)
    if cfg.final_logit_softcapping:
        cap = cfg.final_logit_softcapping
        logits = jnp.tanh(logits / cap) * cap
    return logits


# --------------------------------------------------------------------------
# Segmented fused decode (read-only prompt cache + small carried tail)
# --------------------------------------------------------------------------


def _merged_attention(q, kp, vp, bias_p, kt, vt, bias_t, scale, softcap=None):
    """Attention over two KV segments without concatenating them.

    ``kp/vp`` is the (large, read-only) prompt cache segment; ``kt/vt`` the
    (small) decode tail. Logits for both segments are computed separately,
    softmaxed jointly, and the value matmuls summed — the prompt cache is
    only ever READ, never copied or concatenated.
    q (B, 1, H, D); kp (B, S, Hkv, D); kt (B, Ts, Hkv, D);
    bias_* broadcastable to (B, 1, 1, S*).
    """
    B, T, H, D = q.shape
    Hkv = kp.shape[2]
    group = H // Hkv
    qf = (q * scale).reshape(B, T, Hkv, group, D)
    # biases arrive as (B|1, 1, S*) -> (B|1, 1, 1, 1, S*) for (B,Hkv,g,T,S*)
    lp = jnp.einsum(
        "bthgd,bshd->bhgts", qf, kp, preferred_element_type=jnp.float32
    )
    lt = jnp.einsum(
        "bthgd,bshd->bhgts", qf, kt, preferred_element_type=jnp.float32
    )
    if softcap is not None:  # gemma2: softcap before masking
        lp = jnp.tanh(lp / softcap) * softcap
        lt = jnp.tanh(lt / softcap) * softcap
    lp = lp + bias_p[:, None, None].astype(jnp.float32)
    lt = lt + bias_t[:, None, None].astype(jnp.float32)
    probs = jax.nn.softmax(jnp.concatenate([lp, lt], axis=-1), axis=-1)
    S = kp.shape[1]
    pp = probs[..., :S].astype(vp.dtype)
    pt = probs[..., S:].astype(vt.dtype)
    out = jnp.einsum(
        "bhgts,bshd->bthgd", pp, vp, preferred_element_type=jnp.float32
    ) + jnp.einsum(
        "bhgts,bshd->bthgd", pt, vt, preferred_element_type=jnp.float32
    )
    return out.reshape(B, T, H, D).astype(q.dtype)


def _segment_kernel_attention(
    cfg: DecoderConfig, q, prompt_cache, page_table, layer: int,
    prompt_lens, tail_k_l, tail_v_l, written, is_local: bool,
):
    """One layer's segmented flash-decode attention inside a scan step:
    the Pallas kernel reads the stacked cache (or pool pages) directly at
    ``layer`` — no per-layer slice of the big cache ever materialises.
    q may be (B, 1, H, D) (block decode) or (B, T, H, D) (spec verify)."""
    from ultravox_tpu.ops.pallas.segment_attention import (
        paged_segment_tail_attention,
        segment_tail_attention,
    )

    window = (
        cfg.sliding_window
        if (is_local and cfg.sliding_window is not None)
        else 0
    )
    layer_idx = jnp.asarray(layer, jnp.int32)
    if page_table is not None:
        return paged_segment_tail_attention(
            q, prompt_cache.k, prompt_cache.v, layer_idx, page_table,
            prompt_lens, tail_k_l, tail_v_l, written, window,
            scale=cfg.attn_scale,
        )
    return segment_tail_attention(
        q, prompt_cache.k, prompt_cache.v, layer_idx, prompt_lens,
        tail_k_l, tail_v_l, written, window, scale=cfg.attn_scale,
    )


def segmented_decode_scan(
    params: Params,
    cfg: DecoderConfig,
    prompt_cache,  # KVCache (L, B, S, Hkv, Dh) — read-only during the scan —
    # or, with ``page_table``, a PagedKVCache pool read by the kernel
    prompt_lens: jax.Array,  # (B,) valid prompt positions in the cache
    first_tokens: jax.Array,  # (B,) int32
    rng: jax.Array,
    *,
    n_steps: int,
    sample_fn,  # (logits (B, V), key) -> (B,) int32
    return_tail: bool = False,
    attn_impl: str = "xla",  # "kernel" = segmented flash decode (Pallas)
    page_table: Optional[jax.Array] = None,  # kernel-only paged mode
):
    """Fused n-step greedy/sampled decode with segmented KV.

    A ``lax.scan`` that carries the big KV cache double-buffers it — one full
    cache copy per token (measured ~4x the ideal HBM traffic). Here the
    prompt cache enters as a closure constant (XLA never copies it) and new
    tokens write into an (L, B, n_steps, Hkv, Dh) tail that IS carried — but
    it is max_new_tokens slots, so its copies are noise. Decode-step cache
    traffic = one read of the prompt cache + tail, the bandwidth minimum.

    ``attn_impl="kernel"`` runs each step's attention in the segmented
    flash-decode kernel (ops/pallas/segment_attention.py): the prompt read
    stops at each row's actual length and no (B, Hkv, G, T, S) fp32 logits
    ever reach HBM. With ``page_table`` the kernel DMAs live pool pages
    directly — no contiguous view gather. Callers gate on
    ``attn_logit_softcapping is None`` (the kernel does not softcap).

    Returns the (B, n_steps + 1) token matrix: column 0 is ``first_tokens``
    (already sampled from prefill logits) followed by the ``n_steps`` newly
    sampled tokens; with ``return_tail`` also returns the (L, B, n_steps,
    Hkv, Dh) tail KV of the PROCESSED tokens (toks column t's kv sits at
    tail slot t).
    """
    use_kernel = attn_impl == "kernel"
    if page_table is not None:
        if not use_kernel:
            raise ValueError(
                "paged segmented scan requires attn_impl='kernel' — the XLA "
                "path takes a pre-gathered contiguous view"
            )
        L, _, page_size, Hkv, Dh = prompt_cache.k.shape
        B = first_tokens.shape[0]
        S = page_table.shape[1] * page_size
    else:
        L, B, S, Hkv, Dh = prompt_cache.k.shape
    plus_one = cfg.arch in ("gemma2", "gemma3")
    local_flags = is_local_layer(cfg)

    inv_freq_g = jnp.asarray(
        rope_frequencies(cfg.head_dim, cfg.rope_theta, cfg.rope_scaling)
    )
    inv_freq_l = (
        jnp.asarray(rope_frequencies(cfg.head_dim, cfg.rope_local_base_freq))
        if cfg.rope_local_base_freq is not None
        else inv_freq_g
    )

    kpos = jnp.arange(S, dtype=jnp.int32)[None]  # (1, S)
    tail_shape = (L, B, n_steps, Hkv, Dh)
    tail_k0 = jnp.zeros(tail_shape, prompt_cache.k.dtype)
    tail_v0 = jnp.zeros(tail_shape, prompt_cache.v.dtype)
    tpos = jnp.arange(n_steps, dtype=jnp.int32)[None]  # (1, Ts)

    def step(carry, step_idx):
        tok, tail_k, tail_v, key = carry
        x = embed_lookup(params, tok)[:, None]  # (B, 1, D)
        if cfg.scale_embeddings:
            x = x * jnp.asarray(cfg.hidden_size**0.5, dtype=x.dtype)
        positions = (prompt_lens + step_idx)[:, None]  # (B, 1)
        cos_g, sin_g = rope_cos_sin(positions, inv_freq_g)
        cos_l, sin_l = rope_cos_sin(positions, inv_freq_l)

        if not use_kernel:
            # prompt-segment bias: key j visible iff j < prompt_len (B,1,S)
            ok_p = kpos < prompt_lens[:, None]
            # tail-segment bias: tail slot t visible iff t <= step (1, Ts)
            ok_t = tpos <= step_idx
            if cfg.sliding_window is not None:
                w = cfg.sliding_window
                # absolute distance: prompt key j -> q at prompt_len + step
                ok_p_loc = ok_p & (
                    prompt_lens[:, None] + step_idx - kpos < w
                )
                ok_t_loc = ok_t & ((step_idx - tpos) < w)
            biases = {}
            for name, ok in (("p", ok_p), ("t", ok_t)):
                biases[name] = jnp.where(ok, 0.0, NEG_INF)[:, None]
            if cfg.sliding_window is not None:
                biases["p_loc"] = jnp.where(ok_p_loc, 0.0, NEG_INF)[:, None]
                biases["t_loc"] = jnp.where(ok_t_loc, 0.0, NEG_INF)[:, None]
        else:
            written = jnp.full((B,), step_idx, jnp.int32)

        for l in range(L):
            p = jax.tree.map(lambda a: a[l], params["layers"])
            is_loc = bool(local_flags[l])
            h = rms_norm(x, p["input_ln"], cfg.rms_norm_eps, plus_one=plus_one)
            q, k, v = _qkv(cfg, h, p)
            if cfg.qk_norm:
                q = rms_norm(q, p["q_norm"], cfg.rms_norm_eps, plus_one=plus_one)
                k = rms_norm(k, p["k_norm"], cfg.rms_norm_eps, plus_one=plus_one)
            cos, sin = (cos_l, sin_l) if (
                is_loc and cfg.rope_local_base_freq is not None
            ) else (cos_g, sin_g)
            q = apply_rope(q, cos, sin)
            k = apply_rope(k, cos, sin)
            # tail write at a uniform (per-step) slot — dynamic_update_slice,
            # no per-row scatter needed
            tail_k = jax.lax.dynamic_update_slice(
                tail_k, k.astype(tail_k.dtype)[None], (l, 0, step_idx, 0, 0)
            )
            tail_v = jax.lax.dynamic_update_slice(
                tail_v, v.astype(tail_v.dtype)[None], (l, 0, step_idx, 0, 0)
            )
            if use_kernel:
                attn = _segment_kernel_attention(
                    cfg, q, prompt_cache, page_table, l, prompt_lens,
                    tail_k[l], tail_v[l], written, is_loc,
                )
            else:
                bias_p = biases["p_loc"] if (is_loc and cfg.sliding_window) else biases["p"]
                bias_t = biases["t_loc"] if (is_loc and cfg.sliding_window) else biases["t"]
                attn = _merged_attention(
                    q, prompt_cache.k[l], prompt_cache.v[l], bias_p,
                    tail_k[l], tail_v[l], bias_t, cfg.attn_scale,
                    softcap=cfg.attn_logit_softcapping,
                )
            attn = _proj(attn.reshape(B, 1, cfg.num_heads * Dh), p["o_proj"])
            if cfg.use_post_norms:
                attn = rms_norm(attn, p["post_attn_ln"], cfg.rms_norm_eps,
                                plus_one=plus_one)
                x = x + attn
                h = rms_norm(x, p["pre_ffn_ln"], cfg.rms_norm_eps,
                             plus_one=plus_one)
            else:
                x = x + attn
                h = rms_norm(x, p["post_attn_ln"], cfg.rms_norm_eps,
                             plus_one=plus_one)
            mlp = _mlp(cfg, h, p)
            if cfg.use_post_norms:
                mlp = rms_norm(mlp, p["post_ffn_ln"], cfg.rms_norm_eps,
                               plus_one=plus_one)
            x = x + mlp

        x = rms_norm(x, params["norm"], cfg.rms_norm_eps, plus_one=plus_one)
        logits = compute_logits(params, cfg, x[:, 0])
        key, step_key = jax.random.split(key)
        nxt = sample_fn(logits, step_key)
        return (nxt, tail_k, tail_v, key), nxt

    (_, tail_k, tail_v, _), toks = jax.lax.scan(
        step,
        (first_tokens, tail_k0, tail_v0, rng),
        jnp.arange(n_steps, dtype=jnp.int32),
    )
    # (B, n_steps + 1): first_tokens followed by the n_steps sampled tokens
    all_toks = jnp.concatenate(
        [first_tokens[:, None], jnp.transpose(toks)], axis=1
    )
    if return_tail:
        # tail (L, B, n_steps, Hkv, Dh): the kv of each PROCESSED token
        # (first_tokens at slot 0, then each sampled token) — callers write
        # it back into their persistent cache at [prompt_lens + t]
        return all_toks, KVCache(k=tail_k, v=tail_v)
    return all_toks


def segmented_spec_scan(
    params: Params,
    cfg: DecoderConfig,
    prompt_cache: KVCache,  # (L, B, S, Hkv, Dh) — read-only during the scan
    prompt_lens: jax.Array,  # (B,) valid positions in the cache
    first_tokens: jax.Array,  # (B,) int32 — pending (sampled, unwritten)
    hist: jax.Array,  # (B, S_hist) int32 token history (prompt + sampled)
    draft_fn,  # (hist, hist_len (B,)) -> (B, K) int32 draft tokens
    accept_fn,  # (logits (B,T,V), drafts, rng, positions (B,)) ->
    #   (out (B,T) int32 emitted tokens, accepted (B,) in [1, T])
    rng: jax.Array,
    *,
    n_rounds: int,
    K: int,
    attn_impl: str = "xla",  # "kernel" = segmented flash decode (Pallas)
    page_table: Optional[jax.Array] = None,  # kernel-only paged mode
):
    """``n_rounds`` speculative draft+verify rounds in ONE dispatch: each
    round drafts K tokens from the carried token history (``draft_fn``),
    verifies ``[pending, draft_0..draft_{K-1}]`` in a single (K+1)-token
    forward against the read-only prompt cache plus a carried KV tail, and
    emits the tokens ``accept_fn`` keeps (greedy argmax match, or
    speculative rejection sampling — the caller's policy). Between
    ``n_rounds`` (all drafts miss) and ``n_rounds*(K+1)`` (all hit) tokens
    per dispatch for ``n_rounds`` weight reads — composing speculation's
    weight-traffic amortization with the multi-step block's dispatch
    amortization (segmented_decode_scan's KV layout; rejected tokens'
    tail writes are overwritten by the next round, so the tail stays a
    contiguous run of accepted tokens).

    Returns ``(outs (n_rounds, B, K+1), accepts (n_rounds, B), tail
    KVCache (L, B, n_rounds*(K+1), Hkv, Dh), written (B,), last (B,),
    new_hist)``: tail slots [0, written_b) hold row b's accepted tokens'
    KV contiguously (callers publish them at [prompt_lens + t]); ``last``
    is each row's new pending token; ``new_hist`` carries the accepted
    tokens appended. Round r of row b emitted ``accepts[r, b]`` tokens:
    ``outs[r, b, :accepts[r, b]]``."""
    use_kernel = attn_impl == "kernel"
    if page_table is not None:
        if not use_kernel:
            raise ValueError(
                "paged segmented spec scan requires attn_impl='kernel'"
            )
        L, _, page_size, Hkv, Dh = prompt_cache.k.shape
        B = first_tokens.shape[0]
        S = page_table.shape[1] * page_size
    else:
        L, B, S, Hkv, Dh = prompt_cache.k.shape
    T = K + 1
    Ts = n_rounds * T
    plus_one = cfg.arch in ("gemma2", "gemma3")
    local_flags = is_local_layer(cfg)
    bidx = jnp.arange(B, dtype=jnp.int32)

    inv_freq_g = jnp.asarray(
        rope_frequencies(cfg.head_dim, cfg.rope_theta, cfg.rope_scaling)
    )
    inv_freq_l = (
        jnp.asarray(rope_frequencies(cfg.head_dim, cfg.rope_local_base_freq))
        if cfg.rope_local_base_freq is not None
        else inv_freq_g
    )

    kpos = jnp.arange(S, dtype=jnp.int32)[None]  # (1, S)
    seg_i = jnp.arange(T, dtype=jnp.int32)  # in-segment query index
    tail_t = jnp.arange(Ts, dtype=jnp.int32)  # tail key slot
    tail_k0 = jnp.zeros((L, B, Ts, Hkv, Dh), prompt_cache.k.dtype)
    tail_v0 = jnp.zeros((L, B, Ts, Hkv, Dh), prompt_cache.v.dtype)
    if not use_kernel:
        # prompt-segment visibility is query-independent (every query sits
        # after the prompt): computed once outside the scan
        ok_p = kpos < prompt_lens[:, None]  # (B, S)
        bias_p = jnp.where(ok_p, 0.0, NEG_INF)[:, None]  # (B, 1, S)

    def step(carry, round_idx):
        tok, written, tail_k, tail_v, hist = carry
        hl = prompt_lens + written + 1  # known tokens incl. pending
        drafts = draft_fn(hist, hl)  # (B, K)
        seg = jnp.concatenate([tok[:, None], drafts], axis=1)  # (B, T)
        x = embed_lookup(params, seg)
        if cfg.scale_embeddings:
            x = x * jnp.asarray(cfg.hidden_size**0.5, dtype=x.dtype)
        positions = (prompt_lens + written)[:, None] + seg_i[None]  # (B, T)
        cos_g, sin_g = rope_cos_sin(positions, inv_freq_g)
        cos_l, sin_l = rope_cos_sin(positions, inv_freq_l)

        if not use_kernel:
            # tail slot t visible to query i iff t <= written + i (covers
            # both previously accepted tokens and in-segment causality;
            # slots past written + i hold garbage from rejected drafts)
            ok_t = tail_t[None, None] <= (
                written[:, None] + seg_i[None]
            )[:, :, None]  # (B, T, Ts)
            bias_t = jnp.where(ok_t, 0.0, NEG_INF)  # (B, T, Ts)
            if cfg.sliding_window is not None:
                w = cfg.sliding_window
                # absolute distance: query abs pos - key abs pos < w
                d_p = positions[:, :, None] - kpos[:, None]  # (B, T, S)
                bias_p_loc = jnp.where(
                    ok_p[:, None] & (d_p < w), 0.0, NEG_INF
                )
                d_t = (written[:, None] + seg_i[None])[:, :, None] - tail_t
                bias_t_loc = jnp.where(ok_t & (d_t < w), 0.0, NEG_INF)
        # per-row write offsets for this round's K+1 tokens
        tpos_w = written[:, None] + seg_i[None]  # (B, T), always in bounds

        for l in range(L):
            p = jax.tree.map(lambda a: a[l], params["layers"])
            is_loc = bool(local_flags[l])
            h = rms_norm(x, p["input_ln"], cfg.rms_norm_eps, plus_one=plus_one)
            q, k, v = _qkv(cfg, h, p)
            if cfg.qk_norm:
                q = rms_norm(q, p["q_norm"], cfg.rms_norm_eps, plus_one=plus_one)
                k = rms_norm(k, p["k_norm"], cfg.rms_norm_eps, plus_one=plus_one)
            cos, sin = (cos_l, sin_l) if (
                is_loc and cfg.rope_local_base_freq is not None
            ) else (cos_g, sin_g)
            q = apply_rope(q, cos, sin)
            k = apply_rope(k, cos, sin)
            tail_k = tail_k.at[l, bidx[:, None], tpos_w].set(
                k.astype(tail_k.dtype), unique_indices=True
            )
            tail_v = tail_v.at[l, bidx[:, None], tpos_w].set(
                v.astype(tail_v.dtype), unique_indices=True
            )
            if use_kernel:
                attn = _segment_kernel_attention(
                    cfg, q, prompt_cache, page_table, l, prompt_lens,
                    tail_k[l], tail_v[l], written, is_loc,
                )
            else:
                b_p = bias_p_loc if (is_loc and cfg.sliding_window) else bias_p
                b_t = bias_t_loc if (is_loc and cfg.sliding_window) else bias_t
                attn = _merged_attention(
                    q, prompt_cache.k[l], prompt_cache.v[l], b_p,
                    tail_k[l], tail_v[l], b_t, cfg.attn_scale,
                    softcap=cfg.attn_logit_softcapping,
                )
            attn = _proj(attn.reshape(B, T, cfg.num_heads * Dh), p["o_proj"])
            if cfg.use_post_norms:
                attn = rms_norm(attn, p["post_attn_ln"], cfg.rms_norm_eps,
                                plus_one=plus_one)
                x = x + attn
                h = rms_norm(x, p["pre_ffn_ln"], cfg.rms_norm_eps,
                             plus_one=plus_one)
            else:
                x = x + attn
                h = rms_norm(x, p["post_attn_ln"], cfg.rms_norm_eps,
                             plus_one=plus_one)
            mlp = _mlp(cfg, h, p)
            if cfg.use_post_norms:
                mlp = rms_norm(mlp, p["post_ffn_ln"], cfg.rms_norm_eps,
                               plus_one=plus_one)
            x = x + mlp

        x = rms_norm(x, params["norm"], cfg.rms_norm_eps, plus_one=plus_one)
        out, acc = accept_fn(
            compute_logits(params, cfg, x), drafts,
            jax.random.fold_in(rng, round_idx), hl,
        )
        # history gains the accepted tokens at hl + i (rejected columns
        # drop out of bounds; duplicates are fine without unique_indices)
        S_hist = hist.shape[1]
        wpos = jnp.where(seg_i[None] < acc[:, None], hl[:, None] + seg_i[None],
                         S_hist)
        hist = hist.at[bidx[:, None], wpos].set(out, mode="drop")
        new_tok = out[bidx, acc - 1]
        return (new_tok, written + acc, tail_k, tail_v, hist), (out, acc)

    (last, written, tail_k, tail_v, hist), (outs, accepts) = jax.lax.scan(
        step,
        (first_tokens, jnp.zeros((B,), jnp.int32), tail_k0, tail_v0, hist),
        jnp.arange(n_rounds, dtype=jnp.uint32),
    )
    return outs, accepts, KVCache(k=tail_k, v=tail_v), written, last, hist


def fuse_inference_params(params: Params, cfg: DecoderConfig) -> Params:
    """Derive an inference-optimised decoder tree with q/k/v and gate/up
    kernels concatenated into single matmuls ("qkv_proj", "gateup_proj").

    Decode steps at small batch are HBM-bound AND launch-bound: 7 skinny
    matmuls per layer each pay kernel-launch overhead and underutilise the
    HBM pipeline. Fusing cuts that to 4. One-time HBM copy at engine
    construction; the canonical (trainable / exportable / shardable) layout
    is untouched. No-op (returns the input) when LoRA adapters are present
    or the params are sharded over multiple devices."""
    ly = params["layers"]
    if "qkv_proj" in ly or "kernel" not in ly.get("q_proj", {}):
        return params  # already fused and/or quantized
    for name in ("q_proj", "k_proj", "v_proj", "gate_proj", "up_proj"):
        if "lora_a" in ly.get(name, {}):
            return params
    leaf = ly["q_proj"]["kernel"]
    if isinstance(leaf, jax.Array) and len(leaf.sharding.device_set) > 1:
        return params

    new_layers = dict(ly)
    qkv = {"kernel": jnp.concatenate(
        [ly["q_proj"]["kernel"], ly["k_proj"]["kernel"], ly["v_proj"]["kernel"]],
        axis=-1,
    )}
    if "bias" in ly["q_proj"]:
        qkv["bias"] = jnp.concatenate(
            [ly["q_proj"]["bias"], ly["k_proj"]["bias"], ly["v_proj"]["bias"]],
            axis=-1,
        )
    new_layers["qkv_proj"] = qkv
    new_layers["gateup_proj"] = {"kernel": jnp.concatenate(
        [ly["gate_proj"]["kernel"], ly["up_proj"]["kernel"]], axis=-1
    )}
    for name in ("q_proj", "k_proj", "v_proj", "gate_proj", "up_proj"):
        del new_layers[name]
    out = dict(params)
    out["layers"] = new_layers
    return out


def _qkv(cfg: DecoderConfig, h: jax.Array, p: Params):
    """(q, k, v) heads from either the fused or the canonical projections."""
    B, T, _ = h.shape
    Hq, Hkv, Dh = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    if "qkv_proj" in p:
        qkv = _proj(h, p["qkv_proj"])
        q = qkv[..., : Hq * Dh]
        k = qkv[..., Hq * Dh: (Hq + Hkv) * Dh]
        v = qkv[..., (Hq + Hkv) * Dh:]
    else:
        q = _proj(h, p["q_proj"])
        k = _proj(h, p["k_proj"])
        v = _proj(h, p["v_proj"])
    return (
        q.reshape(B, T, Hq, Dh),
        k.reshape(B, T, Hkv, Dh),
        v.reshape(B, T, Hkv, Dh),
    )


def _mlp(cfg: DecoderConfig, h: jax.Array, p: Params) -> jax.Array:
    if "gateup_proj" in p:
        gu = _proj(h, p["gateup_proj"])
        gate, up = jnp.split(gu, 2, axis=-1)
    else:
        gate = _proj(h, p["gate_proj"])
        up = _proj(h, p["up_proj"])
    return _proj(_act(cfg, gate) * up, p["down_proj"])


# --------------------------------------------------------------------------
# int8 weight-only quantization (serving)
# --------------------------------------------------------------------------


def embed_lookup(params: Params, ids: jax.Array) -> jax.Array:
    """Token-embedding rows, dequantizing int8 storage when present."""
    if "embed_tokens_q" in params:
        rows = jnp.take(params["embed_tokens_q"], ids, axis=0)
        scales = jnp.take(params["embed_scale"], ids, axis=0)
        return rows.astype(scales.dtype) * scales[..., None]
    return jnp.take(params["embed_tokens"], ids, axis=0)


from functools import partial


@partial(jax.jit, static_argnums=(1,))
def _quantize_kernel(kernel: jax.Array, axis: int = -2):
    """Per-output-channel symmetric int8: scale over the contraction axis.

    Jitted so the fp32 upcasts fuse into the reduction / int8-cast loops —
    eager, each `.astype(jnp.float32)` materializes a full fp32 copy, which
    at 70B layer dims (a (3, 8192, 57344) gateup slice = 5.6 GB fp32,
    twice) RESOURCE_EXHAUSTs a 16 GB chip that holds the bf16 source +
    int8 output comfortably."""
    amax = jnp.max(jnp.abs(kernel.astype(jnp.float32)), axis=axis, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(kernel.astype(jnp.float32) / scale), -127, 127)
    return q.astype(jnp.int8), scale.astype(jnp.bfloat16)


@jax.jit
def _quantize_embedding(emb: jax.Array):
    """Per-ROW symmetric int8 for the token embedding (fused, see above)."""
    emb32 = emb.astype(jnp.float32)
    amax = jnp.max(jnp.abs(emb32), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(emb32 / scale), -127, 127).astype(jnp.int8)
    return q, scale[..., 0].astype(jnp.bfloat16)


def quantize_decoder_int8(params: Params) -> Params:
    """Weight-only int8 for the decoder: projection kernels, the token
    embedding, and the LM head become int8 + per-channel bf16 scales.

    Decode at small batch is weight-HBM-bound, so halving weight bytes is a
    near-2x decode speedup — and it makes 8B-class models servable on one
    16 GB v5e chip. Activations and the KV cache stay bf16 (w8a16)."""
    out = dict(params)
    layers = {}
    for name, leaf in params["layers"].items():
        if isinstance(leaf, dict) and "kernel" in leaf:
            q, scale = _quantize_kernel(leaf["kernel"])
            new = {"kernel_q": q, "scale": scale}
            if "bias" in leaf:
                new["bias"] = leaf["bias"]
            # LoRA rides on top of the int8 base (QLoRA-style serving):
            # proj_apply adds the bf16 low-rank branch after the int8 dot
            for k in ("lora_a", "lora_b", "lora_scale"):
                if k in leaf:
                    new[k] = leaf[k]
            layers[name] = new
        else:
            layers[name] = leaf
    out["layers"] = layers
    out["embed_tokens_q"], out["embed_scale"] = _quantize_embedding(
        params["embed_tokens"]
    )
    del out["embed_tokens"]
    if "lm_head" in params:
        q, scale = _quantize_kernel(params["lm_head"]["kernel"])
        out["lm_head"] = {"kernel_q": q, "scale": scale}
    else:
        # tied embeddings: materialize the (D, V) transposed int8 head once
        # — the per-step embed_tokens_q.T view costs a measured ~0.085 ms
        # per 1B decode step on v5e (~3% of the step) that a one-time HBM
        # copy (V*D bytes) removes; compute_logits prefers lm_head when
        # present and the math is identical (same int8 values and scales)
        out["lm_head"] = {
            # jnp.copy forces a real (D, V)-layout buffer, not a .T view
            "kernel_q": jnp.copy(out["embed_tokens_q"].T),
            "scale": out["embed_scale"][None],
        }
    return out
