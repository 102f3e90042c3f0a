"""Attention primitives.

Batched multi-head attention with GQA support, fp32 softmax, and additive-bias
masking. This einsum path relies on XLA:TPU fusion and accepts arbitrary
bias tensors; the Pallas kernels (``ops.pallas.fused_attention`` for
inference, ``ops.pallas.flash_attention`` for differentiable training paths)
compute their masks in-kernel from scalars instead and are selected by the
model-level ``attn_impl`` arguments, not here.

Replaces the reference's reliance on torch SDPA / flash-attention-2
(ultravox_model.py:24-30).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = float(jnp.finfo(jnp.float32).min)


def mha(
    q: jax.Array,  # (B, T, H, D)
    k: jax.Array,  # (B, S, Hkv, D)
    v: jax.Array,  # (B, S, Hkv, D)
    *,
    bias: Optional[jax.Array] = None,  # broadcastable to (B, H, T, S), additive
    scale: Optional[float] = None,
    is_causal: bool = False,
    softcap: Optional[float] = None,  # gemma2 attn logit softcapping
) -> jax.Array:
    """Multi-head attention with grouped KV heads. Returns (B, T, H, D).

    Softmax runs in float32 regardless of input dtype; the output is cast back
    to the query dtype.
    """
    B, T, H, D = q.shape
    S = k.shape[1]
    Hkv = k.shape[2]
    assert H % Hkv == 0, f"query heads {H} not a multiple of kv heads {Hkv}"
    group = H // Hkv
    if scale is None:
        scale = D**-0.5

    # keep k/v in their storage dtype (bf16 caches stay bf16 in HBM — an
    # explicit fp32 cast would double the cache read traffic with a
    # materialized copy); the MXU accumulates in fp32 via
    # preferred_element_type, and the softmax runs in fp32
    qf = (q * scale).reshape(B, T, Hkv, group, D)
    # (B, Hkv, group, T, S)
    logits = jnp.einsum(
        "bthgd,bshd->bhgts", qf, k,
        preferred_element_type=jnp.float32, optimize=True,
    )
    if softcap is not None:
        # gemma2: tanh(logits / cap) * cap BEFORE masking (HF order)
        logits = jnp.tanh(logits / softcap) * softcap
    if is_causal:
        causal = jnp.tril(jnp.ones((T, S), dtype=bool), k=S - T)
        logits = jnp.where(causal[None, None, None], logits, NEG_INF)
    if bias is not None:
        b = jnp.broadcast_to(bias, (B, H, T, S)) if bias.ndim == 4 else bias
        logits = logits + b.reshape(B, Hkv, group, T, S).astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum(
        "bhgts,bshd->bthgd", probs.astype(v.dtype), v,
        preferred_element_type=jnp.float32, optimize=True,
    )
    return out.reshape(B, T, H, D).astype(q.dtype)


def decode_attention(
    q: jax.Array,  # (B, 1, H, D) — single query step
    k_cache: jax.Array,  # (B, S_max, Hkv, D)
    v_cache: jax.Array,  # (B, S_max, Hkv, D)
    cache_len: jax.Array,  # (B,) int32 — valid prefix length incl. this step
    *,
    scale: Optional[float] = None,
) -> jax.Array:
    """Single-step decode attention against a static-shape KV cache.

    Positions >= cache_len are masked out, so the cache can be a fixed-size
    ring/linear buffer shared across a continuously-batched set of requests.
    """
    B, _, H, D = q.shape
    S = k_cache.shape[1]
    if scale is None:
        scale = D**-0.5
    pos = jnp.arange(S, dtype=jnp.int32)[None, :]  # (1, S)
    valid = pos < cache_len[:, None]  # (B, S)
    bias = jnp.where(valid, 0.0, NEG_INF)[:, None, None, :]  # (B,1,1,S)
    return mha(q, k_cache, v_cache, bias=bias, scale=scale)


def length_mask_bias(
    lengths: jax.Array,  # (B,) int32
    seq_len: int,
    *,
    dtype=jnp.float32,
) -> jax.Array:
    """Additive bias (B, 1, 1, S): 0 for positions < length, -inf after.

    Replaces the reference encoder's extended attention mask construction
    (ultravox_model.py:915-926).
    """
    pos = jnp.arange(seq_len, dtype=jnp.int32)[None, :]
    valid = pos < lengths[:, None]
    return jnp.where(valid, 0.0, NEG_INF)[:, None, None, :].astype(dtype)


def block_causal_bias(seq_len: int, block_size: int) -> jax.Array:
    """Block-causal streaming latency mask (1, 1, T, T).

    Re-expression of the reference's ``init_latency_mask``
    (ultravox_model.py:834-863): position i may attend to position j iff
    ``j // block_size <= i // block_size``.
    """
    blk = jnp.arange(seq_len, dtype=jnp.int32) // block_size
    allowed = blk[None, :] <= blk[:, None]
    return jnp.where(allowed, 0.0, NEG_INF)[None, None].astype(jnp.float32)
