"""Fused multi-head attention kernel for TPU.

Replaces the XLA einsum-attention path on the inference/frozen-encoder hot
loops. The einsum path materialises the (B, H, T, S) fp32 logits tensor in
HBM (1.4 GB for the 30 s whisper-large encoder at batch 8) — measured ~9× off
matmul speed-of-light on v5e. This kernel keeps K/V and the logits block in
VMEM: one grid step handles one (batch, head, query-block), computing
``softmax(q K^T / sqrt(d) + mask) V`` entirely on-chip.

Masks are computed in-kernel from scalars (never materialised in HBM):
- ``lengths``   — per-sequence valid key length (encoder padding mask,
  reference ultravox_model.py:915-926);
- ``latency_block`` — block-causal streaming mask (reference
  ultravox_model.py:834-863);
- ``causal``    — decoder self-attention.

GQA: query heads may be a multiple of kv heads; the kv block index maps
h -> h // group.

Supported shapes: full K/V for one (b, h) must fit VMEM — S·D ≤ ~64K elems
(S=3000, D=64 → 750 KB as bf16 ×2) which covers the whisper encoder window
and serving caches up to ~8K at D=64. Longer sequences fall back to XLA.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)


def _attn_kernel(
    lengths_ref,  # SMEM (B,) or None-like (always passed; dummy when unused)
    offsets_ref,  # SMEM (B,) absolute position of query row 0 (prefill at
    # a nonzero cache offset — conversation suffixes, chunked prefill)
    q_ref,  # (1, 1, bq, D)
    k_ref,  # (1, 1, S, D)
    v_ref,  # (1, 1, S, D)
    o_ref,  # (1, 1, bq, D)
    *,
    scale: float,
    causal: bool,
    use_lengths: bool,
    latency_block: int,
    block_q: int,
    seq_len: int,
    n_chunks: int = 1,
):
    b = pl.program_id(0)
    iq = pl.program_id(2)

    k = k_ref[0, 0]
    v = v_ref[0, 0]

    col_bias = None
    if use_lengths and not (causal or latency_block > 0):
        # column-only mask (encoder length masking): build a (1, S) additive
        # bias and broadcast-add it — one pass over the logits instead of
        # five (two iotas, compare, and, where), which is a measurable slice
        # of the encoder's VPU time at S=1500
        col = jax.lax.broadcasted_iota(jnp.int32, (8, seq_len), 1)
        col_bias = jnp.where(col < lengths_ref[b], 0.0, NEG_INF)[:1]

    chunk = block_q // n_chunks

    def qk(j):
        # keep the QK^T operands in their native (bf16) dtype — the MXU runs
        # bf16 x bf16 -> fp32 at full rate; upcasting first quarters
        # throughput. log2(e) is folded into the scale so the softmax can
        # use exp2 (cheaper on the VPU than exp).
        q = q_ref[0, 0, j * chunk:(j + 1) * chunk]
        return jnp.dot(q, k.T, preferred_element_type=jnp.float32) * (
            scale * 1.4426950408889634
        )  # (chunk, S)

    # Software pipeline over query chunks: chunk j's VPU softmax is
    # independent of chunk j+1's MXU QK^T dot, so issuing the next dot
    # before the current softmax lets Mosaic overlap MXU and VPU — with
    # one monolithic block the three phases serialize and the MXU idles
    # for the entire exp2/max/sum pass (the dominant slice of the 54-vs-98
    # TF/s encoder-attention gap measured in r3/r4).
    s_next = qk(0)
    for j in range(n_chunks):
        s = s_next
        if j + 1 < n_chunks:
            s_next = qk(j + 1)

        if causal or latency_block > 0:
            rows = (
                offsets_ref[b]
                + iq * block_q
                + j * chunk
                + jax.lax.broadcasted_iota(jnp.int32, (chunk, seq_len), 0)
            )
            cols = jax.lax.broadcasted_iota(jnp.int32, (chunk, seq_len), 1)
            mask = jnp.ones((chunk, seq_len), dtype=jnp.bool_)
            if use_lengths:
                mask &= cols < lengths_ref[b]
            if causal:
                mask &= cols <= rows
            if latency_block > 0:
                mask &= (cols // latency_block) <= (rows // latency_block)
            s = jnp.where(mask, s, NEG_INF)
        elif col_bias is not None:
            s = s + col_bias

        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp2(s - m)
        z = jnp.sum(e, axis=-1, keepdims=True)
        # deferred normalisation: divide the (chunk, D) output, not the
        # (chunk, S) probabilities — saves a full pass over the logits
        o = jnp.dot(
            e.astype(v.dtype), v, preferred_element_type=jnp.float32
        )
        o_ref[0, 0, j * chunk:(j + 1) * chunk] = (o / z).astype(o_ref.dtype)


def fused_attention(
    q, k, v, lengths=None, row_offsets=None, *, scale=None, causal=False,
    latency_block=0, block_q=256, n_chunks=1, interpret=None,
):
    """Fused attention; ``interpret=None`` auto-selects interpret mode on the
    CPU backend so the kernel path stays CPU-testable.

    ``n_chunks`` > 1 software-pipelines the query block inside the kernel
    (see _attn_kernel): chunk j's softmax overlaps chunk j+1's QK^T on the
    MXU. ``block_q`` may exceed T in that case (T is padded up); the chunk
    size block_q/n_chunks must be a multiple of 8 (Mosaic sublane)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    return _fused_attention(
        q, k, v, lengths, row_offsets, scale=scale, causal=causal,
        latency_block=latency_block, block_q=block_q, n_chunks=n_chunks,
        interpret=interpret,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "scale", "causal", "latency_block", "block_q", "n_chunks", "interpret"
    ),
)
def _fused_attention(
    q: jax.Array,  # (B, T, H, D)
    k: jax.Array,  # (B, S, Hkv, D)
    v: jax.Array,  # (B, S, Hkv, D)
    lengths: Optional[jax.Array] = None,  # (B,) int32 valid key length
    row_offsets: Optional[jax.Array] = None,  # (B,) absolute pos of q row 0
    *,
    scale: Optional[float] = None,
    causal: bool = False,
    latency_block: int = 0,
    block_q: int = 256,
    n_chunks: int = 1,
    interpret: bool = False,
) -> jax.Array:
    # (see fused_attention wrapper) returns (B, T, H, D) in q.dtype

    B, T, H, D = q.shape
    S = k.shape[1]
    Hkv = k.shape[2]
    group = H // Hkv
    if scale is None:
        scale = D**-0.5

    if n_chunks == 1:
        block_q = min(block_q, T)
    elif block_q % n_chunks or (block_q // n_chunks) % 8:
        raise ValueError(
            f"block_q {block_q} must split into n_chunks={n_chunks} "
            "sublane-aligned (multiple-of-8) chunks"
        )
    # pad T to a multiple of block_q (for n_chunks > 1 the padded query
    # rows are self-contained garbage: per-row softmax, output sliced off)
    T_pad = -(-T // block_q) * block_q
    if T_pad != T:
        q = jnp.pad(q, ((0, 0), (0, T_pad - T), (0, 0), (0, 0)))

    qt = jnp.transpose(q, (0, 2, 1, 3))  # (B, H, T, D)
    kt = jnp.transpose(k, (0, 2, 1, 3))  # (B, Hkv, S, D)
    vt = jnp.transpose(v, (0, 2, 1, 3))

    use_lengths = lengths is not None
    if lengths is None:
        lengths = jnp.full((B,), S, jnp.int32)
    if row_offsets is None:
        row_offsets = jnp.zeros((B,), jnp.int32)

    grid = (B, H, T_pad // block_q)
    kernel = functools.partial(
        _attn_kernel,
        scale=scale,
        causal=causal,
        use_lengths=use_lengths,
        latency_block=latency_block,
        block_q=block_q,
        seq_len=S,
        n_chunks=n_chunks,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (1, 1, block_q, D), lambda b, h, i, *_: (b, h, i, 0)
                ),
                pl.BlockSpec((1, 1, S, D), lambda b, h, i, *_: (b, h // group, 0, 0)),
                pl.BlockSpec((1, 1, S, D), lambda b, h, i, *_: (b, h // group, 0, 0)),
            ],
            out_specs=pl.BlockSpec(
                (1, 1, block_q, D), lambda b, h, i, *_: (b, h, i, 0)
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, T_pad, D), q.dtype),
        interpret=interpret,
    )(lengths.astype(jnp.int32), row_offsets.astype(jnp.int32), qt, kt, vt)

    out = jnp.transpose(out, (0, 2, 1, 3))
    if T_pad != T:
        out = out[:, :T]
    return out


def supports_shape(seq_len: int, head_dim: int, dtype=jnp.bfloat16) -> bool:
    """Whether full K/V per (b, h) fits comfortably in VMEM."""
    bytes_per = jnp.dtype(dtype).itemsize
    kv_bytes = 2 * seq_len * head_dim * bytes_per
    logits_bytes = 256 * seq_len * 4
    return kv_bytes + logits_bytes < 10 * 1024 * 1024
