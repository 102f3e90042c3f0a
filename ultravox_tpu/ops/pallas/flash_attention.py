"""Differentiable flash attention for TPU (forward + backward Pallas kernels).

The training-path counterpart of ``fused_attention`` (which is forward-only):
a ``jax.custom_vjp`` op so the frozen-encoder inference kernel's design —
K/V resident in VMEM, masks computed in-kernel from scalars, exp2 softmax
with deferred normalisation — also serves the *training* hot loops (encoder
when unfrozen / LoRA'd, decoder teacher+student forwards, and every
backward). The XLA einsum path (`ops.attention.mha`) materialises the
(B, H, T, S) fp32 logits tensor in HBM twice per training step (forward +
recomputed backward); here neither pass ever writes logits to HBM.

Masks (all computed in-kernel from scalars; no bias tensor exists):
- ``lengths`` (B,) — per-sequence valid key length;
- ``causal`` — decoder self-attention (query row i == absolute position i);
- ``window`` — sliding-window attention (runtime scalar; 0 disables), for
  mistral/gemma-3 local layers;
- ``latency_block`` — the whisper encoder's block-causal streaming mask
  (reference ultravox_model.py:834-863).

Backward strategy: recompute. One grid step = one (batch, head, q-block);
the logits block is rebuilt from q/k (identical values to the forward — same
inputs, same reduction order), then
    dv += p^T do;   ds = p * (dp - rowsum(do*o));   dq = ds k;   dk += ds^T q.
dk/dv accumulate in fp32 output blocks revisited across the (h-in-group,
q-block) grid steps — TPU grid iteration is sequential, so revisiting is the
standard Pallas accumulation pattern (same as the K-loop of a tiled matmul).

Not supported (falls back to XLA): gemma-2 attention-logit softcapping,
arbitrary additive bias tensors, T != S (use the inference kernels for
cached decode/prefill).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)
LOG2E = 1.4426950408889634


def _mask_block(
    lengths_ref, window_ref, b, iq, *,
    block_q, seq_len, causal, use_lengths, latency_block,
):
    """(block_q, seq_len) bool validity mask, or None when fully valid."""
    need_rows = causal or latency_block > 0
    mask = None

    def _and(m, x):
        return x if m is None else m & x

    if use_lengths or need_rows:
        cols = jax.lax.broadcasted_iota(jnp.int32, (block_q, seq_len), 1)
    if use_lengths:
        mask = _and(mask, cols < lengths_ref[b])
    if need_rows:
        rows = iq * block_q + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, seq_len), 0
        )
    if causal:
        mask = _and(mask, cols <= rows)
        # sliding window rides on causal: key j visible iff i - j < window;
        # window is a runtime scalar, 0 disables. Expressed as a scalar-OR
        # (Mosaic cannot legalize arith.select between i1 vectors)
        window = window_ref[0]
        mask = _and(mask, (window <= 0) | (rows - cols < window))
    if latency_block > 0:
        mask = _and(mask, (cols // latency_block) <= (rows // latency_block))
    return mask


def _fwd_kernel(
    lengths_ref, window_ref,  # SMEM scalars
    q_ref, k_ref, v_ref,  # (1, 1, bq, D), (1, 1, S, D), (1, 1, S, D)
    o_ref,  # (1, 1, bq, D)
    *, scale, causal, use_lengths, latency_block, block_q, seq_len,
):
    b = pl.program_id(0)
    iq = pl.program_id(2)
    q = q_ref[0, 0]
    k = k_ref[0, 0]
    s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * (scale * LOG2E)
    mask = _mask_block(
        lengths_ref, window_ref, b, iq, block_q=block_q, seq_len=seq_len,
        causal=causal, use_lengths=use_lengths, latency_block=latency_block,
    )
    if mask is not None:
        s = jnp.where(mask, s, NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp2(s - m)
    z = jnp.sum(e, axis=-1, keepdims=True)
    o = jnp.dot(
        e.astype(v_ref.dtype), v_ref[0, 0], preferred_element_type=jnp.float32
    )
    o_ref[0, 0] = (o / z).astype(o_ref.dtype)


def _bwd_kernel(
    lengths_ref, window_ref,  # SMEM scalars
    q_ref, k_ref, v_ref, o_ref, do_ref,  # blocks as in fwd (+o/do like q)
    dq_ref,  # (1, 1, bq, D) fp32
    dk_ref,  # (1, 1, S, D) fp32 — accumulated across (g, iq) grid steps
    dv_ref,  # (1, 1, S, D) fp32
    *, scale, causal, use_lengths, latency_block, block_q, seq_len, group,
):
    b = pl.program_id(0)
    h = pl.program_id(1)
    iq = pl.program_id(2)

    @pl.when((h % group == 0) & (iq == 0))
    def _init():
        dk_ref[0, 0] = jnp.zeros_like(dk_ref[0, 0])
        dv_ref[0, 0] = jnp.zeros_like(dv_ref[0, 0])

    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    do = do_ref[0, 0].astype(jnp.float32)
    o = o_ref[0, 0].astype(jnp.float32)

    # recompute p exactly as the forward (same inputs, same order)
    s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * (scale * LOG2E)
    mask = _mask_block(
        lengths_ref, window_ref, b, iq, block_q=block_q, seq_len=seq_len,
        causal=causal, use_lengths=use_lengths, latency_block=latency_block,
    )
    if mask is not None:
        s = jnp.where(mask, s, NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp2(s - m)
    z = jnp.sum(e, axis=-1, keepdims=True)
    p = e / z  # (bq, S) fp32

    dv_ref[0, 0] += jnp.dot(
        p.astype(do_ref.dtype).T, do_ref[0, 0],
        preferred_element_type=jnp.float32,
    )
    dp = jnp.dot(do, v.astype(jnp.float32).T, preferred_element_type=jnp.float32)
    delta = jnp.sum(do * o, axis=-1, keepdims=True)  # rowsum(do*o) = Σ dp∘p
    ds = p * (dp - delta)  # gradient w.r.t. natural-units logits
    if mask is not None:
        ds = jnp.where(mask, ds, 0.0)  # masked logits are constants
    ds16 = (ds * scale).astype(q_ref.dtype)
    dq_ref[0, 0] = jnp.dot(
        ds16, k, preferred_element_type=jnp.float32
    ).astype(dq_ref.dtype)
    dk_ref[0, 0] += jnp.dot(ds16.T, q, preferred_element_type=jnp.float32)


def _prep(q, k, v, lengths, window, block_q):
    B, T, H, D = q.shape
    S = k.shape[1]
    block_q = min(block_q, T)
    T_pad = -(-T // block_q) * block_q
    if T_pad != T:
        q = jnp.pad(q, ((0, 0), (0, T_pad - T), (0, 0), (0, 0)))
    qt = jnp.transpose(q, (0, 2, 1, 3))  # (B, H, T, D)
    kt = jnp.transpose(k, (0, 2, 1, 3))  # (B, Hkv, S, D)
    vt = jnp.transpose(v, (0, 2, 1, 3))
    use_lengths = lengths is not None
    if lengths is None:
        lengths = jnp.full((B,), S, jnp.int32)
    window = jnp.asarray(window, jnp.int32).reshape(1)
    return qt, kt, vt, lengths.astype(jnp.int32), window, block_q, T_pad, use_lengths


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9)
)
def _flash(q, k, v, lengths, window, scale, causal, latency_block, block_q,
           interpret):
    out, _ = _flash_fwd(
        q, k, v, lengths, window, scale, causal, latency_block, block_q,
        interpret,
    )
    return out


def _flash_fwd(q, k, v, lengths, window, scale, causal, latency_block,
               block_q, interpret):
    B, T, H, D = q.shape
    S = k.shape[1]
    Hkv = k.shape[2]
    group = H // Hkv
    qt, kt, vt, lens, win, bq, T_pad, use_lengths = _prep(
        q, k, v, lengths, window, block_q
    )
    grid = (B, H, T_pad // bq)
    kernel = functools.partial(
        _fwd_kernel, scale=scale, causal=causal, use_lengths=use_lengths,
        latency_block=latency_block, block_q=bq, seq_len=S,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1, bq, D), lambda b, h, i, *_: (b, h, i, 0)),
                pl.BlockSpec(
                    (1, 1, S, D), lambda b, h, i, *_: (b, h // group, 0, 0)
                ),
                pl.BlockSpec(
                    (1, 1, S, D), lambda b, h, i, *_: (b, h // group, 0, 0)
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, 1, bq, D), lambda b, h, i, *_: (b, h, i, 0)
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, T_pad, D), q.dtype),
        interpret=interpret,
    )(lens, win, qt, kt, vt)
    out = jnp.transpose(out, (0, 2, 1, 3))[:, :T]
    return out, (q, k, v, lengths, window, out)


def _flash_bwd(scale, causal, latency_block, block_q, interpret, res, dout):
    q, k, v, lengths, window, out = res
    B, T, H, D = q.shape
    S = k.shape[1]
    Hkv = k.shape[2]
    group = H // Hkv
    qt, kt, vt, lens, win, bq, T_pad, use_lengths = _prep(
        q, k, v, lengths, window, block_q
    )
    ot = jnp.transpose(
        jnp.pad(out, ((0, 0), (0, T_pad - T), (0, 0), (0, 0))), (0, 2, 1, 3)
    )
    dot_ = jnp.transpose(
        jnp.pad(
            dout.astype(q.dtype), ((0, 0), (0, T_pad - T), (0, 0), (0, 0))
        ),
        (0, 2, 1, 3),
    )
    grid = (B, H, T_pad // bq)
    kernel = functools.partial(
        _bwd_kernel, scale=scale, causal=causal, use_lengths=use_lengths,
        latency_block=latency_block, block_q=bq, seq_len=S, group=group,
    )
    kv_spec = pl.BlockSpec((1, 1, S, D), lambda b, h, i, *_: (b, h // group, 0, 0))
    q_spec = pl.BlockSpec((1, 1, bq, D), lambda b, h, i, *_: (b, h, i, 0))
    dq, dk, dv = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[q_spec, kv_spec, kv_spec, q_spec, q_spec],
            out_specs=[q_spec, kv_spec, kv_spec],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((B, H, T_pad, D), jnp.float32),
            jax.ShapeDtypeStruct((B, Hkv, S, D), jnp.float32),
            jax.ShapeDtypeStruct((B, Hkv, S, D), jnp.float32),
        ],
        interpret=interpret,
    )(lens, win, qt, kt, vt, ot, dot_)
    dq = jnp.transpose(dq, (0, 2, 1, 3))[:, :T].astype(q.dtype)
    dk = jnp.transpose(dk, (0, 2, 1, 3)).astype(k.dtype)
    dv = jnp.transpose(dv, (0, 2, 1, 3)).astype(v.dtype)
    # lengths/window are integer inputs — no gradients
    return dq, dk, dv, None, None


_flash.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(
    q: jax.Array,  # (B, T, H, D)
    k: jax.Array,  # (B, T, Hkv, D) — self-attention (S == T)
    v: jax.Array,
    lengths: Optional[jax.Array] = None,  # (B,) valid key length
    *,
    scale: Optional[float] = None,
    causal: bool = False,
    window: jax.Array | int = 0,  # sliding window (0 = off; needs causal)
    latency_block: int = 0,
    block_q: int = 256,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Differentiable fused self-attention. Returns (B, T, H, D) in q.dtype.

    ``interpret=None`` auto-selects interpret mode on the CPU backend so the
    kernel path (and its VJP) stays CPU-testable.
    """
    if q.shape[1] != k.shape[1]:
        raise ValueError(
            f"flash_attention is self-attention only (T={q.shape[1]} vs "
            f"S={k.shape[1]}); use the inference kernels for cached decode."
        )
    if scale is None:
        scale = q.shape[-1] ** -0.5
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    return _flash(
        q, k, v, lengths, window, scale, causal, int(latency_block),
        int(block_q), bool(interpret),
    )


def supports_shape(seq_len: int, head_dim: int, dtype=jnp.bfloat16) -> bool:
    """Whether the backward's working set fits VMEM comfortably: ~3 fp32
    (block_q, S) logit-sized blocks + K/V + fp32 dK/dV accumulators."""
    logits = 3 * 256 * seq_len * 4
    kv = 2 * seq_len * head_dim * jnp.dtype(dtype).itemsize
    acc = 2 * seq_len * head_dim * 4
    return logits + kv + acc < 12 * 1024 * 1024
