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


# ---------------------------------------------------------------------------
# Head-major encoder attention (round 5).
#
# The generic `fused_attention` needs q/k/v in (B, H, T, D) — XLA's
# (B, T, H, 64)->(B, H, T, 64) transposes tile terribly (minor dim 64) and
# cost 40.6 ms of the 154.8 ms 30 s batch-8 whisper encode, 2.5x the
# attention dots themselves (16.0 ms; softmax 5.6 ms) — measured in
# scripts/profile_encoder_plumbing.py. Mosaic's block constraint (last two
# block dims 8/128-divisible or array-equal) rules out reading the
# (B, T, H, D) layout per-head directly, but 64-offset LANE slices inside a
# kernel DO lower (scripts in /tmp verified on v5e), so the fix is a
# three-kernel pipeline that never materialises a bad layout:
#
#   1. qkv_head_transpose: (B, T, 3·H·D) matmul output -> (B, 3H, T, D)
#      via 3H lane slices per T-block — a near-bandwidth HBM relayout
#      (~2.4 ms total where XLA's transposes cost 40.6).
#   2. attention_headmajor: the unchanged _attn_kernel gridded over the
#      (B, 3H, T, D) array — q/k/v are the same array with index maps
#      offset by 0/H/2H. Output (B, H, T, D).
#   3. attn_out_proj_residual: consumes (B, H, T, D) directly —
#      out = x + attn @ W_o + b as 20 half-rate (K=64) MXU dots per
#      T-block, folding the output transpose AND the residual add away.
# ---------------------------------------------------------------------------


def qkv_head_transpose(qkv, head_dim: int, interpret=None):
    """(B, T, G·D) -> (B, G, T, D) head-major relayout (G = 3·num_heads for
    a fused qkv projection output). T must be a multiple of 128."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    B, T, C = qkv.shape
    G = C // head_dim
    if T % 128:
        raise ValueError(f"T={T} must be a multiple of 128")
    # biggest row block VMEM allows (in + out + double buffering)
    bt = 256 if T % 256 == 0 else 128

    def kernel(x_ref, o_ref):
        x = x_ref[0]
        for g in range(G):
            o_ref[0, g] = x[:, g * head_dim:(g + 1) * head_dim]

    return pl.pallas_call(
        kernel,
        grid=(B, T // bt),
        in_specs=[pl.BlockSpec((1, bt, C), lambda b, i: (b, i, 0))],
        out_specs=pl.BlockSpec(
            (1, G, bt, head_dim), lambda b, i: (b, 0, i, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((B, G, T, head_dim), qkv.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(qkv)


def ln_qkv_head_fused(
    x, ln_scale, ln_bias, kernel, bias, head_dim: int, *,
    eps: float = 1e-5, block_t: int = 256, interpret=None,
):
    """LayerNorm -> qkv matmul -> head-major relayout in ONE kernel:
    (B, T, D) x (D, G*Dh) -> (B, G, T, Dh), G = 3*num_heads.

    Fuses the attn_ln + proj_apply(qkv_proj) + qkv_head_transpose pipeline
    of the encoder fast path. The separate form pays two full HBM round
    trips it doesn't need: the LN write+read (61 MB/layer at the 30 s
    batch-8 window) and the (B, T, 3D) qkv intermediate (184 MB/layer —
    the relayout kernel alone measured 448 us/layer, 2x its own traffic
    floor, because it re-reads what the matmul just wrote). Here the LN
    runs in fp32 registers on each (block_t, D) row block, the dot hits
    the MXU with the (D, G*Dh) weights VMEM-resident across grid steps
    (constant index map), and the output is stored as G lane slices
    directly in the attention kernel's head-major layout.

    Numerics match ops/norms.layer_norm (fp32 internals) followed by
    proj_apply's float path (bf16 dot with fp32 accumulation, bias added
    in the output dtype). Weights-only float path: int8 ({kernel_q}) and
    LoRA trees fall back to the separate pipeline in _encoder_layer.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    B, T, D = x.shape
    C = kernel.shape[-1]
    G = C // head_dim
    bt = block_t if T % block_t == 0 else 128
    if T % bt or D % 128 or C % 128:
        raise ValueError(f"bad shape for ln_qkv_head_fused: {x.shape}x{kernel.shape}")

    def kern(x_ref, s_ref, b2_ref, w_ref, pb_ref, o_ref):
        xf = x_ref[0].astype(jnp.float32)  # (bt, D)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        xc = xf - mean
        var = jnp.mean(xc * xc, axis=-1, keepdims=True)
        h = (
            xc * jax.lax.rsqrt(var + eps) * s_ref[...].astype(jnp.float32)
            + b2_ref[...].astype(jnp.float32)
        ).astype(x_ref.dtype)
        acc = jnp.dot(h, w_ref[...], preferred_element_type=jnp.float32)
        qkv = acc.astype(o_ref.dtype) + pb_ref[...]
        for g in range(G):
            o_ref[0, g] = qkv[:, g * head_dim:(g + 1) * head_dim]

    return pl.pallas_call(
        kern,
        grid=(B, T // bt),
        in_specs=[
            pl.BlockSpec((1, bt, D), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, D), lambda b, i: (0, 0)),
            pl.BlockSpec((1, D), lambda b, i: (0, 0)),
            pl.BlockSpec((D, C), lambda b, i: (0, 0)),
            pl.BlockSpec((1, C), lambda b, i: (0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, G, bt, head_dim), lambda b, i: (b, 0, i, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((B, G, T, head_dim), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        x,
        ln_scale.reshape(1, D),
        ln_bias.reshape(1, D),
        kernel,
        bias.reshape(1, C).astype(x.dtype),
    )


def ln_matmul_gelu(
    x, ln_scale, ln_bias, kernel, bias, *,
    eps: float = 1e-5, block_t: int = 256, interpret=None,
):
    """LayerNorm -> matmul+bias -> tanh-GELU in one kernel:
    (B, T, D) x (D, F) -> (B, T, F).

    NEGATIVE RESULT (r5, kept unwired): targeted the encoder FFN front
    (final_ln -> fc1 -> gelu) with the same fusion argument as
    ln_qkv_head_fused, but measured 1.8 ms SLOWER per 30 s batch-8 encode
    (127.9 vs 126.2 ms) — XLA's fc1+gelu already runs at ~89% of peak and
    the Pallas (T,1280)x(1280,5120) dot gives back more than the LN round
    trip (~114 us/layer) saves. ln_qkv_head_fused wins because it ALSO
    removes the relayout's full HBM round trip, which has no FFN analog.
    Don't re-wire this without beating that number at the bench shape."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    B, T, D = x.shape
    F = kernel.shape[-1]
    bt = block_t if T % block_t == 0 else 128
    if T % bt or D % 128 or F % 128:
        raise ValueError(f"bad shape for ln_matmul_gelu: {x.shape}x{kernel.shape}")

    def kern(x_ref, s_ref, b2_ref, w_ref, pb_ref, o_ref):
        xf = x_ref[0].astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        xc = xf - mean
        var = jnp.mean(xc * xc, axis=-1, keepdims=True)
        h = (
            xc * jax.lax.rsqrt(var + eps) * s_ref[...].astype(jnp.float32)
            + b2_ref[...].astype(jnp.float32)
        ).astype(x_ref.dtype)
        acc = jnp.dot(h, w_ref[...], preferred_element_type=jnp.float32)
        # match proj_apply + jax.nn.gelu(approximate=True) numerics: cast
        # to the stream dtype, add bias in that dtype, gelu on that value
        # (upcast to fp32 for the tanh polynomial, cast back)
        y = (acc.astype(o_ref.dtype) + pb_ref[...]).astype(jnp.float32)
        g = 0.5 * y * (
            1.0 + jnp.tanh(0.7978845608028654 * (y + 0.044715 * y * y * y))
        )
        o_ref[0] = g.astype(o_ref.dtype)

    return pl.pallas_call(
        kern,
        grid=(B, T // bt),
        in_specs=[
            pl.BlockSpec((1, bt, D), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, D), lambda b, i: (0, 0)),
            pl.BlockSpec((1, D), lambda b, i: (0, 0)),
            pl.BlockSpec((D, F), lambda b, i: (0, 0)),
            pl.BlockSpec((1, F), lambda b, i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bt, F), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((B, T, F), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        x,
        ln_scale.reshape(1, D),
        ln_bias.reshape(1, D),
        kernel,
        bias.reshape(1, F).astype(x.dtype),
    )


def _headmajor_kernel(
    lengths_ref,  # SMEM (B,)
    q_ref,  # (1, Hb, T, D)
    k_ref,  # (1, Hb, T, D)
    v_ref,  # (1, Hb, T, D)
    o_ref,  # (1, Hb, T, D)
    *,
    scale: float,
    latency_block: int,
    seq_len: int,
    n_chunks: int,
    heads_per_step: int,
):
    b = pl.program_id(0)
    lat = latency_block > 0
    col_bias = None
    if not lat:
        col = jax.lax.broadcasted_iota(jnp.int32, (8, seq_len), 1)
        col_bias = jnp.where(col < lengths_ref[b], 0.0, NEG_INF)[:1]

    chunk = seq_len // n_chunks

    for hh in range(heads_per_step):
        k = k_ref[0, hh]
        v = v_ref[0, hh]

        def qk(j, _hh=hh):
            q = q_ref[0, _hh, j * chunk:(j + 1) * chunk]
            return jnp.dot(q, k.T, preferred_element_type=jnp.float32) * (
                scale * 1.4426950408889634
            )

        # chunked softmax pipeline as in _attn_kernel: chunk j+1's MXU dot
        # issued before chunk j's VPU softmax
        s_next = qk(0)
        for j in range(n_chunks):
            s = s_next
            if j + 1 < n_chunks:
                s_next = qk(j + 1)
            if lat:
                rows = j * chunk + jax.lax.broadcasted_iota(
                    jnp.int32, (chunk, seq_len), 0
                )
                cols = jax.lax.broadcasted_iota(
                    jnp.int32, (chunk, seq_len), 1
                )
                mask = (cols < lengths_ref[b]) & (
                    (cols // latency_block) <= (rows // latency_block)
                )
                s = jnp.where(mask, s, NEG_INF)
            else:
                s = s + col_bias
            m = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp2(s - m)
            z = jnp.sum(e, axis=-1, keepdims=True)
            o = jnp.dot(
                e.astype(v.dtype), v, preferred_element_type=jnp.float32
            )
            o_ref[0, hh, j * chunk:(j + 1) * chunk] = (o / z).astype(
                o_ref.dtype
            )


def attention_headmajor(
    qkv_t, lengths, *, n_heads: int, scale=None, latency_block=0,
    n_chunks=8, heads_per_step=None, interpret=None,
):
    """Encoder self-attention over a head-major packed (B, 3H, T, D) array
    (from qkv_head_transpose). Returns (B, H, T, D). ``lengths`` is
    mandatory: the encoder pads its hidden states to a 128-multiple T and
    the pad columns must be masked out as keys (pad query rows produce
    finite garbage that the caller slices off after the layer stack).

    Multiple heads run per grid step (leading block dims are
    unconstrained by Mosaic's 8/128 rule): at the whisper-large shape the
    kernel is within ~4% of the head_dim-64 half-rate MXU floor, and
    amortising the ~1.7 us/step grid overhead over heads is worth
    several ms of the 30 s batch-8 encode. The unrolled heads' softmax
    chunk buffers stay live simultaneously, so the default 16 MB scoped
    VMEM limit is raised (v5e has 128 MiB physical VMEM; 2 heads/step
    wants ~20 MB, 4 wants ~39)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    B, G, T, D = qkv_t.shape
    H = n_heads
    assert G == 3 * H
    if T % (8 * n_chunks):
        raise ValueError(f"T={T} must be a multiple of 8*n_chunks")
    if scale is None:
        scale = D**-0.5
    hb = heads_per_step or next(h for h in (4, 2, 1) if H % h == 0)

    kernel = functools.partial(
        _headmajor_kernel,
        scale=scale,
        latency_block=latency_block,
        seq_len=T,
        n_chunks=n_chunks,
        heads_per_step=hb,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, H // hb),
            in_specs=[
                pl.BlockSpec((1, hb, T, D), lambda b, h, *_: (b, h, 0, 0)),
                pl.BlockSpec(
                    (1, hb, T, D), lambda b, h, *_: (b, H // hb + h, 0, 0)
                ),
                pl.BlockSpec(
                    (1, hb, T, D),
                    lambda b, h, *_: (b, 2 * (H // hb) + h, 0, 0),
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, hb, T, D), lambda b, h, *_: (b, h, 0, 0)
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, T, D), qkv_t.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(lengths.astype(jnp.int32), qkv_t, qkv_t, qkv_t)


def attn_out_proj_residual(attn_t, kernel_w, bias, x_res, interpret=None):
    """x_res + (heads-concat of attn_t) @ W_o + b, reading the attention
    output in its native (B, H, T, D) layout.

    ``kernel_w``: (H, D, M) — a free reshape of the (H·D, M) out-proj
    kernel. Numerics mirror proj_apply's float path: fp32-accumulated dot,
    cast to the stream dtype, bias added in that dtype, then the residual.
    T must be a multiple of 128."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    B, H, T, D = attn_t.shape
    M = kernel_w.shape[-1]
    if T % 128:
        raise ValueError(f"T={T} must be a multiple of 128")

    def kernel(a_ref, w_ref, b_ref, x_ref, o_ref):
        acc = jnp.dot(
            a_ref[0, 0], w_ref[0], preferred_element_type=jnp.float32
        )
        for h in range(1, H):
            acc += jnp.dot(
                a_ref[0, h], w_ref[h], preferred_element_type=jnp.float32
            )
        o_ref[0] = x_ref[0] + (acc.astype(o_ref.dtype) + b_ref[0])

    return pl.pallas_call(
        kernel,
        grid=(B, T // 128),
        in_specs=[
            pl.BlockSpec((1, H, 128, D), lambda b, i: (b, 0, i, 0)),
            pl.BlockSpec((H, D, M), lambda b, i: (0, 0, 0)),
            pl.BlockSpec((1, M), lambda b, i: (0, 0)),
            pl.BlockSpec((1, 128, M), lambda b, i: (b, i, 0)),
        ],
        out_specs=pl.BlockSpec((1, 128, M), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((B, T, M), x_res.dtype),
        interpret=interpret,
    )(attn_t, kernel_w, bias.reshape(1, M), x_res)


def supports_shape(seq_len: int, head_dim: int, dtype=jnp.bfloat16) -> bool:
    """Whether full K/V per (b, h) fits comfortably in VMEM."""
    bytes_per = jnp.dtype(dtype).itemsize
    kv_bytes = 2 * seq_len * head_dim * bytes_per
    logits_bytes = 256 * seq_len * 4
    return kv_bytes + logits_bytes < 10 * 1024 * 1024
