"""Flash-decoding attention kernel: single-token decode against a KV cache,
reading ONLY the valid prefix of each sequence's cache.

Why: the XLA decode path computes attention against the full static-shape
cache every step — at batch 8 × 2048 max positions × 1B-model dims that is
multiple GB of (mostly invalid) KV traffic per step, while the valid prefix
is often a tenth of that. This kernel (vLLM's paged-attention counterpart,
SURVEY.md §2.9) keeps the cache in HBM and DMAs fixed-size blocks into VMEM
with an online-softmax accumulator, terminating the block loop at each
sequence's actual length (per-sequence lengths arrive via scalar prefetch).

Alignment strategy: Mosaic requires manual HBM→VMEM DMA slices to have a
128-aligned minor dimension, but head_dim is typically 64. The cache is
therefore viewed as (B, S, Hkv·D) (a free bitcast — minor dim 512+), and the
per-head structure is recovered algebraically: queries enter as a
block-diagonal (Hkv·D, Hkv·group) matrix (zeros kill cross-head terms), so
`k_flat @ q_bd` yields exactly the per-head logits with only lane-aligned 2-D
shapes inside the kernel. The block-diagonal construction and the final
diagonal extraction are cheap XLA ops outside the kernel.

Grid: one program per batch row. The block loop skips blocks outside
[window_start, length) — sliding-window layers read only their window.

When to use (measured on v5e, 1B model, batch 8): the standalone op is ~8×
faster than the standalone XLA decode attention at a 2048-entry cache, but
*inside the full decode step* XLA fuses its attention chain well and the
per-layer kernel-launch overhead makes the kernel a net loss at short
contexts (~820 vs ~968 tok/s at ≤256 live entries). Select
``decode_attn_impl="kernel"`` for long-context serving (≥2–4K live cache
entries per sequence); the XLA path stays the default.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)


def _decode_kernel(
    lens_ref,  # SMEM (B,) — valid cache length per row (incl. current token)
    window_ref,  # SMEM (1,) — sliding window size; 0 = disabled
    qbd_ref,  # VMEM (1, Hkv*D, Hkv*G) block-diagonal queries
    k_hbm,  # ANY  (B, S, Hkv*D)
    v_hbm,  # ANY  (B, S, Hkv*D)
    o_ref,  # VMEM (1, Hkv*D, Hkv*G) fp32 — packed output, diag-extracted outside
    k_scratch,  # VMEM (2, block_s, Hkv*D)
    v_scratch,
    sem,  # DMA semaphores (2, 2)
    *,
    block_s: int,
    packed_dim: int,  # Hkv*D
    num_cols: int,  # Hkv*G
):
    b = pl.program_id(0)
    n = lens_ref[b]
    window = window_ref[0]
    win_start = jnp.where(window > 0, jnp.maximum(n - window, 0), 0)
    first_block = win_start // block_s
    num_blocks = pl.cdiv(n, block_s)

    q_bd = qbd_ref[0]  # (packed, cols)

    def start_copy(slot, block_idx):
        pltpu.make_async_copy(
            k_hbm.at[b, pl.ds(block_idx * block_s, block_s)],
            k_scratch.at[slot],
            sem.at[slot, 0],
        ).start()
        pltpu.make_async_copy(
            v_hbm.at[b, pl.ds(block_idx * block_s, block_s)],
            v_scratch.at[slot],
            sem.at[slot, 1],
        ).start()

    def wait_copy(slot, block_idx):
        pltpu.make_async_copy(
            k_hbm.at[b, pl.ds(block_idx * block_s, block_s)],
            k_scratch.at[slot],
            sem.at[slot, 0],
        ).wait()
        pltpu.make_async_copy(
            v_hbm.at[b, pl.ds(block_idx * block_s, block_s)],
            v_scratch.at[slot],
            sem.at[slot, 1],
        ).wait()

    @pl.when(num_blocks > first_block)
    def _():
        start_copy(first_block % 2, first_block)

    def body(i, carry):
        m, z, acc = carry
        slot = i % 2

        @pl.when(i + 1 < num_blocks)
        def _():
            start_copy((i + 1) % 2, i + 1)

        wait_copy(slot, i)
        k = k_scratch[slot]  # (block_s, packed)
        v = v_scratch[slot]

        # per-head logits via the block-diagonal queries: (block_s, cols)
        s = jnp.dot(k, q_bd, preferred_element_type=jnp.float32)
        pos = i * block_s + jax.lax.broadcasted_iota(
            jnp.int32, (block_s, 1), 0
        )
        valid = (pos < n) & (pos >= win_start)
        s = jnp.where(valid, s, NEG_INF)

        m_new = jnp.maximum(m, jnp.max(s, axis=0, keepdims=True))  # (1, cols)
        corr = jnp.exp(m - m_new)
        e = jnp.exp(s - m_new)  # (block_s, cols)
        e = jnp.where(valid, e, 0.0)
        z_new = z * corr + jnp.sum(e, axis=0, keepdims=True)
        # acc (packed, cols) += V^T e
        pv = jax.lax.dot_general(
            v,
            e.astype(jnp.float32),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return m_new, z_new, acc * corr + pv

    m0 = jnp.full((1, num_cols), NEG_INF, jnp.float32)
    z0 = jnp.zeros((1, num_cols), jnp.float32)
    acc0 = jnp.zeros((packed_dim, num_cols), jnp.float32)
    m, z, acc = jax.lax.fori_loop(
        first_block, num_blocks, body, (m0, z0, acc0)
    )
    o_ref[0] = acc / jnp.maximum(z, 1e-30)


def block_diag_queries(q: jax.Array, Hkv: int, G: int, scale: float):
    """(B, H, D) queries -> (B, Hkv*D, Hkv*G) block-diagonal matrix such that
    ``k_flat @ q_bd`` computes per-head logits with only lane-aligned 2-D
    shapes inside a kernel (zeros kill cross-head terms). Shared by the
    contiguous and paged decode kernels."""
    B, H, D = q.shape
    qg = q.reshape(B, Hkv, G, D) * jnp.asarray(scale, q.dtype)
    eye = jnp.eye(Hkv, dtype=q.dtype)
    return jnp.einsum("bkgd,kK->bkdKg", qg, eye).reshape(B, Hkv * D, Hkv * G)


def extract_diag(out_packed: jax.Array, Hkv: int, G: int, D: int, dtype):
    """Inverse of ``block_diag_queries`` on the kernel output: pull the
    diagonal blocks out of (B, Hkv*D, Hkv*G) -> (B, H, D)."""
    B = out_packed.shape[0]
    out5 = out_packed.reshape(B, Hkv, D, Hkv, G)
    out = jnp.einsum("bkdKg,kK->bkgd", out5, jnp.eye(Hkv, dtype=jnp.float32))
    return out.reshape(B, Hkv * G, D).astype(dtype)


@functools.partial(
    jax.jit, static_argnames=("scale", "block_s", "interpret")
)
def decode_attention(
    q: jax.Array,  # (B, H, D) — one token per sequence
    k_cache: jax.Array,  # (B, S, Hkv, D)
    v_cache: jax.Array,  # (B, S, Hkv, D)
    lengths: jax.Array,  # (B,) int32 valid entries (incl. current token)
    window: jax.Array | int = 0,  # sliding window (0 = full causal)
    *,
    scale: float | None = None,
    block_s: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """Returns (B, H, D)."""
    B, H, D = q.shape
    S = k_cache.shape[1]
    Hkv = k_cache.shape[2]
    G = H // Hkv
    if scale is None:
        scale = D**-0.5
    block_s = min(block_s, S)
    if S % block_s:
        raise ValueError(f"cache length {S} not a multiple of block {block_s}")

    packed = Hkv * D
    cols = Hkv * G

    q_bd = block_diag_queries(q, Hkv, G, scale)

    k_flat = k_cache.reshape(B, S, packed)
    v_flat = v_cache.reshape(B, S, packed)

    kernel = functools.partial(
        _decode_kernel, block_s=block_s, packed_dim=packed, num_cols=cols
    )
    out_packed = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(B,),
            in_specs=[
                pl.BlockSpec(
                    (1, packed, cols), lambda b, *_: (b, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(
                (1, packed, cols), lambda b, *_: (b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((2, block_s, packed), k_cache.dtype),
                pltpu.VMEM((2, block_s, packed), v_cache.dtype),
                pltpu.SemaphoreType.DMA((2, 2)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B, packed, cols), jnp.float32),
        interpret=interpret,
    )(
        lengths.astype(jnp.int32),
        jnp.asarray(window, jnp.int32).reshape(1),
        q_bd,
        k_flat,
        v_flat,
    )
    # extract the diagonal blocks: out[b, kv, g, d] = packed[b, kv*D+d, kv*G+g]
    return extract_diag(out_packed, Hkv, G, D, q.dtype)
