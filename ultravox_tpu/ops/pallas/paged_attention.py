"""Paged flash-decoding attention: single-token decode against a PAGED KV
cache (vLLM paged-attention counterpart; reference surface: the vLLM V1
engine the reference serves through, run_vllm_inference.py:185-199).

The contiguous decode kernel (decode_attention.py) reads per-sequence slabs
of a (B, S_max, ...) cache; here each sequence's KV lives in fixed-size
pages scattered through a shared pool, indirected through a page table:

    k_pool: (num_pages, page_size, Hkv, D)
    page_table: (B, pages_per_seq) int32 — logical block i of sequence b
                lives in pool page ``page_table[b, i]``

One grid program per sequence. The page table and lengths arrive via scalar
prefetch (SMEM); the block loop DMAs page ``table[b, i]`` from HBM into a
double-buffered VMEM scratch and runs the same online-softmax /
block-diagonal-query scheme as the contiguous kernel (see
decode_attention.py's module docstring for the Mosaic alignment strategy —
pools are viewed as (P, page_size, Hkv*D) so the DMA minor dim stays
128-aligned at head_dim 64). Pages past each sequence's length are never
touched, so unused table entries may hold garbage ids as long as they are
in-range for the pool.

Why paged: a slot cache provisions num_slots x S_max tokens of HBM up
front; a pool provisions only the tokens actually resident, decoupling the
advertised context length from slot count (BASELINE.json north star:
"continuous-batching decode loop (paged KV cache)"). The attention itself
reads exactly the live prefix either way — paging costs nothing inside the
kernel because the DMA source address simply comes from SMEM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ultravox_tpu.ops.pallas.decode_attention import (
    NEG_INF,
    block_diag_queries,
    extract_diag,
)


def _paged_decode_kernel(
    table_ref,  # SMEM (B, pages_per_seq) int32 page ids
    lens_ref,  # SMEM (B,) — valid tokens per sequence (incl. current)
    window_ref,  # SMEM (1,) — sliding window size; 0 = disabled
    qbd_ref,  # VMEM (1, Hkv*D, Hkv*G) block-diagonal queries
    k_pool,  # ANY  (P, page_size, Hkv*D)
    v_pool,  # ANY  (P, page_size, Hkv*D)
    o_ref,  # VMEM (1, Hkv*D, Hkv*G) fp32
    k_scratch,  # VMEM (2, page_size, Hkv*D)
    v_scratch,
    sem,  # DMA semaphores (2, 2)
    *,
    page_size: int,
    packed_dim: int,
    num_cols: int,
    num_pages: int,
):
    b = pl.program_id(0)
    n = lens_ref[b]
    window = window_ref[0]
    win_start = jnp.where(window > 0, jnp.maximum(n - window, 0), 0)
    first_block = win_start // page_size
    num_blocks = pl.cdiv(n, page_size)

    q_bd = qbd_ref[0]

    def page_of(block_idx):
        # clamp sentinel/garbage ids in-range: a slot that owns no pages
        # still runs (continuous batching decodes every slot; inactive
        # slots carry length 1) and must never DMA outside the pool — the
        # same guard the XLA gather path gets from mode="clip"
        return jnp.minimum(table_ref[b, block_idx], num_pages - 1)

    def start_copy(slot, block_idx):
        pid = page_of(block_idx)
        pltpu.make_async_copy(
            k_pool.at[pid], k_scratch.at[slot], sem.at[slot, 0]
        ).start()
        pltpu.make_async_copy(
            v_pool.at[pid], v_scratch.at[slot], sem.at[slot, 1]
        ).start()

    def wait_copy(slot, block_idx):
        pid = page_of(block_idx)
        pltpu.make_async_copy(
            k_pool.at[pid], k_scratch.at[slot], sem.at[slot, 0]
        ).wait()
        pltpu.make_async_copy(
            v_pool.at[pid], v_scratch.at[slot], sem.at[slot, 1]
        ).wait()

    # triple-buffered pipeline: the DMA source address depends on an SMEM
    # table load, so issue TWO pages ahead to keep the copy engine busy
    # (the contiguous kernel's addresses are affine in the loop index and
    # get away with double buffering)
    @pl.when(num_blocks > first_block)
    def _():
        start_copy(first_block % 3, first_block)

    @pl.when(num_blocks > first_block + 1)
    def _():
        start_copy((first_block + 1) % 3, first_block + 1)

    def body(i, carry):
        m, z, acc = carry
        slot = i % 3

        @pl.when(i + 2 < num_blocks)
        def _():
            start_copy((i + 2) % 3, i + 2)

        wait_copy(slot, i)
        k = k_scratch[slot]  # (page_size, packed)
        v = v_scratch[slot]

        s = jnp.dot(k, q_bd, preferred_element_type=jnp.float32)
        pos = i * page_size + jax.lax.broadcasted_iota(
            jnp.int32, (page_size, 1), 0
        )
        valid = (pos < n) & (pos >= win_start)
        s = jnp.where(valid, s, NEG_INF)

        m_new = jnp.maximum(m, jnp.max(s, axis=0, keepdims=True))
        corr = jnp.exp(m - m_new)
        e = jnp.exp(s - m_new)
        e = jnp.where(valid, e, 0.0)
        z_new = z * corr + jnp.sum(e, axis=0, keepdims=True)
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
    m, z, acc = jax.lax.fori_loop(first_block, num_blocks, body, (m0, z0, acc0))
    o_ref[0] = acc / jnp.maximum(z, 1e-30)


@functools.partial(jax.jit, static_argnames=("scale", "interpret"))
def paged_decode_attention(
    q: jax.Array,  # (B, H, D) — one token per sequence
    k_pool: jax.Array,  # (P, page_size, Hkv, D)
    v_pool: jax.Array,  # (P, page_size, Hkv, D)
    page_table: jax.Array,  # (B, pages_per_seq) int32
    lengths: jax.Array,  # (B,) int32 valid tokens (incl. current)
    window: jax.Array | int = 0,  # sliding window (0 = full causal)
    *,
    scale: float | None = None,
    interpret: bool = False,
) -> jax.Array:
    """Returns (B, H, D). The DMA block size IS the page size."""
    B, H, D = q.shape
    P, page_size, Hkv, _ = k_pool.shape
    G = H // Hkv
    if scale is None:
        scale = D**-0.5

    packed = Hkv * D
    cols = Hkv * G
    q_bd = block_diag_queries(q, Hkv, G, scale)
    k_flat = k_pool.reshape(P, page_size, packed)
    v_flat = v_pool.reshape(P, page_size, packed)

    kernel = functools.partial(
        _paged_decode_kernel,
        page_size=page_size,
        packed_dim=packed,
        num_cols=cols,
        num_pages=P,
    )
    out_packed = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
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
                pltpu.VMEM((3, page_size, packed), k_pool.dtype),
                pltpu.VMEM((3, page_size, packed), v_pool.dtype),
                pltpu.SemaphoreType.DMA((3, 2)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B, packed, cols), jnp.float32),
        interpret=interpret,
    )(
        page_table.astype(jnp.int32),
        lengths.astype(jnp.int32),
        jnp.asarray(window, jnp.int32).reshape(1),
        q_bd,
        k_flat,
        v_flat,
    )
    return extract_diag(out_packed, Hkv, G, D, q.dtype)


def paged_decode_attention_xla(
    q: jax.Array,  # (B, H, D)
    k_pool: jax.Array,  # (P, page_size, Hkv, D)
    v_pool: jax.Array,
    page_table: jax.Array,  # (B, pages_per_seq) int32
    lengths: jax.Array,  # (B,)
    window: jax.Array | int = 0,
    *,
    scale: float | None = None,
) -> jax.Array:
    """XLA fallback/oracle: gather the pages into a contiguous per-sequence
    view and run masked attention. Reads the whole gathered view (and pays a
    gather copy), so it is the correctness path for CPU tests and
    non-Pallas platforms; the kernel is the serving path."""
    from ultravox_tpu.ops.attention import mha

    B, H, D = q.shape
    P, ps, Hkv, _ = k_pool.shape
    # clip: sentinel table entries read an arbitrary in-range page (finite
    # garbage masked by the length bias); "fill" would inject unmaskable NaN
    k = jnp.take(k_pool, page_table, axis=0, mode="clip").reshape(B, -1, Hkv, D)
    v = jnp.take(v_pool, page_table, axis=0, mode="clip").reshape(B, -1, Hkv, D)
    S = k.shape[1]
    pos = jnp.arange(S, dtype=jnp.int32)[None, :]
    n = lengths[:, None]
    window = jnp.asarray(window, jnp.int32)
    win_start = jnp.where(window > 0, jnp.maximum(n - window, 0), 0)
    valid = (pos < n) & (pos >= win_start)
    bias = jnp.where(valid, 0.0, NEG_INF)[:, None, None, :]
    return mha(q[:, None], k, v, bias=bias, scale=scale)[:, 0]
