"""Flash-decoding attention kernel: single-token decode against a KV cache,
reading ONLY the valid prefix of each sequence's cache.

Why: the XLA decode path computes attention against the full static-shape
cache every step — at batch 8 × 1024 max positions × 1B-model dims that is
~2 GB of (mostly invalid) KV traffic per step, while the valid prefix is
often a tenth of that. This kernel (vLLM's paged-attention counterpart,
SURVEY.md §2.9) keeps the cache in HBM and DMAs fixed-size blocks into VMEM
with an online-softmax accumulator, terminating the block loop at each
sequence's actual length (per-sequence lengths arrive via scalar prefetch).

Grid: one program per batch row. GQA: queries (H, D) grouped as
(Hkv, group, D) against the (S, Hkv, D) cache.
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
    q_ref,  # VMEM (1, H, D)
    k_hbm,  # ANY  (B, S, Hkv, D) — full array; batch row indexed in-kernel
    v_hbm,  # ANY  (B, S, Hkv, D)
    o_ref,  # VMEM (1, H, D)
    k_scratch,  # VMEM (2, block_s, Hkv, D)
    v_scratch,
    sem,  # DMA semaphores (2, 2)
    *,
    block_s: int,
    seq_len: int,
    num_heads: int,
    num_kv_heads: int,
    head_dim: int,
    scale: float,
):
    b = pl.program_id(0)
    n = lens_ref[b]
    window = window_ref[0]
    # with a sliding window only keys in [n - window, n) participate; skip
    # whole blocks below the window start
    win_start = jnp.where(window > 0, jnp.maximum(n - window, 0), 0)
    first_block = win_start // block_s
    num_blocks = pl.cdiv(n, block_s)
    group = num_heads // num_kv_heads

    q = q_ref[0].reshape(num_kv_heads, group, head_dim)

    def start_copy(slot, block_idx):
        kc = pltpu.make_async_copy(
            k_hbm.at[b, pl.ds(block_idx * block_s, block_s)],
            k_scratch.at[slot],
            sem.at[slot, 0],
        )
        vc = pltpu.make_async_copy(
            v_hbm.at[b, pl.ds(block_idx * block_s, block_s)],
            v_scratch.at[slot],
            sem.at[slot, 1],
        )
        kc.start()
        vc.start()
        return kc, vc

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

    # warm-up: first block in flight
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
        k = k_scratch[slot]  # (block_s, Hkv, D)
        v = v_scratch[slot]

        # s[kv, g, s_blk] = q[kv, g, :] · k[s_blk, kv, :]
        s = jax.lax.dot_general(
            q,
            k,
            dimension_numbers=(((2,), (2,)), ((0,), (1,))),
            preferred_element_type=jnp.float32,
        ) * scale  # (Hkv, group, block_s)

        pos = i * block_s + jax.lax.broadcasted_iota(
            jnp.int32, (1, 1, block_s), 2
        )
        s = jnp.where((pos < n) & (pos >= win_start), s, NEG_INF)

        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        corr = jnp.exp(m - m_new)
        e = jnp.exp(s - m_new)
        z_new = z * corr + jnp.sum(e, axis=-1, keepdims=True)
        # acc[kv, g, d] += e[kv, g, s_blk] · v[s_blk, kv, d]
        pv = jax.lax.dot_general(
            e.astype(v.dtype),
            v,
            dimension_numbers=(((2,), (0,)), ((0,), (1,))),
            preferred_element_type=jnp.float32,
        )
        acc_new = acc * corr + pv
        return m_new, z_new, acc_new

    m0 = jnp.full((num_kv_heads, group, 1), NEG_INF, jnp.float32)
    z0 = jnp.zeros((num_kv_heads, group, 1), jnp.float32)
    acc0 = jnp.zeros((num_kv_heads, group, head_dim), jnp.float32)
    m, z, acc = jax.lax.fori_loop(first_block, num_blocks, body, (m0, z0, acc0))
    out = acc / jnp.maximum(z, 1e-30)
    o_ref[0] = out.reshape(num_heads, head_dim).astype(o_ref.dtype)


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
    if scale is None:
        scale = D**-0.5
    block_s = min(block_s, S)
    if S % block_s:
        raise ValueError(f"cache length {S} not a multiple of block {block_s}")

    kernel = functools.partial(
        _decode_kernel,
        block_s=block_s,
        seq_len=S,
        num_heads=H,
        num_kv_heads=Hkv,
        head_dim=D,
        scale=scale,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(B,),
            in_specs=[
                pl.BlockSpec(
                    (1, H, D), lambda b, *_: (b, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec(
                (1, H, D), lambda b, *_: (b, 0, 0), memory_space=pltpu.VMEM
            ),
            scratch_shapes=[
                pltpu.VMEM((2, block_s, Hkv, D), k_cache.dtype),
                pltpu.VMEM((2, block_s, Hkv, D), v_cache.dtype),
                pltpu.SemaphoreType.DMA((2, 2)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, D), q.dtype),
        interpret=interpret,
    )(
        lengths.astype(jnp.int32),
        jnp.asarray(window, jnp.int32).reshape(1),
        q,
        k_cache,
        v_cache,
    )
