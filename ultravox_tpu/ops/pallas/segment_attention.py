"""Segmented flash decode attention: T-query attention against a read-only
prompt cache PLUS a small carried tail segment, entirely in one kernel.

This is the kernel behind multi-step decode blocks and speculative verify
forwards (the segmented scans in models/decoder.py). Those scans keep the
big KV cache read-only and accumulate new tokens' KV in an (L, B, Ts, ...)
tail; their XLA attention (`_merged_attention`) materialises
(B, Hkv, G, T, S) fp32 logits in HBM — ~19 MB/layer at T=1 and ~170 MB/layer
at the speculative T=9 on the 1B flagship, several GB per verify round
against a ~2 GB weight read. Here both segments stream through an
online-softmax accumulator in VMEM; nothing quadratic ever touches HBM.

Layout strategy (see decode_attention.py for the alignment rationale): the
cache is viewed as (L*B, S, Hkv*D) so DMA minor dims stay 128-aligned at
head_dim 64, and the layer enters as DATA (a scalar-prefetch row offset)
rather than a sliced operand — slicing `cache.k[l]` into a pallas_call
operand could materialise a per-layer copy of the slab; indexing rows of
the flat view cannot. Queries enter as a block-diagonal
(Hkv*D, Hkv*T*G) matrix, one column per (kv-head, query, q-head):
`k_flat @ q_bd` yields per-head, per-query logits with only lane-aligned
2-D shapes in the kernel. Per-column query indices (a static iota) drive
the causal masks:

    prompt key j visible to query t   iff  j < n           (all queries sit
                                           after the prompt)
    tail slot s visible to query t    iff  s <= written + t
    sliding window (local layers)     iff  q_abs - key_abs < w,
                                           q_abs = n + written + t

Reference surface: the vLLM V1 multi-step/speculative decode engine the
reference serves through (run_vllm_inference.py:185-199).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ultravox_tpu.ops.pallas.decode_attention import NEG_INF


def block_diag_queries_multi(q: jax.Array, Hkv: int, G: int, scale: float):
    """(B, T, H, D) queries -> (B, Hkv*D, Hkv*T*G) block-diagonal matrix.

    Column ordering is (kv_head, query, q_head-in-group): col =
    K*(T*G) + t*G + g — the kernel recovers t as (col % (T*G)) // G.
    """
    B, T, H, D = q.shape
    qg = q.reshape(B, T, Hkv, G, D) * jnp.asarray(scale, q.dtype)
    eye = jnp.eye(Hkv, dtype=q.dtype)
    return jnp.einsum("btkgd,kK->bkdKtg", qg, eye).reshape(
        B, Hkv * D, Hkv * T * G
    )


def extract_diag_multi(out_packed, Hkv: int, T: int, G: int, D: int, dtype):
    """Inverse of block_diag_queries_multi on the packed kernel output:
    (B, Hkv*D, Hkv*T*G) -> (B, T, H, D)."""
    B = out_packed.shape[0]
    out6 = out_packed.reshape(B, Hkv, D, Hkv, T, G)
    out = jnp.einsum(
        "bkdKtg,kK->btkgd", out6, jnp.eye(Hkv, dtype=jnp.float32)
    )
    return out.reshape(B, T, Hkv * G, D).astype(dtype)


def _online_update(carry, s, valid, v, dtype_note=None):
    """One online-softmax block update. s/valid: (rows, cols); v: (rows,
    packed). carry = (m (1,cols), z (1,cols), acc (packed,cols))."""
    m, z, acc = carry
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


def _tail_block(carry, qbd, tailk_ref, tailv_ref, n, wr, t_col, q_abs,
                window):
    """Fold the (small, VMEM-resident) tail segment into the accumulator."""
    Ts = tailk_ref.shape[1]
    tk = tailk_ref[0]  # (Ts, packed)
    tv = tailv_ref[0]
    s_t = jnp.dot(tk, qbd, preferred_element_type=jnp.float32)  # (Ts, cols)
    tslot = jax.lax.broadcasted_iota(jnp.int32, (Ts, 1), 0)
    valid = tslot <= (wr + t_col)  # (Ts, cols)
    # sliding window vs the tail's absolute positions (n + slot); pure mask
    # arithmetic — Mosaic cannot select between i1 vectors
    in_win = (q_abs - (n + tslot)) < window
    valid = valid & ((window <= 0) | in_win)
    return _online_update(carry, s_t, valid, tv)


def _seg_kernel(
    layer_ref,  # SMEM (1,) — row-block offset: layer * B
    lens_ref,  # SMEM (B,) — prompt length per row (valid cache entries)
    written_ref,  # SMEM (B,) — tail slots already filled before this segment
    window_ref,  # SMEM (1,) — sliding window; 0 = disabled
    qbd_ref,  # VMEM (1, packed, cols) block-diagonal queries
    tailk_ref,  # VMEM (1, Ts, packed)
    tailv_ref,  # VMEM (1, Ts, packed)
    k_hbm,  # ANY (L*B, S, packed)
    v_hbm,  # ANY (L*B, S, packed)
    o_ref,  # VMEM (1, packed, cols) fp32
    k_scratch,  # VMEM (2, block_s, packed)
    v_scratch,
    sem,  # DMA semaphores (2, 2)
    *,
    block_s: int,
    packed_dim: int,
    num_cols: int,
    T: int,
    G: int,
):
    b = pl.program_id(0)
    row = layer_ref[0] + b
    n = lens_ref[b]
    wr = written_ref[b]
    window = window_ref[0]

    col = jax.lax.broadcasted_iota(jnp.int32, (1, num_cols), 1)
    t_col = (col % (T * G)) // G  # per-column query index (1, cols)
    q_abs = n + wr + t_col  # absolute query positions (1, cols)
    win_lo = jnp.where(
        window > 0, jnp.maximum(q_abs - window + 1, 0), 0
    )  # (1, cols)
    # the earliest key ANY query can see bounds the block loop
    first_block = jnp.min(win_lo) // block_s
    num_blocks = pl.cdiv(n, block_s)

    q_bd = qbd_ref[0]

    def start_copy(slot, block_idx):
        pltpu.make_async_copy(
            k_hbm.at[row, pl.ds(block_idx * block_s, block_s)],
            k_scratch.at[slot],
            sem.at[slot, 0],
        ).start()
        pltpu.make_async_copy(
            v_hbm.at[row, pl.ds(block_idx * block_s, block_s)],
            v_scratch.at[slot],
            sem.at[slot, 1],
        ).start()

    def wait_copy(slot, block_idx):
        pltpu.make_async_copy(
            k_hbm.at[row, pl.ds(block_idx * block_s, block_s)],
            k_scratch.at[slot],
            sem.at[slot, 0],
        ).wait()
        pltpu.make_async_copy(
            v_hbm.at[row, pl.ds(block_idx * block_s, block_s)],
            v_scratch.at[slot],
            sem.at[slot, 1],
        ).wait()

    @pl.when(num_blocks > first_block)
    def _():
        start_copy(first_block % 2, first_block)

    def body(i, carry):
        slot = i % 2

        @pl.when(i + 1 < num_blocks)
        def _():
            start_copy((i + 1) % 2, i + 1)

        wait_copy(slot, i)
        k = k_scratch[slot]  # (block_s, packed)
        v = v_scratch[slot]
        s = jnp.dot(k, q_bd, preferred_element_type=jnp.float32)
        pos = i * block_s + jax.lax.broadcasted_iota(
            jnp.int32, (block_s, 1), 0
        )
        valid = (pos < n) & (pos >= win_lo)  # (block_s, cols)
        return _online_update(carry, s, valid, v)

    m0 = jnp.full((1, num_cols), NEG_INF, jnp.float32)
    z0 = jnp.zeros((1, num_cols), jnp.float32)
    acc0 = jnp.zeros((packed_dim, num_cols), jnp.float32)
    carry = jax.lax.fori_loop(first_block, num_blocks, body, (m0, z0, acc0))
    m, z, acc = _tail_block(
        carry, q_bd, tailk_ref, tailv_ref, n, wr, t_col, q_abs, window
    )
    o_ref[0] = acc / jnp.maximum(z, 1e-30)


@functools.partial(
    jax.jit, static_argnames=("scale", "block_s", "interpret")
)
def segment_tail_attention(
    q: jax.Array,  # (B, T, H, D) — T queries per sequence, T small
    k_cache: jax.Array,  # (L, B, S, Hkv, D) stacked cache (or (B, S, Hkv, D))
    v_cache: jax.Array,
    layer: jax.Array,  # scalar int32 — which layer's rows to read
    lengths: jax.Array,  # (B,) prompt length (valid cache entries)
    tail_k: jax.Array,  # (B, Ts, Hkv, D) carried tail segment
    tail_v: jax.Array,
    written: jax.Array,  # (B,) tail slots filled before this segment
    window: jax.Array | int = 0,
    *,
    scale: float | None = None,
    block_s: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """Returns (B, T, H, D). ``k_cache`` is the STACKED (L, B, S, Hkv, D)
    cache with ``layer`` = l (the kernel reads rows layer*B+b of the free
    flat view — no per-layer slice materialises) or a single slab
    (B, S, Hkv, D) with ``layer`` = 0."""
    B, T, H, D = q.shape
    Ts = tail_k.shape[1]
    Hkv = tail_k.shape[2]
    G = H // Hkv
    S = k_cache.shape[-3]
    if scale is None:
        scale = D**-0.5
    block_s = min(block_s, S)
    if S % block_s:
        raise ValueError(f"cache length {S} not a multiple of {block_s}")

    packed = Hkv * D
    cols = Hkv * T * G
    q_bd = block_diag_queries_multi(q, Hkv, G, scale)
    k_flat = k_cache.reshape(-1, S, packed)
    v_flat = v_cache.reshape(-1, S, packed)
    tk_flat = tail_k.reshape(B, Ts, packed)
    tv_flat = tail_v.reshape(B, Ts, packed)

    kernel = functools.partial(
        _seg_kernel, block_s=block_s, packed_dim=packed, num_cols=cols,
        T=T, G=G,
    )
    row0 = (jnp.asarray(layer, jnp.int32) * B).reshape(1)
    out_packed = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(B,),
            in_specs=[
                pl.BlockSpec(
                    (1, packed, cols), lambda b, *_: (b, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, Ts, packed), lambda b, *_: (b, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, Ts, packed), lambda b, *_: (b, 0, 0),
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
        row0,
        lengths.astype(jnp.int32),
        written.astype(jnp.int32),
        jnp.asarray(window, jnp.int32).reshape(1),
        q_bd,
        tk_flat,
        tv_flat,
        k_flat,
        v_flat,
    )
    return extract_diag_multi(out_packed, Hkv, T, G, D, q.dtype)


def _paged_seg_kernel(
    layer_ref,  # SMEM (1,) — page offset: layer * P
    table_ref,  # SMEM (B, pages_per_seq) int32
    lens_ref,  # SMEM (B,)
    written_ref,  # SMEM (B,)
    window_ref,  # SMEM (1,)
    qbd_ref,  # VMEM (1, packed, cols)
    tailk_ref,  # VMEM (1, Ts, packed)
    tailv_ref,
    k_pool,  # ANY (L*P, page_size, packed)
    v_pool,
    o_ref,
    k_scratch,  # VMEM (3, page_size, packed)
    v_scratch,
    sem,  # (3, 2)
    *,
    page_size: int,
    packed_dim: int,
    num_cols: int,
    num_pages: int,
    T: int,
    G: int,
):
    b = pl.program_id(0)
    n = lens_ref[b]
    wr = written_ref[b]
    window = window_ref[0]

    col = jax.lax.broadcasted_iota(jnp.int32, (1, num_cols), 1)
    t_col = (col % (T * G)) // G
    q_abs = n + wr + t_col
    win_lo = jnp.where(window > 0, jnp.maximum(q_abs - window + 1, 0), 0)
    first_block = jnp.min(win_lo) // page_size
    num_blocks = pl.cdiv(n, page_size)

    q_bd = qbd_ref[0]

    def page_of(block_idx):
        # clamp garbage/sentinel ids in-range (see paged_attention.py)
        return layer_ref[0] + jnp.minimum(
            table_ref[b, block_idx], num_pages - 1
        )

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

    # triple-buffered: DMA addresses come from SMEM table loads, so issue
    # two pages ahead (see paged_attention.py)
    @pl.when(num_blocks > first_block)
    def _():
        start_copy(first_block % 3, first_block)

    @pl.when(num_blocks > first_block + 1)
    def _():
        start_copy((first_block + 1) % 3, first_block + 1)

    def body(i, carry):
        slot = i % 3

        @pl.when(i + 2 < num_blocks)
        def _():
            start_copy((i + 2) % 3, i + 2)

        wait_copy(slot, i)
        k = k_scratch[slot]
        v = v_scratch[slot]
        s = jnp.dot(k, q_bd, preferred_element_type=jnp.float32)
        pos = i * page_size + jax.lax.broadcasted_iota(
            jnp.int32, (page_size, 1), 0
        )
        valid = (pos < n) & (pos >= win_lo)
        return _online_update(carry, s, valid, v)

    m0 = jnp.full((1, num_cols), NEG_INF, jnp.float32)
    z0 = jnp.zeros((1, num_cols), jnp.float32)
    acc0 = jnp.zeros((packed_dim, num_cols), jnp.float32)
    carry = jax.lax.fori_loop(first_block, num_blocks, body, (m0, z0, acc0))
    m, z, acc = _tail_block(
        carry, q_bd, tailk_ref, tailv_ref, n, wr, t_col, q_abs, window
    )
    o_ref[0] = acc / jnp.maximum(z, 1e-30)


@functools.partial(jax.jit, static_argnames=("scale", "interpret"))
def paged_segment_tail_attention(
    q: jax.Array,  # (B, T, H, D)
    k_pool: jax.Array,  # (L, P, page_size, Hkv, D) stacked pool
    v_pool: jax.Array,
    layer: jax.Array,  # scalar int32
    page_table: jax.Array,  # (B, pages_per_seq) int32
    lengths: jax.Array,  # (B,) prompt length
    tail_k: jax.Array,  # (B, Ts, Hkv, D)
    tail_v: jax.Array,
    written: jax.Array,  # (B,)
    window: jax.Array | int = 0,
    *,
    scale: float | None = None,
    interpret: bool = False,
) -> jax.Array:
    """Paged variant: DMAs exactly the live pages of each row — no
    contiguous view gather. Takes the STACKED (L, P, ...) pool + a layer
    scalar so no per-layer slice ever materialises (the kernel offsets page
    ids by layer * P into the flat (L*P, ...) view — a free reshape).
    Single-layer (P, page_size, Hkv, D) pools work with ``layer`` = 0.
    Returns (B, T, H, D)."""
    B, T, H, D = q.shape
    Ts = tail_k.shape[1]
    Hkv = tail_k.shape[2]
    G = H // Hkv
    if scale is None:
        scale = D**-0.5
    packed = Hkv * D
    cols = Hkv * T * G

    if k_pool.ndim == 4:  # (P, ps, Hkv, D) single-layer form
        P, page_size = k_pool.shape[:2]
    else:  # (L, P, ps, Hkv, D)
        P, page_size = k_pool.shape[1:3]
    k_flat = k_pool.reshape(-1, page_size, packed)
    v_flat = v_pool.reshape(-1, page_size, packed)
    q_bd = block_diag_queries_multi(q, Hkv, G, scale)
    tk_flat = tail_k.reshape(B, Ts, packed)
    tv_flat = tail_v.reshape(B, Ts, packed)

    kernel = functools.partial(
        _paged_seg_kernel, page_size=page_size, packed_dim=packed,
        num_cols=cols, num_pages=P, T=T, G=G,
    )
    row0 = (jnp.asarray(layer, jnp.int32) * P).reshape(1)
    out_packed = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=5,
            grid=(B,),
            in_specs=[
                pl.BlockSpec(
                    (1, packed, cols), lambda b, *_: (b, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, Ts, packed), lambda b, *_: (b, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, Ts, packed), lambda b, *_: (b, 0, 0),
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
        row0,
        page_table.astype(jnp.int32),
        lengths.astype(jnp.int32),
        written.astype(jnp.int32),
        jnp.asarray(window, jnp.int32).reshape(1),
        q_bd,
        tk_flat,
        tv_flat,
        k_flat,
        v_flat,
    )
    return extract_diag_multi(out_packed, Hkv, T, G, D, q.dtype)


def segment_tail_attention_xla(
    q, k_cache, v_cache, lengths, tail_k, tail_v, written, window=0,
    *, scale=None,
):
    """XLA oracle replicating the kernel's masking semantics — the
    correctness reference for tests and non-TPU backends.

    q (B, T, H, D); k_cache (B, S, Hkv, D); tail (B, Ts, Hkv, D)."""
    B, T, H, D = q.shape
    S = k_cache.shape[1]
    Ts = tail_k.shape[1]
    Hkv = k_cache.shape[2]
    G = H // Hkv
    if scale is None:
        scale = D**-0.5
    qf = (q * scale).reshape(B, T, Hkv, G, D)
    lp = jnp.einsum(
        "btkgd,bskd->bkgts", qf, k_cache, preferred_element_type=jnp.float32
    )
    lt = jnp.einsum(
        "btkgd,bskd->bkgts", qf, tail_k, preferred_element_type=jnp.float32
    )
    window = jnp.asarray(window, jnp.int32)
    n = lengths[:, None]  # (B, 1)
    tq = jnp.arange(T, dtype=jnp.int32)[None]  # (1, T)
    q_abs = n + written[:, None] + tq  # (B, T)
    kpos = jnp.arange(S, dtype=jnp.int32)
    ok_p = (kpos[None, None] < n[..., None]) & jnp.where(
        window > 0, q_abs[..., None] - kpos[None, None] < window, True
    )  # (B, T, S)
    tslot = jnp.arange(Ts, dtype=jnp.int32)
    ok_t = tslot[None, None] <= (written[:, None] + tq)[..., None]
    ok_t = ok_t & jnp.where(
        window > 0, q_abs[..., None] - (n[..., None] + tslot) < window, True
    )  # (B, T, Ts)
    lp = jnp.where(ok_p[:, None, None], lp, NEG_INF)
    lt = jnp.where(ok_t[:, None, None], lt, NEG_INF)
    probs = jax.nn.softmax(jnp.concatenate([lp, lt], axis=-1), axis=-1)
    pp = probs[..., :S].astype(v_cache.dtype)
    pt = probs[..., S:].astype(tail_v.dtype)
    out = jnp.einsum(
        "bkgts,bskd->btkgd", pp, v_cache, preferred_element_type=jnp.float32
    ) + jnp.einsum(
        "bkgts,bskd->btkgd", pt, tail_v, preferred_element_type=jnp.float32
    )
    return out.reshape(B, T, H, D).astype(q.dtype)
