"""Pallas page-gather: assemble the contiguous per-sequence KV view from
pool pages with raw HBM->HBM DMAs.

The paged block-decode path gathers pool pages into a contiguous logical
view once per multi-step dispatch. XLA lowers that `jnp.take` to a gather
measured at ~97 GB/s effective on v5e (11.1 ms for the 1B-flagship 537 MB
view — scripts/ profile in git history), an order of magnitude under copy
bandwidth. This kernel is a pure data-movement program: one grid program
per (row, page) issues per-layer async copies pool[l, table[b, i]] ->
view[l, b, i*ps:(i+1)*ps]. Every table entry is copied (sentinel ids clip
to an arbitrary in-range page, exactly like the XLA gather's mode="clip"):
leaving dead pages UNWRITTEN would expose uninitialised HBM, whose bit
patterns can be NaN — and the attention masks are ADDITIVE (NaN + -inf =
NaN), so garbage must be finite, not merely masked.

No compute, no VMEM staging — source and destination stay in HBM/ANY."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gather_kernel(
    table_ref,  # SMEM (B, n_per) int32
    k_pool,  # ANY (L, P, ps, packed)
    v_pool,  # ANY (L, P, ps, packed)
    k_out,  # ANY (L, B, S, packed)
    v_out,  # ANY (L, B, S, packed)
    sems,  # DMA sems (L, 2)
    *,
    L: int,
    ps: int,
    P: int,
):
    b = pl.program_id(0)
    i = pl.program_id(1)
    pid = jnp.minimum(table_ref[b, i], P - 1)

    for l in range(L):
        pltpu.make_async_copy(
            k_pool.at[l, pid],
            k_out.at[l, b, pl.ds(i * ps, ps)],
            sems.at[l, 0],
        ).start()
        pltpu.make_async_copy(
            v_pool.at[l, pid],
            v_out.at[l, b, pl.ds(i * ps, ps)],
            sems.at[l, 1],
        ).start()
    for l in range(L):
        pltpu.make_async_copy(
            k_pool.at[l, pid],
            k_out.at[l, b, pl.ds(i * ps, ps)],
            sems.at[l, 0],
        ).wait()
        pltpu.make_async_copy(
            v_pool.at[l, pid],
            v_out.at[l, b, pl.ds(i * ps, ps)],
            sems.at[l, 1],
        ).wait()


@functools.partial(jax.jit, static_argnames=("interpret",))
def gather_pages(
    k_pool: jax.Array,  # (L, P, ps, Hkv, D)
    v_pool: jax.Array,
    page_table: jax.Array,  # (B, n_per) int32
    *,
    interpret: bool = False,
):
    """Returns (k_view, v_view): (L, B, n_per*ps, Hkv, D), value-identical
    to ``jnp.take(pool, table, axis=1, mode="clip")`` up to which in-range
    page a sentinel entry clips to (both finite, both masked)."""
    L, P, ps, Hkv, D = k_pool.shape
    B, n_per = page_table.shape
    S = n_per * ps
    packed = Hkv * D
    kernel = functools.partial(_gather_kernel, L=L, ps=ps, P=P)
    k_out, v_out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, n_per),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=(
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ),
            scratch_shapes=[pltpu.SemaphoreType.DMA((L, 2))],
        ),
        out_shape=(
            jax.ShapeDtypeStruct((L, B, S, packed), k_pool.dtype),
            jax.ShapeDtypeStruct((L, B, S, packed), v_pool.dtype),
        ),
        interpret=interpret,
    )(
        page_table.astype(jnp.int32),
        k_pool.reshape(L, P, ps, packed),
        v_pool.reshape(L, P, ps, packed),
    )
    return (
        k_out.reshape(L, B, S, Hkv, D),
        v_out.reshape(L, B, S, Hkv, D),
    )
