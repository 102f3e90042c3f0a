"""Paged KV attention: kernel (interpret) and XLA-gather fallback vs a
contiguous oracle, with pages deliberately scattered through the pool."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ultravox_tpu.ops.attention import NEG_INF, mha
from ultravox_tpu.ops.pallas.paged_attention import (
    paged_decode_attention,
    paged_decode_attention_xla,
)


def _scatter_to_pages(k_contig, page_size, rng, extra_pages=3):
    """(B, S, Hkv, D) -> pool (P, ps, Hkv, D) + page_table (B, S/ps), with a
    shuffled page order and a few never-referenced garbage pages."""
    B, S, Hkv, D = k_contig.shape
    n_per = S // page_size
    P = B * n_per + extra_pages
    order = rng.permutation(B * n_per)
    pool = np.asarray(
        rng.standard_normal((P, page_size, Hkv, D)), k_contig.dtype
    )  # garbage everywhere, incl. the extra pages
    table = np.zeros((B, n_per), np.int32)
    blocks = np.asarray(k_contig).reshape(B * n_per, page_size, Hkv, D)
    for flat, pid in enumerate(order):
        b, i = divmod(flat, n_per)
        pool[pid] = blocks[flat]
        table[b, i] = pid
    return jnp.asarray(pool), jnp.asarray(table)


@pytest.mark.parametrize("window", [0, 48], ids=["full", "window"])
def test_paged_decode_parity(window):
    B, S, H, Hkv, D, ps = 4, 512, 8, 2, 64, 128
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, H, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, S, Hkv, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, S, Hkv, D)), jnp.float32)
    lens = jnp.asarray([512, 100, 256, 7], jnp.int32)

    # contiguous oracle with the same length+window masking
    pos = jnp.arange(S, dtype=jnp.int32)[None, :]
    n = lens[:, None]
    lo = jnp.maximum(n - window, 0) if window else jnp.zeros_like(n)
    ok = (pos < n) & (pos >= lo)
    bias = jnp.where(ok, 0.0, NEG_INF)[:, None, None, :]
    ref = mha(q[:, None], k, v, bias=bias)[:, 0]

    # k and v must share one table: same seed -> same permutation
    k_pool, table = _scatter_to_pages(k, ps, np.random.default_rng(7))
    v_pool, table_v = _scatter_to_pages(v, ps, np.random.default_rng(7))
    np.testing.assert_array_equal(np.asarray(table), np.asarray(table_v))

    out_kernel = paged_decode_attention(
        q, k_pool, v_pool, table, lens, window, interpret=True
    )
    out_xla = paged_decode_attention_xla(
        q, k_pool, v_pool, table, lens, window
    )
    np.testing.assert_allclose(
        np.asarray(out_kernel), np.asarray(ref), atol=2e-5
    )
    np.testing.assert_allclose(np.asarray(out_xla), np.asarray(ref), atol=2e-5)


def test_paged_decode_gqa_and_scale():
    """GQA grouping survives the block-diagonal packing with a paged table,
    and a non-default scale is honoured."""
    B, S, H, Hkv, D, ps = 2, 256, 16, 4, 64, 64
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.standard_normal((B, H, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, S, Hkv, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, S, Hkv, D)), jnp.float32)
    lens = jnp.asarray([256, 129], jnp.int32)
    scale = 0.25

    pos = jnp.arange(S, dtype=jnp.int32)[None, :]
    bias = jnp.where(pos < lens[:, None], 0.0, NEG_INF)[:, None, None, :]
    ref = mha(q[:, None], k, v, bias=bias, scale=scale)[:, 0]

    rng2 = np.random.default_rng(3)
    k_pool, table = _scatter_to_pages(k, ps, rng2)
    v_pool, _ = _scatter_to_pages(v, ps, np.random.default_rng(3))
    out = paged_decode_attention(
        q, k_pool, v_pool, table, lens, scale=scale, interpret=True
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_paged_decode_untouched_pages_are_ignored():
    """Table entries past each sequence's length may point anywhere in-range
    without affecting the result (the kernel never reads them)."""
    B, S, H, Hkv, D, ps = 2, 256, 4, 2, 64, 64
    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.standard_normal((B, H, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, S, Hkv, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, S, Hkv, D)), jnp.float32)
    lens = jnp.asarray([65, 64], jnp.int32)  # 2 pages and 1 page live

    rng2 = np.random.default_rng(5)
    k_pool, table = _scatter_to_pages(k, ps, rng2)
    v_pool, _ = _scatter_to_pages(v, ps, np.random.default_rng(5))
    out1 = paged_decode_attention(
        q, k_pool, v_pool, table, lens, interpret=True
    )
    # stomp the dead tail of the table (points at garbage pages)
    t2 = np.asarray(table).copy()
    t2[0, 2:] = 0
    t2[1, 1:] = int(k_pool.shape[0]) - 1
    out2 = paged_decode_attention(
        q, k_pool, v_pool, jnp.asarray(t2), lens, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))


def test_paged_decode_pageless_slot_is_safe():
    """A slot owning ZERO pages (all-sentinel table row, as every free slot
    has in the serving engine) must not address outside the pool: the
    kernel clamps page ids in-range. Its output is garbage-by-contract but
    must be finite, and other rows must be exact."""
    B, S, H, Hkv, D, ps = 2, 128, 4, 2, 64, 64
    rng = np.random.default_rng(9)
    q = jnp.asarray(rng.standard_normal((B, H, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, S, Hkv, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, S, Hkv, D)), jnp.float32)

    k_pool, table = _scatter_to_pages(k, ps, np.random.default_rng(11))
    v_pool, _ = _scatter_to_pages(v, ps, np.random.default_rng(11))
    t = np.asarray(table).copy()
    t[1, :] = int(k_pool.shape[0])  # row 1: no pages at all (sentinel)
    lens = jnp.asarray([128, 1], jnp.int32)  # inactive slots carry len 1

    out = paged_decode_attention(
        q, k_pool, v_pool, jnp.asarray(t), lens, interpret=True
    )
    assert np.isfinite(np.asarray(out)).all()
    # row 0 unaffected by row 1's sentinel table
    pos = jnp.arange(S, dtype=jnp.int32)[None, :]
    bias = jnp.where(pos < lens[:, None], 0.0, NEG_INF)[:, None, None, :]
    ref = mha(q[:1, None], k[:1], v[:1], bias=bias[:1])[:, 0]
    np.testing.assert_allclose(
        np.asarray(out[:1]), np.asarray(ref), atol=2e-5
    )


def test_gather_pages_kernel_matches_take():
    """The Pallas page-copy kernel assembles exactly the XLA gather's view
    for every allocated table entry (sentinel entries differ only in WHICH
    finite garbage they carry — both are masked by length)."""
    from ultravox_tpu.ops.pallas.paged_gather import gather_pages

    L, P, ps, Hkv, D = 3, 10, 16, 2, 64
    B, n_per = 2, 4
    rng = np.random.default_rng(0)
    pool_k = jnp.asarray(rng.standard_normal((L, P, ps, Hkv, D)), jnp.float32)
    pool_v = pool_k * 2.0 + 1.0
    table = jnp.asarray([[3, 7, 1, 0], [9, 2, 5, 8]], np.int32)
    want_k = jnp.take(pool_k, table, axis=1, mode="clip").reshape(
        L, B, n_per * ps, Hkv, D
    )
    want_v = jnp.take(pool_v, table, axis=1, mode="clip").reshape(
        L, B, n_per * ps, Hkv, D
    )
    got_k, got_v = gather_pages(pool_k, pool_v, table, interpret=True)
    np.testing.assert_array_equal(np.asarray(got_k), np.asarray(want_k))
    np.testing.assert_array_equal(np.asarray(got_v), np.asarray(want_v))
