"""Segmented tail attention (multi-query verify + carried tail) kernel:
interpret-mode parity vs the XLA oracle and vs the decoder's
`_merged_attention` masking semantics, contiguous and paged."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ultravox_tpu.models.decoder import NEG_INF, _merged_attention
from ultravox_tpu.ops.pallas.segment_attention import (
    paged_segment_tail_attention,
    segment_tail_attention,
    segment_tail_attention_xla,
)


def _rand(rng, shape, dtype=jnp.float32):
    return jnp.asarray(rng.standard_normal(shape), dtype)


@pytest.mark.parametrize(
    "T,window", [(1, 0), (1, 40), (9, 0), (9, 40)],
    ids=["t1", "t1-win", "t9", "t9-win"],
)
def test_kernel_vs_oracle(T, window):
    B, S, H, Hkv, D, Ts = 4, 256, 8, 2, 64, 24
    rng = np.random.default_rng(0)
    q = _rand(rng, (B, T, H, D))
    k = _rand(rng, (B, S, Hkv, D))
    v = _rand(rng, (B, S, Hkv, D))
    tk = _rand(rng, (B, Ts, Hkv, D))
    tv = _rand(rng, (B, Ts, Hkv, D))
    lens = jnp.asarray([256, 100, 33, 7], jnp.int32)
    written = jnp.asarray([0, 5, 15 - T, 2], jnp.int32)

    ref = segment_tail_attention_xla(
        q, k, v, lens, tk, tv, written, window
    )
    out = segment_tail_attention(
        q, k, v, jnp.asarray(0, jnp.int32), lens, tk, tv, written, window,
        block_s=128, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


def test_oracle_vs_merged_attention():
    """The oracle (and hence the kernel) must reproduce the segmented
    scans' `_merged_attention` + bias construction exactly (decoder.py's
    segmented_spec_scan masking)."""
    B, S, H, Hkv, D, Ts, T = 2, 128, 8, 2, 64, 18, 9
    rng = np.random.default_rng(1)
    q = _rand(rng, (B, T, H, D))
    k = _rand(rng, (B, S, Hkv, D))
    v = _rand(rng, (B, S, Hkv, D))
    tk = _rand(rng, (B, Ts, Hkv, D))
    tv = _rand(rng, (B, Ts, Hkv, D))
    lens = jnp.asarray([100, 37], jnp.int32)
    written = jnp.asarray([0, 9], jnp.int32)
    scale = D**-0.5

    # bias construction copied from segmented_spec_scan (decoder.py)
    kpos = jnp.arange(S, dtype=jnp.int32)[None]
    seg_i = jnp.arange(T, dtype=jnp.int32)
    tail_t = jnp.arange(Ts, dtype=jnp.int32)
    ok_p = kpos < lens[:, None]
    bias_p = jnp.where(ok_p, 0.0, NEG_INF)[:, None]
    ok_t = tail_t[None, None] <= (written[:, None] + seg_i[None])[:, :, None]
    bias_t = jnp.where(ok_t, 0.0, NEG_INF)
    ref = _merged_attention(q, k, v, bias_p, tk, tv, bias_t, scale)

    out = segment_tail_attention_xla(q, k, v, lens, tk, tv, written, 0)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


def test_stacked_layer_indexing():
    """The stacked (L, B, S, Hkv, D) form with a layer scalar must match
    slicing that layer out by hand."""
    L, B, S, H, Hkv, D, Ts, T = 3, 2, 128, 4, 2, 64, 8, 1
    rng = np.random.default_rng(2)
    q = _rand(rng, (B, T, H, D))
    ks = _rand(rng, (L, B, S, Hkv, D))
    vs = _rand(rng, (L, B, S, Hkv, D))
    tk = _rand(rng, (B, Ts, Hkv, D))
    tv = _rand(rng, (B, Ts, Hkv, D))
    lens = jnp.asarray([90, 128], jnp.int32)
    written = jnp.asarray([3, 0], jnp.int32)
    for layer in range(L):
        ref = segment_tail_attention_xla(
            q, ks[layer], vs[layer], lens, tk, tv, written, 0
        )
        out = segment_tail_attention(
            q, ks, vs, jnp.asarray(layer, jnp.int32), lens, tk, tv,
            written, 0, block_s=128, interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
        )


@pytest.mark.parametrize("T", [1, 9], ids=["t1", "t9"])
def test_paged_kernel_vs_oracle(T):
    L, B, S, H, Hkv, D, ps, Ts = 2, 4, 512, 8, 2, 64, 128, 16
    rng = np.random.default_rng(3)
    q = _rand(rng, (B, T, H, D))
    k = _rand(rng, (L, B, S, Hkv, D))
    v = _rand(rng, (L, B, S, Hkv, D))
    tk = _rand(rng, (B, Ts, Hkv, D))
    tv = _rand(rng, (B, Ts, Hkv, D))
    lens = jnp.asarray([512, 100, 256, 7], jnp.int32)
    written = jnp.asarray([2, 0, 7, 1], jnp.int32)

    # scatter each layer's rows into a shared pool with a shuffled order
    n_per = S // ps
    P = B * n_per + 3
    perm = np.random.default_rng(7).permutation(B * n_per)
    pool_k = np.asarray(
        np.random.default_rng(8).standard_normal((L, P, ps, Hkv, D)),
        np.float32,
    )
    pool_v = pool_k + 1.0  # garbage, overwritten where referenced
    table = np.zeros((B, n_per), np.int32)
    for flat, pid in enumerate(perm):
        b, i = divmod(flat, n_per)
        for l in range(L):
            pool_k[l, pid] = np.asarray(k[l, b, i * ps:(i + 1) * ps])
            pool_v[l, pid] = np.asarray(v[l, b, i * ps:(i + 1) * ps])
        table[b, i] = pid
    pool_k, pool_v = jnp.asarray(pool_k), jnp.asarray(pool_v)
    table = jnp.asarray(table)

    for layer in range(L):
        ref = segment_tail_attention_xla(
            q, k[layer], v[layer], lens, tk, tv, written, 0
        )
        out = paged_segment_tail_attention(
            q, pool_k, pool_v, jnp.asarray(layer, jnp.int32), table, lens,
            tk, tv, written, 0, interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
        )
