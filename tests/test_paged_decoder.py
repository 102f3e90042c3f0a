"""Paged-cache decoder paths: chunked prefill + decode against a paged pool
must produce the same logits as the contiguous KVCache path."""

import numpy as np

import jax
import jax.numpy as jnp

from ultravox_tpu.models import DecoderConfig
from ultravox_tpu.models import decoder as dl


def _cfg(**kw):
    return DecoderConfig(
        arch=kw.pop("arch", "llama"), vocab_size=128, hidden_size=32,
        intermediate_size=64, num_layers=2, num_heads=4, num_kv_heads=2,
        head_dim=16, **kw,
    )


def _alloc_tables(B, n_per, num_pages, used, rng):
    """Sentinel-padded page tables with ``used[b]`` allocated pages per row,
    drawn from a shuffled pool (no page shared between rows)."""
    order = rng.permutation(num_pages)
    table = np.full((B, n_per), num_pages, np.int32)
    it = iter(order)
    for b in range(B):
        for i in range(used[b]):
            table[b, i] = next(it)
    return jnp.asarray(table)


def test_paged_matches_contiguous_prefill_and_decode():
    cfg = _cfg()
    params = dl.init_params(cfg, jax.random.key(0), jnp.float32)
    B, T, ps = 2, 24, 8
    S_max = 40  # logical view: 5 pages per row
    n_per = S_max // ps
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(1, 128, (B, T)), jnp.int32)
    prompt_lens = jnp.asarray([24, 17], jnp.int32)

    # ---- contiguous oracle
    cache = dl.KVCache.zeros(cfg, B, S_max, jnp.float32)
    positions = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32)[None], (B, T))
    logits_c, cache = dl.decoder_forward(
        params, cfg, input_ids=ids, positions=positions,
        kv_valid_len=prompt_lens, cache=cache,
        write_pos=jnp.zeros((B,), jnp.int32),
    )

    # ---- paged: enough pages for prompt + a few decode tokens
    pool = dl.PagedKVCache.zeros(cfg, num_pages=16, page_size=ps,
                                 dtype=jnp.float32)
    used = [int(-(-int(l) // ps)) + 1 for l in np.asarray(prompt_lens)]
    table = _alloc_tables(B, n_per, pool.num_pages, used, rng)
    logits_p, pool = dl.decoder_forward(
        params, cfg, input_ids=ids, positions=positions,
        kv_valid_len=prompt_lens, cache=pool, page_table=table,
        write_pos=jnp.zeros((B,), jnp.int32),
    )
    np.testing.assert_allclose(
        np.asarray(logits_p), np.asarray(logits_c), atol=2e-5, rtol=1e-5
    )

    # ---- three greedy decode steps, logits compared each step
    lens = prompt_lens
    tok_c = jnp.argmax(logits_c[jnp.arange(B), lens - 1], axis=-1).astype(
        jnp.int32
    )
    tok_p = tok_c
    for _ in range(3):
        pos = lens[:, None]
        lc, cache = dl.decoder_forward(
            params, cfg, input_ids=tok_c[:, None], positions=pos,
            kv_valid_len=lens + 1, cache=cache, write_pos=lens,
        )
        lp, pool = dl.decoder_forward(
            params, cfg, input_ids=tok_p[:, None], positions=pos,
            kv_valid_len=lens + 1, cache=pool, page_table=table,
            write_pos=lens,
        )
        np.testing.assert_allclose(
            np.asarray(lp), np.asarray(lc), atol=2e-5, rtol=1e-5
        )
        tok_c = jnp.argmax(lc[:, 0], axis=-1).astype(jnp.int32)
        tok_p = jnp.argmax(lp[:, 0], axis=-1).astype(jnp.int32)
        np.testing.assert_array_equal(np.asarray(tok_c), np.asarray(tok_p))
        lens = lens + 1


def test_paged_sliding_window_layers_match():
    """Mistral-style sliding-window layers agree between paged and
    contiguous caches (bias-built window on the gathered view)."""
    cfg = _cfg(arch="mistral", sliding_window=8)
    params = dl.init_params(cfg, jax.random.key(1), jnp.float32)
    B, T, ps = 2, 16, 8
    S_max = 24
    rng = np.random.default_rng(1)
    ids = jnp.asarray(rng.integers(1, 128, (B, T)), jnp.int32)
    lens = jnp.asarray([16, 11], jnp.int32)
    positions = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32)[None], (B, T))

    cache = dl.KVCache.zeros(cfg, B, S_max, jnp.float32)
    lc, _ = dl.decoder_forward(
        params, cfg, input_ids=ids, positions=positions, kv_valid_len=lens,
        cache=cache, write_pos=jnp.zeros((B,), jnp.int32),
    )
    pool = dl.PagedKVCache.zeros(cfg, num_pages=8, page_size=ps,
                                 dtype=jnp.float32)
    table = _alloc_tables(B, S_max // ps, pool.num_pages, [3, 3], rng)
    lp, _ = dl.decoder_forward(
        params, cfg, input_ids=ids, positions=positions, kv_valid_len=lens,
        cache=pool, page_table=table,
        write_pos=jnp.zeros((B,), jnp.int32),
    )
    np.testing.assert_allclose(
        np.asarray(lp), np.asarray(lc), atol=2e-5, rtol=1e-5
    )


def test_paged_inactive_write_pos_is_dropped():
    """A row whose write_pos is out of range (inactive slot) must leave the
    pool bit-identical (no page corruption)."""
    cfg = _cfg()
    params = dl.init_params(cfg, jax.random.key(2), jnp.float32)
    B, ps = 2, 8
    pool = dl.PagedKVCache.zeros(cfg, num_pages=8, page_size=ps,
                                 dtype=jnp.float32)
    rng = np.random.default_rng(2)
    table = _alloc_tables(B, 3, pool.num_pages, [1, 1], rng)
    k_before = np.asarray(pool.k)
    ids = jnp.asarray([[5], [9]], jnp.int32)
    # row 0 writes at 0; row 1 is "inactive": write_pos far out of range
    wp = jnp.asarray([0, 3 * ps + 100], jnp.int32)
    _, pool = dl.decoder_forward(
        params, cfg, input_ids=ids, positions=wp[:, None],
        kv_valid_len=jnp.asarray([1, 1], jnp.int32), cache=pool,
        page_table=table, write_pos=wp,
    )
    k_after = np.asarray(pool.k)
    p0 = int(np.asarray(table)[0, 0])
    changed = [
        p for p in range(8)
        if not np.array_equal(k_before[:, p], k_after[:, p])
    ]
    assert changed == [p0], changed


def test_paged_decode_kernel_path_matches_xla_gather():
    """decode_kernel=True through a PagedKVCache routes to the paged Pallas
    kernel (interpret here) and matches the XLA gather path."""
    import functools

    import ultravox_tpu.ops.pallas.paged_attention as pa

    orig = pa.paged_decode_attention
    pa.paged_decode_attention = functools.partial(orig, interpret=True)
    try:
        cfg = _cfg()
        params = dl.init_params(cfg, jax.random.key(3), jnp.float32)
        B, T, ps = 2, 10, 8
        rng = np.random.default_rng(3)
        ids = jnp.asarray(rng.integers(1, 128, (B, T)), jnp.int32)
        pos = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32)[None], (B, T))
        pool = dl.PagedKVCache.zeros(cfg, num_pages=8, page_size=ps,
                                     dtype=jnp.float32)
        table = _alloc_tables(B, 4, pool.num_pages, [3, 3], rng)
        logits, pool = dl.decoder_forward(
            params, cfg, input_ids=ids, positions=pos,
            kv_valid_len=jnp.full((B,), T, jnp.int32),
            cache=pool, page_table=table,
            write_pos=jnp.zeros((B,), jnp.int32),
        )
        tok = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)
        kw = dict(
            input_ids=tok[:, None],
            positions=jnp.full((B, 1), T, jnp.int32),
            kv_valid_len=jnp.full((B,), T + 1, jnp.int32),
            page_table=table,
            write_pos=jnp.full((B,), T, jnp.int32),
        )
        l_xla, _ = dl.decoder_forward(params, cfg, cache=pool, **kw)
        l_krn, _ = dl.decoder_forward(
            params, cfg, cache=pool, decode_kernel=True, **kw
        )
        np.testing.assert_allclose(
            np.asarray(l_krn), np.asarray(l_xla), atol=1e-5
        )
    finally:
        pa.paged_decode_attention = orig
