"""Validate + time the segmented tail-attention kernel on the real TPU.

1. Parity: compiled kernel vs the XLA oracle at serving shapes (bf16).
2. Perf: block-decode and speculative-block programs, XLA merged attention
   vs the segmented flash-decode kernel, at the driver-bench shapes
   (1B flagship, 8 slots, ~1.5K live context, 2K window).

    python scripts/validate_seg_kernel.py [--mode slots|paged|both]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def timeit(name, fn, steps=20):
    from ultravox_tpu.utils.profiling import fence

    out = fn()
    fence(jax.tree.leaves(out)[-1])
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn()
    fence(jax.tree.leaves(out)[-1])
    dt = (time.perf_counter() - t0) / steps * 1e3
    print(f"{name:32s} {dt:8.2f} ms", flush=True)
    return dt


def parity_check():
    from ultravox_tpu.ops.pallas.segment_attention import (
        segment_tail_attention,
        segment_tail_attention_xla,
    )

    B, S, H, Hkv, D = 8, 2048, 32, 8, 64
    rng = np.random.default_rng(0)
    lens = jnp.asarray(rng.integers(700, 1900, (B,)), jnp.int32)
    for T, Ts in ((1, 8), (9, 72)):
        q = jnp.asarray(rng.standard_normal((B, T, H, D)), jnp.bfloat16)
        k = jnp.asarray(
            rng.standard_normal((B, S, Hkv, D)) * 0.3, jnp.bfloat16
        )
        v = jnp.asarray(
            rng.standard_normal((B, S, Hkv, D)) * 0.3, jnp.bfloat16
        )
        tk = jnp.asarray(rng.standard_normal((B, Ts, Hkv, D)), jnp.bfloat16)
        tv = jnp.asarray(rng.standard_normal((B, Ts, Hkv, D)), jnp.bfloat16)
        wr = jnp.asarray(rng.integers(0, Ts - T + 1, (B,)), jnp.int32)
        ref = np.asarray(
            segment_tail_attention_xla(
                q.astype(jnp.float32), k.astype(jnp.float32),
                v.astype(jnp.float32), lens, tk.astype(jnp.float32),
                tv.astype(jnp.float32), wr, 0,
            )
        )
        out = np.asarray(
            segment_tail_attention(
                q, k, v, jnp.asarray(0, jnp.int32), lens, tk, tv, wr, 0
            ).astype(jnp.float32)
        )
        err = np.abs(out - ref).max()
        print(f"parity T={T}: max abs err {err:.4f} (bf16 inputs)")
        assert err < 0.15, err


def bench_mode(mode):
    import __graft_entry__ as graft
    from ultravox_tpu.inference.serving import engine as eng_mod
    from ultravox_tpu.models import ultravox as uv_model
    from ultravox_tpu.models import decoder as dl

    cfg = graft._flagship_config()
    params = uv_model.init_params(cfg, jax.random.key(0), jnp.bfloat16)
    lm = dl.fuse_inference_params(params["language_model"], cfg.text_config)
    params = dict(params)
    params["language_model"] = lm
    B, CTX, SEQ, K = 8, 1500, 2048, 8
    tc = cfg.text_config
    rng_np = np.random.default_rng(0)
    V = tc.vocab_size
    cache_lens = jnp.full((B,), CTX, jnp.int32)
    last = jnp.asarray(rng_np.integers(1, V, (B,)), jnp.int32)
    mask = jnp.ones((B,), bool)
    samp = jnp.zeros((B, 4), jnp.float32).at[:, 2].set(1.0)
    samp7 = jnp.zeros((B, 7), jnp.float32).at[:, 2].set(1.0).at[:, 6].set(1.0)
    key = jax.random.key(1)
    hist0 = np.zeros((B, SEQ), np.int32)
    motif = rng_np.integers(1, V, (24,))
    hist0[:, :CTX] = np.tile(motif, CTX // 24 + 1)[:CTX]
    hist = jnp.asarray(hist0)

    if mode == "slots":
        cache = dl.KVCache.zeros(tc, B, SEQ, jnp.bfloat16)
        table = None
        blk_fn, spec_fn = eng_mod._decode_block, eng_mod._spec_decode_block
        extra = ()
    else:
        n_per = SEQ // 256
        P = B * n_per + 2
        cache = dl.PagedKVCache.zeros(tc, P, 256, jnp.bfloat16)
        t = np.arange(B * n_per, dtype=np.int32).reshape(B, n_per)
        table = jnp.asarray(t)
        blk_fn = eng_mod._decode_block_paged
        spec_fn = eng_mod._spec_decode_block_paged
        extra = (table,)

    if mode == "slots":
        # reference: the raw fused scan with STATIC greedy sampling (what
        # decode_tok_s_batch8_1b_2k_ctx measures) — separates the engine
        # block program's sampling/publish overhead from attention cost
        for impl in ("xla", "kernel"):
            raw = jax.jit(
                lambda p, c, tok, cl, k_, impl=impl: dl.segmented_decode_scan(
                    p["language_model"], tc, c, cl, tok, k_, n_steps=8,
                    sample_fn=lambda lg, kk: jnp.argmax(lg, -1).astype(
                        jnp.int32
                    ),
                    attn_impl=impl,
                )
            )
            timeit(
                f"raw scan8 greedy [{impl}]",
                lambda: raw(params, cache, last, cache_lens, key),
            )

    for impl in ("xla", "kernel"):
        blk = jax.jit(
            lambda p, c, tok, cl, m, s, k_, *ex, impl=impl: blk_fn(
                p, c, tok, cl, m, s, k_, *ex, cfg=cfg, n_steps=8,
                attn_impl=impl,
            )
        )
        out = timeit(
            f"{mode} block8 [{impl}]",
            lambda: blk(params, cache, last, cache_lens, mask, samp7, key,
                        *extra),
        )
        spec = jax.jit(
            lambda p, c, h, tok, cl, m, s, k_, *ex, impl=impl: spec_fn(
                p, c, h, tok, cl, m, s, k_, *ex, cfg=cfg, K=K, ngram=2,
                n_rounds=8, attn_impl=impl,
            )
        )
        timeit(
            f"{mode} spec_block8 [{impl}]",
            lambda: spec(params, cache, hist, last, cache_lens, mask, samp,
                         key, *extra),
        )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="both")
    ap.add_argument("--skip-parity", action="store_true")
    args = ap.parse_args()
    if not args.skip_parity:
        parity_check()
    for mode in ("paged", "slots") if args.mode == "both" else (args.mode,):
        bench_mode(mode)


if __name__ == "__main__":
    main()
