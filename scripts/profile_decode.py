"""Decode-step profiling on the real TPU (run under the ambient axon env).

Measures ms/step of the fused greedy decode scan on 1B-class dims at several
cache buckets, plus component microbenches, to steer the decode-throughput
work (VERDICT r1 weak #2: 6.9 ms/step vs ~3.0 ms weight-traffic roofline).

Usage: python scripts/profile_decode.py [--kernel] [--batch 8]
"""

import argparse
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def fence(x) -> float:
    """Scalar host fetch — the only reliable execution fence on axon."""
    return float(jnp.sum(x.astype(jnp.float32)) if hasattr(x, "astype") else x)


def time_fn(fn, *args, iters=20, **kw):
    out = fn(*args, **kw)
    fence(jax.tree.leaves(out)[0])  # compile + run once
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kw)
    fence(jax.tree.leaves(out)[0])
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--kernel", action="store_true")
    ap.add_argument("--steps", type=int, default=64)
    args = ap.parse_args()

    import __graft_entry__ as graft
    from ultravox_tpu.inference.engine import GenerationEngine
    from ultravox_tpu.models import ultravox as uv_model

    print("device:", jax.devices()[0], flush=True)
    cfg = graft._flagship_config()
    params = uv_model.init_params(cfg, jax.random.key(0), jnp.bfloat16)

    B, STEPS = args.batch, args.steps
    n_weight_bytes = sum(
        x.size * x.dtype.itemsize for x in jax.tree.leaves(params["language_model"])
    )
    print(f"LM weight bytes: {n_weight_bytes/1e9:.2f} GB", flush=True)

    for max_cache in (256, 512, 1024, 2048):
        engine = GenerationEngine(
            params, cfg, max_cache_len=max_cache,
            decode_attn_impl="kernel" if args.kernel else "xla",
        )
        prompt_len = max_cache - STEPS - 8
        prompt = np.full((B, prompt_len), 7, np.int32)
        batch = {"input_ids": prompt, "attention_mask": np.ones_like(prompt)}

        engine.generate_greedy_fused(batch, max_new_tokens=STEPS)  # compile
        t0 = time.perf_counter()
        iters = 3
        for _ in range(iters):
            engine.generate_greedy_fused(batch, max_new_tokens=STEPS)
        dt = time.perf_counter() - t0
        # subtract prefill cost measured separately
        import ultravox_tpu.models.decoder as decoder_lib
        from ultravox_tpu.inference.engine import _cache_bucket

        cache_t = decoder_lib.KVCache.zeros(
            cfg.text_config, B, _cache_bucket(prompt_len + STEPS, max_cache),
            jnp.bfloat16,
        )
        jb = {k: jnp.asarray(v) for k, v in engine.pad_batch(batch).items()}

        def pf():
            out, c, s = engine._prefill(
                engine.params, jb, cache_t, jnp.asarray(0, jnp.int32)
            )
            return out

        pf_dt = time_fn(pf, iters=3)
        decode_ms = (dt / iters - pf_dt) / STEPS * 1000
        tps = B / (decode_ms / 1000)
        bw = n_weight_bytes / (decode_ms / 1000) / 1e9
        print(
            f"ctx~{prompt_len}+{STEPS} cache={cache_t.max_len}: "
            f"decode {decode_ms:.2f} ms/step, {tps:.0f} tok/s (B={B}), "
            f"weight-BW {bw:.0f} GB/s, prefill {pf_dt*1000:.1f} ms",
            flush=True,
        )


if __name__ == "__main__":
    main()
