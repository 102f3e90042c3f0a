"""Sweep the segmented-kernel crossover: raw 8-step fused scan, XLA vs
kernel at several (live_ctx, slab, block_s) points on the real chip. Finds
where the kernel's valid-prefix-only read beats XLA's full-slab read
(decides the engine/GenerationEngine auto gates).

    python scripts/seg_kernel_sweep.py
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def timeit(fn, steps=20):
    from ultravox_tpu.utils.profiling import fence

    out = fn()
    fence(jax.tree.leaves(out)[-1])
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn()
    fence(jax.tree.leaves(out)[-1])
    return (time.perf_counter() - t0) / steps * 1e3


def main():
    import argparse

    import __graft_entry__ as graft
    from ultravox_tpu.models import decoder as dl
    from ultravox_tpu.ops.pallas import segment_attention as seg

    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--dims", choices=("1b", "8b"), default="1b",
        help="1b = flagship config (r4 sweep); 8b = Llama-3.1-8B layer "
        "dims on a layer slice (--layers deep) — decides the dims-aware "
        "auto gate for block_attn_impl (VERDICT r4 #4)",
    )
    ap.add_argument("--layers", type=int, default=4)
    args = ap.parse_args()

    if args.dims == "8b":
        from ultravox_tpu.models import DecoderConfig, UltravoxConfig

        cfg = UltravoxConfig(
            text_config=DecoderConfig(
                arch="llama", vocab_size=128256, hidden_size=4096,
                intermediate_size=14336, num_layers=args.layers,
                num_heads=32, num_kv_heads=8, head_dim=128,
                rope_theta=500000.0, max_position_embeddings=8192,
            ),
            llm_only_training=True,
        )
        tc = cfg.text_config
        lm = dl.fuse_inference_params(
            {
                "language_model": dl.init_params(
                    tc, jax.random.key(0), jnp.bfloat16
                )
            }["language_model"],
            tc,
        )
        params = {"language_model": lm}
    else:
        cfg = graft._flagship_config()
        tc = cfg.text_config
        from ultravox_tpu.models import ultravox as uv_model

        params = uv_model.init_params(cfg, jax.random.key(0), jnp.bfloat16)
        lm = dl.fuse_inference_params(params["language_model"], tc)
        params = {"language_model": lm}
    B = 8
    key = jax.random.key(1)
    rng_np = np.random.default_rng(0)
    V = tc.vocab_size

    orig = seg.segment_tail_attention

    points = [(192, 1024), (768, 1024), (1500, 2048), (2000, 2048)]
    if args.dims == "8b":
        # long-context points: the kernel's valid-prefix-only read can only
        # matter once the KV slab dwarfs the per-layer weight read
        points += [(1024, 4096), (3500, 4096)]
    for live, S in points:
        cache = dl.KVCache.zeros(tc, B, S, jnp.bfloat16)
        lens = jnp.full((B,), live, jnp.int32)
        last = jnp.asarray(rng_np.integers(1, V, (B,)), jnp.int32)

        def run(impl):
            f = jax.jit(
                lambda p, c, tok, cl, k_, impl=impl: dl.segmented_decode_scan(
                    p["language_model"], tc, c, cl, tok, k_, n_steps=8,
                    sample_fn=lambda lg, kk: jnp.argmax(lg, -1).astype(
                        jnp.int32
                    ),
                    attn_impl=impl,
                )
            )
            return timeit(lambda: f(params, cache, last, lens, key))

        t_x = run("xla")
        line = f"live={live:5d} S={S:5d}  xla {t_x/8:6.2f} ms/step"
        for bs in (256, 512):
            if S % bs:
                continue
            seg.segment_tail_attention = functools.partial(orig, block_s=bs)
            try:
                t_k = run("kernel")
            finally:
                seg.segment_tail_attention = orig
            line += f"  | kern(bs={bs}) {t_k/8:6.2f}"
        print(line, flush=True)


if __name__ == "__main__":
    main()
