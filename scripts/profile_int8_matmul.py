"""int8 decode-matmul bandwidth attribution on the real TPU.

The int8 decode path sits at ~53% of its weight-traffic roofline (bf16:
67%). This times single (B, D) x (D, F) projections at decode batch sizes
in bf16 vs the w8a8 proj_apply path vs variants, reporting effective
weight bandwidth — to tell whether XLA streams int8 weights through the
MXU dot or materializes a dequantized copy (which would triple traffic).

Usage: python scripts/profile_int8_matmul.py
"""

import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def fence(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def time_fn(fn, *args, iters=30):
    fence(fn(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    fence(out)
    return (time.perf_counter() - t0) / iters


def main():
    from ultravox_tpu.models.lora import proj_apply

    print("device:", jax.devices()[0], flush=True)
    rng = np.random.default_rng(0)
    B = 8
    for (D, F) in ((2048, 8192), (2048, 2048), (4096, 14336)):
        x = jnp.asarray(rng.standard_normal((B, D)), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((D, F)) * 0.02, jnp.bfloat16)
        wq = jnp.asarray(
            rng.integers(-127, 127, (D, F)), jnp.int8
        )
        scale = jnp.full((1, F), 2e-4, jnp.bfloat16)

        t_bf16 = time_fn(jax.jit(lambda a, b: a @ b), x, w)
        bw_bf = D * F * 2 / t_bf16 / 1e9

        p = {"kernel_q": wq, "scale": scale}
        t_q = time_fn(jax.jit(lambda a: proj_apply(a, p)), x)
        bw_q = D * F / t_q / 1e9

        # variant: dequant-then-bf16-dot (what we want XLA NOT to do)
        def deq(a):
            wd = (wq.astype(jnp.bfloat16) * scale)
            return a @ wd

        t_d = time_fn(jax.jit(deq), x)
        bw_d = D * F / t_d / 1e9

        # variant: int8 weights, bf16 activation dot (mixed, no act quant)
        def mixed(a):
            acc = jax.lax.dot_general(
                a, wq, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return (acc * scale.astype(jnp.float32)).astype(jnp.bfloat16)

        try:
            t_m = time_fn(jax.jit(mixed), x)
            bw_m = D * F / t_m / 1e9
            m_s = f"{t_m*1e6:8.1f} us ({bw_m:6.1f} GB/s int8)"
        except Exception as e:  # noqa: BLE001
            m_s = f"unsupported: {type(e).__name__}"

        print(
            f"({D}x{F}): bf16 {t_bf16*1e6:8.1f} us ({bw_bf:6.1f} GB/s) | "
            f"w8a8 {t_q*1e6:8.1f} us ({bw_q:6.1f} GB/s int8) | "
            f"dequant {t_d*1e6:8.1f} us ({bw_d:6.1f} GB/s int8) | "
            f"mixed {m_s}",
            flush=True,
        )


if __name__ == "__main__":
    main()
