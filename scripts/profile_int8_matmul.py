"""int8 decode-matmul bandwidth attribution on the real TPU.

The int8 decode path sits at ~53% of its weight-traffic roofline (bf16:
67-76%). Times single (B, D) x (D, F) projections at decode batch size in
bf16 vs the w8a8 proj_apply path vs variants, reporting effective weight
bandwidth.

Per-dispatch latency through the remote tunnel (~1.7 ms) swamps
microsecond ops, so each op runs inside a lax.scan of N iterations in ONE
program, with the activation perturbed by the carry so XLA can neither
hoist nor elide the body.

Usage: python scripts/profile_int8_matmul.py
"""

import os
import sys
import functools
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ultravox_tpu.utils.profiling import bench_op as _bench_op  # noqa: E402

bench_op = functools.partial(_bench_op, n_inner=200)


def main():
    from ultravox_tpu.models.lora import proj_apply

    print("device:", jax.devices()[0], flush=True)
    rng = np.random.default_rng(0)
    B = 8
    for (D, F) in ((2048, 8192), (4096, 14336)):
        x = jnp.asarray(rng.standard_normal((B, D)), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((D, F)) * 0.02, jnp.bfloat16)
        wq = jnp.asarray(rng.integers(-127, 127, (D, F)), jnp.int8)
        scale = jnp.full((1, F), 2e-4, jnp.bfloat16)

        t_bf16 = bench_op(lambda a: a @ w, x)
        bw_bf = D * F * 2 / t_bf16 / 1e9

        p = {"kernel_q": wq, "scale": scale}
        t_q = bench_op(lambda a: proj_apply(a, p), x)
        bw_q = D * F / t_q / 1e9

        def deq(a):  # dequant-then-bf16-dot (the thing to avoid)
            return a @ (wq.astype(jnp.bfloat16) * scale)

        t_d = bench_op(deq, x)
        bw_d = D * F / t_d / 1e9

        def mixed(a):  # int8 weights, bf16 activations, no act quant
            acc = jax.lax.dot_general(
                a, wq, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return (acc * scale.astype(jnp.float32)).astype(jnp.bfloat16)

        t_m = bench_op(mixed, x)
        bw_m = D * F / t_m / 1e9

        print(
            f"({D}x{F}): bf16 {t_bf16*1e6:7.1f} us ({bw_bf:6.1f} GB/s) | "
            f"w8a8 {t_q*1e6:7.1f} us ({bw_q:6.1f} GB/s int8) | "
            f"dequant {t_d*1e6:7.1f} us ({bw_d:6.1f} GB/s int8) | "
            f"mixed {t_m*1e6:7.1f} us ({bw_m:6.1f} GB/s int8)",
            flush=True,
        )


if __name__ == "__main__":
    main()
