"""Targeted experiments behind the encoder-MFU push (round 3).

scripts/profile_encoder_layer.py attributed the ~52% headline MFU to
three costs at (B=8, T=1500, D=1280, F=5120, bf16):
  - q/k/v/out DxD projections run ~74 TF/s while a raw (BT,D)x(D,4D)
    matmul hits 137 TF/s — is it the 3-D operand shape, the small N, or
    per-op overhead?
  - the MLP (fc1+gelu+fc2) lands at 98 TF/s vs 137 raw: exact-erf GELU
    on 61M elements looks VPU-bound, not traffic-bound.
  - fused attention at ~54 TF/s (exp-bound softmax, head_dim 64).

This measures each hypothesis in isolation so the fixes target the real
cost. Usage: python scripts/profile_encoder_experiments.py
"""

import os
import sys

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ultravox_tpu.utils.profiling import bench_op  # noqa: E402


def main():
    print("device:", jax.devices()[0], flush=True)
    rng = np.random.default_rng(0)
    B, T, D, F = 8, 1500, 1280, 5120
    BT = B * T
    x3 = jnp.asarray(rng.standard_normal((B, T, D)), jnp.bfloat16)
    x2 = x3.reshape(BT, D)
    wdd = jnp.asarray(rng.standard_normal((D, D)) * 0.02, jnp.bfloat16)
    wdf = jnp.asarray(rng.standard_normal((D, F)) * 0.02, jnp.bfloat16)
    w3d = jnp.asarray(rng.standard_normal((D, 3 * D)) * 0.02, jnp.bfloat16)
    tf_dd = 2 * BT * D * D / 1e12
    tf_df = 2 * BT * D * F / 1e12

    t = bench_op(lambda a: a @ wdd, x3)
    print(f"(B,T,D)x(D,D):        {t*1e3:7.3f} ms = {tf_dd/t:5.0f} TF/s", flush=True)
    t = bench_op(lambda a: a @ wdd, x2)
    print(f"(BT,D)x(D,D):         {t*1e3:7.3f} ms = {tf_dd/t:5.0f} TF/s", flush=True)
    t = bench_op(lambda a: a.reshape(BT, D) @ wdd, x3)
    print(f"reshape+(BT,D)x(D,D): {t*1e3:7.3f} ms = {tf_dd/t:5.0f} TF/s", flush=True)
    t = bench_op(lambda a: a @ w3d, x2)
    print(f"(BT,D)x(D,3D) qkv:    {t*1e3:7.3f} ms = {3*tf_dd/t:5.0f} TF/s", flush=True)
    t = bench_op(lambda a: a @ wdf, x2)
    print(f"(BT,D)x(D,F):         {t*1e3:7.3f} ms = {tf_df/t:5.0f} TF/s", flush=True)

    # GELU variants on the fc1 output shape (exact erf is the parity
    # baseline; whisper uses erf gelu)
    h = jnp.asarray(rng.standard_normal((BT, F)), jnp.bfloat16)
    gb = BT * F * 2 * 2 / 1e9  # read+write GB at bf16

    t = bench_op(lambda a: jax.nn.gelu(a, approximate=False), h)
    print(f"gelu exact bf16:      {t*1e3:7.3f} ms ({gb/t:5.0f} GB/s eff)", flush=True)
    t = bench_op(
        lambda a: jax.nn.gelu(a.astype(jnp.float32), approximate=False).astype(a.dtype),
        h,
    )
    print(f"gelu exact fp32:      {t*1e3:7.3f} ms", flush=True)
    t = bench_op(lambda a: jax.nn.gelu(a, approximate=True), h)
    print(f"gelu tanh bf16:       {t*1e3:7.3f} ms", flush=True)
    t = bench_op(lambda a: a * jax.nn.sigmoid(1.702 * a.astype(jnp.float32)).astype(a.dtype), h)
    print(f"gelu sigmoid approx:  {t*1e3:7.3f} ms", flush=True)
    t = bench_op(lambda a: jnp.maximum(a, 0), h)
    print(f"relu (traffic bound): {t*1e3:7.3f} ms ({gb/t:5.0f} GB/s)", flush=True)

    # fused mlp: does XLA fuse gelu into the matmul epilogue?
    t = bench_op(
        lambda a: jax.nn.gelu(a @ wdf, approximate=False) @ wdf.T, x2
    )
    print(f"mlp 2d exact:         {t*1e3:7.3f} ms = {2*tf_df/t:5.0f} TF/s", flush=True)
    t = bench_op(
        lambda a: jax.nn.gelu(a @ wdf, approximate=True) @ wdf.T, x2
    )
    print(f"mlp 2d tanh:          {t*1e3:7.3f} ms = {2*tf_df/t:5.0f} TF/s", flush=True)

    # softmax/exp cost at attention shapes (20 heads, T x T logits)
    H = 20
    s = jnp.asarray(rng.standard_normal((B, H, T, T)), jnp.bfloat16)
    t = bench_op(lambda a: jax.nn.softmax(a.astype(jnp.float32), axis=-1).astype(a.dtype), s)
    n = B * H * T * T
    print(f"softmax fp32 (BHTT):  {t*1e3:7.3f} ms ({n/t/1e9:5.1f} Gexp/s)", flush=True)
    t = bench_op(lambda a: jnp.exp2(a.astype(jnp.float32)).astype(a.dtype), s)
    print(f"exp2 fp32 (BHTT):     {t*1e3:7.3f} ms ({n/t/1e9:5.1f} Gexp/s)", flush=True)


if __name__ == "__main__":
    main()
