"""Bandwidth-optimal skinny matmul for decode steps (bf16 and w8a16).

A decode step multiplies a few activation rows (batch <= 32) against every
weight matrix in the model — pure HBM-bandwidth work. Measured on v5e at 1B
decode shapes, XLA runs these back-to-back matmuls at ~60-80% of the
weight-traffic bound (the per-op pipeline never reaches steady state), and
the mixed int8-weight x bf16-activation dot is worse (~50%): the whole
decode step lands at 62% (bf16) / 49% (int8) of roofline
(/tmp ablations, round 3; VERDICT r2 #3 targets 70% / 65%).

This kernel streams the weight matrix through VMEM in column blocks with
the activation block resident (constant index_map -> fetched once), letting
Pallas's grid pipeline double-buffer the weight DMA: traffic = one read of
the weights. int8 weights are upcast to bf16 in VMEM registers (w8a16) and
the per-output-channel scale is applied to the fp32 accumulator — matching
`lora.proj_apply`'s decode regime numerics.

MEASURED RESULT (v5e, round 3): replacing every decode matmul with this
kernel made the 1B step ~2x SLOWER (bf16 10.16 vs 4.61 ms/step; int8 6.14
vs 3.14), with greedy tokens matching — ~80 pallas_call launches per step
(5 matmuls x 16 layers) cost more than XLA's fused whole-step program
saves. It is therefore NOT wired into the decode path; it stays as a
correct, tested building block for cases with few launches per step (e.g.
a single giant matmul) or a future fully-fused decode-layer kernel.

Forward/serving only (no custom VJP) — training matmuls are large-batch
MXU-bound where XLA is already at peak.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _mm_kernel(x_ref, w_ref, o_ref):
    w = w_ref[...]
    if w.dtype != x_ref.dtype:
        w = w.astype(x_ref.dtype)
    o_ref[...] = jax.lax.dot_general(
        x_ref[...], w, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


def _mm_scaled_kernel(x_ref, w_ref, s_ref, o_ref):
    w = w_ref[...]
    if w.dtype != x_ref.dtype:
        w = w.astype(x_ref.dtype)
    acc = jax.lax.dot_general(
        x_ref[...], w, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[...] = (acc * s_ref[...].astype(jnp.float32)).astype(o_ref.dtype)


def _pick_block_n(n: int, k: int, itemsize: int) -> int:
    """Largest 128-multiple block so one weight block stays ~<=2 MB (two
    in flight under the grid pipeline's double buffering)."""
    budget = 2 * 1024 * 1024
    bn = max(128, min(1024, (budget // max(k * itemsize, 1)) // 128 * 128))
    return min(bn, pl.cdiv(n, 128) * 128)


def decode_matmul(
    x: jax.Array,  # (M, K), M <= 32 — bf16/fp32 activations
    w: jax.Array,  # (K, N) — bf16 or int8 weights
    scale: jax.Array | None = None,  # (N,) per-output-channel (int8 path)
    *,
    out_dtype=None,
    block_n: int | None = None,
    interpret: bool | None = None,
) -> jax.Array:
    """x @ w (+ scale) with the weights streamed once through VMEM."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    M, K = x.shape
    _, N = w.shape
    out_dtype = out_dtype or x.dtype
    if block_n is None:
        block_n = _pick_block_n(N, K, w.dtype.itemsize)
    grid = (pl.cdiv(N, block_n),)
    in_specs = [
        pl.BlockSpec((M, K), lambda j: (0, 0)),
        pl.BlockSpec((K, block_n), lambda j: (0, j)),
    ]
    args = [x, w]
    kernel = _mm_kernel
    if scale is not None:
        in_specs.append(pl.BlockSpec((1, block_n), lambda j: (0, j)))
        args.append(scale.reshape(1, N))
        kernel = _mm_scaled_kernel
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((M, block_n), lambda j: (0, j)),
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
        interpret=interpret,
    )(*args)


def supports(x_shape, k: int, n: int) -> bool:
    """Decode-shaped: few rows, 128-aligned contraction/output dims, and
    the resident activation block comfortably inside VMEM."""
    if len(x_shape) < 2:
        return False
    rows = 1
    for d in x_shape[:-1]:
        rows *= d
    return (
        rows <= 32
        and k % 128 == 0
        and n % 128 == 0
        and rows * k * 4 <= 2 * 1024 * 1024
    )
