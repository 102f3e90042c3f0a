"""Fused LayerNorm kernel for TPU.

XLA's layer_norm at encoder shapes (8 x 1500 x 1280 bf16) measures
~0.35 ms — ~4.6x the 2-pass HBM traffic bound — because the fp32 upcast
and moment reductions materialise intermediates
(scripts/profile_encoder_layer.py). With TWO LayerNorms per encoder layer
that tax is ~0.6 ms/layer, the single largest non-matmul cost in the
30 s-window encode. This kernel reads each (T, D) row-block once into
VMEM, computes mean/variance/normalise/affine in-register (fp32), and
writes once: traffic = exactly one read + one write.

Forward-only (inference/frozen-encoder paths — the differentiable
training path keeps XLA's layer_norm); numerics match ops/norms.layer_norm
(fp32 internals, cast back to the input dtype).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _ln_kernel(x_ref, scale_ref, bias_ref, o_ref, *, eps: float):
    x = x_ref[0].astype(jnp.float32)  # (Tb, D)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    y = xc * jax.lax.rsqrt(var + eps)
    out = y * scale_ref[...].astype(jnp.float32) + bias_ref[...].astype(
        jnp.float32
    )
    o_ref[0] = out.astype(o_ref.dtype)


def fused_layer_norm(
    x: jax.Array,  # (B, T, D)
    scale: jax.Array,  # (D,)
    bias: jax.Array,  # (D,)
    eps: float = 1e-5,
    interpret=None,
) -> jax.Array:
    """LayerNorm over the last axis; one grid step per batch row.
    ``interpret=None`` auto-selects interpret mode on the CPU backend."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    return _fused_layer_norm(x, scale, bias, eps=eps, interpret=interpret)


@functools.partial(
    jax.jit, static_argnames=("eps", "interpret")
)
def _fused_layer_norm(x, scale, bias, *, eps: float, interpret: bool):
    B, T, D = x.shape
    # NOTE (r5): splitting T into smaller row blocks (grid (B, T//bt)) to
    # pipeline DMA/compute measured ~1.3 ms SLOWER per 30 s batch-8 encode
    # than whole-(T, D) slabs — the slab grid already overlaps step b+1's
    # read with step b's compute, and smaller blocks just add step overhead.
    return pl.pallas_call(
        functools.partial(_ln_kernel, eps=eps),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, T, D), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, D), lambda b: (0, 0)),
            pl.BlockSpec((1, D), lambda b: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, T, D), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, T, D), x.dtype),
        interpret=interpret,
    )(x, scale.reshape(1, D), bias.reshape(1, D))


def supports_shape(seq_len: int, d_model: int) -> bool:
    """One (T, D) slab must fit VMEM comfortably (fp32 working set)."""
    return seq_len * d_model * 4 <= 12 * 1024 * 1024 and d_model % 128 == 0
