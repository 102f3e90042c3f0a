"""Normalisation layers as pure functions.

All norms compute in float32 and cast back to the input dtype — matching the
reference models' behaviour (HF LlamaRMSNorm upcasts to fp32 internally).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rms_norm(
    x: jax.Array,
    weight: jax.Array,
    eps: float = 1e-6,
    *,
    plus_one: bool = False,
) -> jax.Array:
    """RMSNorm. ``plus_one=True`` uses the Gemma convention ``(1 + w) * x̂``.

    Matches HF LlamaRMSNorm semantics: variance in fp32, scale applied after
    casting the normalised value back to the weight dtype.
    """
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    xf = xf * jax.lax.rsqrt(var + eps)
    w = weight.astype(jnp.float32)
    if plus_one:
        w = 1.0 + w
    return (xf * w).astype(dtype)


def layer_norm(
    x: jax.Array,
    weight: jax.Array,
    bias: jax.Array | None = None,
    eps: float = 1e-5,
) -> jax.Array:
    """LayerNorm over the last axis, fp32 internals."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    xf = (xf - mean) * jax.lax.rsqrt(var + eps)
    out = xf * weight.astype(jnp.float32)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(dtype)
