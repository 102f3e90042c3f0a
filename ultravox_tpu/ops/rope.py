"""Rotary position embeddings.

Implements plain RoPE plus the Llama-3 frequency-scaling scheme used by the
Llama-3.x text towers of the reference's released models. Gemma-3 local
(sliding-window) layers use a different base frequency — handled by passing a
different ``theta``.

Convention: HF-style half-split rotation (rotate_half), which is what every
family the reference supports (Llama/Mistral/Gemma/Qwen) uses.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def rope_frequencies(
    head_dim: int,
    theta: float,
    rope_scaling: Optional[Tuple[float, float, float, int]] = None,
) -> np.ndarray:
    """Inverse frequencies (head_dim // 2,) in float32, with optional Llama-3
    scaling ``(factor, low_freq_factor, high_freq_factor, original_max_pos)``.
    """
    inv_freq = 1.0 / (
        theta ** (np.arange(0, head_dim, 2, dtype=np.float64) / head_dim)
    )
    if rope_scaling is not None:
        factor, low_ff, high_ff, orig_max = rope_scaling
        low_wavelen = orig_max / low_ff
        high_wavelen = orig_max / high_ff
        wavelen = 2.0 * np.pi / inv_freq
        # smooth interpolation between scaled and unscaled bands
        smooth = (orig_max / wavelen - low_ff) / (high_ff - low_ff)
        scaled = np.where(
            wavelen > low_wavelen,
            inv_freq / factor,
            np.where(
                wavelen < high_wavelen,
                inv_freq,
                (1.0 - smooth) / factor * inv_freq + smooth * inv_freq,
            ),
        )
        inv_freq = scaled
    return inv_freq.astype(np.float32)


def rope_cos_sin(
    positions: jax.Array,  # (..., T) int32
    inv_freq: jax.Array,  # (head_dim // 2,)
) -> Tuple[jax.Array, jax.Array]:
    """cos/sin tables of shape (..., T, head_dim) in float32 (HF duplicates the
    half-dim table along the last axis)."""
    angles = positions.astype(jnp.float32)[..., None] * inv_freq[None, :]
    angles = jnp.concatenate([angles, angles], axis=-1)
    return jnp.cos(angles), jnp.sin(angles)


def _rotate_half(x: jax.Array) -> jax.Array:
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rope(
    x: jax.Array,  # (..., T, num_heads, head_dim)
    cos: jax.Array,  # (..., T, head_dim)
    sin: jax.Array,
) -> jax.Array:
    """Apply rotary embedding. Computation in fp32, output in input dtype."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    c = cos[..., :, None, :]
    s = sin[..., :, None, :]
    return (xf * c + _rotate_half(xf) * s).astype(dtype)
