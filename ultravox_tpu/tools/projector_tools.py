"""Projector surgery: regression + combination.

Re-design of the reference's ``projector_regression_tool.py`` /
``projector_combine_tool.py``: synthesize a projector for a larger LLM from a
small-LLM projector without training, via a least-squares linear map between
the two LLMs' token-embedding spaces.

Method (reference docstring, projector_regression_tool.py:1-50):
1. fit ``M`` minimising ‖E_small M − E_big‖ over shared vocab rows
   (closed-form ridge least squares);
2. compose the small projector's final linear with ``M`` so its outputs land
   in the big model's embedding space: ``linear_2' = linear_2 @ M`` (and the
   post-norm is refit on M's output scale when present).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np


def fit_embedding_map(
    emb_small: np.ndarray,  # (V, d_small)
    emb_big: np.ndarray,  # (V, d_big)
    ridge: float = 1e-4,
) -> np.ndarray:
    """Closed-form ridge regression: M = (XᵀX + λI)⁻¹ Xᵀ Y, (d_small, d_big)."""
    X = emb_small.astype(np.float64)
    Y = emb_big.astype(np.float64)
    d = X.shape[1]
    gram = X.T @ X + ridge * np.eye(d)
    M = np.linalg.solve(gram, X.T @ Y)
    return M.astype(np.float32)


def combine_projector(
    projector_params: Dict[str, Any],  # small projector tree (ours)
    embedding_map: np.ndarray,  # (d_small, d_big)
) -> Dict[str, Any]:
    """Compose the final projector linear with the embedding map. If the
    projector ends with an ln_post RMSNorm (pre-v0.5 layout), the norm weight
    is mapped through |M| column mass as an approximation and training is
    recommended to touch it up."""
    import jax.numpy as jnp

    out = dict(projector_params)
    l2 = np.asarray(projector_params["linear_2"]["kernel"], np.float32)
    out["linear_2"] = {"kernel": jnp.asarray(l2 @ embedding_map)}
    if "ln_post" in projector_params:
        # ln_post lives in the output space; rescale by the map's per-column
        # L2 mass so activation scales stay comparable.
        w = np.asarray(projector_params["ln_post"], np.float32)
        col_scale = np.sqrt((embedding_map.astype(np.float64) ** 2).sum(0))
        mean_in = float(np.mean(w))
        out["ln_post"] = jnp.asarray(
            np.full(embedding_map.shape[1], mean_in, np.float32)
            * (col_scale / max(col_scale.mean(), 1e-8)).astype(np.float32)
        )
    return out


def upproject_adapter(
    projector_params: Dict[str, Any],
    emb_small: np.ndarray,
    emb_big: np.ndarray,
    ridge: float = 1e-4,
) -> Dict[str, Any]:
    """One-call 8B→70B-style adapter synthesis (reference use case)."""
    M = fit_embedding_map(emb_small, emb_big, ridge)
    return combine_projector(projector_params, M)
