"""Parameter sharding rules: regex path -> PartitionSpec.

The TPU-native replacement for the reference's FSDP auto-wrap policies and
``tp_plan="auto"`` (ultravox_model.py:74-84, :507-514): every parameter leaf
gets a PartitionSpec from a rules table keyed on its tree path, and XLA
inserts the collectives. FSDP = shard the large dimension over ``fsdp``;
TP = shard heads/FFN over ``tensor``.
"""

from __future__ import annotations

import logging
import re
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

# (path regex, spec). First match wins. Paths look like
# "language_model/layers/q_proj/kernel". Layer-stacked leaves have a leading
# L axis which is never sharded (it is scanned over).
DEFAULT_RULES: List[Tuple[str, P]] = [
    # ---- decoder LLM ----
    (r".*language_model/embed_tokens$", P("tensor", "fsdp")),
    (r".*language_model/layers/(q|k|v)_proj/kernel$", P(None, "fsdp", "tensor")),
    (r".*language_model/layers/(q|k|v)_proj/bias$", P(None, "tensor")),
    (r".*language_model/layers/o_proj/kernel$", P(None, "tensor", "fsdp")),
    (r".*language_model/layers/(gate|up)_proj/kernel$", P(None, "fsdp", "tensor")),
    (r".*language_model/layers/down_proj/kernel$", P(None, "tensor", "fsdp")),
    (r".*language_model/lm_head/kernel$", P("fsdp", "tensor")),
    # ---- audio encoder ----
    (r".*audio_tower/layers/(q|k|v)_proj/kernel$", P(None, "fsdp", "tensor")),
    (r".*audio_tower/layers/out_proj/kernel$", P(None, "tensor", "fsdp")),
    (r".*audio_tower/layers/fc1/kernel$", P(None, "fsdp", "tensor")),
    (r".*audio_tower/layers/fc1/bias$", P(None, "tensor")),
    (r".*audio_tower/layers/fc2/kernel$", P(None, "tensor", "fsdp")),
    (r".*audio_tower/embed_positions$", P(None, "fsdp")),
    # ---- projector ----
    (r".*projector/linear_1/kernel$", P("fsdp", "tensor")),
    (r".*projector/linear_2/kernel$", P("tensor", "fsdp")),
    # ---- everything else (norms, convs, biases) replicated ----
    (r".*", P()),
]


def rules_for_mesh(mesh: jax.sharding.Mesh) -> List[Tuple[str, P]]:
    """DEFAULT_RULES, with the decoder layer stack's leading L axis sharded
    over ``pipe`` when the mesh carries pipeline stages: each stage then
    HOLDS only its own layer slice (the same leading-axis mechanism FSDP
    uses, pointed at the layer axis — parallel/pipeline.py consumes the
    slices via shard_map, manual over pipe only)."""
    if dict(mesh.shape).get("pipe", 1) <= 1:
        return DEFAULT_RULES
    out: List[Tuple[str, P]] = []
    for pat, spec in DEFAULT_RULES:
        if "language_model/layers/" in pat:
            spec = P(*(("pipe",) + tuple(spec)[1:]))
        out.append((pat, spec))
    # layer-stacked leaves not named above (norms, qk_norm, biases) also
    # carry the leading L axis — insert before the replicate-all catch-all
    out.insert(
        len(out) - 1, (r".*language_model/layers/.*", P("pipe"))
    )
    return out


def _tree_paths(tree: Any) -> List[Tuple[Tuple, Any]]:
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    return flat


def _path_str(path) -> str:
    parts = []
    for p in path:
        if isinstance(p, jax.tree_util.DictKey):
            parts.append(str(p.key))
        elif isinstance(p, jax.tree_util.SequenceKey):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def spec_for_path(path_str: str, rules: Sequence[Tuple[str, P]]) -> P:
    for pattern, spec in rules:
        if re.fullmatch(pattern, path_str):
            return spec
    return P()


def _shrink_spec(
    spec: P,
    shape: Tuple[int, ...],
    mesh: jax.sharding.Mesh,
    path: str = "",
) -> P:
    """Drop mesh axes that don't divide the corresponding dim (tiny test
    models, odd vocab sizes) — mirrors XLA's requirement of even sharding.

    Dropping an axis silently replicates the parameter, which on a large
    model burns HBM on every device — so it logs loudly (once per param)
    when a non-trivially-sized dim loses its sharding."""
    out = []
    for i, axis in enumerate(spec):
        if axis is None:
            out.append(None)
            continue
        size = mesh.shape[axis] if isinstance(axis, str) else int(
            np.prod([mesh.shape[a] for a in axis])
        )
        if i < len(shape) and shape[i] % size == 0:
            out.append(axis)
        else:
            out.append(None)
            if size > 1 and i < len(shape) and shape[i] >= 1024:
                logging.warning(
                    "sharding rule dropped: %s dim %d (size %d) is not "
                    "divisible by mesh axis %r (size %d) — parameter will be "
                    "REPLICATED on that axis, costing HBM on every device",
                    path or "<param>", i, shape[i], axis, size,
                )
    return P(*out)


def param_pspecs(
    params: Any,
    rules: Sequence[Tuple[str, P]] = DEFAULT_RULES,
    mesh: jax.sharding.Mesh | None = None,
) -> Any:
    """PartitionSpec pytree matching ``params`` (arrays or ShapeDtypeStructs)."""

    def leaf_spec(path, leaf):
        path_str = _path_str(path)
        spec = spec_for_path(path_str, rules)
        if mesh is not None:
            spec = _shrink_spec(spec, tuple(leaf.shape), mesh, path_str)
        return spec

    return jax.tree_util.tree_map_with_path(leaf_spec, params)


def shard_params(
    params: Any,
    mesh: jax.sharding.Mesh,
    rules: Optional[Sequence[Tuple[str, P]]] = None,
) -> Any:
    """Place a parameter tree on the mesh according to the rules (default:
    ``rules_for_mesh`` — pipe-aware when the mesh has pipeline stages)."""
    if rules is None:
        rules = rules_for_mesh(mesh)
    specs = param_pspecs(params, rules, mesh)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )


def batch_sharding(mesh: jax.sharding.Mesh) -> NamedSharding:
    """Batches split over (data, fsdp) — both axes carry data parallelism for
    activations; ``tensor`` replicates the batch."""
    return NamedSharding(mesh, P(("data", "fsdp")))


def shard_batch(batch: Dict[str, Any], mesh: jax.sharding.Mesh) -> Dict[str, Any]:
    """Device-put a host batch with the batch axis split over (data, fsdp).

    Audio chunk arrays have a data-dependent leading axis (total chunks); they
    are replicated if the chunk count doesn't divide the mesh (the splice
    scatter handles cross-row chunks anyway).
    """
    sharding = batch_sharding(mesh)
    ndev = sharding.num_devices

    def put(x):
        if hasattr(x, "shape") and x.ndim >= 1 and x.shape[0] % _batch_div(mesh) == 0:
            return jax.device_put(x, sharding)
        return jax.device_put(x, NamedSharding(mesh, P()))

    return {k: put(v) for k, v in batch.items()}


def _batch_div(mesh: jax.sharding.Mesh) -> int:
    return mesh.shape["data"] * mesh.shape["fsdp"]
