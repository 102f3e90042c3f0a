"""Per-host sharded data feeding for multi-process runs.

Replaces the reference's master-only data loading + accelerate
``split_batches`` scatter (reference train.py:224-247) with the idiomatic
JAX multi-host design: every process loads its own shard of samples
(mod-N, reference ddp_utils.py:50-69 semantics) and contributes its local
rows to globally-sharded ``jax.Array``s via
``jax.make_array_from_process_local_data``.

Shape agreement: hosts bucket independently (text length, mel length, chunk
count can differ), so each global batch assembly starts with one small
host-gather of the local shapes; every host then pads to the global maxima.
Chunk-count padding appends dummy audio chunks with ``audio_token_len == 0``
— the fixed-shape splice scatter drops them (models/ultravox.py:62-67).

When the mesh replicates the batch axis across processes (e.g. tensor-only
meshes), per-host feeding is impossible; ``needs_replicated_feed`` tells the
caller to feed identical batches on every host instead (the reference's
TP-eval replicated-input mode, eval.py:159-166).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ultravox_tpu.parallel.sharding import batch_sharding, shard_batch

# arrays whose leading axis is "total audio chunks in the batch"
CHUNK_KEYS = (
    "audio_values",
    "audio_lens",
    "audio_token_len",
    "audio_token_start_idx",
    "audio_chunk_batch_idx",
)

_PAD_VALUES = {"labels": -100, "alt_labels": -100}


def batch_shards(mesh: jax.sharding.Mesh) -> int:
    """Number of shards of the batch axis."""
    return mesh.shape["data"] * mesh.shape["fsdp"]


def needs_replicated_feed(mesh: jax.sharding.Mesh) -> bool:
    """True when per-host sharded feeding can't work on this mesh: the batch
    axis has fewer shards than processes (each host must then feed the full,
    identical global batch)."""
    n_proc = jax.process_count()
    return n_proc > 1 and batch_shards(mesh) % n_proc != 0


def _pad_dim(arr: np.ndarray, dim: int, target: int, value=0) -> np.ndarray:
    if arr.shape[dim] >= target:
        return arr
    pad = [(0, 0)] * arr.ndim
    pad[dim] = (0, target - arr.shape[dim])
    return np.pad(arr, pad, constant_values=value)


def make_global_batch(
    batch: Dict[str, Any], mesh: jax.sharding.Mesh
) -> Dict[str, jax.Array]:
    """Assemble a host-local collated batch into globally-sharded jax.Arrays.

    Single-process: plain ``shard_batch``. Multi-process: agree shapes across
    hosts, pad, offset ``audio_chunk_batch_idx`` to global row indices, and
    build arrays with ``jax.make_array_from_process_local_data``.
    """
    import jax.numpy as jnp

    n_proc = jax.process_count()
    if n_proc == 1:
        return shard_batch({k: jnp.asarray(v) for k, v in batch.items()}, mesh)
    if needs_replicated_feed(mesh):
        raise ValueError(
            f"mesh {dict(mesh.shape)} replicates the batch axis across "
            f"{n_proc} processes; feed identical batches on every host and "
            "use replicated placement instead (needs_replicated_feed)"
        )

    from jax.experimental import multihost_utils

    batch = {k: np.asarray(v) for k, v in batch.items()}
    local_b = batch["input_ids"].shape[0]
    shards = batch_shards(mesh)
    if (local_b * n_proc) % shards:
        raise ValueError(
            f"global batch {local_b * n_proc} not divisible by the "
            f"{shards} batch shards of mesh {dict(mesh.shape)}"
        )

    has_audio = "audio_values" in batch
    n_mels = batch["audio_values"].shape[1] if has_audio else 0
    local_shape = np.asarray(
        [
            local_b,
            batch["input_ids"].shape[1],
            batch["alt_input_ids"].shape[1] if "alt_input_ids" in batch else 0,
            batch["audio_values"].shape[0] if has_audio else 0,
            batch["audio_values"].shape[2] if has_audio else 0,
            n_mels,
        ],
        np.int64,
    )
    all_shapes = np.asarray(
        multihost_utils.process_allgather(local_shape, tiled=False)
    ).reshape(n_proc, -1)
    if not (all_shapes[:, 0] == local_b).all():
        raise ValueError(
            f"per-host batch sizes differ: {all_shapes[:, 0].tolist()}; use "
            "drop-last batching so every host contributes equal rows"
        )
    t_max, alt_max, chunks_max, mel_max, mels_max = all_shapes[:, 1:].max(0)
    # chunk rows are sharded too: per-process chunk count must divide evenly
    # over this process's share of the batch shards
    per_proc_shards = batch_shards(mesh) // n_proc
    if chunks_max > 0:
        chunks_max = -(-int(chunks_max) // per_proc_shards) * per_proc_shards

    out: Dict[str, np.ndarray] = {}
    for key in ("input_ids", "attention_mask", "labels",
                "alt_input_ids", "alt_attention_mask", "alt_labels"):
        if key not in batch:
            continue
        target = alt_max if key.startswith("alt_") else t_max
        out[key] = _pad_dim(batch[key], 1, int(target),
                            _PAD_VALUES.get(key, 0))

    if chunks_max > 0:
        # pad the per-host chunk count so every host contributes chunks_max
        # rows; dummies have token_len 0 (splice drops them)
        if has_audio:
            vals = _pad_dim(batch["audio_values"], 2, int(mel_max))
            vals = _pad_dim(vals, 0, int(chunks_max))
            lens = _pad_dim(batch["audio_lens"], 0, int(chunks_max), 2)
            tlen = _pad_dim(batch["audio_token_len"], 0, int(chunks_max))
            start = _pad_dim(batch["audio_token_start_idx"], 0, int(chunks_max))
            bidx = batch["audio_chunk_batch_idx"]
            # local row -> global row: derive this process's row block from
            # the actual sharding (device meshes built by e.g.
            # mesh_utils.create_device_mesh may NOT be process-major)
            bidx = bidx + _process_row_offset(
                batch_sharding(mesh), local_b * n_proc, local_b
            )
            bidx = _pad_dim(bidx, 0, int(chunks_max))
        else:
            vals = np.zeros(
                (int(chunks_max), int(mels_max), int(mel_max)), np.float32
            )
            lens = np.full((int(chunks_max),), 2, np.int32)
            tlen = np.zeros((int(chunks_max),), np.int32)
            start = np.zeros((int(chunks_max),), np.int32)
            bidx = np.zeros((int(chunks_max),), np.int32)
        out["audio_values"] = vals
        out["audio_lens"] = lens
        out["audio_token_len"] = tlen
        out["audio_token_start_idx"] = start
        out["audio_chunk_batch_idx"] = bidx

    row_sharding = batch_sharding(mesh)
    return {
        k: jax.make_array_from_process_local_data(row_sharding, v)
        for k, v in out.items()
    }


def _process_row_offset(
    sharding: NamedSharding, global_rows: int, local_rows: int
) -> int:
    """First global batch row owned by this process, from the sharding's
    device->index map; raises if this process's rows aren't one contiguous
    block (per-host feeding requires it)."""
    imap = sharding.devices_indices_map((global_rows, 1))
    rows = set()
    for dev, idx in imap.items():
        if dev.process_index != jax.process_index():
            continue
        sl = idx[0]
        rows.update(range(sl.start or 0, sl.stop if sl.stop else global_rows))
    if not rows:
        raise ValueError("this process owns no batch rows on the mesh")
    lo, hi = min(rows), max(rows)
    if hi - lo + 1 != len(rows) or len(rows) != local_rows:
        raise ValueError(
            f"process {jax.process_index()} owns non-contiguous or "
            f"unexpected batch rows {sorted(rows)[:8]}... (expected "
            f"{local_rows} contiguous); rebuild the mesh process-major "
            "(parallel.make_mesh) for per-host sharded feeding"
        )
    return lo


def replicate_to_mesh(tree: Any, mesh: jax.sharding.Mesh) -> Any:
    """Place identical host-local arrays replicated over a (possibly
    multi-process) mesh."""
    sharding = NamedSharding(mesh, P())
    if jax.process_count() == 1:
        return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(
            sharding, np.asarray(x)
        ),
        tree,
    )


def fetch_replicated(tree: Any) -> Any:
    """Host-fetch arrays that are replicated (or otherwise fully addressable
    on this process); works in both single- and multi-process runs."""
    return jax.tree.map(lambda x: np.asarray(jax.device_get(x)), tree)


def make_replicated_batch(
    batch: Dict[str, Any], mesh: jax.sharding.Mesh
) -> Dict[str, Any]:
    """Replicated batch placement for meshes whose batch axis can't be
    host-sharded (pure-TP; the reference's TP-eval replicated-input mode,
    eval.py:159-166). Every host must feed the identical batch."""
    import jax.numpy as jnp

    if jax.process_count() == 1:
        return shard_batch({k: jnp.asarray(v) for k, v in batch.items()}, mesh)
    return replicate_to_mesh({k: np.asarray(v) for k, v in batch.items()}, mesh)


def gather_tree_to_host(tree: Any) -> Any:
    """Fetch a (possibly cross-host sharded) array pytree to host numpy on
    every process — used before checkpoint writes on the global master."""
    if jax.process_count() == 1:
        return jax.tree.map(lambda x: np.asarray(jax.device_get(x)), tree)
    from jax.experimental import multihost_utils

    return jax.tree.map(
        lambda x: np.asarray(multihost_utils.process_allgather(x, tiled=True))
        if isinstance(x, jax.Array) and not x.is_fully_addressable
        else np.asarray(jax.device_get(x)),
        tree,
    )


class ShardedDataset:
    """Re-iterable mod-N sample shard of a dataset (reference:
    ddp_utils.sharded_iterator, kept re-startable so infinite epoch cycling
    in ``batch_iterator`` works)."""

    def __init__(self, dataset, num_shards: int, shard_index: int):
        self.dataset = dataset
        self.num_shards = num_shards
        self.shard_index = shard_index

    def __iter__(self):
        for i, item in enumerate(self.dataset):
            if i % self.num_shards == self.shard_index:
                yield item

    def __len__(self):
        n = len(self.dataset)
        return (n - self.shard_index + self.num_shards - 1) // self.num_shards
