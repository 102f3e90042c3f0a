"""Multi-host helpers (reference: training/ddp_utils.py).

Every helper degenerates to a no-op at process_count()==1 so the whole stack
runs single-process (the property the reference's CPU CI relies on,
SURVEY.md §4).
"""

from __future__ import annotations

from typing import Any, Iterator, List, Sequence

import jax


def process_index() -> int:
    return jax.process_index()


def process_count() -> int:
    return jax.process_count()


def is_global_master() -> bool:
    return jax.process_index() == 0


def all_gather_list(items: List[Any]) -> List[Any]:
    """Gather arbitrary picklable python objects from all hosts, concatenated
    in rank order (reference: ddp_utils.all_gather_list via
    dist.all_gather_object).

    ``process_allgather`` only accepts equal-shaped array pytrees, so the
    object list is pickled to bytes, padded to the global max length (one
    scalar gather to agree on it), exchanged as uint8 arrays, and unpickled.
    """
    if jax.process_count() == 1:
        return list(items)
    import pickle

    import numpy as np
    from jax.experimental import multihost_utils

    payload = pickle.dumps(items)
    lengths = multihost_utils.process_allgather(
        np.asarray([len(payload)], np.int64)
    ).reshape(-1)
    max_len = int(lengths.max())
    padded = np.zeros(max_len, np.uint8)
    padded[: len(payload)] = np.frombuffer(payload, np.uint8)
    gathered = multihost_utils.process_allgather(padded, tiled=False)
    gathered = np.asarray(gathered).reshape(jax.process_count(), max_len)
    out: List[Any] = []
    for rank in range(jax.process_count()):
        out.extend(pickle.loads(gathered[rank, : int(lengths[rank])].tobytes()))
    return out


def sync_hosts(name: str = "barrier") -> None:
    """Host barrier (reference: run_on_master_first / dist.barrier)."""
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)


def sharded_iterator(iterable, num_shards: int, shard_index: int) -> Iterator:
    """mod-N sample sharding (reference: ddp_utils.py:50-69) — kept for eval
    result-ordering parity."""
    for i, item in enumerate(iterable):
        if i % num_shards == shard_index:
            yield item


def sharded_batch_iterator(
    iterable, batch_size: int, num_shards: int, shard_index: int
) -> Iterator[List]:
    """Batches of per-shard samples with their global indices."""
    batch: List = []
    for i, item in enumerate(iterable):
        if i % num_shards == shard_index:
            batch.append((i, item))
            if len(batch) == batch_size:
                yield batch
                batch = []
    if batch:
        yield batch
