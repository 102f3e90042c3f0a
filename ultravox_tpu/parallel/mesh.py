"""Device mesh construction.

Replaces the reference's torchrun env-var topology + NCCL process groups
(train.py:126-130, device_helpers.py:44-73) with a ``jax.sharding.Mesh`` over
axes ``("data", "fsdp", "tensor")``:

- ``data``   — pure data parallelism; gradients all-reduce over it. Place it
  on DCN when spanning slices.
- ``fsdp``   — parameter sharding (ZeRO-3 style); XLA inserts all-gather /
  reduce-scatter over ICI. Batch is also split over this axis.
- ``tensor`` — Megatron-style intra-layer sharding of attention heads and FFN.
- ``pipe``   — GPipe pipeline stages over the decoder layer stack
  (parallel/pipeline.py); manual (shard_map) over this axis only, the other
  axes stay XLA-automatic inside the pipeline body. Beyond-reference
  (SURVEY §2.4: the reference has no PP).

The reference's two FSDP code paths (HF Trainer fsdp + manual FSDP2 wraps,
ddp_utils.py:72-99) collapse into PartitionSpecs; there are no wrapper classes.
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Optional, Sequence

import jax
import numpy as np

AXES = ("data", "fsdp", "tensor", "pipe")


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """-1 for one axis means "use all remaining devices"."""

    data: int = 1
    fsdp: int = -1
    tensor: int = 1
    pipe: int = 1

    def resolve(self, n_devices: int) -> tuple:
        dims = [self.data, self.fsdp, self.tensor, self.pipe]
        if dims.count(-1) > 1:
            raise ValueError("at most one mesh axis may be -1")
        known = int(np.prod([d for d in dims if d != -1]))
        if -1 in dims:
            if n_devices % known:
                raise ValueError(
                    f"{n_devices} devices not divisible by fixed axes {known}"
                )
            dims[dims.index(-1)] = n_devices // known
        if int(np.prod(dims)) > n_devices:
            raise ValueError(
                f"mesh {dims} needs more than the {n_devices} available devices"
            )
        # a fully-specified mesh smaller than the device count uses the first
        # prod(dims) devices (useful for tests / partial-slice runs)
        return tuple(dims)


def make_mesh(
    config: Optional[MeshConfig] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> jax.sharding.Mesh:
    devices = list(devices if devices is not None else jax.devices())
    config = config or MeshConfig()
    shape = config.resolve(len(devices))
    n_used = int(np.prod(shape))
    logging.info("mesh %s over %d devices", dict(zip(AXES, shape)), n_used)
    arr = np.asarray(devices[:n_used]).reshape(shape)
    return jax.sharding.Mesh(arr, AXES)


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host init (replaces dist.init_process_group, train.py:126-130).

    On TPU pods the runtime discovers topology itself and all arguments may
    be None; explicit values support CPU/GPU clusters. Must run BEFORE any
    JAX backend access, so this function never queries devices itself: it
    decides from the arguments and rendezvous environment variables alone,
    and no-ops for plain single-host runs.
    """
    import os

    if num_processes is not None and num_processes <= 1:
        return
    explicit = any(
        v is not None for v in (coordinator_address, num_processes, process_id)
    )
    env_rendezvous = any(
        os.environ.get(k)
        for k in (
            "JAX_COORDINATOR_ADDRESS",
            "COORDINATOR_ADDRESS",
            "MEGASCALE_COORDINATOR_ADDRESS",
        )
    ) or len(os.environ.get("TPU_WORKER_HOSTNAMES", "").split(",")) > 1
    if not explicit and not env_rendezvous:
        return  # single-host run
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        logging.info(
            "multi-host initialized: process %d/%d",
            jax.process_index(), jax.process_count(),
        )
    except RuntimeError as e:  # already initialized
        logging.warning("jax.distributed.initialize skipped: %s", e)
