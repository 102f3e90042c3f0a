"""Standalone val-loss CLI (reference: evaluation/validate.py:22-226):
teacher-forcing forward over the configured datasets, label-count-weighted
loss averaged across hosts.

Usage: ``python -m ultravox_tpu.evaluation.validate --config_path <train yaml>
[--val_sets ...]``.
"""

from __future__ import annotations

import json
import logging
from typing import Dict

import jax

from ultravox_tpu.parallel import MeshConfig, make_mesh, shard_params
from ultravox_tpu.training import train_step as ts
from ultravox_tpu.training.config import get_train_config
from ultravox_tpu.training.model_factory import create_model_pack
from ultravox_tpu.training.train import validate

logger = logging.getLogger(__name__)


def main():
    logging.basicConfig(level=logging.INFO)
    config = get_train_config()
    # multi-host rendezvous BEFORE any device access (reference:
    # validate.py initializes the process group the same way eval does)
    from ultravox_tpu.parallel.mesh import initialize_multihost

    initialize_multihost(
        config.coordinator_address, config.num_processes, config.process_id
    )
    mesh = make_mesh(
        MeshConfig(config.mesh_data, config.mesh_fsdp, config.mesh_tensor,
                   config.mesh_pipe)
    )
    model_pack = create_model_pack(config)
    params = shard_params(model_pack.params, mesh)
    optimizer = ts.make_optimizer(config.lr)
    state, template = ts.init_train_state(
        params, optimizer, config.effective_trainable_patterns
    )
    results: Dict[str, float] = validate(config, model_pack, state, template, mesh)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
