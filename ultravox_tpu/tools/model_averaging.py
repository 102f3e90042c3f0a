"""Model-soup weight averaging (reference: tools/model_averaging.py:1-67).

Averages the tensors of several checkpoint directories (or diff safetensors
files) into one output checkpoint.

CLI: ``python -m ultravox_tpu.tools.model_averaging --inputs a b c --output d``
"""

from __future__ import annotations

import argparse
import os
from typing import Dict, List

import numpy as np


def average_state_dicts(dicts: List[Dict[str, np.ndarray]]) -> Dict[str, np.ndarray]:
    if not dicts:
        raise ValueError("nothing to average")
    keys = set(dicts[0])
    for d in dicts[1:]:
        if set(d) != keys:
            missing = keys.symmetric_difference(set(d))
            raise ValueError(f"state dicts disagree on keys: {sorted(missing)[:8]}")
    return {
        k: np.mean([d[k].astype(np.float64) for d in dicts], axis=0).astype(
            dicts[0][k].dtype
        )
        for k in keys
    }


def average_checkpoints(inputs: List[str], output: str) -> str:
    import safetensors.numpy

    from ultravox_tpu.models.weights import load_safetensors_dir

    dicts = []
    config_src = None
    for path in inputs:
        if os.path.isdir(path):
            dicts.append(load_safetensors_dir(path))
            if config_src is None and os.path.exists(
                os.path.join(path, "config.json")
            ):
                config_src = os.path.join(path, "config.json")
        else:
            dicts.append(safetensors.numpy.load_file(path))
    avg = average_state_dicts(dicts)
    os.makedirs(output, exist_ok=True)
    safetensors.numpy.save_file(
        {k: np.ascontiguousarray(v) for k, v in avg.items()},
        os.path.join(output, "model.safetensors"),
    )
    if config_src:
        import shutil

        shutil.copy(config_src, os.path.join(output, "config.json"))
    return output


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--inputs", nargs="+", required=True)
    parser.add_argument("--output", required=True)
    args = parser.parse_args()
    print(average_checkpoints(args.inputs, args.output))


if __name__ == "__main__":
    main()
