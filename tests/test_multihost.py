"""Multi-host execution path: 2 CPU processes × 4 virtual devices run the
real train() entry point end-to-end (rendezvous via TrainConfig
coordinator_address -> jax.distributed.initialize, per-host mod-N data
sharding, global batch assembly via jax.make_array_from_process_local_data,
master-only checkpointing). Replaces the reference's torchrun multi-node
launch (train.py:126-141, mcloud_train.yaml:18)."""

import os
import re
import socket
import subprocess
import sys

import numpy as np
import pytest

from tests.helpers import make_tiny_tokenizer

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_cpu_train(tmp_path):
    tok_dir = tmp_path / "tok"
    make_tiny_tokenizer().save_pretrained(str(tok_dir))
    out_dir = tmp_path / "out"
    port = _free_port()

    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own 4-device flag
    procs = [
        subprocess.Popen(
            [
                sys.executable,
                os.path.join(REPO, "tests", "multihost_worker.py"),
                str(pid), str(port), str(out_dir), str(tok_dir),
            ],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            cwd=REPO,
        )
        for pid in (0, 1)
    ]
    outputs = []
    for p in procs:
        out, _ = p.communicate(timeout=850)
        outputs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outputs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-4000:]}"

    losses = []
    for pid, out in enumerate(outputs):
        assert f"WORKER {pid} batch-layout ok" in out, out[-4000:]
        m = re.search(rf"WORKER {pid} loss=([0-9.eE+-]+)", out)
        assert m, out[-4000:]
        losses.append(float(m.group(1)))
    assert np.isfinite(losses).all()
    # both hosts observe the same (replicated) global loss
    assert abs(losses[0] - losses[1]) < 1e-6, losses

    # master-only artifacts written exactly once
    assert os.path.exists(out_dir / "train_config.json")
    assert os.path.exists(out_dir / "checkpoint-2")
    assert os.path.exists(out_dir / "model.safetensors")


def test_make_global_batch_single_process_fallback():
    """Single-process path degenerates to shard_batch placement."""
    import jax

    from ultravox_tpu.parallel import multihost
    from ultravox_tpu.parallel.mesh import MeshConfig, make_mesh

    mesh = make_mesh(MeshConfig(data=2, fsdp=2, tensor=2))
    batch = {
        "input_ids": np.ones((4, 8), np.int32),
        "attention_mask": np.ones((4, 8), np.int32),
    }
    gb = multihost.make_global_batch(batch, mesh)
    assert gb["input_ids"].shape == (4, 8)
    assert not multihost.needs_replicated_feed(mesh)


def test_needs_replicated_feed_pure_tp(monkeypatch):
    from ultravox_tpu.parallel import multihost
    from ultravox_tpu.parallel.mesh import MeshConfig, make_mesh

    mesh = make_mesh(MeshConfig(data=1, fsdp=1, tensor=8))
    import jax

    monkeypatch.setattr(jax, "process_count", lambda: 2)
    assert multihost.needs_replicated_feed(mesh)
    with pytest.raises(ValueError, match="replicates the batch axis"):
        multihost.make_global_batch({"input_ids": np.ones((2, 4))}, mesh)
