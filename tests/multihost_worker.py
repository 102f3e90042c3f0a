"""Worker process for the 2-process CPU multi-host smoke test (spawned by
tests/test_multihost.py — each worker is one 'host' with 4 virtual CPU
devices; together they form an 8-device global mesh).

Usage: python tests/multihost_worker.py <process_id> <port> <outdir> <tokdir>
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ.setdefault("TOKENIZERS_PARALLELISM", "false")

import jax

jax.config.update("jax_platforms", "cpu")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def check_global_batch_layout(pid: int):
    """make_global_batch row placement: process p's local rows land at global
    rows [p*local_B, (p+1)*local_B) and chunk batch indices are offset."""
    import numpy as np
    from jax.experimental import multihost_utils

    from ultravox_tpu.parallel import multihost
    from ultravox_tpu.parallel.mesh import MeshConfig, make_mesh

    mesh = make_mesh(MeshConfig(data=2, fsdp=2, tensor=2))
    local_b = 2
    batch = {
        "input_ids": np.asarray(
            [[pid * local_b + i] * 4 for i in range(local_b)], np.int32
        ),
        "attention_mask": np.ones((local_b, 4), np.int32),
        "audio_values": np.zeros((3, 80, 100), np.float32),
        "audio_lens": np.full((3,), 100, np.int32),
        "audio_token_len": np.full((3,), 7, np.int32),
        "audio_token_start_idx": np.zeros((3,), np.int32),
        "audio_chunk_batch_idx": np.asarray([0, 0, 1], np.int32),
    }
    gb = multihost.make_global_batch(batch, mesh)
    ids = np.asarray(multihost_utils.process_allgather(gb["input_ids"], tiled=True))
    np.testing.assert_array_equal(ids[:, 0], np.arange(4))
    bidx = np.asarray(
        multihost_utils.process_allgather(gb["audio_chunk_batch_idx"], tiled=True)
    )
    tlen = np.asarray(
        multihost_utils.process_allgather(gb["audio_token_len"], tiled=True)
    )
    real = tlen > 0
    # each host contributed chunks pointing at ITS global rows
    np.testing.assert_array_equal(bidx[real], [0, 0, 1, 2, 2, 3])
    print(f"WORKER {pid} batch-layout ok", flush=True)


def main():
    pid, port, outdir, tokdir = (
        int(sys.argv[1]), sys.argv[2], sys.argv[3], sys.argv[4]
    )
    from ultravox_tpu.training.config import get_train_config
    from ultravox_tpu.training.train import train

    config = get_train_config(
        [
            "--config_path",
            os.path.join(REPO, "ultravox_tpu", "training", "configs",
                         "test_train.yaml"),
            "--output_dir", outdir,
            "--tokenizer_path", tokdir,
            "--text_model", "",
            "--coordinator_address", f"localhost:{port}",
            "--num_processes", "2",
            "--process_id", str(pid),
            "--batch_size", "4",
            "--mesh_data", "2",
            "--mesh_fsdp", "2",
            "--mesh_tensor", "2",
        ]
    )
    metrics = train(config)
    check_global_batch_layout(pid)
    print(f"WORKER {pid} loss={metrics['loss']:.6f}", flush=True)


if __name__ == "__main__":
    main()
