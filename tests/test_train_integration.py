"""End-to-end train() integration test on CPU (mirrors the reference's
training/train_test.py: whole pipeline, tiny models, synthetic data, 2 steps),
plus checkpoint save/restore/export round-trips."""

import os

import numpy as np
import pytest

from tests.helpers import make_tiny_tokenizer


@pytest.fixture(scope="module")
def tokenizer_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("tok")
    make_tiny_tokenizer().save_pretrained(str(d))
    return str(d)


def _config(tmp_path, tokenizer_dir, **overrides):
    from ultravox_tpu.training.config import get_train_config

    argv = [
        "--config_path",
        os.path.join(
            os.path.dirname(__file__),
            "..", "ultravox_tpu", "training", "configs", "test_train.yaml",
        ),
        "--output_dir", str(tmp_path / "out"),
        "--tokenizer_path", tokenizer_dir,
        "--text_model", "",
    ]
    for k, v in overrides.items():
        argv += [f"--{k}", str(v)]
    return get_train_config(argv)


def test_train_end_to_end_kl(tmp_path, tokenizer_dir):
    from ultravox_tpu.training.train import train

    config = _config(tmp_path, tokenizer_dir)
    metrics = train(config)
    assert np.isfinite(metrics["loss"])
    out = config.output_dir
    assert os.path.exists(os.path.join(out, "train_config.json"))
    assert os.path.exists(os.path.join(out, "train_log.jsonl"))
    assert os.path.exists(os.path.join(out, "checkpoint-2"))
    assert os.path.exists(os.path.join(out, "model.safetensors"))

    # exported safetensors must carry reference-naming projector weights
    import safetensors.numpy

    sd = safetensors.numpy.load_file(os.path.join(out, "model.safetensors"))
    assert any(k.startswith("multi_modal_projector.") for k in sd)


def test_train_ce_loss(tmp_path, tokenizer_dir):
    from ultravox_tpu.training.train import train

    config = _config(tmp_path, tokenizer_dir, loss_function="ce")
    metrics = train(config)
    assert np.isfinite(metrics["loss"])


def test_train_streaming_latency_mask(tmp_path, tokenizer_dir):
    """The streaming workload trains END TO END: audio_latency_block_size
    flows config -> factory -> encoder block-causal mask through a real
    2-step train run (reference recipe: streaming_tinyllama.yaml:24), and
    the published config records the mask so serving reproduces it."""
    from ultravox_tpu.training.train import train

    config = _config(
        tmp_path, tokenizer_dir,
        audio_latency_block_size=100,
        # train the encoder too, so the masked attention is on the
        # gradient path (streaming recipes use audio LoRA)
        trainable_params='[".*projector/.*", ".*audio_tower/.*"]',
    )
    metrics = train(config)
    assert np.isfinite(metrics["loss"])

    import json

    with open(
        os.path.join(config.output_dir, "train_config.json")
    ) as f:
        recorded = json.load(f)
    assert recorded["audio_latency_block_size"] == 100
    # the mask reached the model config the factory built
    from ultravox_tpu.training.model_factory import create_model_pack

    pack = create_model_pack(config)
    assert pack.config.audio_latency_block_size == 100


def test_resume_from_checkpoint(tmp_path, tokenizer_dir):
    from ultravox_tpu.training.train import train

    config = _config(tmp_path, tokenizer_dir)
    train(config)
    # resume: 2 more steps from the saved checkpoint
    config2 = _config(
        tmp_path, tokenizer_dir,
        model_load_dir=config.output_dir,
        resume_from_load_dir=True,
        max_steps=4,
    )
    train(config2)
    assert os.path.exists(os.path.join(config2.output_dir, "checkpoint-4"))


def test_train_pipeline_parallel_matches_single(tmp_path, tokenizer_dir):
    """mesh_pipe=2 through the train CLI: the decoder layer stack runs as a
    2-stage GPipe (parallel/pipeline.py) and the loss trajectory matches the
    non-pipelined run (same ops, different schedule; beyond-reference —
    SURVEY §2.4 'PP: absent')."""
    import json

    from ultravox_tpu.training.train import train

    losses = {}
    for name, overrides in (
        ("plain", {}),
        ("pipe", {"mesh_pipe": 2, "mesh_fsdp": 1}),
    ):
        config = _config(
            tmp_path.joinpath(name), tokenizer_dir, seed=7, **overrides
        )
        metrics = train(config)
        assert np.isfinite(metrics["loss"])
        with open(
            os.path.join(config.output_dir, "train_log.jsonl")
        ) as f:
            losses[name] = [
                json.loads(line)["loss"]
                for line in f
                if "loss" in json.loads(line)
            ]
    assert len(losses["plain"]) == len(losses["pipe"]) >= 2
    np.testing.assert_allclose(losses["pipe"], losses["plain"], rtol=2e-3)
