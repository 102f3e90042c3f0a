"""Serve-and-eval harness test: in-process API server + OpenAI client +
metric scoring over the synthetic dataset (reference workload #8:
run_vllm_inference equivalent)."""

import json
import os
from unittest import mock

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(scope="module")
def tiny_ckpt(tmp_path_factory):
    from tests.helpers import make_tiny_tokenizer
    from ultravox_tpu.models import (
        DecoderConfig,
        UltravoxConfig,
        WhisperEncoderConfig,
    )
    from ultravox_tpu.models import ultravox as uv
    from ultravox_tpu.tools.publish import save_pretrained

    cfg = UltravoxConfig(
        audio_config=WhisperEncoderConfig(
            d_model=32, num_layers=1, num_heads=2, ffn_dim=64
        ),
        text_config=DecoderConfig(
            vocab_size=384, hidden_size=48, intermediate_size=96,
            num_layers=2, num_heads=4, num_kv_heads=2, head_dim=12,
        ),
        hidden_size=64,
    )
    params = uv.init_params(cfg, jax.random.key(0))
    out = tmp_path_factory.mktemp("ckpt")
    save_pretrained(params, cfg, str(out), tokenizer=make_tiny_tokenizer())
    return str(out)


def test_serve_and_eval_roundtrip(tiny_ckpt, tmp_path):
    from ultravox_tpu.data import registry
    from ultravox_tpu.data.types import DatasetConfig, EvalConfig as DSEval
    from ultravox_tpu.evaluation.eval import EvalConfig, eval_datasets
    from ultravox_tpu.inference.run_serving_eval import start_server, wait_healthy
    from ultravox_tpu.tools.infer_api import OpenAIInference

    server, engine, port = start_server(tiny_ckpt, num_slots=2, max_seq_len=128)
    try:
        wait_healthy(port)
        client = OpenAIInference(f"http://127.0.0.1:{port}")
        registry.register_datasets(
            [
                DatasetConfig(
                    name="serve-eval-test", path="x", splits=[],
                    user_template="u", eval_config=DSEval(metric="wer"),
                )
            ]
        )
        real = registry.create_dataset
        with mock.patch.object(
            registry,
            "create_dataset",
            side_effect=lambda n, a: real("synthetic-asr", a),
        ):
            scores = eval_datasets(
                client,
                EvalConfig(
                    eval_sets=["serve-eval-test"], num_samples=3,
                    batch_size=2, max_tokens=4, output_dir=str(tmp_path),
                ),
            )
        assert scores["serve-eval-test"]["num_samples"] == 3
        assert os.path.exists(tmp_path / "summary.json")
    finally:
        server.shutdown()
        engine.stop()
        registry.unregister_datasets(["serve-eval-test"])
