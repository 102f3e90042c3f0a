"""Serve-and-score harness (reference: inference/run_vllm_inference.py:41-233
launches a vLLM OpenAI server and runs an eval set against it).

Here the server is this framework's own continuous-batching API server,
started in-process; the eval loop drives it through the OpenAI protocol via
``tools.infer_api.OpenAIInference`` — exactly how an external client would —
then scores with the metric registries.

CLI: ``python -m ultravox_tpu.inference.run_serving_eval --model <dir>
--eval_sets "[librispeech-clean-transcription]"``
"""

from __future__ import annotations

import argparse
import json
import logging
import threading
import time
import urllib.request
from http.server import ThreadingHTTPServer

import yaml

logger = logging.getLogger(__name__)


def start_server(model_dir: str, num_slots: int, max_seq_len: int, port: int = 0):
    import jax
    import jax.numpy as jnp
    import transformers

    from ultravox_tpu.inference.serving.api_server import ServingAPI, make_handler
    from ultravox_tpu.inference.serving.engine import ServingEngine
    from ultravox_tpu.inference.ultravox_infer import resolve_checkpoint
    from ultravox_tpu.models import ultravox as uv_model
    from ultravox_tpu.models import weights as weights_lib
    from ultravox_tpu.models.config import UltravoxConfig
    from ultravox_tpu.models.processor import (
        DataCollatorWithAudio,
        UltravoxProcessor,
    )

    model_dir = resolve_checkpoint(model_dir)
    cfg = UltravoxConfig.from_pretrained_dir(model_dir)
    params = uv_model.init_params(cfg, jax.random.key(0), jnp.bfloat16)
    params = weights_lib.convert_ultravox(
        weights_lib.load_safetensors_dir(model_dir), cfg, jnp.bfloat16,
        base=params,
    )
    tokenizer = transformers.AutoTokenizer.from_pretrained(model_dir)
    if tokenizer.pad_token_id is None:
        tokenizer.pad_token = tokenizer.eos_token
    processor = UltravoxProcessor(
        tokenizer,
        num_mel_bins=cfg.audio_config.num_mel_bins,
        stack_factor=cfg.stack_factor,
    )
    engine = ServingEngine(
        params, cfg, num_slots=num_slots, max_seq_len=max_seq_len
    )
    api = ServingAPI(
        engine, processor, DataCollatorWithAudio(pad_token_id=tokenizer.pad_token_id)
    )
    engine.start()
    server = ThreadingHTTPServer(("127.0.0.1", port), make_handler(api))
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    return server, engine, server.server_address[1]


def wait_healthy(port: int, timeout_s: float = 60.0) -> None:
    deadline = time.time() + timeout_s
    while time.time() < deadline:
        try:
            with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/health", timeout=5
            ) as r:
                if json.load(r).get("status") == "ok":
                    return
        except OSError:
            time.sleep(0.5)
    raise TimeoutError("server did not become healthy")


def main():
    from ultravox_tpu.evaluation.eval import EvalConfig, eval_datasets
    from ultravox_tpu.tools.infer_api import OpenAIInference

    parser = argparse.ArgumentParser()
    parser.add_argument("--model", required=True)
    parser.add_argument("--eval_sets", required=True)
    parser.add_argument("--num_samples", type=int, default=64)
    parser.add_argument("--batch_size", type=int, default=8)
    parser.add_argument("--max_tokens", type=int, default=256)
    parser.add_argument("--num_slots", type=int, default=16)
    parser.add_argument("--max_seq_len", type=int, default=4096)
    parser.add_argument("--output_dir", default="serving_eval_results")
    args = parser.parse_args()
    logging.basicConfig(level=logging.INFO)

    server, engine, port = start_server(
        args.model, args.num_slots, args.max_seq_len
    )
    try:
        wait_healthy(port)
        client = OpenAIInference(f"http://127.0.0.1:{port}")
        config = EvalConfig(
            eval_sets=yaml.safe_load(args.eval_sets),
            num_samples=args.num_samples,
            batch_size=args.batch_size,
            max_tokens=args.max_tokens,
            output_dir=args.output_dir,
        )
        scores = eval_datasets(client, config)
        print(json.dumps(scores, indent=2))
    finally:
        server.shutdown()
        engine.stop()


if __name__ == "__main__":
    main()
