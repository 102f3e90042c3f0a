"""Training-throughput profile on the real TPU: KL-distillation adapter
train step on the 1B-class flagship (whisper-small tower + llama-3.2-1B
dims), 10 s audio per sample, bf16 params + remat.

Usage: python scripts/profile_train.py [--batch 4]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--attn", default="xla", choices=["xla", "flash"])
    ap.add_argument(
        "--audio-secs", type=int, default=10,
        help="seconds of audio per sample (sets mel frames = 100/s)",
    )
    ap.add_argument(
        "--vocab-chunk", type=int, default=None,
        help="chunked vocab-projection loss (no full logits tensor in HBM)",
    )
    ap.add_argument(
        "--lora", action="store_true",
        help="audio-LoRA recipe: encoder LoRA adapters train too (v0.6 "
        "shape), so the encoder fwd+bwd joins the hot path",
    )
    args = ap.parse_args()

    import __graft_entry__ as graft
    from ultravox_tpu.models import LossConfig, LossFunction
    from ultravox_tpu.models import ultravox as uv
    from ultravox_tpu.training import train_step as ts

    cfg = graft._flagship_config()
    params = uv.init_params(cfg, jax.random.key(0), jnp.bfloat16)
    patterns = [r".*projector/.*"]
    if args.lora:
        from ultravox_tpu.models import lora as lora_lib
        from ultravox_tpu.models.config import LoraConfig

        params = lora_lib.apply_lora_to_model(
            params, LoraConfig(r=0), LoraConfig(r=8), jax.random.key(1),
            jnp.bfloat16,
        )
        patterns += list(lora_lib.lora_trainable_patterns())
    opt = ts.make_optimizer(1e-3, warmup_steps=0, total_steps=100)
    state, template = ts.init_train_state(params, opt, trainable_patterns=patterns)
    step_fn = jax.jit(
        ts.make_train_step(
            cfg,
            LossConfig(loss_function=LossFunction.KL_DIVERGENCE),
            opt,
            template,
            remat=True,
            attn_impl=args.attn,
            vocab_chunk=args.vocab_chunk,
        ),
        donate_argnums=(0,),
    )

    mel_frames = args.audio_secs * 100
    n_audio_tok = mel_frames // 2 // 8  # conv stride 2, stack 8
    B, T, T2 = args.batch, 64 + n_audio_tok + 64, 128
    rng = np.random.default_rng(0)
    labels = np.full((B, T), -100, np.int32)
    labels[:, -40:] = rng.integers(1, cfg.vocab_size, (B, 40))
    alt_labels = np.full((B, T2), -100, np.int32)
    alt_labels[:, -40:] = labels[:, -40:]
    batch = {
        "input_ids": jnp.asarray(
            rng.integers(1, cfg.vocab_size, (B, T)), jnp.int32
        ),
        "attention_mask": jnp.ones((B, T), jnp.int32),
        "labels": jnp.asarray(labels),
        "alt_input_ids": jnp.asarray(
            rng.integers(1, cfg.vocab_size, (B, T2)), jnp.int32
        ),
        "alt_attention_mask": jnp.ones((B, T2), jnp.int32),
        "alt_labels": jnp.asarray(alt_labels),
        "audio_values": jnp.asarray(
            rng.standard_normal((B, 80, mel_frames)) * 0.1, jnp.float32
        ),
        "audio_lens": jnp.full((B,), mel_frames, jnp.int32),
        "audio_token_len": jnp.full((B,), n_audio_tok, jnp.int32),
        "audio_token_start_idx": jnp.full((B,), 4, jnp.int32),
        "audio_chunk_batch_idx": jnp.arange(B, dtype=jnp.int32),
    }

    state, metrics = step_fn(state, batch)
    print(f"compile done, loss={float(metrics['loss']):.4f}", flush=True)
    t0 = time.perf_counter()
    for _ in range(args.steps):
        state, metrics = step_fn(state, batch)
    float(metrics["loss"])  # fence
    dt = (time.perf_counter() - t0) / args.steps
    print(
        f"train step (KL, B={B}, attn={args.attn}, lora={args.lora}, "
        f"vchunk={args.vocab_chunk}, {args.audio_secs}s audio, T={T}, "
        f"bf16+remat): {dt*1000:.1f} ms = {B/dt:.1f} samples/s",
        flush=True,
    )


if __name__ == "__main__":
    main()
