"""In-context (full 32-layer encode) timing of the q-chunked fused-attention
pipeline (round 5 encoder-MFU push).

Standalone kernel timings through the remote tunnel are dispatch-noise-
dominated (scripts/profile_encoder_attn.py measured the prod kernel at
31 TF/s standalone vs ~54 TF/s in-context), so variants are compared by the
only number that matters: the whole-encoder wall time at the headline shape
(batch 8 x 30 s, whisper-large-v3-turbo dims, bf16, fused-qkv inference
params).

Usage: python scripts/profile_encoder_chunks.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def fence(x) -> float:
    return float(jnp.sum(x.astype(jnp.float32)))


def time_fn(fn, *args, iters=10):
    fence(fn(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    fence(out)
    return (time.perf_counter() - t0) / iters


def main():
    from ultravox_tpu.models import WhisperEncoderConfig, whisper_encoder

    print("device:", jax.devices()[0], flush=True)
    cfg = WhisperEncoderConfig(
        num_mel_bins=128, d_model=1280, num_layers=32, num_heads=20,
        ffn_dim=5120, max_source_positions=1500,
    )
    params = whisper_encoder.init_params(
        cfg, jax.random.key(0), dtype=jnp.bfloat16
    )
    params = whisper_encoder.fuse_encoder_inference_params(params)
    rng = np.random.default_rng(0)
    mel = jnp.asarray(
        rng.standard_normal((8, 128, 3000)) * 0.1, jnp.bfloat16
    )
    lens = jnp.full((8,), 3000, jnp.int32)

    # FLOPs per iteration (matches bench.py's encoder MFU accounting)
    D, F, T, L, B = 1280, 5120, 1500, 32, 8
    flops = (
        2 * (4 * D * D + 2 * D * F) * T * B * L
        + 2 * 2 * T * T * D * B * L
        + 2 * 3 * (128 * D * 3000 + D * D * 1500) * B
    )
    peak = 197e12

    ref = None
    for bq, nc in ((1500, 1), (1536, 2), (1536, 4), (1536, 8), (768, 4)):
        fn = jax.jit(
            lambda p, m, ln, _bq=bq, _nc=nc: whisper_encoder.encoder_forward(
                p, cfg, m, ln, attn_impl="fused",
                fused_block_q=_bq, fused_n_chunks=_nc,
            )
        )
        try:
            t = time_fn(fn, params, mel, lens)
            out = fn(params, mel, lens)
            if ref is None:
                ref = out
                d = 0.0
            else:
                d = float(jnp.max(jnp.abs(
                    ref.astype(jnp.float32) - out.astype(jnp.float32)
                )))
            print(
                f"bq={bq} chunks={nc}: {t*1e3:7.2f} ms  "
                f"MFU {flops/t/peak*100:5.1f}%  maxdiff {d:.2e}",
                flush=True,
            )
        except Exception as e:  # noqa: BLE001
            print(f"bq={bq} chunks={nc} FAILED: {type(e).__name__}: {e}",
                  flush=True)


if __name__ == "__main__":
    main()
