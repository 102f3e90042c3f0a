"""Encoder component profiling on the real TPU (ambient axon env).

Splits the headline-bench iteration (batch 8 x 30 s chunks through the
whisper-large-v3-turbo-class encoder) into components to steer MFU work:
mel frontend, conv stem, transformer stack (xla vs fused attention), and a
16-layer variant to separate per-layer from fixed cost.

Usage: python scripts/profile_encoder.py
"""

import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def fence(x) -> float:
    return float(jnp.sum(x.astype(jnp.float32)))


def time_fn(fn, *args, iters=10):
    fence(fn(*args))  # compile
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    fence(out)
    return (time.perf_counter() - t0) / iters


def main():
    from ultravox_tpu.models import WhisperEncoderConfig, whisper_encoder
    from ultravox_tpu.ops import mel as mel_lib

    print("device:", jax.devices()[0], flush=True)

    BATCH = 8
    n_samples = int(30.0 * mel_lib.SAMPLE_RATE)
    rng = np.random.default_rng(0)
    audio = jnp.asarray(
        rng.standard_normal((BATCH, n_samples)).astype(np.float32) * 0.1
    )
    lens = jnp.full((BATCH,), 3000, jnp.int32)

    # --- mel frontend alone
    mel_fn = jax.jit(
        lambda a: mel_lib.log_mel_spectrogram(a, num_mel_filters=128)
    )
    t_mel = time_fn(mel_fn, audio)
    print(f"mel frontend:            {t_mel*1e3:8.2f} ms", flush=True)
    mel = mel_fn(audio).astype(jnp.bfloat16)

    for n_layers in (32, 16):
        cfg = WhisperEncoderConfig(
            num_mel_bins=128, d_model=1280, num_layers=n_layers,
            num_heads=20, ffn_dim=5120, max_source_positions=1500,
        )
        params = whisper_encoder.init_params(
            cfg, jax.random.key(0), dtype=jnp.bfloat16
        )
        for impl in ("fused", "xla"):
            fn = jax.jit(
                lambda p, m, ln, _cfg=cfg, _impl=impl: whisper_encoder.encoder_forward(
                    p, _cfg, m, ln, attn_impl=_impl
                )
            )
            t = time_fn(fn, params, mel, lens)
            print(
                f"encoder L={n_layers:2d} attn={_pad(impl)}: {t*1e3:8.2f} ms",
                flush=True,
            )

    # --- conv stem alone (32L params reused)
    cfg = WhisperEncoderConfig(
        num_mel_bins=128, d_model=1280, num_layers=32,
        num_heads=20, ffn_dim=5120, max_source_positions=1500,
    )
    params = whisper_encoder.init_params(cfg, jax.random.key(0), dtype=jnp.bfloat16)

    @jax.jit
    def stem(p, m):
        x = jax.nn.gelu(
            whisper_encoder._conv1d(
                m, p["conv1"]["kernel"], p["conv1"]["bias"], cfg.conv1_stride
            ),
            approximate=False,
        )
        return jax.nn.gelu(
            whisper_encoder._conv1d(
                x, p["conv2"]["kernel"], p["conv2"]["bias"], cfg.conv2_stride
            ),
            approximate=False,
        )

    t_stem = time_fn(stem, params, mel)
    print(f"conv stem:               {t_stem*1e3:8.2f} ms", flush=True)

    # FLOPs model for MFU accounting
    D, F, T, L = 1280, 5120, 1500, 32
    mm = 2 * (4 * D * D + 2 * D * F) * T * BATCH * L
    att = 2 * 2 * T * T * D * BATCH * L
    conv = 2 * 3 * (128 * D * 3000 + D * D * 1500) * BATCH
    print(f"matmul TF/iter: {mm/1e12:.2f}  attn TF: {att/1e12:.2f}  "
          f"conv TF: {conv/1e12:.2f}", flush=True)


def _pad(s):
    return f"{s:<5s}"


if __name__ == "__main__":
    main()
