"""Benchmark: audio-encoder real-time factor per TPU chip.

Headline metric (BASELINE.md north star: >30× real-time encoder throughput
per chip): seconds of audio encoded per wall-clock second through the
whisper-large-v3-turbo-class encoder (d_model=1280, 32 layers, 128 mels) in
bf16, including the on-device mel frontend.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp


def main():
    from ultravox_tpu.models import WhisperEncoderConfig
    from ultravox_tpu.models import whisper_encoder
    from ultravox_tpu.ops import mel as mel_lib

    cfg = WhisperEncoderConfig(
        num_mel_bins=128,  # whisper-large-v3-turbo
        d_model=1280,
        num_layers=32,
        num_heads=20,
        ffn_dim=5120,
        max_source_positions=1500,
    )
    params = whisper_encoder.init_params(
        cfg, jax.random.key(0), dtype=jnp.bfloat16
    )

    BATCH = 8  # 30 s chunks per iteration
    SECONDS_PER_CHUNK = 30.0
    n_samples = int(SECONDS_PER_CHUNK * mel_lib.SAMPLE_RATE)

    rng = np.random.default_rng(0)
    audio = jnp.asarray(
        rng.standard_normal((BATCH, n_samples)).astype(np.float32) * 0.1
    )
    lens = jnp.full((BATCH,), 3000, jnp.int32)

    @jax.jit
    def encode_sum(params, audio, lens):
        mel = mel_lib.log_mel_spectrogram(audio, num_mel_filters=cfg.num_mel_bins)
        out = whisper_encoder.encoder_forward(
            params, cfg, mel.astype(jnp.bfloat16), lens, attn_impl="fused"
        )
        # reduce on device: a host scalar fetch is the only reliable
        # execution fence on the remote-attached (axon) backend, where
        # block_until_ready returns before the computation runs
        return jnp.sum(out.astype(jnp.float32))

    # warmup / compile (scalar fetch forces execution)
    float(encode_sum(params, audio, lens))
    # host<->device round-trip latency, to subtract from the measurement
    t0 = time.perf_counter()
    float(jnp.sum(audio))
    roundtrip = time.perf_counter() - t0

    iters = 10
    t0 = time.perf_counter()
    result = None
    for _ in range(iters):
        result = encode_sum(params, audio, lens)
    float(result)  # fence
    dt = max(time.perf_counter() - t0 - roundtrip, 1e-6)

    audio_seconds = BATCH * SECONDS_PER_CHUNK * iters
    rtfx = audio_seconds / dt
    baseline_rtfx = 30.0  # north-star: >30x real time per chip
    print(
        json.dumps(
            {
                "metric": "audio_encoder_rtfx_per_chip",
                "value": round(rtfx, 2),
                "unit": "x_realtime",
                "vs_baseline": round(rtfx / baseline_rtfx, 3),
                "encoder": "whisper-large-v3-turbo-class (1280d x 32L, bf16)",
                "batch_30s_chunks": BATCH,
                "wall_s_per_iter": round(dt / iters, 4),
                "device": str(jax.devices()[0]),
            }
        )
    )


if __name__ == "__main__":
    main()
