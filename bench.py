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

    ttft_ms, decode_tps = _flagship_metrics()
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
                "ttft_ms_p50_10s_audio_1b": ttft_ms,
                "decode_tok_s_batch8_1b": decode_tps,
                "device": str(jax.devices()[0]),
            }
        )
    )


def _flagship_metrics():
    """TTFT (10 s audio -> first-token logits) and fused-decode throughput on
    the 1B-class flagship (whisper-small + llama-3.2-1B dims, bf16).

    The 8B target config does not fit a single 16 GB v5e chip; multi-chip
    serving shards it over the mesh (see parallel/)."""
    import time

    import __graft_entry__ as graft
    from ultravox_tpu.inference.engine import GenerationEngine
    from ultravox_tpu.models import decoder as decoder_lib
    from ultravox_tpu.models import ultravox as uv_model

    cfg = graft._flagship_config()
    params = uv_model.init_params(cfg, jax.random.key(0), jnp.bfloat16)
    engine = GenerationEngine(params, cfg, max_cache_len=1024)

    B = 8
    prompt = np.full((B, 128), 7, np.int32)
    batch = {"input_ids": prompt, "attention_mask": np.ones_like(prompt)}
    engine.generate_greedy_fused(batch, max_new_tokens=64)  # compile
    t0 = time.perf_counter()
    iters = 3
    for _ in range(iters):
        engine.generate_greedy_fused(batch, max_new_tokens=64)
    decode_tps = B * 64 * iters / (time.perf_counter() - t0)

    n_tok = -(-1000 // cfg.audio_token_compression)
    abatch = {
        "input_ids": prompt[:1],
        "attention_mask": np.ones((1, 128), np.int32),
        "audio_values": np.zeros((1, 80, 1000), np.float32),
        "audio_lens": np.asarray([1000], np.int32),
        "audio_token_len": np.asarray([n_tok], np.int32),
        "audio_token_start_idx": np.asarray([4], np.int32),
        "audio_chunk_batch_idx": np.asarray([0], np.int32),
    }

    def ttft_once():
        t0 = time.perf_counter()
        jb = {k: jnp.asarray(v) for k, v in engine.pad_batch(abatch).items()}
        cache = decoder_lib.KVCache.zeros(cfg.text_config, 1, 1024, jnp.bfloat16)
        logits, _, _ = engine._prefill(
            engine.params, jb, cache, jnp.asarray(0, jnp.int32)
        )
        int(jnp.argmax(logits[0]))  # host fetch = execution fence
        return time.perf_counter() - t0

    ttft_once()  # compile
    times = sorted(ttft_once() for _ in range(10))
    return round(times[5] * 1000, 1), round(decode_tps, 1)


if __name__ == "__main__":
    main()
