"""Incremental block-causal encode (the streaming voice path): the
per-block stream step must reproduce the batch block-causal encoder
exactly, the incremental mel must match the batch frontend, and the
precomputed-audio-embeds serving submit must emit the same tokens as the
standard path (reference workload: streaming latency-masked models,
streaming_tinyllama.yaml:24 — which the reference can only train, not
serve incrementally)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.helpers import make_tiny_tokenizer
from ultravox_tpu.inference.streaming import StreamingAudioEncoder, StreamingMel
from ultravox_tpu.models import (
    DecoderConfig,
    UltravoxConfig,
    WhisperEncoderConfig,
)
from ultravox_tpu.models import whisper_encoder
from ultravox_tpu.ops import mel as mel_lib

C = 8  # latency block (encoder positions) for the unit tests


def _enc_cfg(**kw):
    return WhisperEncoderConfig(
        d_model=32, num_layers=2, num_heads=2, ffn_dim=64,
        max_source_positions=64, **kw,
    )


def _window(mel, k, block):
    """Mel window [2kC-2, 2(k+1)C+1) zero-padded at the edges (mirrors
    StreamingAudioEncoder._window)."""
    C2 = 2 * block
    lo, hi = k * C2 - 2, (k + 1) * C2 + 1
    n = mel.shape[1]
    w = np.zeros((mel.shape[0], hi - lo), np.float32)
    s, e = max(lo, 0), min(hi, n)
    if e > s:
        w[:, s - lo: e - lo] = mel[:, s:e]
    return w


def test_stream_step_matches_batch_block_causal_encode():
    cfg = _enc_cfg()
    params = whisper_encoder.init_params(cfg, jax.random.key(0))
    rng = np.random.default_rng(0)
    mel_len = 70  # feat_len = 35; 5 blocks of 8 cover 40 positions
    mel = rng.standard_normal((cfg.num_mel_bins, mel_len)).astype(np.float32)

    # batch oracle: pad mel to 80 frames -> T_out = 40 positions
    mel_b = np.zeros((1, cfg.num_mel_bins, 80), np.float32)
    mel_b[0, :, :mel_len] = mel
    full = np.asarray(
        whisper_encoder.encoder_forward(
            params, cfg, jnp.asarray(mel_b),
            mel_lens=jnp.asarray([mel_len], jnp.int32),
            latency_block_size=C,
        )
    )[0]

    feat_len = (mel_len - 1) // 2 + 1  # 35
    state = whisper_encoder.EncoderStreamState.zeros(cfg)
    outs = []
    for k in range(5):
        n_valid = int(np.clip(feat_len - k * C, 0, C))
        state, out = whisper_encoder.encoder_stream_step(
            params, state,
            jnp.asarray(_window(mel, k, C)),
            jnp.asarray(n_valid, jnp.int32),
            cfg=cfg, block_size=C,
        )
        outs.append(np.asarray(out))
    streamed = np.concatenate(outs, axis=0)
    assert streamed.shape == (40, cfg.d_model)
    np.testing.assert_allclose(streamed, full[:40], atol=2e-5, rtol=2e-5)

    # an inference-fused tower (eager qkv concat) streams identically —
    # the serving engine fuses self.params["audio_tower"] and the
    # incremental voice path then runs encoder_stream_step on it
    fparams = whisper_encoder.fuse_encoder_inference_params(params)
    state = whisper_encoder.EncoderStreamState.zeros(cfg)
    outs_f = []
    for k in range(5):
        n_valid = int(np.clip(feat_len - k * C, 0, C))
        state, out = whisper_encoder.encoder_stream_step(
            fparams, state,
            jnp.asarray(_window(mel, k, C)),
            jnp.asarray(n_valid, jnp.int32),
            cfg=cfg, block_size=C,
        )
        outs_f.append(np.asarray(out))
    np.testing.assert_allclose(
        np.concatenate(outs_f, axis=0), streamed, atol=2e-5, rtol=2e-5
    )


def test_stream_step_state_is_blockwise_final():
    """Feeding more blocks must not change earlier blocks' outputs (the
    property that makes streaming valid at all)."""
    cfg = _enc_cfg()
    params = whisper_encoder.init_params(cfg, jax.random.key(1))
    rng = np.random.default_rng(1)
    mel = rng.standard_normal((cfg.num_mel_bins, 64)).astype(np.float32)

    state = whisper_encoder.EncoderStreamState.zeros(cfg)
    state, out0 = whisper_encoder.encoder_stream_step(
        params, state, jnp.asarray(_window(mel, 0, C)),
        jnp.asarray(C, jnp.int32), cfg=cfg, block_size=C,
    )
    # a different continuation after block 0
    mel2 = mel.copy()
    mel2[:, 2 * C + 1:] = rng.standard_normal(
        mel2[:, 2 * C + 1:].shape
    ).astype(np.float32)
    state2 = whisper_encoder.EncoderStreamState.zeros(cfg)
    state2, out0b = whisper_encoder.encoder_stream_step(
        params, state2, jnp.asarray(_window(mel2, 0, C)),
        jnp.asarray(C, jnp.int32), cfg=cfg, block_size=C,
    )
    np.testing.assert_allclose(
        np.asarray(out0), np.asarray(out0b), atol=1e-6
    )


def test_streaming_mel_matches_batch_frontend():
    rng = np.random.default_rng(2)
    # the loudest moment arrives in the FIRST chunk, so the running-max
    # clamp equals the batch frontend's global-max clamp exactly
    audio = (rng.standard_normal(16000) * 0.05).astype(np.float32)
    audio[:1600] *= 8.0
    want = mel_lib.log_mel_spectrogram_np(audio, 80)

    sm = StreamingMel(80)
    got = []
    for i in range(0, len(audio), 1480):  # uneven chunks
        out = sm.feed(audio[i: i + 1480])
        if out is not None:
            got.append(out)
    tail = sm.finalize()
    if tail is not None:
        got.append(tail)
    got = np.concatenate(got, axis=1)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


@pytest.fixture(scope="module")
def streaming_model():
    cfg = UltravoxConfig(
        audio_config=_enc_cfg(),
        text_config=DecoderConfig(
            vocab_size=384, hidden_size=48, intermediate_size=96,
            num_layers=2, num_heads=4, num_kv_heads=2, head_dim=12,
        ),
        hidden_size=64,
        audio_latency_block_size=C,
    )
    from ultravox_tpu.models import ultravox as uv

    params = uv.init_params(cfg, jax.random.key(3))
    return cfg, params


def test_streaming_audio_encoder_matches_batch_embeds(streaming_model):
    from ultravox_tpu.models import projector as projector_lib

    cfg, params = streaming_model
    rng = np.random.default_rng(3)
    audio = (rng.standard_normal(9600) * 0.1).astype(np.float32)
    audio[:960] *= 4.0  # early peak -> exact mel clamp parity

    enc = StreamingAudioEncoder(params, cfg)
    for i in range(0, len(audio), 800):
        enc.feed(audio[i: i + 800])
    got = enc.finalize()

    mel = mel_lib.log_mel_spectrogram_np(audio, cfg.audio_config.num_mel_bins)
    mel_len = mel.shape[1]
    pad = np.zeros((1, cfg.audio_config.num_mel_bins, 80), np.float32)
    pad[0, :, :mel_len] = mel
    full_enc = whisper_encoder.encoder_forward(
        params["audio_tower"], cfg.audio_config, jnp.asarray(pad),
        mel_lens=jnp.asarray([mel_len], jnp.int32),
        latency_block_size=C,
    )
    want = np.asarray(
        projector_lib.projector_forward(params["projector"], cfg, full_enc)
    )[0]
    n_tokens = -(-mel_len // 16)
    assert got.shape == (n_tokens, cfg.text_config.hidden_size)
    np.testing.assert_allclose(got, want[:n_tokens], atol=3e-5, rtol=3e-5)


def test_precomputed_audio_embeds_submit_matches_standard(streaming_model):
    from ultravox_tpu.inference.serving.engine import ServingEngine
    from ultravox_tpu.models.processor import (
        DataCollatorWithAudio,
        UltravoxProcessor,
    )

    cfg, params = streaming_model
    tokenizer = make_tiny_tokenizer()
    processor = UltravoxProcessor(tokenizer)
    collator = DataCollatorWithAudio(
        pad_token_id=tokenizer.pad_token_id, pad_multiple=1,
        mel_pad_multiple=80,
    )
    rng = np.random.default_rng(4)
    audio = (rng.standard_normal(9600) * 0.1).astype(np.float32)
    audio[:960] *= 4.0
    text = "transcribe <|audio|> please"

    engine = ServingEngine(
        params, cfg, num_slots=2, max_seq_len=128, cache_dtype=jnp.float32,
        prefill_len_buckets=(64, 128), mel_len_buckets=(80,),
    )
    engine.start()
    try:
        # standard path: audio through the tower at admit
        feats = processor(text=text, audio=audio)
        std = engine.submit(collator([feats]), max_tokens=8)
        std_ids = [
            ev.token_id for ev in engine.stream(std)
            if ev.token_id is not None
        ]

        # streaming path: precomputed embeds, no audio_values
        enc = StreamingAudioEncoder(params, cfg)
        enc.feed(audio)
        embeds = enc.finalize()
        feats2 = processor(
            text=text, audio_token_lens=[embeds.shape[0]]
        )
        batch = collator([{"input_ids": feats2["input_ids"]}])
        for key in (
            "audio_token_len", "audio_token_start_idx",
            "audio_chunk_batch_idx",
        ):
            batch[key] = feats2[key]
        pre = engine.submit(
            batch, max_tokens=8, audio_embeds=embeds[None],
            audio_spans=((int(feats2["audio_token_start_idx"][0]),
                          int(feats2["audio_token_len"][0]), "sha"),),
        )
        pre_ids = [
            ev.token_id for ev in engine.stream(pre)
            if ev.token_id is not None
        ]
    finally:
        engine.stop()
    assert std_ids == pre_ids


def test_streaming_encoder_window_overflow_raises(streaming_model):
    """Past one encoder window the stream state would clamp and silently
    corrupt earlier blocks — it must raise instead (callers fall back to
    the batch path's 30 s chunking)."""
    from ultravox_tpu.inference.streaming import EncoderWindowExceeded

    cfg, params = streaming_model
    enc = StreamingAudioEncoder(params, cfg)
    rng = np.random.default_rng(0)
    # 64 positions = 128 mel frames = 1.28 s; 3 s overflows mid-feed
    long_audio = (rng.standard_normal(48000) * 0.1).astype(np.float32)
    with pytest.raises(EncoderWindowExceeded):
        for i in range(0, len(long_audio), 8000):
            enc.feed(long_audio[i: i + 8000])
        enc.finalize()


def test_streaming_encoder_empty_stream_finalize(streaming_model):
    """A stream with fewer samples than one mel hop has zero audio tokens:
    finalize returns a shape-correct empty array, not a crash."""
    cfg, params = streaming_model
    enc = StreamingAudioEncoder(params, cfg)
    enc.feed(np.zeros(100, np.float32))  # < HOP_LENGTH
    out = enc.finalize()
    assert out.shape == (0, cfg.text_config.hidden_size)
