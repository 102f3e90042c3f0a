"""Conversation KV-cache prefix reuse: outputs must equal full-context
generation while only the suffix is prefetched into the cache."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.helpers import make_tiny_tokenizer
from ultravox_tpu.data.sample import VoiceSample
from ultravox_tpu.inference.infer import LocalInference
from ultravox_tpu.models import DecoderConfig, UltravoxConfig, WhisperEncoderConfig
from ultravox_tpu.models import ultravox as uv
from ultravox_tpu.models.processor import UltravoxProcessor


@pytest.fixture(scope="module")
def setup():
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
    processor = UltravoxProcessor(make_tiny_tokenizer())
    return cfg, params, processor


def _make(cfg, params, processor, conversation_mode):
    return LocalInference(
        params, cfg, processor,
        max_cache_len=256,
        conversation_mode=conversation_mode,
        cache_dtype=jnp.float32,
    )


def test_kv_reuse_matches_full_replay(setup):
    cfg, params, processor = setup
    conv = _make(cfg, params, processor, True)
    replay = _make(cfg, params, processor, True)
    # replay engine: force full re-prefill each turn by resetting its cache
    turns = ["hello there", "how are you", "tell me more"]
    conv_outs, replay_outs = [], []
    suffix_lens = []

    orig_generate = conv.engine.generate

    def spy(batch, **kw):
        suffix_lens.append(batch["input_ids"].shape[-1])
        return orig_generate(batch, **kw)

    conv.engine.generate = spy
    for t in turns:
        conv_outs.append(conv.infer(VoiceSample.from_prompt(t), max_tokens=5).text)

    for t in turns:
        replay._conv_tokens = []  # force p == 0 (no reuse)
        replay._conv_cache = None
        out = replay.infer(VoiceSample.from_prompt(t), max_tokens=5)
        replay_outs.append(out.text)
        # keep messages accumulated like a real conversation
    assert conv_outs == replay_outs
    # later turns must prefill only a suffix (shorter than the full prompt)
    assert suffix_lens[1] < len(conv._conv_tokens)


def test_kv_reuse_with_audio_turns(setup):
    cfg, params, processor = setup
    conv = _make(cfg, params, processor, True)
    replay = _make(cfg, params, processor, True)
    rng = np.random.default_rng(0)
    audio1 = (rng.standard_normal(6000) * 0.1).astype(np.float32)
    audio2 = (rng.standard_normal(4000) * 0.1).astype(np.float32)
    turns = [
        VoiceSample.from_prompt_and_audio("listen <|audio|>", audio1),
        VoiceSample.from_prompt("and then?"),
        VoiceSample.from_prompt_and_audio("also <|audio|>", audio2),
    ]
    outs_conv = [conv.infer(t, max_tokens=4).text for t in turns]
    outs_replay = []
    for t in turns:
        replay._conv_tokens = []
        replay._conv_cache = None
        outs_replay.append(replay.infer(t, max_tokens=4).text)
    assert outs_conv == outs_replay


def test_stream_conversational(setup):
    cfg, params, processor = setup
    conv = _make(cfg, params, processor, True)
    from ultravox_tpu.inference.base import InferenceChunk, InferenceStats

    msgs1 = list(conv.infer_stream(VoiceSample.from_prompt("hi"), max_tokens=4))
    assert isinstance(msgs1[-1], InferenceStats)
    msgs2 = list(conv.infer_stream(VoiceSample.from_prompt("again"), max_tokens=4))
    assert isinstance(msgs2[-1], InferenceStats)
    assert len(conv.past_messages) == 4
