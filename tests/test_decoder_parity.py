"""Decoder-LLM fp32 logit parity vs HF torch implementations across the model
families the reference supports (Llama / Mistral / Gemma-3 / Qwen-2/3 —
README.md:27), plus KV-cache decode consistency."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from ultravox_tpu.models import DecoderConfig
from ultravox_tpu.models import decoder as decoder_lib
from ultravox_tpu.models import weights as weights_lib

B, T, V = 2, 12, 256


def _make_hf(family):
    import transformers

    torch.manual_seed(0)
    common = dict(
        vocab_size=V,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=3,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=128,
    )
    if family == "llama":
        cfg = transformers.LlamaConfig(**common)
        model = transformers.LlamaForCausalLM(cfg)
    elif family == "llama3-rope":
        cfg = transformers.LlamaConfig(
            **common,
            rope_scaling={
                "rope_type": "llama3",
                "factor": 8.0,
                "low_freq_factor": 1.0,
                "high_freq_factor": 4.0,
                "original_max_position_embeddings": 64,
            },
        )
        model = transformers.LlamaForCausalLM(cfg)
    elif family == "mistral":
        cfg = transformers.MistralConfig(**common, sliding_window=8)
        model = transformers.MistralForCausalLM(cfg)
    elif family == "qwen2":
        cfg = transformers.Qwen2Config(**common)
        model = transformers.Qwen2ForCausalLM(cfg)
    elif family == "qwen3":
        cfg = transformers.Qwen3Config(**common, head_dim=16)
        model = transformers.Qwen3ForCausalLM(cfg)
    elif family == "gemma3":
        cfg = transformers.Gemma3TextConfig(
            **common,
            head_dim=16,
            sliding_window=8,
            sliding_window_pattern=2,
            rope_local_base_freq=10000.0,
            rope_theta=1000000.0,
            query_pre_attn_scalar=16,
        )
        model = transformers.Gemma3ForCausalLM(cfg)
    else:
        raise ValueError(family)
    return cfg, model.eval()


FAMILIES = ["llama", "llama3-rope", "mistral", "qwen2", "qwen3", "gemma3"]


@pytest.mark.parametrize("family", FAMILIES)
def test_logit_parity(family):
    hf_cfg, model = _make_hf(family)
    cfg = DecoderConfig.from_hf_dict(hf_cfg.to_dict())
    params = weights_lib.convert_decoder(
        weights_lib.from_torch_state_dict(model.state_dict()), cfg
    )

    rng = np.random.default_rng(0)
    ids = rng.integers(0, V, size=(B, T)).astype(np.int32)
    with torch.no_grad():
        ref = model(torch.from_numpy(ids).long()).logits.numpy()

    positions = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32)[None], (B, T))
    logits, _ = decoder_lib.decoder_forward(
        params,
        cfg,
        input_ids=jnp.asarray(ids),
        positions=positions,
        kv_valid_len=jnp.full((B,), T, jnp.int32),
    )
    np.testing.assert_allclose(np.asarray(logits), ref, atol=3e-4)


@pytest.mark.parametrize("family", ["llama", "gemma3"])
def test_kv_cache_decode_matches_full_forward(family):
    """Prefill + per-token decode through the KV cache must reproduce the
    full-sequence forward logits."""
    hf_cfg, model = _make_hf(family)
    cfg = DecoderConfig.from_hf_dict(hf_cfg.to_dict())
    params = weights_lib.convert_decoder(
        weights_lib.from_torch_state_dict(model.state_dict()), cfg
    )
    rng = np.random.default_rng(1)
    ids = jnp.asarray(rng.integers(0, V, size=(B, T)).astype(np.int32))
    positions = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32)[None], (B, T))

    full_logits, _ = decoder_lib.decoder_forward(
        params, cfg, input_ids=ids, positions=positions,
        kv_valid_len=jnp.full((B,), T, jnp.int32),
    )

    # prefill the first T0 tokens, then decode one token at a time
    T0 = 5
    cache = decoder_lib.KVCache.zeros(cfg, B, max_len=T + 4, dtype=jnp.float32)
    logits_p, cache = decoder_lib.decoder_forward(
        params, cfg, input_ids=ids[:, :T0], positions=positions[:, :T0],
        kv_valid_len=jnp.full((B,), T0, jnp.int32),
        cache=cache, write_pos=jnp.zeros((B,), jnp.int32),
    )
    np.testing.assert_allclose(
        np.asarray(logits_p), np.asarray(full_logits[:, :T0]), atol=2e-4
    )
    for t in range(T0, T):
        step_logits, cache = decoder_lib.decoder_forward(
            params, cfg, input_ids=ids[:, t : t + 1],
            positions=positions[:, t : t + 1],
            kv_valid_len=jnp.full((B,), t + 1, jnp.int32),
            cache=cache, write_pos=jnp.full((B,), t, jnp.int32),
        )
        np.testing.assert_allclose(
            np.asarray(step_logits[:, 0]), np.asarray(full_logits[:, t]),
            atol=2e-4,
        )
