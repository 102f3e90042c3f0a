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


def test_gemma2_parity_and_decode():
    """Gemma-2 family: attention logit softcapping + plus-one norms +
    alternating sliding windows, fp32 parity vs transformers, and fused
    decode matches the per-step path."""
    import transformers

    from ultravox_tpu.models.config import DecoderConfig, UltravoxConfig

    torch.manual_seed(0)
    hf_cfg = transformers.Gemma2Config(
        vocab_size=V, hidden_size=48, intermediate_size=96,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        head_dim=12, max_position_embeddings=512,
        sliding_window=16, attn_logit_softcapping=50.0,
        final_logit_softcapping=30.0, query_pre_attn_scalar=12,
        attn_implementation="eager",
    )
    model = transformers.Gemma2ForCausalLM(hf_cfg).eval()
    cfg = DecoderConfig.from_hf_dict(hf_cfg.to_dict())
    assert cfg.arch == "gemma2"
    params = weights_lib.convert_decoder(
        weights_lib.from_torch_state_dict(model.state_dict()), cfg
    )

    rng = np.random.default_rng(0)
    ids = rng.integers(1, V, (2, 24)).astype(np.int32)
    with torch.no_grad():
        ref = model(torch.from_numpy(ids).long()).logits.numpy()
    positions = np.broadcast_to(np.arange(24, dtype=np.int32)[None], (2, 24))
    ours, _ = decoder_lib.decoder_forward(
        params, cfg,
        input_ids=jnp.asarray(ids),
        positions=jnp.asarray(positions),
        kv_valid_len=jnp.full((2,), 24, jnp.int32),
    )
    np.testing.assert_allclose(np.asarray(ours), ref, atol=5e-4)

    # generation: per-step (XLA decode attention) == fused segmented scan
    from ultravox_tpu.inference.engine import GenerationEngine

    uv_cfg = UltravoxConfig(text_config=cfg, llm_only_training=True)
    engine = GenerationEngine(
        {"language_model": params}, uv_cfg,
        max_cache_len=128, cache_dtype=jnp.float32,
    )
    batch = {
        "input_ids": ids[:, :20],
        "attention_mask": np.ones((2, 20), np.int32),
    }
    step = engine.generate(batch, max_new_tokens=12)
    fused = engine.generate_fused(batch, max_new_tokens=12)
    assert step.token_ids == fused.token_ids
