"""LoRA tests: identity at init, adapter-only training, merge equivalence."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ultravox_tpu.models import DecoderConfig, LoraConfig, UltravoxConfig, WhisperEncoderConfig
from ultravox_tpu.models import decoder as decoder_lib
from ultravox_tpu.models import lora as lora_lib
from ultravox_tpu.models import ultravox as uv
from ultravox_tpu.training import train_step as ts


@pytest.fixture(scope="module")
def setup():
    cfg = DecoderConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_layers=2, num_heads=4, num_kv_heads=2, head_dim=8,
    )
    params = decoder_lib.init_params(cfg, jax.random.key(0))
    return cfg, params


def _logits(cfg, params, ids):
    B, T = ids.shape
    pos = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32)[None], (B, T))
    logits, _ = decoder_lib.decoder_forward(
        params, cfg, input_ids=ids, positions=pos,
        kv_valid_len=jnp.full((B,), T, jnp.int32),
    )
    return logits


def test_lora_identity_at_init(setup):
    cfg, params = setup
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 128, (2, 6)), jnp.int32)
    base = _logits(cfg, params, ids)
    lcfg = LoraConfig(r=4, target_modules=("q_proj", "v_proj"))
    with_lora = lora_lib.add_lora(
        params, lcfg, jax.random.key(1), lora_lib.DECODER_TARGETS
    )
    assert "lora_a" in with_lora["layers"]["q_proj"]
    assert "lora_a" not in with_lora["layers"]["k_proj"]
    out = _logits(cfg, with_lora, ids)
    np.testing.assert_allclose(np.asarray(out), np.asarray(base), atol=1e-6)


def test_lora_merge_equivalence(setup):
    cfg, params = setup
    lcfg = LoraConfig(r=4, target_modules=("q_proj", "v_proj", "gate_proj"))
    with_lora = lora_lib.add_lora(
        params, lcfg, jax.random.key(1), lora_lib.DECODER_TARGETS
    )
    # give lora_b a nonzero value so the adapter does something
    with_lora["layers"]["q_proj"]["lora_b"] = (
        jax.random.normal(jax.random.key(2), with_lora["layers"]["q_proj"]["lora_b"].shape) * 0.1
    )
    ids = jnp.asarray(np.random.default_rng(1).integers(0, 128, (2, 6)), jnp.int32)
    unmerged = _logits(cfg, with_lora, ids)
    merged = lora_lib.merge_lora({"language_model": with_lora})["language_model"]
    assert "lora_a" not in merged["layers"]["q_proj"]
    out = _logits(cfg, merged, ids)
    np.testing.assert_allclose(np.asarray(out), np.asarray(unmerged), atol=1e-4)
    # adapter actually changed the function
    base = _logits(cfg, params, ids)
    assert np.abs(np.asarray(out) - np.asarray(base)).max() > 1e-4


def test_lora_training_only_updates_adapters(setup):
    cfg, dec_params = setup
    uv_cfg = UltravoxConfig(
        audio_config=WhisperEncoderConfig(
            d_model=32, num_layers=1, num_heads=2, ffn_dim=64
        ),
        text_config=cfg,
        hidden_size=64,
    )
    params = uv.init_params(uv_cfg, jax.random.key(0))
    params = lora_lib.apply_lora_to_model(
        params, LoraConfig(r=4), LoraConfig(r=0), jax.random.key(3)
    )
    patterns = (r".*projector/.*",) + lora_lib.lora_trainable_patterns()
    mask = ts.trainable_mask(params, patterns)
    trainable, frozen = ts.partition_params(params, mask)
    lora_keys = [k for k in trainable if "lora" in k]
    assert lora_keys, "lora params must be trainable"
    assert all("lora_scale" not in k for k in lora_keys)
    assert all("kernel" not in k or "projector" in k for k in trainable)

    import optax

    opt = ts.make_optimizer(1e-2, warmup_steps=0, total_steps=5, schedule="constant")
    state, template = ts.init_train_state(params, opt, patterns)
    from ultravox_tpu.models.config import LossConfig

    step = jax.jit(ts.make_train_step(uv_cfg, LossConfig(), opt, template, remat=False))
    rng = np.random.default_rng(2)
    labels = np.full((2, 8), -100, np.int64)
    labels[:, -3:] = rng.integers(1, 128, (2, 3))
    batch = {
        "input_ids": jnp.asarray(rng.integers(1, 128, (2, 8)), jnp.int32),
        "attention_mask": jnp.ones((2, 8), jnp.int32),
        "labels": jnp.asarray(labels),
    }
    before_b = {
        k: np.asarray(v).copy() for k, v in state.trainable.items() if "lora_b" in k
    }
    for _ in range(3):
        state, metrics = step(state, batch)
    after_b = {k: np.asarray(state.trainable[k]) for k in before_b}
    changed = any(np.abs(after_b[k] - before_b[k]).max() > 0 for k in before_b)
    assert changed, "lora_b should receive updates"
    assert np.isfinite(float(metrics["loss"]))
