"""Train-step tests: partition/merge roundtrip, loss decreases with frozen
backbone, KL-distillation path, frozen params untouched."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.helpers import make_tiny_tokenizer
from ultravox_tpu.models import (
    DecoderConfig,
    LossConfig,
    LossFunction,
    UltravoxConfig,
    WhisperEncoderConfig,
)
from ultravox_tpu.models import ultravox as uv
from ultravox_tpu.models.processor import DataCollatorWithAudio, UltravoxProcessor
from ultravox_tpu.training import train_step as ts


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
    tokenizer = make_tiny_tokenizer()
    processor = UltravoxProcessor(tokenizer)
    coll = DataCollatorWithAudio(
        pad_token_id=tokenizer.pad_token_id, include_alt_fields=True
    )
    rng = np.random.default_rng(0)

    feats = []
    for i in range(2):
        f = processor(
            text="transcribe <|audio|> okay then",
            audio=(rng.standard_normal(8000) * 0.1).astype(np.float32),
        )
        labels = np.asarray(f["input_ids"][0]).copy()
        labels[:-4] = -100  # supervise the last 4 tokens
        f["labels"] = labels
        alt = processor(text="transcribe words okay then")
        f["alt_input_ids"] = alt["input_ids"][0]
        alt_labels = np.asarray(alt["input_ids"][0]).copy()
        alt_labels[:-4] = -100
        f["alt_labels"] = alt_labels
        feats.append(f)
    batch = {k: jnp.asarray(v) for k, v in coll(feats).items()}
    return cfg, params, batch


def test_partition_merge_roundtrip(setup):
    cfg, params, _ = setup
    mask = ts.trainable_mask(params)
    trainable, frozen = ts.partition_params(params, mask)
    assert all("projector" in k for k in trainable)
    assert len(trainable) >= 3
    template = jax.tree.map(lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), params)
    rebuilt = ts.merge_params(template, trainable, frozen)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        params,
        rebuilt,
    )


def test_ce_training_decreases_loss_and_freezes_backbone(setup):
    cfg, params, batch = setup
    opt = ts.make_optimizer(1e-2, warmup_steps=0, total_steps=50, schedule="constant")
    state, template = ts.init_train_state(params, opt)
    step = jax.jit(
        ts.make_train_step(
            cfg, LossConfig(), opt, template, remat=False
        )
    )
    frozen_before = jax.tree.map(lambda x: np.asarray(x).copy(), state.frozen)
    losses = []
    for _ in range(15):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    # only the projector trains (frozen backbone), so gains are modest but
    # must be monotonic-ish and real
    assert losses[-1] < losses[0] - 0.1, losses
    # frozen subtree must be bit-identical
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), b),
        state.frozen,
        frozen_before,
    )
    assert int(state.step) == 15


def test_kl_training_runs_and_decreases(setup):
    cfg, params, batch = setup
    loss_cfg = LossConfig(loss_function=LossFunction.KL_DIVERGENCE)
    opt = ts.make_optimizer(1e-2, warmup_steps=0, total_steps=50, schedule="constant")
    state, template = ts.init_train_state(params, opt)
    step = jax.jit(ts.make_train_step(cfg, loss_cfg, opt, template, remat=False))
    losses = []
    for _ in range(10):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_unfreeze_patterns(setup):
    cfg, params, _ = setup
    mask = ts.trainable_mask(
        params,
        trainable_patterns=(r".*projector/.*", r".*audio_tower/layers/fc1/.*"),
    )
    trainable, frozen = ts.partition_params(params, mask)
    assert any("fc1" in k for k in trainable)
    assert not any("fc2" in k for k in trainable)


def test_eval_step_weighted_loss(setup):
    cfg, params, batch = setup
    opt = ts.make_optimizer(1e-3)
    state, template = ts.init_train_state(params, opt)
    eval_step = jax.jit(ts.make_eval_step(cfg, LossConfig(), template))
    loss_sum, count = eval_step(state, batch)
    assert float(count) == 8  # 4 supervised tokens × 2 samples
    assert np.isfinite(float(loss_sum))


def test_full_finetune_bf16_all_params_differentiable(setup):
    """Unfreezing EVERYTHING (encoder convs included) at bf16 must trace and
    produce finite, nonzero conv-kernel grads on both attention impls.

    Regression: lax.conv_general_dilated's transpose rule rejects the mixed
    bf16-activation/fp32-cotangent dtypes that preferred_element_type
    produces, which made any full-encoder finetune at bf16 untraceable —
    whisper_encoder._conv1d now uses a shifted-slice matmul instead."""
    cfg, params, batch = setup
    params16 = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if jnp.issubdtype(x.dtype, jnp.floating)
        else x,
        params,
    )
    lc = LossConfig()
    for impl in ("xla", "flash"):
        val, grads = jax.value_and_grad(
            lambda p: uv.ultravox_loss(
                p, cfg, batch, lc, remat=True, attn_impl=impl
            )
        )(params16)
        assert np.isfinite(float(val))
        g_conv = grads["audio_tower"]["conv1"]["kernel"]
        assert float(jnp.sum(jnp.abs(g_conv.astype(jnp.float32)))) > 0


@pytest.mark.parametrize("loss_fn", ["ce", "kl"])
def test_chunked_vocab_loss_matches_dense(setup, loss_fn):
    """vocab_chunk computes the loss from hidden states (logits one chunk at
    a time); value AND gradients must match the dense path."""
    cfg, params, batch = setup
    lc = (
        LossConfig()
        if loss_fn == "ce"
        else LossConfig(loss_function=LossFunction.KL_DIVERGENCE)
    )

    def dense(p):
        return uv.ultravox_loss(p, cfg, batch, lc, remat=True)

    def chunked(p):
        return uv.ultravox_loss(p, cfg, batch, lc, remat=True, vocab_chunk=16)

    l_d, g_d = jax.value_and_grad(dense)(params)
    l_c, g_c = jax.value_and_grad(chunked)(params)
    np.testing.assert_allclose(float(l_c), float(l_d), rtol=2e-6)
    for a, b in zip(jax.tree.leaves(g_c), jax.tree.leaves(g_d)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-4
        )


def test_eval_step_chunked_matches_dense(setup):
    cfg, params, batch = setup
    import optax

    opt = optax.adamw(1e-3)
    state, template = ts.init_train_state(params, opt)
    dense = jax.jit(ts.make_eval_step(cfg, LossConfig(), template))
    chunked = jax.jit(
        ts.make_eval_step(cfg, LossConfig(), template, vocab_chunk=16)
    )
    s_d, c_d = dense(state, batch)
    s_c, c_c = chunked(state, batch)
    assert int(c_d) == int(c_c)
    np.testing.assert_allclose(float(s_c), float(s_d), rtol=2e-6)
