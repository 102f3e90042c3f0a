"""Differentiable flash-attention kernel: forward and VJP parity vs the XLA
einsum path (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ultravox_tpu.ops.attention import NEG_INF, mha
from ultravox_tpu.ops.pallas.flash_attention import flash_attention


def _xla_ref(q, k, v, lengths=None, causal=False, window=0, latency_block=0,
             scale=None):
    B, T, H, D = q.shape
    S = k.shape[1]
    bias = jnp.zeros((B, 1, T, S), jnp.float32)
    kpos = jnp.arange(S)[None, None, None, :]
    qpos = jnp.arange(T)[None, None, :, None]
    ok = jnp.ones((B, 1, T, S), bool)
    if lengths is not None:
        ok &= kpos < lengths[:, None, None, None]
    if causal:
        ok &= kpos <= qpos
        if window:
            ok &= qpos - kpos < window
    if latency_block:
        ok &= (kpos // latency_block) <= (qpos // latency_block)
    bias = jnp.where(ok, 0.0, NEG_INF)
    return mha(q, k, v, bias=bias, scale=scale)


CASES = [
    dict(name="plain", lengths=None, causal=False, window=0, latency_block=0),
    dict(name="lengths", lengths=(11, 16), causal=False, window=0, latency_block=0),
    dict(name="causal", lengths=None, causal=True, window=0, latency_block=0),
    dict(name="causal+len+win", lengths=(13, 16), causal=True, window=5,
         latency_block=0),
    dict(name="latency", lengths=(16, 9), causal=False, window=0,
         latency_block=4),
]


@pytest.mark.parametrize("case", CASES, ids=[c["name"] for c in CASES])
def test_forward_parity(case):
    rng = np.random.default_rng(0)
    B, T, H, Hkv, D = 2, 16, 4, 2, 8
    q = jnp.asarray(rng.standard_normal((B, T, H, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, T, Hkv, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, T, Hkv, D)), jnp.float32)
    lengths = (
        jnp.asarray(case["lengths"], jnp.int32)
        if case["lengths"] is not None
        else None
    )
    out = flash_attention(
        q, k, v, lengths, causal=case["causal"], window=case["window"],
        latency_block=case["latency_block"], block_q=8,
    )
    ref = _xla_ref(
        q, k, v, lengths, causal=case["causal"], window=case["window"],
        latency_block=case["latency_block"],
    )
    # rows with no valid key (length-masked query rows) are garbage in both
    # implementations; compare only rows below the max plausible validity
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.parametrize(
    "case", CASES[:4], ids=[c["name"] for c in CASES[:4]]
)
def test_grad_parity(case):
    rng = np.random.default_rng(1)
    B, T, H, Hkv, D = 2, 16, 4, 2, 8
    q = jnp.asarray(rng.standard_normal((B, T, H, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, T, Hkv, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, T, Hkv, D)), jnp.float32)
    lengths = (
        jnp.asarray(case["lengths"], jnp.int32)
        if case["lengths"] is not None
        else None
    )
    tgt = jnp.asarray(rng.standard_normal((B, T, H, D)), jnp.float32)

    def loss_flash(q, k, v):
        o = flash_attention(
            q, k, v, lengths, causal=case["causal"], window=case["window"],
            latency_block=case["latency_block"], block_q=8,
        )
        return jnp.sum((o - tgt) ** 2)

    def loss_ref(q, k, v):
        o = _xla_ref(
            q, k, v, lengths, causal=case["causal"], window=case["window"],
            latency_block=case["latency_block"],
        )
        return jnp.sum((o - tgt) ** 2)

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_flash, g_ref, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5,
            err_msg=f"d{name} mismatch",
        )


def test_rejects_cross_attention_shapes():
    q = jnp.zeros((1, 4, 2, 8))
    k = jnp.zeros((1, 6, 2, 8))
    with pytest.raises(ValueError, match="self-attention"):
        flash_attention(q, k, k)


def test_encoder_forward_flash_matches_xla():
    """encoder_forward(attn_impl='flash') is differentiable and matches the
    XLA path, including length + latency masking."""
    from ultravox_tpu.models import WhisperEncoderConfig, whisper_encoder

    cfg = WhisperEncoderConfig(
        num_mel_bins=80, d_model=32, num_layers=2, num_heads=2,
        ffn_dim=64, max_source_positions=64,
    )
    params = whisper_encoder.init_params(cfg, jax.random.key(0), jnp.float32)
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.standard_normal((2, 80, 128)), jnp.float32)
    lens = jnp.asarray([128, 70], jnp.int32)

    for lat in (None, 16):
        ref = whisper_encoder.encoder_forward(
            params, cfg, mel, lens, attn_impl="xla", latency_block_size=lat
        )
        out = whisper_encoder.encoder_forward(
            params, cfg, mel, lens, attn_impl="flash", latency_block_size=lat
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=3e-5
        )

    def loss(p):
        o = whisper_encoder.encoder_forward(
            p, cfg, mel, lens, attn_impl="flash"
        )
        return jnp.sum(o**2)

    g = jax.grad(loss)(params)

    def loss_x(p):
        o = whisper_encoder.encoder_forward(p, cfg, mel, lens, attn_impl="xla")
        return jnp.sum(o**2)

    gx = jax.grad(loss_x)(params)
    for a, b in zip(jax.tree.leaves(g), jax.tree.leaves(gx)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-3, rtol=2e-3
        )


def _tiny_cfg(**kw):
    from ultravox_tpu.models import DecoderConfig, UltravoxConfig, WhisperEncoderConfig

    return UltravoxConfig(
        text_config=DecoderConfig(
            arch=kw.pop("arch", "llama"), vocab_size=96, hidden_size=32,
            intermediate_size=64, num_layers=2, num_heads=2, num_kv_heads=2,
            head_dim=16, **kw,
        ),
        audio_config=WhisperEncoderConfig(
            num_mel_bins=80, d_model=32, num_layers=2, num_heads=2,
            ffn_dim=64, max_source_positions=64,
        ),
        stack_factor=8,
    )


def _tiny_batch(rng, B=2, T=24):
    ids = rng.integers(1, 96, (B, T)).astype(np.int32)
    mask = np.ones((B, T), np.int32)
    mask[1, -6:] = 0
    labels = ids.copy()
    labels[:, :4] = -100
    labels[mask == 0] = -100
    n_mel = 64
    return {
        "input_ids": ids,
        "attention_mask": mask,
        "labels": labels,
        "audio_values": rng.standard_normal((B, 80, n_mel)).astype(np.float32),
        "audio_lens": np.asarray([n_mel, 40], np.int32),
        "audio_token_len": np.asarray([4, 3], np.int32),
        "audio_token_start_idx": np.asarray([2, 2], np.int32),
        "audio_chunk_batch_idx": np.asarray([0, 1], np.int32),
    }


def test_training_loss_and_grads_flash_vs_xla():
    """ultravox_loss(attn_impl='flash') matches the XLA path in value and
    gradients (both towers on the kernel path)."""
    from ultravox_tpu.models import ultravox as uv
    from ultravox_tpu.models.config import LossConfig

    cfg = _tiny_cfg()
    params = uv.init_params(cfg, jax.random.key(0), jnp.float32)
    rng = np.random.default_rng(0)
    batch = {k: jnp.asarray(v) for k, v in _tiny_batch(rng).items()}
    lc = LossConfig()

    def loss(p, impl):
        return uv.ultravox_loss(p, cfg, batch, lc, attn_impl=impl)

    l_x, g_x = jax.value_and_grad(loss)(params, "xla")
    l_f, g_f = jax.value_and_grad(loss)(params, "flash")
    np.testing.assert_allclose(float(l_f), float(l_x), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(g_f), jax.tree.leaves(g_x)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-3
        )


def test_decoder_flash_sliding_window_parity():
    """Mistral-style all-local sliding-window layers take the in-kernel
    window path and match the XLA biases."""
    from ultravox_tpu.models import decoder as decoder_lib

    from ultravox_tpu.models import DecoderConfig

    cfg = DecoderConfig(
        arch="mistral", vocab_size=96, hidden_size=32, intermediate_size=64,
        num_layers=2, num_heads=2, num_kv_heads=2, head_dim=16,
        sliding_window=8,
    )
    params = decoder_lib.init_params(cfg, jax.random.key(1), jnp.float32)
    rng = np.random.default_rng(2)
    B, T = 2, 24
    ids = jnp.asarray(rng.integers(1, 96, (B, T)), jnp.int32)
    positions = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32)[None], (B, T))
    lens = jnp.asarray([T, 17], jnp.int32)

    ref, _ = decoder_lib.decoder_forward(
        params, cfg, input_ids=ids, positions=positions, kv_valid_len=lens
    )
    out, _ = decoder_lib.decoder_forward(
        params, cfg, input_ids=ids, positions=positions, kv_valid_len=lens,
        attn_impl="flash",
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=5e-5, rtol=1e-4
    )


def test_train_step_runs_with_flash():
    """make_train_step(attn_impl='flash') runs end to end (remat + custom
    VJP compose)."""
    import optax

    from ultravox_tpu.models import ultravox as uv
    from ultravox_tpu.models.config import LossConfig
    from ultravox_tpu.training import train_step as ts

    cfg = _tiny_cfg()
    params = uv.init_params(cfg, jax.random.key(0), jnp.float32)
    opt = optax.adamw(1e-3)
    state, template = ts.init_train_state(
        params, opt, trainable_patterns=(r".*projector/.*",)
    )
    step = ts.make_train_step(
        cfg, LossConfig(), opt, template, remat=True, attn_impl="flash"
    )
    rng = np.random.default_rng(1)
    batch = {k: jnp.asarray(v) for k, v in _tiny_batch(rng).items()}
    state2, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["grad_norm"]) > 0
