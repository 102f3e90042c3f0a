"""Pallas kernel correctness in interpret mode (CPU CI). Compiled-mode parity
is exercised on real TPU by bench.py and the TPU drive scripts."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ultravox_tpu.ops.attention import block_causal_bias, length_mask_bias, mha
from ultravox_tpu.ops.pallas.fused_attention import fused_attention, supports_shape


@pytest.fixture(scope="module")
def qkv():
    B, T, H, D = 2, 256, 4, 64
    q = jax.random.normal(jax.random.key(0), (B, T, H, D), jnp.float32)
    k = jax.random.normal(jax.random.key(1), (B, T, H, D), jnp.float32)
    v = jax.random.normal(jax.random.key(2), (B, T, H, D), jnp.float32)
    return q, k, v


def test_length_mask_parity(qkv):
    q, k, v = qkv
    lens = jnp.asarray([256, 100], jnp.int32)
    ref = mha(q, k, v, bias=length_mask_bias(lens, 256))
    out = fused_attention(q, k, v, lens, interpret=True, block_q=128)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_causal_parity(qkv):
    q, k, v = qkv
    ref = mha(q, k, v, is_causal=True)
    out = fused_attention(q, k, v, causal=True, interpret=True, block_q=128)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_gqa_parity(qkv):
    q, k, v = qkv
    k2, v2 = k[:, :, :2], v[:, :, :2]
    ref = mha(q, k2, v2)
    out = fused_attention(q, k2, v2, interpret=True, block_q=128)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_latency_block_parity(qkv):
    q, k, v = qkv
    ref = mha(q, k, v, bias=block_causal_bias(256, 64))
    out = fused_attention(q, k, v, latency_block=64, interpret=True, block_q=128)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_unaligned_t_padding(qkv):
    q, k, v = qkv
    q_odd = q[:, :200]
    ref = mha(q_odd, k, v)
    out = fused_attention(q_odd, k, v, interpret=True, block_q=128)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_encoder_fused_matches_xla(qkv):
    from ultravox_tpu.models import WhisperEncoderConfig, whisper_encoder

    cfg = WhisperEncoderConfig(d_model=64, num_layers=2, num_heads=4, ffn_dim=128)
    params = whisper_encoder.init_params(cfg, jax.random.key(3))
    mel = jax.random.normal(jax.random.key(4), (2, 80, 256), jnp.float32)
    lens = jnp.asarray([256, 120], jnp.int32)
    ref = whisper_encoder.encoder_forward(params, cfg, mel, lens)
    # interpret-mode pallas inside the encoder path
    import ultravox_tpu.ops.pallas.fused_attention as fa
    import functools

    orig = fa.fused_attention
    fa_interp = functools.partial(orig, interpret=True, block_q=128)
    fa.fused_attention = fa_interp
    try:
        out = whisper_encoder.encoder_forward(
            params, cfg, mel, lens, attn_impl="fused"
        )
    finally:
        fa.fused_attention = orig
    n0 = whisper_encoder.feat_extract_output_length(256)
    n1 = whisper_encoder.feat_extract_output_length(120)
    np.testing.assert_allclose(
        np.asarray(out)[0, :n0], np.asarray(ref)[0, :n0], atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(out)[1, :n1], np.asarray(ref)[1, :n1], atol=1e-4
    )


def test_supports_shape():
    assert supports_shape(3000, 64)
    assert not supports_shape(200_000, 128)
