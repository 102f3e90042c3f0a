"""Checkpoint-loading semantics: base-first/checkpoint-last order, strict
failure on underspecified diff checkpoints, partial (per-key) overlay, and
Gemma-3 layer-schedule config parsing.

Reference order: construct sub-models then load_state_dict last
(ultravox_infer.py:55-64, model_types.py:227-282)."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.helpers import make_tiny_tokenizer
from ultravox_tpu.models import (
    DecoderConfig,
    UltravoxConfig,
    WhisperEncoderConfig,
)
from ultravox_tpu.models import ultravox as uv
from ultravox_tpu.models import weights as weights_lib
from ultravox_tpu.tools.publish import _encoder_to_hf, save_pretrained


def _tiny_cfg(**kw):
    return UltravoxConfig(
        audio_config=WhisperEncoderConfig(
            d_model=32, num_layers=2, num_heads=2, ffn_dim=64
        ),
        text_config=DecoderConfig(
            vocab_size=384, hidden_size=48, intermediate_size=96,
            num_layers=2, num_heads=4, num_kv_heads=2, head_dim=12,
        ),
        hidden_size=64,
        **kw,
    )


def _write_base_dirs(tmp_path, cfg, params):
    """Write standalone text/audio base checkpoints in HF naming."""
    import safetensors.numpy

    text_dir = tmp_path / "text_base"
    audio_dir = tmp_path / "audio_base"
    os.makedirs(text_dir); os.makedirs(audio_dir)
    safetensors.numpy.save_file(
        {k: np.ascontiguousarray(v) for k, v in weights_lib.decoder_to_hf(
            params["language_model"], cfg.text_config).items()},
        str(text_dir / "model.safetensors"),
    )
    safetensors.numpy.save_file(
        {k: np.ascontiguousarray(v) for k, v in _encoder_to_hf(
            params["audio_tower"], cfg).items()},
        str(audio_dir / "model.safetensors"),
    )
    return str(text_dir), str(audio_dir)


@pytest.fixture(scope="module")
def trees():
    cfg = _tiny_cfg()
    trained = uv.init_params(cfg, jax.random.key(1))
    base = uv.init_params(cfg, jax.random.key(2))
    return cfg, trained, base


def test_full_checkpoint_wins_over_base_ids(tmp_path, trees):
    """A FULL checkpoint with trained tower weights must not be reverted to
    the text_model_id/audio_model_id base weights (round-1 high advisory)."""
    from ultravox_tpu.inference.ultravox_infer import load_ultravox_checkpoint

    cfg, trained, base = trees
    text_dir, audio_dir = _write_base_dirs(tmp_path, cfg, base)
    cfg_ids = _tiny_cfg(text_model_id=text_dir, audio_model_id=audio_dir)
    ckpt = save_pretrained(
        trained, cfg_ids, str(tmp_path / "full_ckpt"), make_tiny_tokenizer()
    )
    _, params, _ = load_ultravox_checkpoint(ckpt, jnp.float32)
    np.testing.assert_allclose(
        np.asarray(params["language_model"]["norm"]),
        np.asarray(trained["language_model"]["norm"]), atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(params["audio_tower"]["conv1"]["bias"]),
        np.asarray(trained["audio_tower"]["conv1"]["bias"]), atol=1e-6,
    )


def test_diff_checkpoint_uses_bases(tmp_path, trees):
    """An adapter-only checkpoint takes the towers from the base ids and the
    projector from the checkpoint."""
    from ultravox_tpu.inference.ultravox_infer import load_ultravox_checkpoint

    cfg, trained, base = trees
    text_dir, audio_dir = _write_base_dirs(tmp_path, cfg, base)
    cfg_ids = _tiny_cfg(text_model_id=text_dir, audio_model_id=audio_dir)
    ckpt = save_pretrained(
        trained, cfg_ids, str(tmp_path / "diff_ckpt"), make_tiny_tokenizer(),
        diff_only=True,
    )
    _, params, _ = load_ultravox_checkpoint(ckpt, jnp.float32)
    np.testing.assert_allclose(
        np.asarray(params["projector"]["linear_1"]["kernel"]),
        np.asarray(trained["projector"]["linear_1"]["kernel"]), atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(params["language_model"]["norm"]),
        np.asarray(base["language_model"]["norm"]), atol=1e-6,
    )


def test_diff_checkpoint_without_bases_fails_loudly(tmp_path, trees):
    """A diff checkpoint whose base ids don't resolve must raise, not serve
    random-init towers (round-1 medium advisory on api_server)."""
    from ultravox_tpu.inference.ultravox_infer import load_ultravox_checkpoint

    cfg, trained, _ = trees
    ckpt = save_pretrained(
        trained, cfg, str(tmp_path / "orphan_diff"), make_tiny_tokenizer(),
        diff_only=True,
    )
    with pytest.raises(ValueError, match="random init"):
        load_ultravox_checkpoint(ckpt, jnp.float32)
    # non-strict mode still loads (for tooling/debugging)
    _, params, _ = load_ultravox_checkpoint(ckpt, jnp.float32, strict=False)
    assert "projector" in params


def test_partial_overlay_merges_per_key(trees):
    """Diff checkpoints covering only some tower params (unfreeze_layers /
    selective model_load_parameters) overlay onto the base tree per-key."""
    cfg, trained, base = trees
    sd = {
        "language_model.model.layers.1.self_attn.q_proj.weight":
            np.asarray(trained["language_model"]["layers"]["q_proj"]["kernel"][1]).T,
        "language_model.model.embed_tokens.weight":
            np.asarray(trained["language_model"]["embed_tokens"]),
        "audio_tower.layers.0.fc1.weight":
            np.asarray(trained["audio_tower"]["layers"]["fc1"]["kernel"][0]).T,
        "audio_tower.layers.0.fc1.bias":
            np.asarray(trained["audio_tower"]["layers"]["fc1"]["bias"][0]),
    }
    merged = weights_lib.convert_ultravox(
        sd, cfg, jnp.float32, base=jax.tree.map(lambda x: x, base)
    )
    lm = merged["language_model"]
    np.testing.assert_allclose(
        np.asarray(lm["layers"]["q_proj"]["kernel"][1]),
        np.asarray(trained["language_model"]["layers"]["q_proj"]["kernel"][1]),
        atol=1e-6,
    )
    # untouched layer stays at base values
    np.testing.assert_allclose(
        np.asarray(lm["layers"]["q_proj"]["kernel"][0]),
        np.asarray(base["language_model"]["layers"]["q_proj"]["kernel"][0]),
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(lm["embed_tokens"]),
        np.asarray(trained["language_model"]["embed_tokens"]), atol=1e-6,
    )
    enc = merged["audio_tower"]
    np.testing.assert_allclose(
        np.asarray(enc["layers"]["fc1"]["kernel"][0]),
        np.asarray(trained["audio_tower"]["layers"]["fc1"]["kernel"][0]),
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(enc["layers"]["fc1"]["kernel"][1]),
        np.asarray(base["audio_tower"]["layers"]["fc1"]["kernel"][1]),
        atol=1e-6,
    )
    # the input trees are not mutated
    assert np.abs(
        np.asarray(base["language_model"]["embed_tokens"])
        - np.asarray(trained["language_model"]["embed_tokens"])
    ).max() > 1e-3


def test_partial_overlay_without_base_warns_and_skips(trees, caplog):
    cfg, trained, _ = trees
    sd = {
        "language_model.model.layers.0.self_attn.q_proj.weight":
            np.zeros((48, 48), np.float32),
    }
    import logging

    with caplog.at_level(logging.WARNING):
        out = weights_lib.convert_ultravox(sd, cfg, jnp.float32, base={})
    assert "language_model" not in out
    assert any("IGNORED" in rec.message for rec in caplog.records)


# ---------------------------------------------------------------- config


def test_gemma3_layer_types_schedule():
    from ultravox_tpu.models.decoder import is_local_layer

    d = {
        "model_type": "gemma3_text",
        "num_hidden_layers": 4,
        "sliding_window": 512,
        "layer_types": [
            "sliding_attention", "full_attention",
            "sliding_attention", "full_attention",
        ],
    }
    cfg = DecoderConfig.from_hf_dict(d)
    np.testing.assert_array_equal(
        is_local_layer(cfg), [True, False, True, False]
    )


def test_gemma3_default_pattern_six():
    from ultravox_tpu.models.decoder import is_local_layer

    d = {
        "model_type": "gemma3_text",
        "num_hidden_layers": 12,
        "sliding_window": 512,
    }
    cfg = DecoderConfig.from_hf_dict(d)
    assert cfg.sliding_window_pattern == 6
    loc = is_local_layer(cfg)
    assert not loc[5] and not loc[11]  # every 6th layer global
    assert loc[:5].all() and loc[6:11].all()


def test_gemma2_config_parsing():
    cfg = DecoderConfig.from_hf_dict({
        "model_type": "gemma2",
        "num_hidden_layers": 4,
        "sliding_window": 512,
        "attn_logit_softcapping": 50.0,
        "final_logit_softcapping": 30.0,
        "query_pre_attn_scalar": 224,
    })
    assert cfg.arch == "gemma2"
    assert not cfg.qk_norm and cfg.use_post_norms and cfg.scale_embeddings
    assert cfg.attn_logit_softcapping == 50.0
    assert cfg.sliding_window_pattern == 2  # even layers sliding, odd global
    from ultravox_tpu.models.decoder import is_local_layer

    np.testing.assert_array_equal(
        is_local_layer(cfg), [True, False, True, False]
    )


def test_layer_types_roundtrip_through_publish():
    from ultravox_tpu.tools.publish import _text_config_to_hf

    cfg = DecoderConfig.from_hf_dict({
        "model_type": "gemma3_text",
        "num_hidden_layers": 2,
        "sliding_window": 512,
        "layer_types": ["sliding_attention", "full_attention"],
    })
    out = _text_config_to_hf(cfg)
    cfg2 = DecoderConfig.from_hf_dict(out)
    assert cfg2.layer_is_local == (True, False)
