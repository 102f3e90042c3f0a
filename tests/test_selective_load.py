"""Selective checkpoint loading via fnmatch patterns
(reference: model_load_parameters, model_types.py:252-275)."""

import numpy as np

import jax
import jax.numpy as jnp


def test_selective_load(tmp_path):
    from tests.helpers import make_tiny_tokenizer
    from ultravox_tpu.models import UltravoxConfig, WhisperEncoderConfig, DecoderConfig
    from ultravox_tpu.models import ultravox as uv
    from ultravox_tpu.tools.publish import save_pretrained
    from ultravox_tpu.training.config import TrainConfig
    from ultravox_tpu.training.model_factory import create_model_pack

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
    src_params = uv.init_params(cfg, jax.random.key(7))
    ckpt = save_pretrained(src_params, cfg, str(tmp_path / "ckpt"))
    tok_dir = tmp_path / "tok"
    make_tiny_tokenizer().save_pretrained(str(tok_dir))

    common = dict(
        tokenizer_path=str(tok_dir),
        text_model_config={
            "model_type": "llama", "vocab_size": 384, "hidden_size": 48,
            "intermediate_size": 96, "num_hidden_layers": 2,
            "num_attention_heads": 4, "num_key_value_heads": 2,
        },
        audio_model_config={
            "model_type": "whisper", "num_mel_bins": 80, "d_model": 32,
            "encoder_layers": 1, "encoder_attention_heads": 2,
            "encoder_ffn_dim": 64,
        },
        projector_hidden_size=64,
        param_dtype="float32",
        data_sets=["synthetic-asr"],
        seed=0,
    )
    # full load: projector matches the checkpoint
    pack_full = create_model_pack(
        TrainConfig(model_load_dir=ckpt, **common)
    )
    np.testing.assert_allclose(
        np.asarray(pack_full.params["projector"]["linear_1"]["kernel"]),
        np.asarray(src_params["projector"]["linear_1"]["kernel"]),
        atol=1e-6,
    )
    # selective load excluding the projector: projector stays random-init
    pack_sel = create_model_pack(
        TrainConfig(
            model_load_dir=ckpt,
            model_load_parameters=["language_model.*"],
            **common,
        )
    )
    diff = np.abs(
        np.asarray(pack_sel.params["projector"]["linear_1"]["kernel"])
        - np.asarray(src_params["projector"]["linear_1"]["kernel"])
    ).max()
    assert diff > 1e-3  # not loaded
    np.testing.assert_allclose(
        np.asarray(pack_sel.params["language_model"]["norm"]),
        np.asarray(src_params["language_model"]["norm"]),
        atol=1e-6,
    )
