"""Wav2Vec2 audio-tower parity vs transformers (reference accepts wav2vec2
ids as the audio tower, ultravox_model.py:440-497)."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from ultravox_tpu.models import wav2vec2_encoder as w2v
from ultravox_tpu.models import weights as weights_lib


def _make(norm_style: str):
    import transformers

    torch.manual_seed(0)
    hf_cfg = transformers.Wav2Vec2Config(
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=128,
        conv_dim=(32, 32, 32),
        conv_kernel=(10, 3, 2),
        conv_stride=(5, 2, 2),
        conv_bias=norm_style == "layer",
        feat_extract_norm=norm_style,
        do_stable_layer_norm=norm_style == "layer",
        num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4,
    )
    model = transformers.Wav2Vec2Model(hf_cfg).eval()
    cfg = w2v.Wav2Vec2EncoderConfig.from_hf_dict(hf_cfg.to_dict())
    params = weights_lib.convert_wav2vec2_encoder(
        weights_lib.from_torch_state_dict(model.state_dict()), cfg
    )
    return model, cfg, params


@pytest.mark.parametrize("norm_style", ["group", "layer"])
def test_wav2vec2_parity(norm_style):
    model, cfg, params = _make(norm_style)
    rng = np.random.default_rng(0)
    audio = (rng.standard_normal((2, 4000)) * 0.1).astype(np.float32)

    with torch.no_grad():
        ref = model(torch.from_numpy(audio)).last_hidden_state.numpy()
    ours = np.asarray(
        w2v.encoder_forward(params, cfg, jnp.asarray(audio))
    )
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-4)


def test_wav2vec2_length_masking():
    model, cfg, params = _make("group")
    rng = np.random.default_rng(1)
    full = (rng.standard_normal((1, 3000)) * 0.1).astype(np.float32)
    # padded batch: row 0 has 3000 valid samples, tail zeros
    padded = np.zeros((1, 4500), np.float32)
    padded[:, :3000] = full

    n_valid = int(cfg.feature_lengths(np.asarray(3000)))
    with torch.no_grad():
        mask = torch.zeros(1, 4500, dtype=torch.long)
        mask[:, :3000] = 1
        ref = model(
            torch.from_numpy(padded), attention_mask=mask
        ).last_hidden_state.numpy()
    ours = np.asarray(
        w2v.encoder_forward(
            params, cfg, jnp.asarray(padded), jnp.asarray([3000])
        )
    )
    np.testing.assert_allclose(
        ours[:, :n_valid], ref[:, :n_valid], atol=2e-4
    )


def test_feature_lengths_match_hf():
    import transformers

    hf_cfg = transformers.Wav2Vec2Config()
    cfg = w2v.Wav2Vec2EncoderConfig.from_hf_dict(hf_cfg.to_dict())
    model = transformers.Wav2Vec2Model(hf_cfg)
    for n in (400, 1600, 16000, 48000):
        ref = int(model._get_feat_extract_output_lengths(n))
        assert int(cfg.feature_lengths(np.asarray(n))) == ref


def test_composite_with_wav2vec2_tower(tmp_path):
    """Full pipeline with a wav2vec2 audio tower: processor -> composite
    forward -> generation -> publish/load round-trip."""
    import jax
    import transformers

    from tests.helpers import make_tiny_tokenizer
    from ultravox_tpu.models import ultravox as uv
    from ultravox_tpu.models.config import DecoderConfig, UltravoxConfig
    from ultravox_tpu.models.processor import (
        DataCollatorWithAudio,
        UltravoxProcessor,
    )

    model_t, w_cfg, w_params = _make("group")
    hf_llama = transformers.LlamaConfig(
        vocab_size=384, hidden_size=48, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=512,
    )
    llm_t = transformers.LlamaForCausalLM(hf_llama).eval()
    cfg = UltravoxConfig(
        audio_config=w_cfg,
        text_config=DecoderConfig.from_hf_dict(hf_llama.to_dict()),
        hidden_size=64,
        stack_factor=8,
    )
    assert cfg.audio_arch == "wav2vec2"
    params = uv.init_params(cfg, jax.random.key(0))
    params["audio_tower"] = w_params
    params["language_model"] = weights_lib.convert_decoder(
        weights_lib.from_torch_state_dict(llm_t.state_dict()), cfg.text_config
    )

    tokenizer = make_tiny_tokenizer()
    processor = UltravoxProcessor(
        tokenizer, stack_factor=8, audio_arch="wav2vec2",
        wav2vec2_config=w_cfg, normalize_audio=False,
    )
    rng = np.random.default_rng(0)
    audio = (rng.standard_normal(4000) * 0.1).astype(np.float32)
    feats = processor(text="transcribe <|audio|> now", audio=audio)
    # token count matches the conv formula
    n_frames = int(w_cfg.feature_lengths(np.asarray(4000)))
    assert feats["audio_token_len"][0] == -(-n_frames // 8)
    assert feats["audio_values"].shape == (1, 1, 4000)

    coll = DataCollatorWithAudio(pad_token_id=tokenizer.pad_token_id)
    batch = coll([feats])

    # torch oracle: wav2vec2 encoder + projector math + llama splice
    def rms(x, w, eps=1e-6):
        return x * torch.rsqrt(x.pow(2).mean(-1, keepdim=True) + eps) * w

    with torch.no_grad():
        enc = model_t(torch.from_numpy(audio[None])).last_hidden_state
        S = 8
        B, T, C = enc.shape
        T_pad = (T + S - 1) // S * S
        h = torch.nn.functional.pad(enc, (0, 0, 0, T_pad - T))
        h = h.reshape(B, T_pad // S, C * S)
        pp = params["projector"]
        h = rms(h, torch.from_numpy(np.asarray(pp["ln_pre"])))
        h = h @ torch.from_numpy(np.asarray(pp["linear_1"]["kernel"]))
        val, gate = h.chunk(2, dim=-1)
        h = torch.nn.functional.silu(gate) * val
        h = h @ torch.from_numpy(np.asarray(pp["linear_2"]["kernel"]))
        audio_embeds = rms(h, torch.from_numpy(np.asarray(pp["ln_post"])))
        ids = torch.from_numpy(np.asarray(batch["input_ids"])).long()
        embeds = llm_t.get_input_embeddings()(ids)
        s = int(batch["audio_token_start_idx"][0])
        n = int(batch["audio_token_len"][0])
        embeds[0, s : s + n] = audio_embeds[0][:n]
        ref = llm_t(
            inputs_embeds=embeds,
            attention_mask=torch.from_numpy(np.asarray(batch["attention_mask"])),
        ).logits.numpy()

    import jax.numpy as jnp2

    ours = np.asarray(
        uv.ultravox_forward(
            params, cfg, {k: jnp2.asarray(v) for k, v in batch.items()}
        )
    )
    n_valid = int(batch["attention_mask"][0].sum())
    np.testing.assert_allclose(ours[0, :n_valid], ref[0, :n_valid], atol=5e-4)

    # generation end-to-end
    from ultravox_tpu.inference.infer import LocalInference

    inf = LocalInference(params, cfg, processor, max_cache_len=256)
    from ultravox_tpu.data.sample import VoiceSample

    out = inf.infer(
        VoiceSample(
            messages=[{"role": "user", "content": "transcribe <|audio|>"}],
            audio=audio,
        ),
        max_tokens=6,
    )
    assert isinstance(out.text, str) and out.output_tokens > 0

    # publish -> strict load round-trip keeps the wav2vec2 tower
    from ultravox_tpu.inference.ultravox_infer import load_ultravox_checkpoint
    from ultravox_tpu.tools.publish import save_pretrained

    ckpt = save_pretrained(params, cfg, str(tmp_path / "w2v_ckpt"), tokenizer)
    cfg2, params2, _ = load_ultravox_checkpoint(ckpt, jnp.float32)
    assert cfg2.audio_arch == "wav2vec2"
    np.testing.assert_allclose(
        np.asarray(params2["audio_tower"]["feature_projection"]["projection"]["kernel"]),
        np.asarray(params["audio_tower"]["feature_projection"]["projection"]["kernel"]),
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(params2["audio_tower"]["pos_conv"]["kernel"]),
        np.asarray(params["audio_tower"]["pos_conv"]["kernel"]),
        atol=1e-5,
    )


def test_wav2vec2_mixed_length_batch_collation():
    """Regression: the collator's whisper 3000-frame cap crashed np.stack on
    mixed-length raw-sample (wav2vec2) batches."""
    from tests.helpers import make_tiny_tokenizer
    from ultravox_tpu.models.processor import (
        DataCollatorWithAudio,
        UltravoxProcessor,
    )

    _, w_cfg, _ = _make("group")
    tokenizer = make_tiny_tokenizer()
    processor = UltravoxProcessor(
        tokenizer, audio_arch="wav2vec2", wav2vec2_config=w_cfg
    )
    rng = np.random.default_rng(0)
    f1 = processor(
        text="a <|audio|> b",
        audio=(rng.standard_normal(16000) * 0.1).astype(np.float32),
    )
    f2 = processor(
        text="c <|audio|> d",
        audio=(rng.standard_normal(32000) * 0.1).astype(np.float32),
    )
    coll = DataCollatorWithAudio(
        pad_token_id=tokenizer.pad_token_id,
        max_audio_len=processor.audio_context_size,
    )
    batch = coll([f1, f2])
    assert batch["audio_values"].shape[0] == 2
    assert batch["audio_values"].shape[-1] >= 32000
    np.testing.assert_array_equal(batch["audio_lens"], [16000, 32000])


def test_wav2vec2_partial_overlay():
    """Partial wav2vec2 diff state dicts overlay per-key (previously routed
    through the whisper key map and silently applied 0 keys)."""
    import jax

    from ultravox_tpu.models import ultravox as uv
    from ultravox_tpu.models.config import DecoderConfig, UltravoxConfig

    _, w_cfg, w_params = _make("group")
    cfg = UltravoxConfig(
        audio_config=w_cfg,
        text_config=DecoderConfig(
            vocab_size=384, hidden_size=48, intermediate_size=96,
            num_layers=2, num_heads=4, num_kv_heads=2, head_dim=12,
        ),
        hidden_size=64,
    )
    base = uv.init_params(cfg, jax.random.key(0))
    base["audio_tower"] = w_params
    new_kernel = np.random.default_rng(1).standard_normal(
        w_params["layers"]["q_proj"]["kernel"][1].shape
    ).astype(np.float32)
    sd = {
        "audio_tower.encoder.layers.1.attention.q_proj.weight": new_kernel.T,
        "audio_tower.encoder.layers.1.attention.q_proj.bias":
            np.zeros(new_kernel.shape[1], np.float32),
    }
    merged = weights_lib.convert_ultravox(sd, cfg, jnp.float32, base=base)
    np.testing.assert_allclose(
        np.asarray(merged["audio_tower"]["layers"]["q_proj"]["kernel"][1]),
        new_kernel, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(merged["audio_tower"]["layers"]["q_proj"]["kernel"][0]),
        np.asarray(w_params["layers"]["q_proj"]["kernel"][0]), atol=1e-6,
    )
