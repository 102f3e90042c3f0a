"""End-to-end verification drive (see .claude/skills/verify/SKILL.md).

Drives the public package surface on synthesized audio and compares against
the HF torch pipeline built from the same random-initialised configs:

1. mel frontend (host + device) vs transformers.WhisperFeatureExtractor
2. whisper encoder vs the torch encoder (<30 s input, sliced pos embeds)
3. full composite model logits vs a hand-spliced torch oracle
4. generation via LocalInference on a WAV + tiny local BPE (streaming too)
+ error/edge probes (chunking hint, <2-hop audio, mixed lengths, text-only,
  placeholder count mismatches).

Run: python scripts/verify_e2e.py    (forces the CPU backend itself)
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("TOKENIZERS_PARALLELISM", "false")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import torch

import jax.numpy as jnp

PASS = []


def check(name, fn):
    fn()
    PASS.append(name)
    print(f"PASS {name}")


def synth_audio(seconds=3.0, sr=16000, seed=0):
    """Chirp + harmonics + noise at 16 kHz."""
    rng = np.random.default_rng(seed)
    t = np.arange(int(seconds * sr)) / sr
    f0, f1 = 200.0, 2400.0
    chirp = np.sin(2 * np.pi * (f0 * t + (f1 - f0) / (2 * seconds) * t * t))
    harm = 0.3 * np.sin(2 * np.pi * 440 * t) + 0.15 * np.sin(2 * np.pi * 880 * t)
    noise = 0.05 * rng.standard_normal(t.shape)
    return (0.5 * chirp + harm + noise).astype(np.float32)


# ---------------------------------------------------------------- stage 1: mel
def stage_mel():
    import transformers

    from ultravox_tpu.ops import mel as mel_ops

    fe = transformers.WhisperFeatureExtractor(feature_size=80)
    audio = synth_audio(2.7)
    ref = fe(
        audio, sampling_rate=16000, padding="longest", pad_to_multiple_of=160,
        return_tensors="np",
    )["input_features"][0]
    host = mel_ops.log_mel_spectrogram_np(audio)
    assert host.shape == ref.shape, (host.shape, ref.shape)
    np.testing.assert_allclose(host, ref, atol=2e-5)
    dev = np.asarray(mel_ops.log_mel_spectrogram(jnp.asarray(audio[None]))[0])
    np.testing.assert_allclose(dev, ref, atol=2e-4)


# ------------------------------------------------------------ stage 2: encoder
def _tiny_torch_models():
    import transformers

    from ultravox_tpu.models import (
        DecoderConfig,
        UltravoxConfig,
        WhisperEncoderConfig,
    )

    torch.manual_seed(0)
    hf_whisper = transformers.WhisperConfig(
        num_mel_bins=80, d_model=64, encoder_layers=2, encoder_attention_heads=4,
        encoder_ffn_dim=128, max_source_positions=1500,
        decoder_layers=1, decoder_attention_heads=4, decoder_ffn_dim=64,
    )
    encoder_t = transformers.WhisperModel(hf_whisper).encoder.eval()
    hf_llama = transformers.LlamaConfig(
        vocab_size=384, hidden_size=48, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=512,
    )
    llm_t = transformers.LlamaForCausalLM(hf_llama).eval()
    cfg = UltravoxConfig(
        audio_config=WhisperEncoderConfig.from_hf_dict(hf_whisper.to_dict()),
        text_config=DecoderConfig.from_hf_dict(hf_llama.to_dict()),
        hidden_size=64,
        stack_factor=8,
    )
    return cfg, encoder_t, llm_t


def stage_encoder():
    from ultravox_tpu.models import weights as weights_lib
    from ultravox_tpu.models import whisper_encoder
    from ultravox_tpu.ops import mel as mel_ops

    cfg, encoder_t, _ = _tiny_torch_models()
    audio = synth_audio(4.2, seed=1)
    mel = mel_ops.log_mel_spectrogram_np(audio)[None]  # (1, 80, T<3000)

    # torch side manually with sliced position embeddings (<30 s input)
    with torch.no_grad():
        x = torch.nn.functional.gelu(encoder_t.conv1(torch.from_numpy(mel)))
        x = torch.nn.functional.gelu(encoder_t.conv2(x)).permute(0, 2, 1)
        x = x + encoder_t.embed_positions.weight[: x.shape[1]]
        for layer in encoder_t.layers:
            x = layer(x, None, layer_head_mask=None)[0]
        ref = encoder_t.layer_norm(x).numpy()

    params = weights_lib.convert_whisper_encoder(
        weights_lib.from_torch_state_dict(encoder_t.state_dict()),
        cfg.audio_config,
    )
    lens = jnp.asarray([mel.shape[2]], jnp.int32)
    ours = np.asarray(
        whisper_encoder.encoder_forward(
            params, cfg.audio_config, jnp.asarray(mel), lens
        )
    )
    np.testing.assert_allclose(ours, ref, atol=1e-4)


# ----------------------------------------------------- stage 3: full composite
def _processor(cfg):
    from tests.helpers import make_tiny_tokenizer
    from ultravox_tpu.models.processor import UltravoxProcessor

    return UltravoxProcessor(make_tiny_tokenizer())


def _torch_composite_logits(cfg, encoder_t, llm_t, proj_params, batch):
    """Reference-semantics composite forward in torch with hand splice."""

    def rms(x, w, eps=1e-6):
        return x * torch.rsqrt(x.pow(2).mean(-1, keepdim=True) + eps) * w

    ids = torch.from_numpy(np.asarray(batch["input_ids"])).long()
    embeds = llm_t.get_input_embeddings()(ids)
    if "audio_values" in batch:
        mel = torch.from_numpy(np.asarray(batch["audio_values"]))
        x = torch.nn.functional.gelu(encoder_t.conv1(mel))
        x = torch.nn.functional.gelu(encoder_t.conv2(x)).permute(0, 2, 1)
        x = x + encoder_t.embed_positions.weight[: x.shape[1]]
        T = x.shape[1]
        feat_lens = (torch.from_numpy(np.asarray(batch["audio_lens"])) - 1) // 2 + 1
        valid = torch.arange(T)[None, :] < feat_lens[:, None]
        bias = torch.where(valid, 0.0, torch.finfo(torch.float32).min)
        bias = bias[:, None, None, :].expand(x.shape[0], 1, T, T)
        for layer in encoder_t.layers:
            x = layer(x, bias, layer_head_mask=None)[0]
        enc = encoder_t.layer_norm(x)
        # projector oracle from the jax params
        S = cfg.stack_factor
        B, T, C = enc.shape
        T_pad = (T + S - 1) // S * S
        h = torch.nn.functional.pad(enc, (0, 0, 0, T_pad - T))
        h = h.reshape(B, T_pad // S, C * S)
        h = rms(h, torch.from_numpy(np.asarray(proj_params["ln_pre"])))
        h = h @ torch.from_numpy(np.asarray(proj_params["linear_1"]["kernel"]))
        val, gate = h.chunk(2, dim=-1)
        h = torch.nn.functional.silu(gate) * val
        h = h @ torch.from_numpy(np.asarray(proj_params["linear_2"]["kernel"]))
        audio_embeds = rms(
            h, torch.from_numpy(np.asarray(proj_params["ln_post"]))
        )
        for i in range(len(batch["audio_token_start_idx"])):
            b = int(batch["audio_chunk_batch_idx"][i])
            s = int(batch["audio_token_start_idx"][i])
            n = int(batch["audio_token_len"][i])
            embeds[b, s : s + n] = audio_embeds[i][:n]
    mask = torch.from_numpy(np.asarray(batch["attention_mask"])).long()
    with torch.no_grad():
        return llm_t(inputs_embeds=embeds, attention_mask=mask).logits.numpy()


def stage_composite():
    from ultravox_tpu.models import ultravox as uv
    from ultravox_tpu.models import weights as weights_lib
    from ultravox_tpu.models.processor import DataCollatorWithAudio

    cfg, encoder_t, llm_t = _tiny_torch_models()
    params = uv.init_params(cfg, jax.random.key(0))
    params["audio_tower"] = weights_lib.convert_whisper_encoder(
        weights_lib.from_torch_state_dict(encoder_t.state_dict()), cfg.audio_config
    )
    params["language_model"] = weights_lib.convert_decoder(
        weights_lib.from_torch_state_dict(llm_t.state_dict()), cfg.text_config
    )
    processor = _processor(cfg)
    coll = DataCollatorWithAudio(pad_token_id=processor.tokenizer.pad_token_id)

    # mixed lengths + length mask in one batch
    f1 = processor(text="transcribe <|audio|> now", audio=synth_audio(1.3, seed=2))
    f2 = processor(text="a <|audio|> b <|audio|> c",
                   audios=[synth_audio(0.6, seed=3), synth_audio(2.1, seed=4)])
    batch = coll([f1, f2])
    ref = _torch_composite_logits(cfg, encoder_t, llm_t, params["projector"], batch)
    ours = np.asarray(
        uv.ultravox_forward(cfg=cfg, params=params,
                            batch={k: jnp.asarray(v) for k, v in batch.items()})
    )
    for b in range(2):
        n = int(batch["attention_mask"][b].sum())
        np.testing.assert_allclose(ours[b, :n], ref[b, :n], atol=1e-4)

    # text-only batch (no audio)
    fb = coll([processor(text="hello world how are you")])
    ref = _torch_composite_logits(cfg, encoder_t, llm_t, params["projector"], fb)
    ours = np.asarray(
        uv.ultravox_forward(cfg=cfg, params=params,
                            batch={k: jnp.asarray(v) for k, v in fb.items()})
    )
    n = int(fb["attention_mask"][0].sum())
    np.testing.assert_allclose(ours[0, :n], ref[0, :n], atol=1e-4)


# -------------------------------------------------------- stage 4: generation
def stage_generation():
    from ultravox_tpu.data.sample import VoiceSample
    from ultravox_tpu.inference.infer import LocalInference
    from ultravox_tpu.models import ultravox as uv

    cfg, _, _ = _tiny_torch_models()
    params = uv.init_params(cfg, jax.random.key(1))
    processor = _processor(cfg)
    inf = LocalInference(params, cfg, processor, max_cache_len=256)

    sample = VoiceSample(
        messages=[{"role": "user", "content": "transcribe <|audio|>"}],
        audio=synth_audio(1.0, seed=5),
    )
    out = inf.infer(sample, max_tokens=8)
    assert isinstance(out.text, str)
    assert out.input_tokens > 0 and out.output_tokens > 0

    chunks = []
    for msg in inf.infer_stream(sample, max_tokens=8):
        chunks.append(msg)
    texts = [c.text for c in chunks if hasattr(c, "text") and c.text is not None]
    assert len(texts) >= 2, "streaming should yield tokens incrementally"
    stats = chunks[-1]
    assert hasattr(stats, "output_tokens")


# ----------------------------------------------------------------- probes
def stage_probes():
    from ultravox_tpu.models.processor import UltravoxProcessor  # noqa: F401

    cfg, _, _ = _tiny_torch_models()
    processor = _processor(cfg)

    # >30 s audio must either chunk (multi-row mel) or raise with a hint
    long_audio = synth_audio(31.0, seed=6)
    feats = processor(text="x <|audio|> y", audio=long_audio)
    assert feats["audio_values"].shape[0] >= 2, "long audio should chunk"

    # <2-hop audio (a few samples) must not crash
    tiny = processor(text="t <|audio|>", audio=np.zeros(100, np.float32))
    assert tiny["audio_values"].shape[-1] >= 2

    # too many / too few placeholders must raise
    for text, n_audio in [("a <|audio|> b <|audio|>", 1), ("no placeholder", 1)]:
        try:
            processor(text=text, audios=[synth_audio(0.5)] * n_audio)
        except Exception:
            pass
        else:
            raise AssertionError(
                f"expected placeholder-count error for {text!r} w/ {n_audio} audio"
            )


if __name__ == "__main__":
    check("mel", stage_mel)
    check("encoder", stage_encoder)
    check("composite+text-only+mixed-lengths", stage_composite)
    check("generation+streaming", stage_generation)
    check("probes", stage_probes)
    print(f"verify_e2e: {len(PASS)}/5 stages passed")
