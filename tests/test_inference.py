"""Generation-engine and LocalInference tests: greedy parity vs HF generate,
batch-padding invariance, streaming, conversation mode."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from tests.helpers import make_tiny_tokenizer
from ultravox_tpu.data.sample import VoiceSample
from ultravox_tpu.inference.base import InferenceChunk, InferenceStats
from ultravox_tpu.inference.engine import GenerationEngine
from ultravox_tpu.inference.infer import LocalInference
from ultravox_tpu.models import DecoderConfig, UltravoxConfig, WhisperEncoderConfig
from ultravox_tpu.models import ultravox as uv
from ultravox_tpu.models import weights as weights_lib
from ultravox_tpu.models.processor import UltravoxProcessor

V = 384


@pytest.fixture(scope="module")
def tiny_llm():
    import transformers

    torch.manual_seed(0)
    hf_cfg = transformers.LlamaConfig(
        vocab_size=V, hidden_size=48, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=512,
    )
    model = transformers.LlamaForCausalLM(hf_cfg).eval()
    cfg = DecoderConfig.from_hf_dict(hf_cfg.to_dict())
    params = weights_lib.convert_decoder(
        weights_lib.from_torch_state_dict(model.state_dict()), cfg
    )
    return model, cfg, params


@pytest.fixture(scope="module")
def uv_setup(tiny_llm):
    _, dec_cfg, dec_params = tiny_llm
    import jax

    cfg = UltravoxConfig(
        audio_config=WhisperEncoderConfig(
            d_model=32, num_layers=1, num_heads=2, ffn_dim=64,
            max_source_positions=1500,
        ),
        text_config=dec_cfg,
        hidden_size=64,
    )
    rest = uv.init_params(cfg, jax.random.key(1))
    params = {
        "language_model": dec_params,
        "audio_tower": rest["audio_tower"],
        "projector": rest["projector"],
    }
    tokenizer = make_tiny_tokenizer()
    processor = UltravoxProcessor(tokenizer)
    return cfg, params, processor


def _engine(cfg, params, stop_ids=(), **kw):
    return GenerationEngine(
        {"language_model": params} if "language_model" not in params else params,
        cfg,
        max_cache_len=128,
        cache_dtype=jnp.float32,
        stop_token_ids=stop_ids,
        **kw,
    )


def test_greedy_matches_hf_generate(tiny_llm):
    model, dec_cfg, params = tiny_llm
    cfg = UltravoxConfig(text_config=dec_cfg, llm_only_training=True)
    rng = np.random.default_rng(0)
    prompt = rng.integers(1, V, size=(1, 9)).astype(np.int32)

    with torch.no_grad():
        ref = model.generate(
            torch.from_numpy(prompt).long(),
            max_new_tokens=12,
            do_sample=False,
            pad_token_id=0,
        )[0, 9:].tolist()

    engine = _engine(cfg, {"language_model": params})
    batch = {
        "input_ids": prompt,
        "attention_mask": np.ones_like(prompt),
    }
    out = engine.generate(batch, max_new_tokens=12)
    assert out.token_ids[0] == ref


def test_batch_padding_invariance(tiny_llm):
    """Generation for a sequence must not depend on its batch neighbours or
    on bucket padding."""
    model, dec_cfg, params = tiny_llm
    cfg = UltravoxConfig(text_config=dec_cfg, llm_only_training=True)
    engine = _engine(cfg, {"language_model": params})
    rng = np.random.default_rng(1)
    p1 = rng.integers(1, V, size=7).astype(np.int32)
    p2 = rng.integers(1, V, size=13).astype(np.int32)

    def gen(prompts):
        max_len = max(len(p) for p in prompts)
        ids = np.zeros((len(prompts), max_len), np.int32)
        mask = np.zeros_like(ids)
        for i, p in enumerate(prompts):
            ids[i, : len(p)] = p
            mask[i, : len(p)] = 1
        return engine.generate(
            {"input_ids": ids, "attention_mask": mask}, max_new_tokens=8
        ).token_ids

    solo1 = gen([p1])[0]
    solo2 = gen([p2])[0]
    both = gen([p1, p2])
    assert both[0] == solo1
    assert both[1] == solo2


def test_stop_token_terminates(tiny_llm):
    model, dec_cfg, params = tiny_llm
    cfg = UltravoxConfig(text_config=dec_cfg, llm_only_training=True)
    rng = np.random.default_rng(2)
    prompt = rng.integers(1, V, size=(1, 5)).astype(np.int32)
    base = _engine(cfg, {"language_model": params})
    free = base.generate(
        {"input_ids": prompt, "attention_mask": np.ones_like(prompt)},
        max_new_tokens=10,
    ).token_ids[0]
    assert len(free) == 10
    stop = free[3]
    engine = _engine(cfg, {"language_model": params}, stop_ids=(stop,))
    out = engine.generate(
        {"input_ids": prompt, "attention_mask": np.ones_like(prompt)},
        max_new_tokens=10,
    ).token_ids[0]
    assert out == free[:3]


def test_local_inference_with_audio(uv_setup):
    cfg, params, processor = uv_setup
    inference = LocalInference(
        params, cfg, processor, max_cache_len=256, cache_dtype=jnp.float32
    )
    rng = np.random.default_rng(3)
    sample = VoiceSample.from_prompt_and_audio(
        "transcribe <|audio|>", (rng.standard_normal(8000) * 0.1).astype(np.float32)
    )
    out = inference.infer(sample, max_tokens=6)
    assert out.input_tokens > 4  # prompt + audio tokens
    assert 0 < out.output_tokens <= 6
    assert isinstance(out.text, str)


def test_infer_stream_yields_chunks_then_stats(uv_setup):
    cfg, params, processor = uv_setup
    inference = LocalInference(
        params, cfg, processor, max_cache_len=256, cache_dtype=jnp.float32
    )
    sample = VoiceSample.from_prompt("hello world")
    messages = list(inference.infer_stream(sample, max_tokens=6))
    assert isinstance(messages[-1], InferenceStats)
    chunks = [m for m in messages[:-1] if isinstance(m, InferenceChunk)]
    streamed = "".join(c.text for c in chunks)
    ref = inference.infer(sample, max_tokens=6)
    assert streamed.strip() == ref.text.strip()
    assert messages[-1].ttft_s is not None


def test_conversation_mode_accumulates(uv_setup):
    cfg, params, processor = uv_setup
    inference = LocalInference(
        params, cfg, processor, max_cache_len=256,
        conversation_mode=True, cache_dtype=jnp.float32,
    )
    out1 = inference.infer(VoiceSample.from_prompt("hello"), max_tokens=4)
    assert len(inference.past_messages) == 2
    assert inference.past_messages[-1]["content"] == out1.text
    inference.infer(VoiceSample.from_prompt("again"), max_tokens=4)
    assert len(inference.past_messages) == 4


def test_cache_budget_guard(tiny_llm):
    """Boundary semantics: prompt + max_new == max_cache_len + 1 fits (the
    final sampled token is never written); one more raises."""
    model, dec_cfg, params = tiny_llm
    cfg = UltravoxConfig(text_config=dec_cfg, llm_only_training=True)
    engine = _engine(cfg, {"language_model": params})  # max_cache_len=128
    prompt = np.ones((1, 9), np.int32)
    batch = {"input_ids": prompt, "attention_mask": np.ones_like(prompt)}
    # 9 + 120 = 129 == max_cache_len + 1 -> allowed
    out = engine.generate(batch, max_new_tokens=120)
    assert len(out.token_ids[0]) == 120
    with pytest.raises(ValueError, match="max_cache_len"):
        engine.generate(batch, max_new_tokens=121)
    with pytest.raises(ValueError, match="max_cache_len"):
        engine.generate_greedy_fused(batch, max_new_tokens=121)


def test_infer_stream_surfaces_engine_errors(uv_setup):
    """A generation error must terminate the stream with the exception, not
    hang the consumer."""
    cfg, params, processor = uv_setup
    inference = LocalInference(
        params, cfg, processor, max_cache_len=16, cache_dtype=jnp.float32
    )
    sample = VoiceSample.from_prompt("a long enough prompt that overflows")
    with pytest.raises(ValueError, match="max_cache_len"):
        list(inference.infer_stream(sample, max_tokens=64))


def test_fused_sampled_matches_per_step(tiny_llm):
    """Temperature sampling inside the fused decode scan reproduces the
    per-step generate() path exactly for the same rng key (same split
    order on device)."""
    import jax

    _, dec_cfg, params = tiny_llm
    from ultravox_tpu.models.config import UltravoxConfig

    cfg = UltravoxConfig(text_config=dec_cfg, llm_only_training=True)
    engine = _engine(cfg, params)
    rng = np.random.default_rng(0)
    prompt = rng.integers(1, V, (2, 9)).astype(np.int32)
    batch = {
        "input_ids": prompt,
        "attention_mask": np.ones_like(prompt),
    }
    key = jax.random.key(42)
    step = engine.generate(
        batch, max_new_tokens=16, temperature=0.8, top_k=20, rng=key
    )
    fused = engine.generate_fused(
        batch, max_new_tokens=16, temperature=0.8, top_k=20, rng=key
    )
    assert step.token_ids == fused.token_ids

    # and greedy fused still matches greedy per-step
    step_g = engine.generate(batch, max_new_tokens=16)
    fused_g = engine.generate_fused(batch, max_new_tokens=16)
    assert step_g.token_ids == fused_g.token_ids


def test_fused_matches_per_step_gemma3_features(tiny_llm):
    """Segmented fused decode handles the Gemma-3 feature set (sliding
    window + local rope + qk-norm + post-norms + softcap + embed scaling)
    identically to the per-step unified-cache path."""
    import jax

    from ultravox_tpu.models import decoder as decoder_lib
    from ultravox_tpu.models.config import DecoderConfig, UltravoxConfig

    cfg_g = DecoderConfig(
        arch="gemma3", vocab_size=V, hidden_size=48, intermediate_size=96,
        num_layers=3, num_heads=4, num_kv_heads=2, head_dim=12,
        sliding_window=8, sliding_window_pattern=2, qk_norm=True,
        use_post_norms=True, scale_embeddings=True,
        final_logit_softcapping=30.0, rope_local_base_freq=10000.0,
        rope_theta=1000000.0, hidden_act="gelu_pytorch_tanh",
        tie_word_embeddings=True,
    )
    params = decoder_lib.init_params(cfg_g, jax.random.key(5))
    cfg = UltravoxConfig(text_config=cfg_g, llm_only_training=True)
    engine = _engine(cfg, {"language_model": params})
    rng = np.random.default_rng(1)
    prompt = rng.integers(1, V, (2, 11)).astype(np.int32)
    batch = {"input_ids": prompt, "attention_mask": np.ones_like(prompt)}
    step = engine.generate(batch, max_new_tokens=16)
    fused = engine.generate_fused(batch, max_new_tokens=16)
    assert step.token_ids == fused.token_ids


def test_prefill_kernel_matches_xla(tiny_llm):
    """Pallas causal-prefill attention (in-kernel masks incl. absolute
    position offsets) produces the same generations as the XLA path,
    including conversation prefills at a nonzero cache offset."""
    _, dec_cfg, params = tiny_llm
    cfg = UltravoxConfig(text_config=dec_cfg, llm_only_training=True)
    xla = _engine(cfg, params)
    fused = _engine(cfg, params, prefill_attn_impl="fused")
    rng = np.random.default_rng(2)
    prompt = rng.integers(1, V, (2, 17)).astype(np.int32)
    mask = np.ones_like(prompt)
    mask[1, 12:] = 0  # ragged lengths
    batch = {"input_ids": prompt, "attention_mask": mask}
    a = xla.generate(batch, max_new_tokens=10)
    b = fused.generate(batch, max_new_tokens=10)
    assert a.token_ids == b.token_ids

    # conversation continuation: prefill at start_pos > 0
    r1 = fused.generate(batch, max_new_tokens=4, return_cache=True)
    suffix = rng.integers(1, V, (2, 5)).astype(np.int32)
    sbatch = {"input_ids": suffix, "attention_mask": np.ones_like(suffix)}
    r1x = xla.generate(batch, max_new_tokens=4, return_cache=True)
    # feed identical caches forward on both engines
    import jax.numpy as _jnp

    out_f = fused.generate(
        sbatch, max_new_tokens=6, cache=r1.cache,
        start_pos=int(r1.cache_lens.max()),
    )
    out_x = xla.generate(
        sbatch, max_new_tokens=6, cache=r1x.cache,
        start_pos=int(r1x.cache_lens.max()),
    )
    assert out_f.token_ids == out_x.token_ids


def test_int8_quantization_accuracy(tiny_llm):
    """Weight-only int8 (w8a16): per-channel dequant error is bounded by
    scale/2 and quantized generation stays close to the fp32 path."""
    import jax

    from ultravox_tpu.models import decoder as decoder_lib

    _, dec_cfg, params = tiny_llm
    qparams = decoder_lib.quantize_decoder_int8(params)
    # dequant error bound on a representative kernel
    w = np.asarray(params["layers"]["q_proj"]["kernel"], np.float32)
    wq = np.asarray(qparams["layers"]["q_proj"]["kernel_q"], np.int8)
    s = np.asarray(qparams["layers"]["q_proj"]["scale"], np.float32)
    deq = wq.astype(np.float32) * s
    # bound: half a quantization step + bf16 rounding of the stored scale
    assert np.abs(deq - w).max() <= s.max() * 0.51 + np.abs(w).max() * 0.005
    # embedding rows round-trip within per-row scale/2
    emb = np.asarray(params["embed_tokens"], np.float32)
    deq_emb = (
        np.asarray(qparams["embed_tokens_q"], np.float32)
        * np.asarray(qparams["embed_scale"], np.float32)[:, None]
    )
    assert np.abs(deq_emb - emb).max() <= float(
        np.asarray(qparams["embed_scale"], np.float32).max()
    ) * 0.51 + np.abs(emb).max() * 0.005

    cfg = UltravoxConfig(text_config=dec_cfg, llm_only_training=True)
    fp = _engine(cfg, params)
    q8 = _engine(cfg, params, quantize="int8")
    rng = np.random.default_rng(0)
    prompt = rng.integers(1, V, (2, 9)).astype(np.int32)
    batch = {"input_ids": prompt, "attention_mask": np.ones_like(prompt)}

    # prefill logits stay highly correlated after quantization
    import jax.numpy as _jnp
    import ultravox_tpu.models.decoder as dl

    jb = {k: _jnp.asarray(v) for k, v in fp.pad_batch(batch).items()}
    c1 = dl.KVCache.zeros(cfg.text_config, 2, 128, _jnp.float32)
    c2 = dl.KVCache.zeros(cfg.text_config, 2, 128, _jnp.float32)
    l_fp, _, _ = fp._prefill(fp.params, jb, c1, _jnp.asarray(0, _jnp.int32))
    l_q8, _, _ = q8._prefill(q8.params, jb, c2, _jnp.asarray(0, _jnp.int32))
    a, b = np.asarray(l_fp).ravel(), np.asarray(l_q8).ravel()
    cos = np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b))
    assert cos > 0.999, cos

    # both fused-scan and per-step paths run end to end quantized
    g1 = q8.generate(batch, max_new_tokens=8)
    g2 = q8.generate_fused(batch, max_new_tokens=8)
    assert g1.token_ids == g2.token_ids


def test_tied_int8_pretransposed_head_exact():
    """quantize_decoder_int8 on a TIED model materializes a transposed int8
    lm_head (decode skips the per-step .T view); logits must be bit-equal
    to the embedding-path formula it replaces."""
    import jax
    import jax.numpy as jnp

    from ultravox_tpu.models import decoder as decoder_lib
    from ultravox_tpu.models.config import DecoderConfig
    from ultravox_tpu.models.lora import proj_apply

    cfg = DecoderConfig(
        vocab_size=V, hidden_size=48, intermediate_size=96, num_layers=2,
        num_heads=4, num_kv_heads=2, head_dim=12, tie_word_embeddings=True,
    )
    params = decoder_lib.init_params(cfg, jax.random.key(3))
    assert "lm_head" not in params
    q = decoder_lib.quantize_decoder_int8(
        decoder_lib.fuse_inference_params(params, cfg)
    )
    assert "kernel_q" in q["lm_head"]
    hidden = jnp.asarray(
        np.random.default_rng(0).standard_normal((3, 48)), jnp.float32
    ).astype(jnp.bfloat16)
    via_head = decoder_lib.compute_logits(q, cfg, hidden)
    via_embed = proj_apply(
        hidden,
        {"kernel_q": q["embed_tokens_q"].T, "scale": q["embed_scale"][None]},
    ).astype(jnp.float32)
    np.testing.assert_array_equal(np.asarray(via_head), np.asarray(via_embed))
