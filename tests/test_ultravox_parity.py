"""Composite-model parity: processor -> encoder -> projector -> embed splice
-> LLM logits, compared against an independently-written torch oracle that
follows the reference forward semantics (ultravox_model.py:277-396)."""

import numpy as np
import pytest
import torch

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
from ultravox_tpu.models import weights as weights_lib
from ultravox_tpu.models.processor import DataCollatorWithAudio, UltravoxProcessor


def _torch_rms_norm(x, w, eps=1e-6):
    var = x.pow(2).mean(-1, keepdim=True)
    return x * torch.rsqrt(var + eps) * w


class TorchProjectorOracle(torch.nn.Module):
    """Reference-semantics projector: stack(8) -> RMSNorm -> linear ->
    swiglu(value=first half) -> linear -> RMSNorm(post)."""

    def __init__(self, cfg: UltravoxConfig):
        super().__init__()
        torch.manual_seed(7)
        dim_in = cfg.audio_config.d_model * cfg.stack_factor
        mid = cfg.hidden_size // 2
        self.stack_factor = cfg.stack_factor
        self.ln_pre_w = torch.nn.Parameter(torch.full((dim_in,), cfg.norm_init))
        self.l1 = torch.nn.Linear(dim_in, cfg.hidden_size, bias=False)
        self.l2 = torch.nn.Linear(mid, cfg.text_config.hidden_size, bias=False)
        self.ln_post_w = torch.nn.Parameter(
            torch.full((cfg.text_config.hidden_size,), cfg.norm_init)
        )

    def forward(self, x):
        B, T, C = x.shape
        S = self.stack_factor
        T_pad = (T + S - 1) // S * S
        x = torch.nn.functional.pad(x, (0, 0, 0, T_pad - T))
        x = x.reshape(B, T_pad // S, C * S)
        x = _torch_rms_norm(x, self.ln_pre_w)
        x = self.l1(x)
        val, gate = x.chunk(2, dim=-1)
        x = torch.nn.functional.silu(gate) * val
        x = self.l2(x)
        return _torch_rms_norm(x, self.ln_post_w)


@pytest.fixture(scope="module")
def setup():
    import transformers

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
        projector_ln_mid=False,
    )
    proj_t = TorchProjectorOracle(cfg).eval()

    params = {
        "audio_tower": weights_lib.convert_whisper_encoder(
            weights_lib.from_torch_state_dict(encoder_t.state_dict()),
            cfg.audio_config,
        ),
        "language_model": weights_lib.convert_decoder(
            weights_lib.from_torch_state_dict(llm_t.state_dict()), cfg.text_config
        ),
        "projector": weights_lib.convert_projector(
            {
                "ln_pre.weight": proj_t.ln_pre_w.detach().numpy(),
                "linear_1.weight": proj_t.l1.weight.detach().numpy(),
                "linear_2.weight": proj_t.l2.weight.detach().numpy(),
                "ln_post.weight": proj_t.ln_post_w.detach().numpy(),
            },
            cfg,
        ),
    }
    tokenizer = make_tiny_tokenizer()
    processor = UltravoxProcessor(tokenizer)
    return cfg, params, (encoder_t, proj_t, llm_t), processor


def _torch_oracle_logits(models, batch):
    """Reference-semantics composite forward in torch (ultravox_model.py:
    314-352 + 354-396), driving the same collated batch."""
    encoder_t, proj_t, llm_t = models
    ids = torch.from_numpy(np.asarray(batch["input_ids"])).long()
    embeds = llm_t.get_input_embeddings()(ids)

    if "audio_values" in batch:
        mel = torch.from_numpy(np.asarray(batch["audio_values"]))
        # torch-side encoder with per-sample length masking as the reference
        # builds it (extended attention mask)
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
        audio_embeds = proj_t(encoder_t.layer_norm(x))

        for i in range(len(batch["audio_token_start_idx"])):
            b = int(batch["audio_chunk_batch_idx"][i])
            s = int(batch["audio_token_start_idx"][i])
            n = int(batch["audio_token_len"][i])
            embeds[b, s : s + n] = audio_embeds[i][:n]

    mask = torch.from_numpy(np.asarray(batch["attention_mask"])).long()
    with torch.no_grad():
        return llm_t(inputs_embeds=embeds, attention_mask=mask).logits.numpy()


def test_forward_parity_with_audio(setup):
    cfg, params, models, processor = setup
    rng = np.random.default_rng(0)
    f1 = processor(
        text="transcribe <|audio|> now",
        audio=(rng.standard_normal(16000) * 0.1).astype(np.float32),
    )
    f2 = processor(
        text="a <|audio|> b <|audio|> c",
        audios=[
            (rng.standard_normal(8000) * 0.1).astype(np.float32),
            (rng.standard_normal(12000) * 0.1).astype(np.float32),
        ],
    )
    coll = DataCollatorWithAudio(pad_token_id=processor.tokenizer.pad_token_id)
    batch = coll([f1, f2])

    ref = _torch_oracle_logits(models, batch)
    jbatch = {k: jnp.asarray(v) for k, v in batch.items()}
    with torch.no_grad():
        ours = np.asarray(uv.ultravox_forward(params, cfg, jbatch))

    # compare only valid (unpadded) positions
    for b in range(2):
        n = int(batch["attention_mask"][b].sum())
        np.testing.assert_allclose(ours[b, :n], ref[b, :n], atol=5e-4)


def test_forward_parity_text_only(setup):
    cfg, params, models, processor = setup
    f = processor(text="hello world how are you")
    coll = DataCollatorWithAudio(pad_token_id=processor.tokenizer.pad_token_id)
    batch = coll([f])
    ref = _torch_oracle_logits(models, batch)
    jbatch = {k: jnp.asarray(v) for k, v in batch.items()}
    ours = np.asarray(uv.ultravox_forward(params, cfg, jbatch))
    n = int(batch["attention_mask"][0].sum())
    np.testing.assert_allclose(ours[0, :n], ref[0, :n], atol=5e-4)


def test_ce_loss_matches_torch(setup):
    cfg, params, models, processor = setup
    _, _, llm_t = models
    rng = np.random.default_rng(3)
    f = processor(
        text="transcribe <|audio|> ok",
        audio=(rng.standard_normal(8000) * 0.1).astype(np.float32),
    )
    labels = np.asarray(f["input_ids"][0]).copy()
    labels[: len(labels) // 2] = -100
    f["labels"] = labels
    coll = DataCollatorWithAudio(pad_token_id=processor.tokenizer.pad_token_id)
    batch = coll([f])
    jbatch = {k: jnp.asarray(v) for k, v in batch.items()}

    logits = uv.ultravox_forward(params, cfg, jbatch)
    loss = uv.causal_lm_loss(logits, jbatch["labels"])

    ref_logits = torch.from_numpy(np.asarray(logits))
    t_labels = torch.from_numpy(np.asarray(batch["labels"])).long()
    shift_logits = ref_logits[:, :-1].reshape(-1, ref_logits.shape[-1])
    shift_labels = t_labels[:, 1:].reshape(-1)
    ref_loss = torch.nn.functional.cross_entropy(
        shift_logits, shift_labels, ignore_index=-100
    )
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)


def test_kl_loss_matches_torch(setup):
    """Masked fixed-shape KL vs the reference's boolean-gather formulation
    (ultravox_model.py:202-257) computed in torch."""
    cfg, params, models, processor = setup
    rng = np.random.default_rng(4)
    B, T, T2, V = 2, 10, 8, 50
    student = rng.standard_normal((B, T, V)).astype(np.float32)
    teacher = rng.standard_normal((B, T2, V)).astype(np.float32)
    labels = np.full((B, T), -100, np.int32)
    alt_labels = np.full((B, T2), -100, np.int32)
    labels[0, 4:9] = 1
    alt_labels[0, 2:7] = 1
    labels[1, 2:5] = 1
    alt_labels[1, 1:4] = 1

    loss_cfg = LossConfig(loss_function=LossFunction.KL_DIVERGENCE)
    ours = uv.kl_distillation_loss(
        jnp.asarray(student), jnp.asarray(labels),
        jnp.asarray(teacher), jnp.asarray(alt_labels), loss_cfg,
    )

    # torch oracle with boolean gathers
    s = torch.from_numpy(student)
    t = torch.from_numpy(teacher)
    lab = torch.from_numpy(labels.astype(np.int64))
    alab = torch.from_numpy(alt_labels.astype(np.int64))

    def masks(l):
        m = l != -100
        pred = torch.zeros_like(m)
        pred[:, :-1] = m[:, 1:]
        eot = torch.zeros_like(pred)
        for i in range(l.shape[0]):
            pos = torch.where(pred[i])[0]
            if len(pos):
                eot[i, pos[-1]] = True
        return pred, eot

    pm, em = masks(lab)
    apm, aem = masks(alab)
    tau = loss_cfg.kl_temperature
    kl = torch.nn.functional.kl_div(
        torch.log_softmax(s[pm] / tau, -1),
        torch.softmax(t[apm] / tau, -1),
        reduction="batchmean",
    )
    kl = kl + loss_cfg.eot_loss_weight * torch.nn.functional.kl_div(
        torch.log_softmax(s[em] / tau, -1),
        torch.softmax(t[aem] / tau, -1),
        reduction="batchmean",
    )
    np.testing.assert_allclose(float(ours), float(kl), rtol=1e-3)


def test_splice_shapes_that_crashed_scatter():
    """Direct splice oracle test at the exact shapes whose flat-scatter
    formulation deterministically crashed the TPU runtime under autodiff
    (B*T=1536 rows, 512 update rows): value vs a numpy loop, and gradients
    flow only into the valid (t < token_len) audio positions."""
    from ultravox_tpu.models.ultravox import splice_audio_embeds

    B, T, D = 8, 192, 64
    N, Ta = 8, 64
    rng = np.random.default_rng(0)
    emb = rng.standard_normal((B, T, D)).astype(np.float32)
    audio = rng.standard_normal((N, Ta, D)).astype(np.float32)
    start = rng.integers(0, T - Ta - 1, (N,)).astype(np.int32)
    tok_len = rng.integers(1, Ta + 1, (N,)).astype(np.int32)
    bidx = np.arange(N, dtype=np.int32)

    out = splice_audio_embeds(
        jnp.asarray(emb), jnp.asarray(audio), jnp.asarray(start),
        jnp.asarray(tok_len), jnp.asarray(bidx),
    )
    ref = emb.copy()
    for n in range(N):
        L = int(tok_len[n])
        ref[bidx[n], start[n] : start[n] + L] = audio[n, :L]
    np.testing.assert_array_equal(np.asarray(out), ref)

    import jax

    def loss(a):
        o = splice_audio_embeds(
            jnp.asarray(emb), a, jnp.asarray(start),
            jnp.asarray(tok_len), jnp.asarray(bidx),
        )
        return jnp.sum(o**2)

    g = np.asarray(jax.grad(loss)(jnp.asarray(audio)))
    for n in range(N):
        L = int(tok_len[n])
        np.testing.assert_allclose(g[n, :L], 2 * audio[n, :L], rtol=1e-5)
        np.testing.assert_array_equal(g[n, L:], 0.0)
