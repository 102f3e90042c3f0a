"""The composite Ultravox model: encoder → projector → embed-splice → LLM.

TPU-native re-design of the reference ``UltravoxModel``
(ultravox_model.py:33-637). Key departures, required by XLA's static-shape
compilation model:

- the audio-embedding merge is a fixed-shape scatter (``splice_audio_embeds``)
  instead of the reference's Python loop of in-place slice writes
  (ultravox_model.py:390-394);
- the KL-distillation loss uses masked fixed-shape reductions instead of
  boolean-mask logit gathers (ultravox_model.py:183-257);
- the teacher forward reuses the same weight tree (student and teacher share
  the LLM), expressed as a second call inside one jitted step with gradients
  stopped, so the weights exist once in HBM.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ultravox_tpu.models import decoder as decoder_lib
from ultravox_tpu.models import projector as projector_lib
from ultravox_tpu.models import whisper_encoder as encoder_lib
from ultravox_tpu.models.config import LossConfig, LossFunction, UltravoxConfig

Params = Dict[str, Any]


def init_params(cfg: UltravoxConfig, rng: jax.Array, dtype=jnp.float32) -> Params:
    k1, k2, k3 = jax.random.split(rng, 3)
    params: Params = {
        "language_model": decoder_lib.init_params(cfg.text_config, k3, dtype),
    }
    if not cfg.llm_only_training:
        if cfg.audio_arch == "wav2vec2":
            from ultravox_tpu.models import wav2vec2_encoder as w2v_lib

            params["audio_tower"] = w2v_lib.init_params(
                cfg.audio_config, k1, dtype
            )
        else:
            params["audio_tower"] = encoder_lib.init_params(
                cfg.audio_config, k1, dtype
            )
        params["projector"] = projector_lib.init_params(cfg, k2, dtype)
    return params


def splice_audio_embeds(
    inputs_embeds: jax.Array,  # (B, T, D)
    audio_embeds: jax.Array,  # (N, T_a, D) — N audio chunks across the batch
    audio_token_start_idx: jax.Array,  # (N,) int32
    audio_token_len: jax.Array,  # (N,) int32
    audio_chunk_batch_idx: jax.Array,  # (N,) int32 — batch row of each chunk
) -> jax.Array:
    """Overwrite placeholder positions with audio embeddings.

    Formulated as a one-hot matmul + select instead of a scatter: every
    (chunk, t) source pair computes its flat destination index, a boolean
    permutation matrix P maps sources to destinations (at most one source
    per destination — placeholder spans never overlap), and the spliced
    rows are ``P @ audio`` with a row-covered mask selecting between audio
    and token embeddings. Replaces ultravox_model.py:390-394.

    Why not a scatter: this op IS MXU-shaped (a (B·T, N·Ta) x (N·Ta, D)
    matmul — microseconds at real sizes), its transpose is simply ``P^T``
    (the VJP is another matmul, no gather), and the 1-D flat scatter this
    replaces deterministically CRASHED the TPU runtime at B·T >= ~1.5K rows
    under autodiff (worker "kernel fault"; minimal 15-line repro — see
    tests/test_ultravox_parity.py::test_splice_shapes_that_crashed_scatter).
    """
    B, T, D = inputs_embeds.shape
    N, Ta, _ = audio_embeds.shape
    t = jnp.arange(Ta, dtype=jnp.int32)
    dest = (
        audio_chunk_batch_idx[:, None] * T + audio_token_start_idx[:, None] + t[None]
    )
    valid = t[None, :] < audio_token_len[:, None]
    dest = jnp.where(valid, dest, -1).reshape(-1)  # (N*Ta,) invalid -> -1
    rows = jnp.arange(B * T, dtype=jnp.int32)
    P = rows[:, None] == dest[None, :]  # (B*T, N*Ta) one-hot columns
    audio_flat = audio_embeds.reshape(N * Ta, D)
    spliced = jax.lax.dot(
        P.astype(audio_flat.dtype), audio_flat
    )  # (B*T, D)
    covered = P.any(axis=1)
    flat = inputs_embeds.reshape(B * T, D)
    out = jnp.where(covered[:, None], spliced.astype(flat.dtype), flat)
    return out.reshape(B, T, D)


def prepare_audio_embeds(
    params: Params,
    cfg: UltravoxConfig,
    inputs_embeds: jax.Array,
    audio_values: jax.Array,  # (N, n_mels, T_mel)
    audio_lens: jax.Array,  # (N,) valid mel frames per chunk
    audio_token_start_idx: jax.Array,
    audio_token_len: jax.Array,
    audio_chunk_batch_idx: jax.Array,
    *,
    remat: bool = False,
    encoder_attn_impl: str = "xla",
) -> jax.Array:
    """Audio tower + projector + splice (reference: ultravox_model.py:354-396)."""
    if cfg.audio_arch == "wav2vec2":
        # raw-waveform tower: audio_values (N, 1, T_samples), lens in samples
        from ultravox_tpu.models import wav2vec2_encoder as w2v_lib

        assert cfg.audio_latency_block_size in (None, 0), (
            "only the whisper audio tower supports latency masking"
        )
        enc = w2v_lib.encoder_forward(
            params["audio_tower"],
            cfg.audio_config,
            audio_values[:, 0, :].astype(inputs_embeds.dtype),
            sample_lens=audio_lens,
        )
    else:
        enc = encoder_lib.encoder_forward(
            params["audio_tower"],
            cfg.audio_config,
            audio_values.astype(inputs_embeds.dtype),
            mel_lens=audio_lens,
            latency_block_size=cfg.audio_latency_block_size,
            remat=remat,
            attn_impl=encoder_attn_impl,
        )
    audio_embeds = projector_lib.projector_forward(params["projector"], cfg, enc)
    return splice_audio_embeds(
        inputs_embeds,
        audio_embeds,
        audio_token_start_idx,
        audio_token_len,
        audio_chunk_batch_idx,
    )


def ultravox_embed(
    params: Params,
    cfg: UltravoxConfig,
    input_ids: jax.Array,
    batch: Dict[str, jax.Array],
    *,
    remat: bool = False,
    encoder_attn_impl: str = "xla",
) -> jax.Array:
    """Token embeddings with audio spliced in (if the batch carries audio)."""
    inputs_embeds = decoder_lib.embed_lookup(
        params["language_model"], input_ids
    )
    if "audio_values" in batch and batch["audio_values"] is not None:
        inputs_embeds = prepare_audio_embeds(
            params,
            cfg,
            inputs_embeds,
            batch["audio_values"],
            batch["audio_lens"],
            batch["audio_token_start_idx"],
            batch["audio_token_len"],
            batch["audio_chunk_batch_idx"],
            remat=remat,
            encoder_attn_impl=encoder_attn_impl,
        )
    return inputs_embeds


def ultravox_forward(
    params: Params,
    cfg: UltravoxConfig,
    batch: Dict[str, jax.Array],
    *,
    remat: bool = False,
    attn_impl: str = "xla",  # "flash" = differentiable Pallas in both towers
    return_hidden: bool = False,  # final hidden states instead of logits
    pipe_mesh=None,  # Mesh with a >1 "pipe" axis: GPipe the decoder stack
    pipe_micro: Optional[int] = None,
) -> jax.Array:
    """Full-sequence forward. Returns fp32 logits (B, T, V) — or, with
    ``return_hidden``, the final hidden states (B, T, D) so callers can
    project to the vocabulary lazily (see the chunked losses below).

    ``batch`` keys: input_ids (B, T), attention_mask (B, T) — right-padded —
    and optionally audio_values/audio_lens/audio_token_len/
    audio_token_start_idx/audio_chunk_batch_idx (reference forward:
    ultravox_model.py:277-352).

    With ``pipe_mesh`` the decoder layer stack runs pipeline-parallel
    (parallel/pipeline.py; beyond-reference — SURVEY §2.4 "PP: absent"):
    encoder/projector/embedding stay on the standard auto-sharded path.
    """
    input_ids = batch["input_ids"]
    mask = batch["attention_mask"]
    inputs_embeds = ultravox_embed(
        params, cfg, input_ids, batch, remat=remat,
        encoder_attn_impl=attn_impl if attn_impl == "flash" else "xla",
    )
    B, T = input_ids.shape
    positions = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32)[None], (B, T))
    seq_lens = mask.sum(axis=-1).astype(jnp.int32)
    if pipe_mesh is not None and dict(pipe_mesh.shape).get("pipe", 1) > 1:
        from ultravox_tpu.parallel.pipeline import pipelined_decoder_hidden

        hidden = pipelined_decoder_hidden(
            params["language_model"],
            cfg.text_config,
            inputs_embeds,
            positions,
            seq_lens,
            mesh=pipe_mesh,
            n_micro=pipe_micro,
            remat=remat,
        )
        if return_hidden:
            return hidden
        return decoder_lib.compute_logits(
            params["language_model"], cfg.text_config, hidden
        )
    out, _ = decoder_lib.decoder_forward(
        params["language_model"],
        cfg.text_config,
        inputs_embeds=inputs_embeds,
        positions=positions,
        kv_valid_len=seq_lens,
        remat=remat,
        attn_impl=attn_impl,
        return_hidden=return_hidden,
    )
    return out


# --------------------------------------------------------------------------
# Losses
# --------------------------------------------------------------------------


def causal_lm_loss(
    logits: jax.Array,  # (B, T, V) fp32
    labels: jax.Array,  # (B, T) int32 with -100 = ignored
) -> jax.Array:
    """Mean next-token cross-entropy over non-ignored positions (matches the
    HF CausalLM loss the reference relies on, ultravox_model.py:328)."""
    shift_logits = logits[:, :-1]
    shift_labels = labels[:, 1:]
    valid = shift_labels != -100
    safe_labels = jnp.where(valid, shift_labels, 0)
    logp = jax.nn.log_softmax(shift_logits, axis=-1)
    nll = -jnp.take_along_axis(logp, safe_labels[..., None], axis=-1)[..., 0]
    nll = jnp.where(valid, nll, 0.0)
    return nll.sum() / jnp.maximum(valid.sum(), 1)


def chunked_nll_sums(
    lm_params: Params,
    tc,
    hidden: jax.Array,  # (B, T, D) final hidden states
    labels: jax.Array,  # (B, T) int32 with -100 = ignored
    *,
    chunk: int = 128,
) -> Tuple[jax.Array, jax.Array]:
    """(sum of next-token NLL, count of supervised positions) computed from
    HIDDEN states, projecting to the vocabulary ``chunk`` positions at a
    time inside a rematerialised scan — the full (B, T, V) fp32 logits
    tensor (±0.8 GB per instance at a 128K vocab, several instances live
    across fwd+bwd) never exists in HBM; peak vocab-sized memory is
    O(chunk x V). The TPU/JAX counterpart of the chunked/fused
    cross-entropy used by large-vocab trainers; numerically identical to
    the dense loss (same fp32 logsumexp)."""
    B, T, D = hidden.shape
    hs = hidden[:, :-1].reshape(-1, D)
    lbl = labels[:, 1:].reshape(-1)
    N = hs.shape[0]
    n_chunks = -(-N // chunk)
    pad = n_chunks * chunk - N
    if pad:
        hs = jnp.pad(hs, ((0, pad), (0, 0)))
        lbl = jnp.pad(lbl, (0, pad), constant_values=-100)
    hs = hs.reshape(n_chunks, chunk, D)
    lbl = lbl.reshape(n_chunks, chunk)

    def body(carry, xs):
        h_c, l_c = xs
        logits = decoder_lib.compute_logits(lm_params, tc, h_c)  # (chunk, V)
        lse = jax.scipy.special.logsumexp(logits, axis=-1)
        valid = l_c != -100
        safe = jnp.where(valid, l_c, 0)
        lbl_logit = jnp.take_along_axis(logits, safe[:, None], axis=-1)[:, 0]
        nll = jnp.where(valid, lse - lbl_logit, 0.0)
        s, c = carry
        return (s + nll.sum(), c + valid.sum()), None

    return jax.lax.scan(
        jax.checkpoint(body),
        (jnp.zeros((), jnp.float32), jnp.zeros((), jnp.int32)),
        (hs, lbl),
    )[0]


def causal_lm_loss_chunked(
    lm_params: Params,
    tc,
    hidden: jax.Array,
    labels: jax.Array,
    *,
    chunk: int = 128,
) -> jax.Array:
    """Mean next-token CE over supervised positions (see chunked_nll_sums)."""
    s, c = chunked_nll_sums(lm_params, tc, hidden, labels, chunk=chunk)
    return s / jnp.maximum(c, 1)


def prediction_masks(labels: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """(pred_mask, eot_mask): positions predicting a labelled token, and the
    last such position per row (reference: ultravox_model.py:158-200), as
    fixed-shape boolean arrays."""
    label_mask = labels != -100
    pred_mask = jnp.zeros_like(label_mask).at[:, :-1].set(label_mask[:, 1:])
    T = labels.shape[1]
    idx = jnp.arange(T, dtype=jnp.int32)[None]
    last = jnp.max(jnp.where(pred_mask, idx, -1), axis=1)  # (B,)
    eot_mask = (idx == last[:, None]) & (last[:, None] >= 0)
    return pred_mask, eot_mask


def _masked_kl(
    student_logits: jax.Array,  # (B, T, V)
    teacher_logits: jax.Array,  # (B, T2, V)
    s_mask: jax.Array,  # (B, T) bool
    t_mask: jax.Array,  # (B, T2) bool
    temperature: float,
) -> jax.Array:
    """KL(teacher ‖ student) with torch-kl_div 'batchmean' semantics: the sum
    of per-position KLs divided by the number of masked positions.

    Student and teacher sequences differ in length/alignment (audio tokens vs
    text tokens); the reference gathers masked rows of each and relies on the
    two selections having equal counts (ultravox_model.py:229-239). Here both
    selections are realigned to a common compacted index instead.
    """
    B, T, V = student_logits.shape
    T2 = teacher_logits.shape[1]

    def compact(logits, mask, length):
        # stable compaction: k-th masked position -> slot k
        order = jnp.cumsum(mask, axis=1) - 1  # (B, T) slot per position
        slots = jnp.where(mask, order, length)  # invalid -> dropped
        out = jnp.zeros((B, length, V), jnp.float32)
        bidx = jnp.broadcast_to(jnp.arange(B)[:, None], slots.shape)
        return out.at[bidx, slots].add(logits.astype(jnp.float32), mode="drop")

    max_rows = min(T, T2)
    s = compact(student_logits, s_mask, max_rows)
    t = compact(teacher_logits, t_mask, max_rows)
    # the reference asserts equal masked counts on both streams
    # (ultravox_model.py:229-239 relies on it); tokenization-boundary shifts
    # can break that by a few positions, so only rows present in BOTH
    # compactions contribute — a silent mismatch must not pair student rows
    # with all-zero teacher rows
    n_s = s_mask.sum(axis=1)  # (B,)
    n_t = t_mask.sum(axis=1)
    n_common = jnp.minimum(n_s, n_t)
    slot = jnp.arange(max_rows)[None]
    row_valid = slot < n_common[:, None]  # (B, max_rows)

    s_logp = jax.nn.log_softmax(s / temperature, axis=-1)
    t_logp = jax.nn.log_softmax(t / temperature, axis=-1)
    t_p = jnp.exp(t_logp)
    kl = jnp.sum(t_p * (t_logp - s_logp), axis=-1)  # (B, max_rows)
    kl = jnp.where(row_valid, kl, 0.0)
    return kl.sum() / jnp.maximum(row_valid.sum(), 1)


def _compact_rows(x: jax.Array, mask: jax.Array, length: int) -> jax.Array:
    """Stable compaction of masked rows: k-th True position of row b lands
    at [b, k]; surplus positions are dropped. x: (B, T, D) -> (B, length, D).
    Same scheme as _masked_kl's logits compaction, but over the (tiny)
    hidden dimension instead of the vocabulary."""
    B, T = mask.shape
    order = jnp.cumsum(mask, axis=1) - 1
    slots = jnp.where(mask, order, length)
    out = jnp.zeros((B, length, x.shape[-1]), x.dtype)
    bidx = jnp.broadcast_to(jnp.arange(B)[:, None], slots.shape)
    return out.at[bidx, slots].add(x, mode="drop")


def _masked_kl_chunked(
    lm_s: Params,
    lm_t: Params,
    tc,
    h_s: jax.Array,  # (B, T, D) student hidden
    h_t: jax.Array,  # (B, T2, D) teacher hidden
    s_mask: jax.Array,  # (B, T) bool
    t_mask: jax.Array,  # (B, T2) bool
    temperature: float,
    *,
    rows: Optional[int] = None,
    chunk: int = 128,
) -> jax.Array:
    """``_masked_kl`` with the vocabulary projected lazily: both streams'
    HIDDEN states are compacted to the common masked rows (B, rows, D) —
    a few MB — and the student/teacher logits exist only one ``chunk`` of
    rows at a time inside a rematerialised scan."""
    B, T, D = h_s.shape
    T2 = h_t.shape[1]
    R = min(T, T2) if rows is None else rows
    s = _compact_rows(h_s, s_mask, R)
    t = _compact_rows(h_t, t_mask, R)
    n_common = jnp.minimum(s_mask.sum(axis=1), t_mask.sum(axis=1))
    slot = jnp.arange(R)[None]
    row_valid = (slot < n_common[:, None]).reshape(-1)  # (B*R,)

    sf = s.reshape(-1, D)
    tf = t.reshape(-1, D)
    N = sf.shape[0]
    ch = min(chunk, N)
    n_chunks = -(-N // ch)
    pad = n_chunks * ch - N
    if pad:
        sf = jnp.pad(sf, ((0, pad), (0, 0)))
        tf = jnp.pad(tf, ((0, pad), (0, 0)))
        row_valid = jnp.pad(row_valid, (0, pad))
    sf = sf.reshape(n_chunks, ch, D)
    tf = tf.reshape(n_chunks, ch, D)
    rv = row_valid.reshape(n_chunks, ch)

    def body(carry, xs):
        s_c, t_c, v_c = xs
        s_logp = jax.nn.log_softmax(
            decoder_lib.compute_logits(lm_s, tc, s_c) / temperature, axis=-1
        )
        t_logp = jax.nn.log_softmax(
            decoder_lib.compute_logits(lm_t, tc, t_c) / temperature, axis=-1
        )
        t_p = jnp.exp(t_logp)
        kl = jnp.sum(t_p * (t_logp - s_logp), axis=-1)  # (ch,)
        acc = carry
        return acc + jnp.where(v_c, kl, 0.0).sum(), None

    total, _ = jax.lax.scan(
        jax.checkpoint(body), jnp.zeros((), jnp.float32), (sf, tf, rv)
    )
    return total / jnp.maximum(row_valid.sum(), 1)


def kl_distillation_loss_chunked(
    lm_params: Params,
    tc,
    student_hidden: jax.Array,  # (B, T, D)
    labels: jax.Array,
    teacher_hidden: jax.Array,  # (B, T2, D) — already stop_gradient'ed
    alt_labels: jax.Array,
    loss_config: LossConfig,
    *,
    chunk: int = 128,
) -> jax.Array:
    """``kl_distillation_loss`` from hidden states (see _masked_kl_chunked).
    The EOT term compacts to a single row per sequence. The teacher's head
    projection is a constant (the whole teacher branch is no-grad in the
    reference, ultravox_model.py:312-320)."""
    lm_teacher = jax.lax.stop_gradient(lm_params)
    pred_mask, eot_mask = prediction_masks(labels)
    alt_pred_mask, alt_eot_mask = prediction_masks(alt_labels)
    loss = _masked_kl_chunked(
        lm_params, lm_teacher, tc, student_hidden, teacher_hidden,
        pred_mask, alt_pred_mask, loss_config.kl_temperature, chunk=chunk,
    )
    if loss_config.eot_loss_weight > 0:
        loss = loss + loss_config.eot_loss_weight * _masked_kl_chunked(
            lm_params, lm_teacher, tc, student_hidden, teacher_hidden,
            eot_mask, alt_eot_mask, loss_config.kl_temperature,
            rows=1, chunk=chunk,
        )
    return loss


def kl_distillation_loss(
    student_logits: jax.Array,
    labels: jax.Array,
    teacher_logits: jax.Array,
    alt_labels: jax.Array,
    loss_config: LossConfig,
) -> jax.Array:
    """Audio-student vs text-teacher KL loss (ultravox_model.py:202-257):
    batchmean KL at ``kl_temperature`` over prediction positions, plus
    ``eot_loss_weight`` × the same KL restricted to the EOT position."""
    pred_mask, eot_mask = prediction_masks(labels)
    alt_pred_mask, alt_eot_mask = prediction_masks(alt_labels)
    loss = _masked_kl(
        student_logits, teacher_logits, pred_mask, alt_pred_mask,
        loss_config.kl_temperature,
    )
    if loss_config.eot_loss_weight > 0:
        loss = loss + loss_config.eot_loss_weight * _masked_kl(
            student_logits, teacher_logits, eot_mask, alt_eot_mask,
            loss_config.kl_temperature,
        )
    return loss


def ultravox_loss(
    params: Params,
    cfg: UltravoxConfig,
    batch: Dict[str, jax.Array],
    loss_config: LossConfig,
    *,
    remat: bool = False,
    attn_impl: str = "xla",
    vocab_chunk: Optional[int] = None,
    pipe_mesh=None,
    pipe_micro: Optional[int] = None,
) -> jax.Array:
    """Training loss: CE, or KL distillation against the text-only teacher
    (same LLM weights, alt_* token stream) — reference forward+loss path
    ultravox_model.py:277-352.

    ``vocab_chunk``: compute the loss from hidden states, projecting to the
    vocabulary only ``vocab_chunk`` positions at a time — the (B, T, V)
    fp32 logits tensors (GB-scale at 128K vocabs) never materialize. Same
    value and gradients as the dense path.

    ``pipe_mesh``: pipeline-parallel decoder (student AND KL teacher)."""
    chunked = vocab_chunk is not None and vocab_chunk > 0
    out = ultravox_forward(
        params, cfg, batch, remat=remat, attn_impl=attn_impl,
        return_hidden=chunked, pipe_mesh=pipe_mesh, pipe_micro=pipe_micro,
    )
    if loss_config.loss_function == LossFunction.CROSS_ENTROPY:
        if chunked:
            return causal_lm_loss_chunked(
                params["language_model"], cfg.text_config, out,
                batch["labels"], chunk=vocab_chunk,
            )
        return causal_lm_loss(out, batch["labels"])

    # Teacher: text-only forward with the same (frozen-by-stop-gradient) LLM.
    teacher_params = jax.lax.stop_gradient(params["language_model"])
    alt_ids = batch["alt_input_ids"]
    alt_mask = batch["alt_attention_mask"]
    B, T2 = alt_ids.shape
    positions = jnp.broadcast_to(jnp.arange(T2, dtype=jnp.int32)[None], (B, T2))
    if pipe_mesh is not None and dict(pipe_mesh.shape).get("pipe", 1) > 1:
        from ultravox_tpu.parallel.pipeline import pipelined_decoder_hidden

        teacher_out = pipelined_decoder_hidden(
            teacher_params,
            cfg.text_config,
            decoder_lib.embed_lookup(teacher_params, alt_ids),
            positions,
            alt_mask.sum(axis=-1).astype(jnp.int32),
            mesh=pipe_mesh,
            n_micro=pipe_micro,
            remat=remat,
        )
        if not chunked:
            teacher_out = decoder_lib.compute_logits(
                teacher_params, cfg.text_config, teacher_out
            )
    else:
        teacher_out, _ = decoder_lib.decoder_forward(
            teacher_params,
            cfg.text_config,
            input_ids=alt_ids,
            positions=positions,
            kv_valid_len=alt_mask.sum(axis=-1).astype(jnp.int32),
            remat=remat,
            attn_impl=attn_impl,
            return_hidden=chunked,
        )
    if chunked:
        return kl_distillation_loss_chunked(
            params["language_model"],
            cfg.text_config,
            out,
            batch["labels"],
            teacher_out,
            batch["alt_labels"],
            loss_config,
            chunk=vocab_chunk,
        )
    return kl_distillation_loss(
        out,
        batch["labels"],
        teacher_out,
        batch["alt_labels"],
        loss_config,
    )
