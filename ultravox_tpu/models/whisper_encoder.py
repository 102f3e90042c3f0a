"""Whisper-style audio encoder, TPU-native.

Functional re-design of the reference's ``ModifiedWhisperEncoder``
(ultravox_model.py:803-994): pure function over a parameter pytree, per-layer
weights stacked on a leading axis and iterated with ``lax.scan`` (fast
compiles, natural remat), attention masking expressed as additive biases with
static shapes.

Reference behaviours carried over:
- accepts < 30 s inputs: position embeddings sliced to the input length
  (ultravox_model.py:897);
- per-sample length masking from mel-frame lengths (ultravox_model.py:915-926);
- optional block-causal streaming latency mask (ultravox_model.py:834-863);
- LayerDrop is intentionally omitted: the reference force-disables it under
  DDP because stochastic depth desyncs ranks (config_base.py:275-284) and all
  released recipes train with the encoder frozen.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ultravox_tpu.models.config import WhisperEncoderConfig
from ultravox_tpu.models.lora import proj_apply
from ultravox_tpu.ops.attention import block_causal_bias, length_mask_bias, mha
from ultravox_tpu.ops.norms import layer_norm

Params = Dict[str, Any]


def feat_extract_output_length(mel_len: jax.Array | int):
    """Mel frames -> encoder positions (conv2 stride 2): (n - 1) // 2 + 1."""
    return (mel_len - 1) // 2 + 1


def init_params(
    cfg: WhisperEncoderConfig, rng: jax.Array, dtype=jnp.float32
) -> Params:
    """Random init (for tests / training from scratch). Real use loads
    converted HF weights via ``ultravox_tpu.models.weights``."""
    k = iter(jax.random.split(rng, 16))
    d, f, L = cfg.d_model, cfg.ffn_dim, cfg.num_layers
    dn = lambda *s: jax.random.normal(next(k), s, dtype) * 0.02

    def ln():
        return {"scale": jnp.ones((L, d), dtype), "bias": jnp.zeros((L, d), dtype)}

    return {
        "conv1": {"kernel": dn(3, cfg.num_mel_bins, d), "bias": jnp.zeros(d, dtype)},
        "conv2": {"kernel": dn(3, d, d), "bias": jnp.zeros(d, dtype)},
        "embed_positions": dn(cfg.max_source_positions, d),
        "layers": {
            "attn_ln": ln(),
            "q_proj": {"kernel": dn(L, d, d), "bias": jnp.zeros((L, d), dtype)},
            "k_proj": {"kernel": dn(L, d, d)},
            "v_proj": {"kernel": dn(L, d, d), "bias": jnp.zeros((L, d), dtype)},
            "out_proj": {"kernel": dn(L, d, d), "bias": jnp.zeros((L, d), dtype)},
            "final_ln": ln(),
            "fc1": {"kernel": dn(L, d, f), "bias": jnp.zeros((L, f), dtype)},
            "fc2": {"kernel": dn(L, f, d), "bias": jnp.zeros((L, d), dtype)},
        },
        "layer_norm": {"scale": jnp.ones(d, dtype), "bias": jnp.zeros(d, dtype)},
    }


def quantize_encoder_int8(params: Params) -> Params:
    """Weight-only int8 for the encoder's transformer projections (q/k/v/out,
    fc1/fc2) — per-output-channel symmetric scales, applied natively as
    int8 x int8 -> int32 MXU dots by ``proj_apply`` (w8a8). Convs, position
    embeddings, and layernorms stay in their original dtype (<1% of weight
    bytes). The encoder is frozen in every reference recipe, so inference
    quantization loses no training capability; the matmul-bound 30 s-window
    encode runs ~1.5x faster on v5e."""
    from ultravox_tpu.models.decoder import _quantize_kernel

    def to_bf16(tree):
        return jax.tree.map(
            lambda a: a.astype(jnp.bfloat16)
            if jnp.issubdtype(a.dtype, jnp.floating)
            else a,
            tree,
        )

    layers = {}
    for name, leaf in params["layers"].items():
        if isinstance(leaf, dict) and "kernel" in leaf and "lora_a" not in leaf:
            q, scale = _quantize_kernel(leaf["kernel"])
            new = {"kernel_q": q, "scale": scale}
            if "bias" in leaf:
                new["bias"] = to_bf16(leaf["bias"])
            layers[name] = new
        else:
            layers[name] = to_bf16(leaf)
    out = {
        # convs / position embeds / final LN go bf16 so the quantized tree
        # has one coherent activation dtype (int8 scales are bf16)
        k: to_bf16(v)
        for k, v in params.items()
        if k != "layers"
    }
    out["layers"] = layers
    return out


def _conv1d(
    x: jax.Array, kernel: jax.Array, bias: jax.Array, stride: int,
    transpose_out: bool = False,
):
    """x: (B, C_in, T); kernel: (K, C_in, C_out); SAME-1 padding like torch
    Conv1d(padding=1), fp32 accumulation.

    Expressed as a shifted-slice matmul rather than lax.conv_general_dilated:
    the native conv measures within ~1 ms of this form at the 30 s batch-8
    window, but its transpose (gradient) rule rejects mixed dtypes when
    ``preferred_element_type`` upcasts (bf16 activations x fp32 cotangent),
    which made any full-encoder finetune at bf16 untraceable. dot_general's
    transpose handles the upcast, so this form is both MXU-shaped and
    differentiable."""
    K, C_in, C_out = kernel.shape
    # int8-quantized trees keep convs in the original param dtype, which
    # can differ from the (scale-dtype) activations entering here
    xp = jnp.pad(x.astype(kernel.dtype), ((0, 0), (0, 0), (1, 1)))
    T_out = (xp.shape[-1] - K) // stride + 1
    patches = jnp.concatenate(
        [
            jax.lax.slice_in_dim(
                xp, k, k + (T_out - 1) * stride + 1, stride, axis=2
            )
            for k in range(K)
        ],
        axis=1,
    )  # (B, K*C_in, T_out), k-major to match kernel.reshape below
    w = kernel.reshape(K * C_in, C_out)
    # transpose_out folds the (B, C, T) -> (B, T, C) layout change into the
    # einsum's output order (free for XLA dots) — the layer stack wants
    # T-major and a separate 30 MB transpose is a measurable stem cost
    spec = "bct,cd->btd" if transpose_out else "bct,cd->bdt"
    if jax.default_backend() == "cpu" and patches.dtype != jnp.float32:
        # the CPU gemm thunk rejects BF16xBF16=F32; the MXU path needs it
        out = jnp.einsum(
            spec, patches.astype(jnp.float32), w.astype(jnp.float32)
        )
    else:
        out = jnp.einsum(
            spec, patches, w, preferred_element_type=jnp.float32
        )
    b = bias[None, None, :] if transpose_out else bias[None, :, None]
    return (out + b).astype(x.dtype)


def _encoder_layer(
    cfg: WhisperEncoderConfig, x, bias, p, *,
    attn_fn=None, attn_qkv_fn=None, ln_fn=None, approx_gelu=False,
):
    """One pre-norm transformer encoder layer. x: (B, T, D).
    ``ln_fn``: LayerNorm implementation (defaults to the XLA path; the
    forward-only fused path passes the Pallas kernel).
    ``approx_gelu``: tanh-approximation GELU — on v5e the exact-erf GELU
    costs ~0.73 ms/layer of pure VPU time at the 30 s batch-8 window while
    the tanh form is literally free (0.843 ms vs relu's 0.857 ms traffic
    bound; scripts/profile_encoder_experiments.py). Max |erf-tanh| GELU
    deviation is ~3e-3 absolute — below bf16 resolution at typical
    activation scales — so the forward-only fused path turns it on.

    When ``p`` carries a fused ``qkv_proj`` (see ``_fuse_qkv_stacked``),
    q/k/v run as ONE (D, 3D) matmul: DxD matmuls only reach ~74 TF/s on
    v5e (output too narrow to fill the MXU pipeline) vs 125 TF/s at 3D
    wide — worth ~0.4 ms/layer net of the slice round-trips."""
    B, T, D = x.shape
    ln = ln_fn or layer_norm
    shape = (B, T, cfg.num_heads, cfg.head_dim)
    if "qkv_proj" in p and attn_qkv_fn is not None:
        # head-major fast path: qkv matmul -> Pallas lane-slice relayout
        # to the attention kernel's (B, 3H, T, Dh) layout -> head-major
        # attention -> einsum out-proj reading the (B, H, T, Dh) output
        # natively ('bhtd,hdm->btm': 268.0 vs 355.5 us/layer for the
        # transpose+matmul form, and 5.9 ms/encode faster than a Pallas
        # out-proj kernel issuing 20 K=64 dots per T-block —
        # attn_out_proj_residual records that negative result). NOTE: an
        # einsum-shaped qkv ('btd,dgh->bgth') probes at plain-matmul speed
        # standalone but LOSES ~5 ms/encode in-context — its output layout
        # forces a relayout copy at the pallas boundary; the explicit
        # relayout kernel is the fast form. int8 qkv trees work here too
        # (proj_apply dequantizes into bf16 before the relayout).
        H, Dh = cfg.num_heads, cfg.head_dim
        from ultravox_tpu.ops.pallas.fused_attention import (
            ln_qkv_head_fused,
            qkv_head_transpose,
        )

        qp = p["qkv_proj"]
        if (
            "kernel" in qp and "lora_a" not in qp and "bias" in qp
            and D % 128 == 0 and (3 * D) % 128 == 0 and T % 128 == 0
        ):
            # single-kernel LN + qkv matmul + head relayout: skips the LN
            # write/read and the (B, T, 3D) intermediate's HBM round trip
            # (~215 MB/layer; LN 114 us + qkv 672 us + relayout 448 us
            # separate vs one matmul-bound kernel)
            qkv_t = ln_qkv_head_fused(
                x, p["attn_ln"]["scale"], p["attn_ln"]["bias"],
                qp["kernel"], qp["bias"], Dh,
            )
        else:
            # int8 / LoRA qkv trees: proj_apply handles dequant + adapters
            h = ln(x, p["attn_ln"]["scale"], p["attn_ln"]["bias"])
            qkv_t = qkv_head_transpose(proj_apply(h, qp), Dh)
        attn_t = attn_qkv_fn(qkv_t)  # (B, H, T, Dh)
        op = p["out_proj"]
        if "kernel" in op and "lora_a" not in op:
            x = x + (
                jnp.einsum(
                    "bhtd,hdm->btm", attn_t, op["kernel"].reshape(H, Dh, D)
                )
                + op["bias"]
            )
            return _encoder_ffn(cfg, x, p, ln, approx_gelu)
        attn = jnp.transpose(attn_t, (0, 2, 1, 3))
    elif "qkv_proj" in p:
        h = ln(x, p["attn_ln"]["scale"], p["attn_ln"]["bias"])
        qkv = proj_apply(h, p["qkv_proj"]).reshape(B, T, 3, D)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        attn = _attn_dispatch(cfg, q, k, v, shape, bias, attn_fn)
    else:
        h = ln(x, p["attn_ln"]["scale"], p["attn_ln"]["bias"])
        q = proj_apply(h, p["q_proj"])
        k = proj_apply(h, p["k_proj"])
        v = proj_apply(h, p["v_proj"])
        attn = _attn_dispatch(cfg, q, k, v, shape, bias, attn_fn)
    attn = attn.reshape(B, T, D)
    x = x + proj_apply(attn, p["out_proj"])
    return _encoder_ffn(cfg, x, p, ln, approx_gelu)


def _encoder_ffn(cfg, x, p, ln, approx_gelu):
    # NOTE (r5): fusing final_ln+fc1+gelu into one Pallas kernel
    # (ops/pallas/fused_attention.py::ln_matmul_gelu) measured 1.8 ms
    # SLOWER per 30 s batch-8 encode than this separate form — XLA's
    # fc1+gelu already runs at ~89% of peak and the Pallas (T,1280)x
    # (1280,5120) dot gives back more than the LN round trip saves.
    # The attention front-end fusion (ln_qkv_head_fused) wins because it
    # also removes the relayout's full HBM round trip, which has no FFN
    # analog. Kernel + parity test kept as the recorded negative result.
    h = ln(x, p["final_ln"]["scale"], p["final_ln"]["bias"])
    h = jax.nn.gelu(proj_apply(h, p["fc1"]), approximate=approx_gelu)
    return x + proj_apply(h, p["fc2"])


def _attn_dispatch(cfg, q, k, v, shape, bias, attn_fn):
    if attn_fn is not None:
        return attn_fn(q.reshape(shape), k.reshape(shape), v.reshape(shape))
    return mha(
        q.reshape(shape),
        k.reshape(shape),
        v.reshape(shape),
        bias=bias,
        scale=cfg.head_dim**-0.5,
    )


def fuse_encoder_inference_params(params: Params) -> Params:
    """Inference-optimised encoder tree: q/k/v concatenated into one
    ``qkv_proj`` (one-time eager HBM copy, like the decoder's
    ``fuse_inference_params``). Apply ONCE at engine/bench setup — never
    inside a jitted forward, where the concat of closed-over weights
    constant-folds into the HLO and chokes compilation. No-op when LoRA
    adapters sit on q/k/v or the tree is already fused; the canonical
    (trainable / exportable / shardable) layout is untouched."""
    ly = params["layers"]
    if "qkv_proj" in ly:
        return params
    for name in ("q_proj", "k_proj", "v_proj"):
        if "lora_a" in ly.get(name, {}):
            return params
    out = dict(params)
    out["layers"] = _fuse_qkv_stacked(ly)
    return out


def _fuse_qkv_stacked(layers: Params) -> Params:
    """Stacked-layer params with q/k/v concatenated into one ``qkv_proj``:
    DxD matmuls only reach ~74 TF/s on v5e (output too narrow to fill the
    MXU pipeline) vs 125 TF/s at 3D wide — ~0.4 ms/layer net of the slice
    round-trips at the 30 s batch-8 window. Handles both bf16 ({kernel})
    and int8 ({kernel_q, scale}) projections. Whisper's k_proj has no
    bias; the fused bias uses zeros for the k third."""
    q, k, v = layers["q_proj"], layers["k_proj"], layers["v_proj"]
    fused = {}
    if "kernel_q" in q:
        fused["kernel_q"] = jnp.concatenate(
            [q["kernel_q"], k["kernel_q"], v["kernel_q"]], axis=-1
        )
        fused["scale"] = jnp.concatenate(
            [q["scale"], k["scale"], v["scale"]], axis=-1
        )
    else:
        fused["kernel"] = jnp.concatenate(
            [q["kernel"], k["kernel"], v["kernel"]], axis=-1
        )
    if "bias" in q:
        kb = k.get("bias", jnp.zeros_like(q["bias"]))
        fused["bias"] = jnp.concatenate([q["bias"], kb, v["bias"]], axis=-1)
    out = {n: p for n, p in layers.items()
           if n not in ("q_proj", "k_proj", "v_proj")}
    out["qkv_proj"] = fused
    return out


# --------------------------------------------------------------------------
# Incremental (streaming) block-causal encode
# --------------------------------------------------------------------------
#
# A block-causal encoder (audio_latency_block_size set — reference
# streaming_tinyllama.yaml:24) admits true incremental encoding: position i
# attends only to blocks <= i's, so a completed block's outputs are FINAL
# the moment its audio arrives. The stream state carries per-layer K/V of
# all completed positions; each step processes exactly ONE latency block of
# new encoder positions against that cache — O(block) work per block
# instead of re-encoding the prefix, which is what lets the serving voice
# path start prefill before end-of-utterance.
#
# Conv locality makes the step self-contained: encoder position q is
# conv2(gelu(conv1(mel)))[q], whose receptive field is mel frames
# [2q-2, 2q+2]; a block of C positions [kC, (k+1)C) therefore needs only
# the mel WINDOW [2kC-2, 2(k+1)C+1) (2C+3 frames, zero-padded at the
# stream edges by the host) — no conv state is carried at all.


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class EncoderStreamState:
    """Per-layer K/V cache over completed encoder positions + fill count."""

    k: jax.Array  # (L, S_max, H, Dh)
    v: jax.Array  # (L, S_max, H, Dh)
    pos: jax.Array  # scalar int32 — encoder positions already cached

    @classmethod
    def zeros(cls, cfg: WhisperEncoderConfig, dtype=jnp.float32):
        shape = (
            cfg.num_layers, cfg.max_source_positions, cfg.num_heads,
            cfg.head_dim,
        )
        return cls(
            k=jnp.zeros(shape, dtype),
            v=jnp.zeros(shape, dtype),
            pos=jnp.zeros((), jnp.int32),
        )


def _conv1d_valid(x, kernel, bias, stride: int):
    """VALID-padding variant of ``_conv1d`` (the stream step supplies its
    own context frames); numerics match it exactly: cast to kernel dtype,
    fp32-accumulated dot, bias, cast back."""
    K, C_in, C_out = kernel.shape
    xp = x.astype(kernel.dtype)
    T_out = (xp.shape[-1] - K) // stride + 1
    patches = jnp.concatenate(
        [
            jax.lax.slice_in_dim(
                xp, k, k + (T_out - 1) * stride + 1, stride, axis=2
            )
            for k in range(K)
        ],
        axis=1,
    )
    w = kernel.reshape(K * C_in, C_out)
    if jax.default_backend() == "cpu" and patches.dtype != jnp.float32:
        out = jnp.einsum(
            "bct,cd->bdt", patches.astype(jnp.float32), w.astype(jnp.float32)
        )
    else:
        out = jnp.einsum(
            "bct,cd->bdt", patches, w, preferred_element_type=jnp.float32
        )
    return (out + bias[None, :, None]).astype(x.dtype)


def encoder_stream_step(
    params: Params,
    state: EncoderStreamState,
    mel_window: jax.Array,  # (n_mels, 2C+3) — frames [2kC-2, 2(k+1)C+1)
    n_valid: jax.Array,  # scalar int32 — valid encoder positions in this
    # block (C for complete blocks; (mel_len-1)//2+1 - kC for the final one)
    *,
    cfg: WhisperEncoderConfig,
    block_size: int,  # C — latency block in ENCODER positions
):
    """One latency block of streaming encode. Returns (new_state, out
    (C, d_model)) where out rows beyond ``n_valid`` are garbage-but-finite
    (excluded downstream by the audio token count, exactly as the batch
    path's padding positions are)."""
    C = block_size
    x = jax.nn.gelu(
        _conv1d_valid(
            mel_window[None], params["conv1"]["kernel"],
            params["conv1"]["bias"], cfg.conv1_stride,
        ),
        approximate=False,
    )
    # the window's first conv1 column is index 2kC-1; at the stream start
    # (k=0) that is conv2's ZERO padding slot in the batch path, not a real
    # conv1 output — gelu(conv1(zero-mel)+bias) != 0, so force the zero
    x = x.at[:, :, 0].set(
        jnp.where(state.pos == 0, 0.0, x[:, :, 0])
    )
    x = jax.nn.gelu(
        _conv1d_valid(
            x, params["conv2"]["kernel"], params["conv2"]["bias"],
            cfg.conv2_stride,
        ),
        approximate=False,
    )
    x = jnp.transpose(x, (0, 2, 1))  # (1, C, D)
    pos = state.pos
    # position embeddings for this block (dynamic offset, static length)
    pe = jax.lax.dynamic_slice_in_dim(
        params["embed_positions"], pos, C, axis=0
    )
    x = x + pe[None].astype(x.dtype)

    S_max = state.k.shape[1]
    kpos = jnp.arange(S_max, dtype=jnp.int32)[None, :]
    # keys visible: every completed position plus this block's valid ones;
    # block-causality is implicit — later blocks simply aren't cached yet
    ok = kpos < (pos + n_valid)
    from ultravox_tpu.ops.attention import NEG_INF

    bias = jnp.where(ok, 0.0, NEG_INF)[:, None, None, :].astype(jnp.float32)

    H, Dh = cfg.num_heads, cfg.head_dim

    def layer_fn(carry, xs):
        h_in = carry
        p, ck, cv = xs
        h = layer_norm(h_in, p["attn_ln"]["scale"], p["attn_ln"]["bias"])
        if "qkv_proj" in p:  # inference-fused tower (fuse_encoder_inference_params)
            qkv = proj_apply(h, p["qkv_proj"]).reshape(1, C, 3, cfg.d_model)
            q = qkv[:, :, 0].reshape(1, C, H, Dh)
            k = qkv[0, :, 1].reshape(C, H, Dh)
            v = qkv[0, :, 2].reshape(C, H, Dh)
        else:
            q = proj_apply(h, p["q_proj"]).reshape(1, C, H, Dh)
            k = proj_apply(h, p["k_proj"]).reshape(C, H, Dh)
            v = proj_apply(h, p["v_proj"]).reshape(C, H, Dh)
        ck = jax.lax.dynamic_update_slice(
            ck, k.astype(ck.dtype), (pos, 0, 0)
        )
        cv = jax.lax.dynamic_update_slice(
            cv, v.astype(cv.dtype), (pos, 0, 0)
        )
        attn = mha(
            q, ck[None], cv[None], bias=bias, scale=cfg.head_dim**-0.5
        ).reshape(1, C, cfg.d_model)
        h_mid = h_in + proj_apply(attn, p["out_proj"])
        h = layer_norm(
            h_mid, p["final_ln"]["scale"], p["final_ln"]["bias"]
        )
        h = jax.nn.gelu(proj_apply(h, p["fc1"]), approximate=False)
        return h_mid + proj_apply(h, p["fc2"]), (ck, cv)

    x, (new_k, new_v) = jax.lax.scan(
        layer_fn, x, (params["layers"], state.k, state.v)
    )
    out = layer_norm(
        x, params["layer_norm"]["scale"], params["layer_norm"]["bias"]
    )[0]
    new_state = EncoderStreamState(
        k=new_k, v=new_v, pos=pos + n_valid.astype(jnp.int32)
    )
    return new_state, out


def encoder_forward(
    params: Params,
    cfg: WhisperEncoderConfig,
    mel: jax.Array,  # (B, n_mels, T_mel) float
    mel_lens: Optional[jax.Array] = None,  # (B,) int32 valid mel frames
    *,
    latency_block_size: Optional[int] = None,
    remat: bool = False,
    attn_impl: str = "xla",
    fused_block_q: int = 1536,
    fused_n_chunks: int = 8,
) -> jax.Array:
    """Encode mel features -> (B, T_out, d_model) hidden states.

    T_out = feat_extract_output_length-style downsampling of T_mel by the two
    convs. Padding positions produce garbage and must be excluded downstream
    via ``mel_lens``-derived token counts (the projector/splice does this).

    ``attn_impl``: "xla" (einsum — the safe differentiable default),
    "fused" (forward-only Pallas kernel — the inference / frozen-encoder
    fast path), or "flash" (Pallas kernel with a custom-VJP backward — the
    training fast path when the encoder itself trains, e.g. audio LoRA).
    """
    if mel.shape[-1] > cfg.max_context_length:
        raise ValueError(
            f"mel length {mel.shape[-1]} exceeds encoder context "
            f"{cfg.max_context_length}; chunk the audio first."
        )
    # the forward-only fused path takes tanh GELU everywhere (incl. the two
    # stem GELUs over ~46M elements): exact-erf GELU is pure VPU cost on
    # TPU while tanh sits at the traffic bound (_encoder_layer docstring)
    stem_approx = attn_impl == "fused"
    x = jax.nn.gelu(
        _conv1d(mel, params["conv1"]["kernel"], params["conv1"]["bias"], cfg.conv1_stride),
        approximate=stem_approx,
    )
    x = jax.nn.gelu(
        _conv1d(
            x, params["conv2"]["kernel"], params["conv2"]["bias"],
            cfg.conv2_stride, transpose_out=True,
        ),
        approximate=stem_approx,
    )  # (B, T, D)
    T = x.shape[1]
    x = x + params["embed_positions"][:T][None].astype(x.dtype)

    bias = None
    attn_fn = None
    attn_qkv_fn = None
    ln_fn = None
    layers = params["layers"]
    approx_gelu = False
    T_real = T
    if attn_impl == "flash":
        from ultravox_tpu.ops.pallas.flash_attention import flash_attention

        feat_lens = (
            feat_extract_output_length(mel_lens) if mel_lens is not None else None
        )
        attn_fn = lambda q, k, v: flash_attention(
            q, k, v, feat_lens,
            scale=cfg.head_dim**-0.5,
            latency_block=latency_block_size or 0,
        )
    elif attn_impl == "fused":
        from ultravox_tpu.ops.pallas.fused_attention import (
            attention_headmajor,
            fused_attention,
        )

        feat_lens = (
            feat_extract_output_length(mel_lens) if mel_lens is not None else None
        )
        if "qkv_proj" in layers:
            # head-major fast path (fuse_encoder_inference_params trees):
            # the hidden states are padded ONCE here to a kernel-friendly
            # length (1500 -> 1536 at the 30 s window) and every layer's
            # attention runs qkv-matmul -> Pallas lane-slice relayout ->
            # head-major attention -> fused out-proj+residual, with zero
            # XLA transposes. The r5 ablation
            # (scripts/profile_encoder_plumbing.py) put the generic
            # kernel's per-layer q/k/v transposes + pad + output transpose
            # at 40.6 ms of the 154.8 ms batch-8 30 s encode — 2.5x the
            # attention dots themselves (16.0 ms; softmax 5.6 ms). Pad
            # rows ride the residual stream as finite garbage: masked as
            # keys via feat_lens, sliced off after the layer stack. Costs
            # +2.4% matmul FLOPs on every layer; wins ~25% wall time.
            T_real = T
            T = -(-T // 128) * 128
            if T != T_real:
                x = jnp.pad(x, ((0, 0), (0, T - T_real), (0, 0)))
            if feat_lens is None:
                feat_lens = jnp.full((x.shape[0],), T_real, jnp.int32)
            n_chunks = fused_n_chunks if T % (8 * fused_n_chunks) == 0 else 1
            attn_qkv_fn = lambda qkv_t: attention_headmajor(
                qkv_t,
                feat_lens,
                n_heads=cfg.num_heads,
                scale=cfg.head_dim**-0.5,
                latency_block=latency_block_size or 0,
                n_chunks=n_chunks,
            )
        else:
            # unfused q/k/v trees (e.g. encoder-LoRA adapters on q/k/v):
            # the generic transpose-layout kernel
            attn_fn = lambda q, k, v: fused_attention(
                q, k, v, feat_lens,
                scale=cfg.head_dim**-0.5,
                latency_block=latency_block_size or 0,
                block_q=fused_block_q,
                n_chunks=fused_n_chunks,
            )
        # the forward-only fast path also takes the fused LayerNorm (XLA's
        # LN measures ~4.6x its traffic bound at these shapes; two LNs per
        # layer made it the largest non-matmul cost in the encode)
        from ultravox_tpu.ops.pallas import layer_norm as pln

        if pln.supports_shape(x.shape[1], cfg.d_model):
            ln_fn = lambda h, scale, bias: pln.fused_layer_norm(
                h, scale, bias
            )
        # forward-only fast path: tanh GELU (see _encoder_layer docstring).
        # The fused qkv matmul is NOT built here: callers opt in by passing
        # params through fuse_encoder_inference_params() ONCE at setup — an
        # in-graph concat of closed-over weights becomes a giant HLO
        # constant-fold that chokes compilation.
        approx_gelu = True
    else:
        if mel_lens is not None:
            feat_lens = feat_extract_output_length(mel_lens)
            bias = length_mask_bias(feat_lens, T)
        if latency_block_size:
            # The reference builds a (3000, 3000) block mask and slices the
            # first (T, T) rows/cols (ultravox_model.py:928-936), so in
            # encoder-position space the block boundaries fall every
            # `latency_block_size` positions.
            lat = block_causal_bias(T, latency_block_size)
            bias = lat if bias is None else jnp.minimum(bias, lat)

    layer_fn = lambda h, p: (
        _encoder_layer(
            cfg, h, bias, p,
            attn_fn=attn_fn, attn_qkv_fn=attn_qkv_fn,
            ln_fn=ln_fn, approx_gelu=approx_gelu,
        ),
        None,
    )
    if remat:
        layer_fn = jax.checkpoint(layer_fn)
    x, _ = jax.lax.scan(layer_fn, x, layers)
    if x.shape[1] != T_real:
        x = x[:, :T_real]
    return layer_norm(
        x, params["layer_norm"]["scale"], params["layer_norm"]["bias"]
    )
