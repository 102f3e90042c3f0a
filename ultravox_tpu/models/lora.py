"""LoRA: low-rank adapters on attention/FFN projections.

Re-design of the reference's peft integration (``apply_lora``,
ultravox_model.py:690-709): instead of wrapper modules, target projection
param dicts gain ``lora_a`` (in, r) / ``lora_b`` (r, out) leaves (stacked
with the layer axis), applied inside the projection helper as
``y += (x @ lora_a) @ lora_b * (alpha / r)``. Freezing is then just a
trainable-pattern selection (``.*lora_[ab]$``), and ``merge_lora`` folds the
update into the kernel (reference merge_and_unload, ultravox_model.py:528-559).
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp

from ultravox_tpu.models.config import LoraConfig

Params = Dict[str, Any]

# module-name → param-tree key for each tower
DECODER_TARGETS = {
    "q_proj": "q_proj",
    "k_proj": "k_proj",
    "v_proj": "v_proj",
    "o_proj": "o_proj",
    "gate_proj": "gate_proj",
    "up_proj": "up_proj",
    "down_proj": "down_proj",
}
ENCODER_TARGETS = {
    "q_proj": "q_proj",
    "k_proj": "k_proj",
    "v_proj": "v_proj",
    "out_proj": "out_proj",
    "fc1": "fc1",
    "fc2": "fc2",
}
# reference default target_modules includes wav2vec-style linear_k/linear_q
_ALIASES = {"linear_q": "q_proj", "linear_k": "k_proj"}


def lora_scale(cfg: LoraConfig) -> float:
    return cfg.lora_alpha / max(cfg.r, 1)


def add_lora(
    tower_params: Params,
    cfg: LoraConfig,
    rng: jax.Array,
    targets: Dict[str, str],
    dtype=jnp.float32,
) -> Params:
    """Add stacked lora_a/lora_b leaves to the targeted projections of one
    tower's ``layers`` subtree. A is gaussian-init, B zero-init (standard
    LoRA init: the adapter starts as identity)."""
    if cfg.r <= 0:
        return tower_params
    layers = dict(tower_params["layers"])
    wanted = {
        _ALIASES.get(t, t) for t in (cfg.target_modules or targets.keys())
    }
    keys = jax.random.split(rng, len(targets))
    for key, (mod, tree_key) in zip(keys, sorted(targets.items())):
        if mod not in wanted or tree_key not in layers:
            continue
        proj = dict(layers[tree_key])
        kernel = proj["kernel"]  # (L, in, out)
        L, d_in, d_out = kernel.shape
        proj["lora_a"] = (
            jax.random.normal(key, (L, d_in, cfg.r), dtype) * (1.0 / cfg.r)
        )
        proj["lora_b"] = jnp.zeros((L, cfg.r, d_out), dtype)
        # per-layer scale leaf so the projection helper needs no config;
        # sliced to a scalar by the layer scan
        proj["lora_scale"] = jnp.full((L,), lora_scale(cfg), dtype)
        layers[tree_key] = proj
    out = dict(tower_params)
    out["layers"] = layers
    return out


def apply_lora_to_model(
    params: Params,
    text_lora: LoraConfig,
    audio_lora: LoraConfig,
    rng: jax.Array,
    dtype=jnp.float32,
) -> Params:
    k1, k2 = jax.random.split(rng)
    out = dict(params)
    if text_lora.r > 0 and "language_model" in out:
        out["language_model"] = add_lora(
            out["language_model"], text_lora, k1, DECODER_TARGETS, dtype
        )
    if audio_lora.r > 0 and "audio_tower" in out:
        out["audio_tower"] = add_lora(
            out["audio_tower"], audio_lora, k2, ENCODER_TARGETS, dtype
        )
    return out


def proj_apply(x: jax.Array, p: Params) -> jax.Array:
    """Linear projection with optional bias, LoRA path, or int8 storage.

    int8 path (kernel_q + per-out-channel weight scale): weights are never
    dequantized to bf16 in HBM (a materialized convert would double the
    weight traffic quantization exists to halve). Two regimes, both MXU
    dots over int8 weight operands:

    - decode-shaped (few activation rows, bandwidth-bound): w8a16 — the
      bf16 activation multiplies the int8 weights directly with fp32
      accumulation. Skipping the dynamic activation quantization measures
      ~8% faster per matmul on v5e at (8, 2048)x(2048, 8192)
      (scripts/profile_int8_matmul.py: 52.0 us vs 56.7 us w8a8).
    - batch-shaped (prefill/training, compute-bound): w8a8 — the
      activation is dynamically quantized per row and the dot runs as
      int8 x int8 -> int32, engaging the MXU's double-rate int8 path."""
    if "kernel_q" in p:
        rows = 1
        for d in x.shape[:-1]:
            rows *= d
        if rows <= 32:  # decode-shaped: w8a16 mixed dot
            acc = jax.lax.dot_general(
                x,
                p["kernel_q"],
                (((x.ndim - 1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            out = (acc * p["scale"].astype(jnp.float32)).astype(x.dtype)
        else:
            xf = x.astype(jnp.float32)
            sx = jnp.maximum(
                jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-6
            ) / 127.0
            xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
            acc = jax.lax.dot_general(
                xq,
                p["kernel_q"],
                (((xq.ndim - 1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            out = (
                acc.astype(jnp.float32) * sx * p["scale"].astype(jnp.float32)
            ).astype(x.dtype)
    else:
        out = x @ p["kernel"]
    if "bias" in p:
        out = out + p["bias"]
    if "lora_a" in p:
        # cast the low-rank delta to the base output dtype: fp32 adapters
        # over a bf16/int8 base must not promote the residual stream
        # (dtype-flipping the layer-scan carry is a compile error)
        out = out + (
            ((x @ p["lora_a"]) @ p["lora_b"]) * p["lora_scale"]
        ).astype(out.dtype)
    return out


def merge_lora(
    params: Params,
    towers: Sequence[str] = ("language_model", "audio_tower"),
) -> Params:
    """Fold LoRA into the kernels and drop the adapter leaves
    (reference merge_and_unload)."""

    def merge_tower(tower: Params) -> Params:
        layers = {}
        for key, leaf in tower["layers"].items():
            if isinstance(leaf, dict) and "lora_a" in leaf:
                new = dict(leaf)
                a = new.pop("lora_a")
                b = new.pop("lora_b")
                scale = new.pop("lora_scale")[:, None, None]
                delta = jnp.einsum("lir,lro->lio", a, b) * scale
                new["kernel"] = new["kernel"] + delta.astype(new["kernel"].dtype)
                layers[key] = new
            else:
                layers[key] = leaf
        out = dict(tower)
        out["layers"] = layers
        return out

    out = dict(params)
    for tower in towers:
        if tower in out and "layers" in out.get(tower, {}):
            out[tower] = merge_tower(out[tower])
    return out


def lora_trainable_patterns() -> Tuple[str, ...]:
    return (r".*lora_[ab]$",)


def build_lora_banks(adapters: Dict[str, Params]):
    """Stack several LoRA adapters into per-target banks for multi-LoRA
    serving (one base model serving many fine-tunes concurrently — the
    vLLM multi-LoRA role, which the reference's single-adapter peft
    integration cannot do).

    ``adapters``: name -> LM params tree whose ``layers`` subtree carries
    ``lora_a``/``lora_b``/``lora_scale`` leaves on some projections (the
    shape ``add_lora`` produces and adapter-diff checkpoints store).

    Returns ``(banks, index)``: ``banks[target] = {"a": (L, N+1, d_in, r),
    "b": (L, N+1, r, d_out), "scale": (L, N+1, 1, 1)}`` with bank slot 0
    all-zeros (= base model, exact no-op), and ``index[name] = 1..N``.
    Adapters may target different projections (missing targets are zero
    rows) but must share the rank within each target. Bank dtype follows
    the adapter leaves (bf16 in production serving; fp32 tests stay
    fp32-exact vs the unbanked LoRA math)."""
    index = {name: i + 1 for i, name in enumerate(sorted(adapters))}
    n_banks = len(index) + 1
    targets: Dict[str, Tuple[int, int, int, int]] = {}
    dtype = None
    for name, tree in adapters.items():
        for tgt, proj in tree["layers"].items():
            if isinstance(proj, dict) and "lora_a" in proj:
                L, d_in, r = proj["lora_a"].shape
                d_out = proj["lora_b"].shape[-1]
                dtype = proj["lora_a"].dtype if dtype is None else dtype
                prev = targets.get(tgt)
                if prev is not None and prev != (L, d_in, r, d_out):
                    raise ValueError(
                        f"adapter {name!r} target {tgt!r} shape "
                        f"{(L, d_in, r, d_out)} != {prev} of another adapter"
                        " — multi-LoRA banks need matching ranks per target"
                    )
                targets[tgt] = (L, d_in, r, d_out)
    if not targets:
        raise ValueError("no lora_a leaves found in any adapter")
    banks = {}
    for tgt, (L, d_in, r, d_out) in targets.items():
        a = jnp.zeros((L, n_banks, d_in, r), dtype)
        b = jnp.zeros((L, n_banks, r, d_out), dtype)
        sc = jnp.zeros((L, n_banks, 1, 1), dtype)
        for name, tree in adapters.items():
            proj = tree["layers"].get(tgt)
            if not (isinstance(proj, dict) and "lora_a" in proj):
                continue
            i = index[name]
            a = a.at[:, i].set(proj["lora_a"].astype(dtype))
            b = b.at[:, i].set(proj["lora_b"].astype(dtype))
            scale = proj["lora_scale"].astype(dtype)  # (L,)
            sc = sc.at[:, i].set(scale[:, None, None])
        banks[tgt] = {"a": a, "b": b, "scale": sc}
    return banks, index


def fuse_lora_banks(
    banks: Params,
    qkv_dims: Tuple[int, int, int],
    gateup_dims: Tuple[int, int],
) -> Params:
    """Recombine canonical-target banks into the FUSED-projection layout
    (``fuse_inference_params``' qkv_proj / gateup_proj), so multi-LoRA
    serving keeps the fused (and int8-quantized) base matmuls instead of
    penalising every request with unfused projections.

    A fused adapter is exact block algebra: A_f = [A_q | A_k | A_v]
    (d_in, r_q+r_k+r_v) and B_f = blockdiag(s_q B_q, s_k B_k, s_v B_v)
    (Σr, d_q+d_k+d_v) — the zero off-diagonal blocks kill cross terms, so
    ``x @ A_f @ B_f`` equals the concatenation of the member updates.
    Per-target scales fold into B_f; the fused scale leaf is 1. Members a
    given adapter does not target contribute zero blocks (exact no-op)."""
    out = dict(banks)
    for fused_name, members, dims in (
        ("qkv_proj", ("q_proj", "k_proj", "v_proj"), qkv_dims),
        ("gateup_proj", ("gate_proj", "up_proj"), gateup_dims),
    ):
        present = [m for m in members if m in out]
        if not present:
            continue
        ref = out[present[0]]
        L, N, d_in, _ = ref["a"].shape
        dtype = ref["a"].dtype
        a_parts = []
        segs = []  # (bank, r, out_offset, d_out)
        off = 0
        for m, d_out in zip(members, dims):
            if m in out:
                bk = out.pop(m)
                r = bk["a"].shape[-1]
                a_parts.append(bk["a"])
                segs.append((bk, r, off, d_out))
            off += d_out
        d_out_total = sum(dims)
        a_f = jnp.concatenate(a_parts, axis=-1)
        total_r = a_f.shape[-1]
        b_f = jnp.zeros((L, N, total_r, d_out_total), dtype)
        r_off = 0
        for bk, r, o, d_out in segs:
            b_f = b_f.at[:, :, r_off:r_off + r, o:o + d_out].set(
                bk["b"] * bk["scale"]
            )
            r_off += r
        out[fused_name] = {
            "a": a_f,
            "b": b_f,
            "scale": jnp.ones((L, N, 1, 1), dtype),
        }
    return out


def apply_lora_banks(lm_params: Params, banks: Params, idx: jax.Array):
    """Inject per-ROW adapters into an (unfused) LM tree: for each banked
    target, gather the rows' adapters so ``lora_a`` becomes (L, B, d_in, r)
    etc. ``proj_apply``'s LoRA math then broadcasts batchwise
    ((B, T, d) @ (B, d, r) @ (B, r, out) * (B, 1, 1)), so every sequence in
    one decode/prefill dispatch runs its own adapter; bank slot 0 is zeros
    (base model). Traced inside the serving jit — the gather is per
    dispatch and amortizes over block steps."""
    layers = dict(lm_params["layers"])
    for tgt, bank in banks.items():
        proj = dict(layers[tgt])
        proj["lora_a"] = bank["a"][:, idx]
        proj["lora_b"] = bank["b"][:, idx]
        proj["lora_scale"] = bank["scale"][:, idx]
        layers[tgt] = proj
    out = dict(lm_params)
    out["layers"] = layers
    return out
