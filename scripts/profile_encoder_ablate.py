"""Phase ablation of the fused encoder attention kernel (round 5).

profile_encoder_chunks.py showed the q-chunk software pipeline bought only
~1.4% whole-encoder time (154.6 vs 156.9 ms), far short of the ~24 ms the
VPU-softmax-serialization hypothesis predicted. This script attributes the
attention gap directly: it monkeypatches `_attn_kernel` with stripped
variants (NOT mathematically valid attention — timing only) and times the
full 32-layer encode for each, so every number is an in-context wall time
at the headline shape (batch 8 x 30 s, whisper-large-v3-turbo dims, bf16).

Variants:
  prod      — the shipped kernel (bias+max+exp2+sum+div)
  no_bias   — drop the length col_bias add
  no_max    — exp2(s - 64) with a fixed shift instead of the max reduce
  no_exp    — identity instead of exp2 (keeps max/sub/sum/div passes)
  dots_only — QK^T -> astype -> PV only: the kernel's MXU floor

Usage: python scripts/profile_encoder_ablate.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ultravox_tpu.ops.pallas import fused_attention as fa  # noqa: E402


def fence(x) -> float:
    return float(jnp.sum(x.astype(jnp.float32)))


def time_fn(fn, *args, iters=10):
    fence(fn(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    fence(out)
    return (time.perf_counter() - t0) / iters


def make_kernel(variant: str):
    """A copy of fa._attn_kernel with softmax phases stripped per variant.

    Only the encoder path (use_lengths, non-causal) is exercised here; the
    causal/latency branches are omitted.
    """

    def kernel(
        lengths_ref, offsets_ref, q_ref, k_ref, v_ref, o_ref, *,
        scale, causal, use_lengths, latency_block, block_q, seq_len,
        n_chunks=1,
    ):
        del causal, latency_block
        b = pl.program_id(0)
        k = k_ref[0, 0]
        v = v_ref[0, 0]

        col_bias = None
        if use_lengths and variant != "no_bias" and variant != "dots_only":
            col = jax.lax.broadcasted_iota(jnp.int32, (8, seq_len), 1)
            col_bias = jnp.where(col < lengths_ref[b], 0.0, fa.NEG_INF)[:1]

        chunk = block_q // n_chunks

        def qk(j):
            q = q_ref[0, 0, j * chunk:(j + 1) * chunk]
            return jnp.dot(q, k.T, preferred_element_type=jnp.float32) * (
                scale * 1.4426950408889634
            )

        s_next = qk(0)
        for j in range(n_chunks):
            s = s_next
            if j + 1 < n_chunks:
                s_next = qk(j + 1)
            if col_bias is not None:
                s = s + col_bias

            if variant == "dots_only":
                o = jnp.dot(s.astype(v.dtype), v,
                            preferred_element_type=jnp.float32)
                o_ref[0, 0, j * chunk:(j + 1) * chunk] = (
                    o.astype(o_ref.dtype))
                continue

            if variant == "no_max":
                e = jnp.exp2(s - 64.0)
            elif variant == "no_exp":
                m = jnp.max(s, axis=-1, keepdims=True)
                e = s - m
            else:  # prod / no_bias
                m = jnp.max(s, axis=-1, keepdims=True)
                e = jnp.exp2(s - m)
            z = jnp.sum(e, axis=-1, keepdims=True)
            o = jnp.dot(e.astype(v.dtype), v,
                        preferred_element_type=jnp.float32)
            o_ref[0, 0, j * chunk:(j + 1) * chunk] = (o / z).astype(
                o_ref.dtype)

    return kernel


from jax.experimental import pallas as pl  # noqa: E402


def main():
    from ultravox_tpu.models import WhisperEncoderConfig, whisper_encoder

    print("device:", jax.devices()[0], flush=True)
    cfg = WhisperEncoderConfig(
        num_mel_bins=128, d_model=1280, num_layers=32, num_heads=20,
        ffn_dim=5120, max_source_positions=1500,
    )
    params = whisper_encoder.init_params(
        cfg, jax.random.key(0), dtype=jnp.bfloat16
    )
    params = whisper_encoder.fuse_encoder_inference_params(params)
    rng = np.random.default_rng(0)
    mel = jnp.asarray(
        rng.standard_normal((8, 128, 3000)) * 0.1, jnp.bfloat16
    )
    lens = jnp.full((8,), 3000, jnp.int32)

    D, F, T, L, B = 1280, 5120, 1500, 32, 8
    flops = (
        2 * (4 * D * D + 2 * D * F) * T * B * L
        + 2 * 2 * T * T * D * B * L
        + 2 * 3 * (128 * D * 3000 + D * D * 1500) * B
    )
    peak = 197e12

    orig = fa._attn_kernel
    base_t = None
    for variant in ("prod", "no_bias", "no_max", "no_exp", "dots_only"):
        fa._attn_kernel = orig if variant == "prod" else make_kernel(variant)
        fa._fused_attention.clear_cache()
        fn = jax.jit(
            lambda p, m, ln: whisper_encoder.encoder_forward(
                p, cfg, m, ln, attn_impl="fused",
                fused_block_q=1536, fused_n_chunks=8,
            )
        )
        try:
            t = time_fn(fn, params, mel, lens)
            if base_t is None:
                base_t = t
            print(
                f"{variant:9s}: {t*1e3:7.2f} ms  MFU {flops/t/peak*100:5.1f}%"
                f"  delta vs prod {-(t-base_t)*1e3:+6.2f} ms",
                flush=True,
            )
        except Exception as e:  # noqa: BLE001
            print(f"{variant} FAILED: {type(e).__name__}: {e}", flush=True)
    fa._attn_kernel = orig


if __name__ == "__main__":
    main()
