"""Second encoder ablation (round 5): non-attention floor and kernel plumbing.

profile_encoder_ablate.py showed the softmax is ~5.6 ms of the 154.8 ms
encode (dots_only 149.2) — the gap to the ~30 ms MXU floor for the dots
lives in the dots themselves and/or the kernel plumbing (q/k/v transposes
to (B,H,T,D), the pad to block_q, the pallas_call boundary materialization,
and the output transpose back). This script separates them:

  identity  — attention replaced by `q` passthrough: the non-attention
              floor N (projections, FFN, LN, conv stem, reshapes)
  plumbing  — full transpose/pad/pallas/untranspose plumbing with a
              copy kernel (no dots, no softmax): N + plumbing
  (ablate)  — dots_only 149.2 = N + plumbing + dots; prod 154.8 adds softmax

Usage: python scripts/profile_encoder_plumbing.py
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


def copy_kernel(
    lengths_ref, offsets_ref, q_ref, k_ref, v_ref, o_ref, *,
    scale, causal, use_lengths, latency_block, block_q, seq_len, n_chunks=1,
):
    # touch k/v so their DMAs aren't elided, then pass q through (vector
    # row, not scalar extract — Mosaic only supports 32-bit scalar extracts)
    zero_row = (k_ref[0, 0, 0:1, :] + v_ref[0, 0, 0:1, :]) * 0
    o_ref[0, 0] = q_ref[0, 0] + zero_row


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

    orig_wrapper = fa.fused_attention
    orig_kernel = fa._attn_kernel

    def run(tag):
        fa._fused_attention.clear_cache()
        fn = jax.jit(
            lambda p, m, ln: whisper_encoder.encoder_forward(
                p, cfg, m, ln, attn_impl="fused",
                fused_block_q=1536, fused_n_chunks=8,
            )
        )
        t = time_fn(fn, params, mel, lens)
        print(f"{tag:9s}: {t*1e3:7.2f} ms", flush=True)

    try:
        fa.fused_attention = (
            lambda q, k, v, lengths=None, row_offsets=None, **kw: q
        )
        run("identity")
    finally:
        fa.fused_attention = orig_wrapper

    try:
        fa._attn_kernel = copy_kernel
        run("plumbing")
    finally:
        fa._attn_kernel = orig_kernel


if __name__ == "__main__":
    main()
