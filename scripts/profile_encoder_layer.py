"""Per-op attribution inside one encoder layer on the real TPU.

The headline encoder runs ~52% MFU; per-layer is ~5.5 ms vs ~2.9 ms of
pure matmul FLOPs at peak. Times each component of
whisper_encoder._encoder_layer (batch 8 x 1500 positions,
large-v3-turbo dims, bf16). Ops run inside a lax.scan (N iterations in
one program) with carry feedback, because per-dispatch latency through
the remote tunnel (~1.7 ms) swamps sub-millisecond ops.

Usage: python scripts/profile_encoder_layer.py
"""

import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ultravox_tpu.utils.profiling import bench_op  # noqa: E402


def main():
    from ultravox_tpu.models import WhisperEncoderConfig, whisper_encoder
    from ultravox_tpu.models.lora import proj_apply
    from ultravox_tpu.ops.attention import length_mask_bias, mha
    from ultravox_tpu.ops.norms import layer_norm
    from ultravox_tpu.ops.pallas.fused_attention import fused_attention

    print("device:", jax.devices()[0], flush=True)
    cfg = WhisperEncoderConfig(
        num_mel_bins=128, d_model=1280, num_layers=32, num_heads=20,
        ffn_dim=5120, max_source_positions=1500,
    )
    params = whisper_encoder.init_params(cfg, jax.random.key(0), jnp.bfloat16)
    p = jax.tree.map(lambda a: a[0] if a.ndim and a.shape[0] == 32 else a,
                     params["layers"])
    B, T, D, F = 8, 1500, 1280, 5120
    H, Dh = cfg.num_heads, cfg.head_dim
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, T, D)), jnp.bfloat16)
    lens = jnp.full((B,), 1500, jnp.int32)

    t = bench_op(
        lambda x: layer_norm(x, p["attn_ln"]["scale"], p["attn_ln"]["bias"]),
        x,
    )
    print(f"layer_norm:            {t*1e3:7.3f} ms", flush=True)

    t = bench_op(
        lambda x: proj_apply(
            layer_norm(x, p["attn_ln"]["scale"], p["attn_ln"]["bias"]),
            p["q_proj"],
        ),
        x,
    )
    print(f"ln+proj fused?:        {t*1e3:7.3f} ms", flush=True)

    t = bench_op(lambda x: proj_apply(x, p["q_proj"]), x)
    print(f"one DxD proj:          {t*1e3:7.3f} ms", flush=True)

    qkv = jnp.asarray(rng.standard_normal((B, T, H, Dh)), jnp.bfloat16)

    for bq in ():  # single-block 1500 already measured; 500 violates the
        # (8,128)-divisible block constraint
        t = bench_op(
            lambda q, _bq=bq: fused_attention(
                q, q, q, lens, scale=Dh**-0.5, block_q=_bq
            ),
            qkv,
        )
        print(f"fused attention bq={bq}: {t*1e3:7.3f} ms", flush=True)

    t = bench_op(
        lambda q: mha(q, q, q, bias=length_mask_bias(lens, T),
                      scale=Dh**-0.5),
        qkv,
    )
    print(f"xla attention:         {t*1e3:7.3f} ms", flush=True)

    def mlp(x):
        h = jax.nn.gelu(proj_apply(x, p["fc1"]), approximate=False)
        return proj_apply(h, p["fc2"])

    t = bench_op(mlp, x)
    tf_mlp = 2 * 2 * B * T * D * F / 1e12
    print(f"mlp fc1+gelu+fc2:      {t*1e3:7.3f} ms = {tf_mlp/t:.0f} TF/s",
          flush=True)

    def full_layer(x):
        return whisper_encoder._encoder_layer(
            cfg, x, None, p,
            attn_fn=lambda q, k, v: fused_attention(
                q, k, v, lens, scale=Dh**-0.5, block_q=1500
            ),
        )

    t = bench_op(full_layer, x)
    print(f"full layer (fused):    {t*1e3:7.3f} ms", flush=True)

    w = jnp.asarray(rng.standard_normal((D, F)), jnp.bfloat16)
    t = bench_op(lambda a: a.reshape(B * T, D) @ w, x)
    tf = 2 * B * T * D * F / 1e12
    print(f"raw (BT,{D})x({D},{F}): {t*1e3:7.3f} ms = {tf/t:.0f} TF/s",
          flush=True)


if __name__ == "__main__":
    main()
