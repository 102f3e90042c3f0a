"""Per-op attribution inside one encoder layer on the real TPU.

The headline encoder runs ~52% MFU; per-layer is ~5.5 ms vs ~2.9 ms of
pure matmul FLOPs at peak. This times each component of
whisper_encoder._encoder_layer in isolation (batch 8 x 1500 positions,
large-v3-turbo dims, bf16) to find where the ~2.6 ms/layer tax lives.

Usage: python scripts/profile_encoder_layer.py
"""

import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def fence(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def time_fn(fn, *args, iters=20):
    fence(fn(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    fence(out)
    return (time.perf_counter() - t0) / iters


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

    t = time_fn(jax.jit(
        lambda x: layer_norm(x, p["attn_ln"]["scale"], p["attn_ln"]["bias"])
    ), x)
    print(f"layer_norm:            {t*1e3:7.3f} ms", flush=True)

    t = time_fn(jax.jit(lambda x: proj_apply(x, p["q_proj"])), x)
    print(f"one DxD proj:          {t*1e3:7.3f} ms", flush=True)

    qkv = jnp.asarray(rng.standard_normal((B, T, H, Dh)), jnp.bfloat16)

    t = time_fn(jax.jit(
        lambda q: fused_attention(
            q, q, q, lens, scale=Dh**-0.5, block_q=1500
        )
    ), qkv)
    print(f"fused attention:       {t*1e3:7.3f} ms", flush=True)

    for bq in (512, 768):
        t = time_fn(jax.jit(
            lambda q, _bq=bq: fused_attention(
                q, q, q, lens, scale=Dh**-0.5, block_q=_bq
            )
        ), qkv)
        print(f"fused attention bq={bq}: {t*1e3:7.3f} ms", flush=True)

    t = time_fn(jax.jit(
        lambda q: mha(q, q, q, bias=length_mask_bias(lens, T),
                      scale=Dh**-0.5)
    ), qkv)
    print(f"xla attention:         {t*1e3:7.3f} ms", flush=True)

    def mlp(x):
        h = jax.nn.gelu(proj_apply(x, p["fc1"]), approximate=False)
        return proj_apply(h, p["fc2"])

    t = time_fn(jax.jit(mlp), x)
    print(f"mlp fc1+gelu+fc2:      {t*1e3:7.3f} ms", flush=True)

    def full_layer(x):
        return whisper_encoder._encoder_layer(
            cfg, x, None, p,
            attn_fn=lambda q, k, v: fused_attention(
                q, k, v, lens, scale=Dh**-0.5, block_q=1500
            ),
        )

    t = time_fn(jax.jit(full_layer), x)
    print(f"full layer (fused):    {t*1e3:7.3f} ms", flush=True)

    # matmul-only roofline check at these dims
    w = jnp.asarray(rng.standard_normal((D, F)), jnp.bfloat16)

    t = time_fn(jax.jit(lambda a, b: a.reshape(B * T, D) @ b), x, w)
    tf = 2 * B * T * D * F / 1e12
    print(f"raw (BT,{D})x({D},{F}): {t*1e3:7.3f} ms "
          f"= {tf/t:.1f} TF/s", flush=True)


if __name__ == "__main__":
    main()
