"""Attention-kernel variant experiments for the encoder-MFU push (round 5).

The r3/r4 breakdown put fused attention at ~54 TF/s against a ~98 TF/s
ceiling (both QK^T and PV run the 128-wide MXU at 50% because head_dim=64).
The gap decomposes into (a) the 3 input + 1 output HBM transposes around
the kernel (~124 MB/layer), (b) the fp32 exp2 + mask passes over the
(1500, 1500) logits block, (c) imperfect MXU/VPU overlap. Each variant
isolates one term at the headline shape (B=8, T=S=1500, H=20, D=64, bf16).

Usage: python scripts/profile_encoder_attn.py
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402


def fence(x) -> float:
    return float(jnp.sum(x.astype(jnp.float32)))


def time_fn(fn, *args, iters=20):
    fence(fn(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    fence(out)
    return (time.perf_counter() - t0) / iters


NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)


def _kernel_v2(
    lengths_ref, q_ref, k_ref, v_ref, o_ref, *,
    scale, use_lengths, seq_len, exp_dtype,
):
    """Like the production kernel but with a configurable exp dtype: the
    probabilities are consumed in bf16 by the PV dot anyway, so computing
    exp2 at bf16 halves the VPU transcendental cost if Mosaic packs it."""
    b = pl.program_id(0)
    q = q_ref[0, 0]
    k = k_ref[0, 0]
    s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * (
        scale * 1.4426950408889634
    )
    if use_lengths:
        col = jax.lax.broadcasted_iota(jnp.int32, (8, seq_len), 1)
        bias = jnp.where(col < lengths_ref[b], 0.0, NEG_INF)[:1]
        s = s + bias
    m = jnp.max(s, axis=-1, keepdims=True)
    if exp_dtype == jnp.bfloat16:
        e = jnp.exp2((s - m).astype(jnp.bfloat16))
        z = jnp.sum(e.astype(jnp.float32), axis=-1, keepdims=True)
    else:
        e = jnp.exp2(s - m)
        z = jnp.sum(e, axis=-1, keepdims=True)
    o = jnp.dot(
        e.astype(v_ref.dtype), v_ref[0, 0], preferred_element_type=jnp.float32
    )
    o_ref[0, 0] = (o / z).astype(o_ref.dtype)


def attn_v2(q, k, v, lengths, *, scale, block_q, exp_dtype,
            interpret=None):
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    B, T, H, D = q.shape
    S = k.shape[1]
    qt = jnp.transpose(q, (0, 2, 1, 3))
    kt = jnp.transpose(k, (0, 2, 1, 3))
    vt = jnp.transpose(v, (0, 2, 1, 3))
    use_lengths = lengths is not None
    if lengths is None:
        lengths = jnp.full((B,), S, jnp.int32)
    grid = (B, H, T // block_q)
    out = pl.pallas_call(
        functools.partial(
            _kernel_v2, scale=scale, use_lengths=use_lengths,
            seq_len=S, exp_dtype=exp_dtype,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1, block_q, D), lambda b, h, i, *_: (b, h, i, 0)),
                pl.BlockSpec((1, 1, S, D), lambda b, h, i, *_: (b, h, 0, 0)),
                pl.BlockSpec((1, 1, S, D), lambda b, h, i, *_: (b, h, 0, 0)),
            ],
            out_specs=pl.BlockSpec(
                (1, 1, block_q, D), lambda b, h, i, *_: (b, h, i, 0)
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, T, D), q.dtype),
    interpret=interpret,
    )(lengths.astype(jnp.int32), qt, kt, vt)
    return jnp.transpose(out, (0, 2, 1, 3))


def _kernel_nt(lengths_ref, q_ref, k_ref, v_ref, o_ref, *,
               scale, use_lengths, seq_len, exp_dtype):
    """Transpose-free layout: blocks slice the native (B, T, H, D) arrays
    directly ((1, bq, 1, D) / (1, S, 1, D) blocks), so no HBM transpose
    passes happen at all."""
    b = pl.program_id(0)
    q = q_ref[0, :, 0]
    k = k_ref[0, :, 0]
    s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * (
        scale * 1.4426950408889634
    )
    if use_lengths:
        col = jax.lax.broadcasted_iota(jnp.int32, (8, seq_len), 1)
        bias = jnp.where(col < lengths_ref[b], 0.0, NEG_INF)[:1]
        s = s + bias
    m = jnp.max(s, axis=-1, keepdims=True)
    if exp_dtype == jnp.bfloat16:
        e = jnp.exp2((s - m).astype(jnp.bfloat16))
        z = jnp.sum(e.astype(jnp.float32), axis=-1, keepdims=True)
    else:
        e = jnp.exp2(s - m)
        z = jnp.sum(e, axis=-1, keepdims=True)
    o = jnp.dot(
        e.astype(v_ref.dtype), v_ref[0, :, 0],
        preferred_element_type=jnp.float32,
    )
    o_ref[0, :, 0] = (o / z).astype(o_ref.dtype)


def attn_nt(q, k, v, lengths, *, scale, block_q, exp_dtype,
            interpret=None):
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    B, T, H, D = q.shape
    S = k.shape[1]
    use_lengths = lengths is not None
    if lengths is None:
        lengths = jnp.full((B,), S, jnp.int32)
    grid = (B, H, T // block_q)
    out = pl.pallas_call(
        functools.partial(
            _kernel_nt, scale=scale, use_lengths=use_lengths,
            seq_len=S, exp_dtype=exp_dtype,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, block_q, 1, D), lambda b, h, i, *_: (b, i, h, 0)),
                pl.BlockSpec((1, S, 1, D), lambda b, h, i, *_: (b, 0, h, 0)),
                pl.BlockSpec((1, S, 1, D), lambda b, h, i, *_: (b, 0, h, 0)),
            ],
            out_specs=pl.BlockSpec(
                (1, block_q, 1, D), lambda b, h, i, *_: (b, i, h, 0)
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((B, T, H, D), q.dtype),
    interpret=interpret,
    )(lengths.astype(jnp.int32), q, k, v)
    return out


def main():
    from ultravox_tpu.ops.pallas.fused_attention import fused_attention

    print("device:", jax.devices()[0], flush=True)
    rng = np.random.default_rng(0)
    B, T, H, D = 8, 1500, 20, 64
    S = T
    q = jnp.asarray(rng.standard_normal((B, T, H, D)), jnp.bfloat16) * 0.3
    k = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.bfloat16) * 0.3
    v = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.bfloat16) * 0.3
    lens = jnp.full((B,), S, jnp.int32)
    scale = D**-0.5
    tf = (2 * B * H * T * S * D * 2) / 1e12  # QK^T + PV

    def report(name, t, ref=None):
        line = f"{name:34s} {t*1e3:7.3f} ms = {tf/t:5.1f} TF/s"
        if ref is not None:
            d = float(jnp.max(jnp.abs(ref.astype(jnp.float32) - out.astype(jnp.float32))))
            line += f"  maxdiff {d:.2e}"
        print(line, flush=True)

    # production kernel (current bench path)
    f0 = jax.jit(lambda q, k, v: fused_attention(
        q, k, v, lens, scale=scale, block_q=1500))
    t0 = time_fn(f0, q, k, v)
    ref = f0(q, k, v)
    out = ref
    report("prod kernel bq=1500", t0)

    for bq in (500, 1500):
        for ed, tag in ((jnp.float32, "fp32"), (jnp.bfloat16, "bf16")):
            f = jax.jit(functools.partial(
                attn_v2, lengths=lens, scale=scale, block_q=bq, exp_dtype=ed))
            try:
                t = time_fn(f, q, k, v)
                out = f(q, k, v)
                report(f"v2 bq={bq} exp={tag}", t, ref)
            except Exception as e:  # noqa: BLE001
                print(f"v2 bq={bq} exp={tag} FAILED: {type(e).__name__}: {e}",
                      flush=True)

    for bq, ed, tag in (
        (1500, jnp.float32, "fp32"),
        (1500, jnp.bfloat16, "bf16"),
        (500, jnp.float32, "fp32"),
    ):
        f = jax.jit(functools.partial(
            attn_nt, lengths=lens, scale=scale, block_q=bq, exp_dtype=ed))
        try:
            t = time_fn(f, q, k, v)
            out = f(q, k, v)
            report(f"no-transpose bq={bq} exp={tag}", t, ref)
        except Exception as e:  # noqa: BLE001
            print(f"no-transpose bq={bq} exp={tag} FAILED: "
                  f"{type(e).__name__}: {e}", flush=True)

    # no length mask: measures the mask pass cost
    f = jax.jit(functools.partial(
        attn_v2, lengths=None, scale=scale, block_q=1500,
        exp_dtype=jnp.float32))
    t = time_fn(f, q, k, v)
    report("v2 no-mask exp=fp32", t)


if __name__ == "__main__":
    main()
