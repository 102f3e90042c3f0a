"""Paged-vs-slot decode on the real TPU: (1) op-level decode attention at a
2K context (contiguous kernel vs paged kernel vs XLA gather), (2) the
ServingEngine decode step end-to-end in both cache modes.

Usage: python scripts/profile_paged.py [--which op|engine|all]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def fence(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def bench_op():
    from ultravox_tpu.ops.pallas.decode_attention import decode_attention
    from ultravox_tpu.ops.pallas.paged_attention import (
        paged_decode_attention,
        paged_decode_attention_xla,
    )

    B, S, H, Hkv, D, ps = 8, 2048, 32, 8, 64, 256
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, H, D)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, S, Hkv, D)) * 0.1, jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, S, Hkv, D)) * 0.1, jnp.bfloat16)
    lens = jnp.full((B,), S, jnp.int32)

    n_per = S // ps
    P = B * n_per + 8
    order = rng.permutation(B * n_per)
    table = np.zeros((B, n_per), np.int32)
    kb = np.asarray(k, np.float32).reshape(B * n_per, ps, Hkv, D)
    vb = np.asarray(v, np.float32).reshape(B * n_per, ps, Hkv, D)
    pk = np.zeros((P, ps, Hkv, D), np.float32)
    pv = np.zeros((P, ps, Hkv, D), np.float32)
    for flat, pid in enumerate(order):
        b, i = divmod(flat, n_per)
        pk[pid] = kb[flat]
        pv[pid] = vb[flat]
        table[b, i] = pid
    pool_k = jnp.asarray(pk, jnp.bfloat16)
    pool_v = jnp.asarray(pv, jnp.bfloat16)
    table = jnp.asarray(table)

    variants = {
        "contiguous_kernel": lambda: decode_attention(q, k, v, lens),
        "paged_kernel": lambda: paged_decode_attention(
            q, pool_k, pool_v, table, lens
        ),
        "paged_xla_gather": lambda: jax.jit(paged_decode_attention_xla)(
            q, pool_k, pool_v, table, lens
        ),
    }
    # host<->device round-trip: the only fence on axon is a scalar fetch;
    # subtract its cost from the loop total (bench.py pattern)
    float(jnp.sum(q.astype(jnp.float32)))
    t0 = time.perf_counter()
    float(jnp.sum(q.astype(jnp.float32)))
    roundtrip = time.perf_counter() - t0

    outs = {}
    for name, fn in variants.items():
        out = fn()
        fence(out)  # compile + fence
        iters = 300
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn()
        fence(out)
        dt = (time.perf_counter() - t0 - roundtrip) / iters
        outs[name] = np.asarray(out, np.float32)
        print(f"op {name}: {dt*1e6:.0f} us/step (B={B}, S={S})", flush=True)
    err = np.abs(outs["paged_kernel"] - outs["contiguous_kernel"]).max()
    print(f"paged vs contiguous max|diff| = {err:.2e}", flush=True)


def bench_engine(cache_mode, decode_attn, n_requests=16):
    import __graft_entry__ as graft
    from ultravox_tpu.inference.serving.engine import ServingEngine
    from ultravox_tpu.models import ultravox as uv_model

    cfg = graft._flagship_config()
    params = uv_model.init_params(cfg, jax.random.key(0), jnp.bfloat16)
    engine = ServingEngine(
        params, cfg,
        num_slots=8,
        max_seq_len=2048,
        encoder_attn_impl="fused",
        prefill_attn_impl="fused",
        decode_attn_impl=decode_attn,
        cache_mode=cache_mode,
        page_size=256,
    )
    ids = np.full((1, 1500), 7, np.int32)  # long prompt -> long live context

    def batch():
        return {"input_ids": ids.copy(), "attention_mask": np.ones_like(ids)}

    engine.start()
    try:
        req = engine.submit(batch(), max_tokens=4)
        for _ in engine.stream(req):
            pass
        print(f"engine[{cache_mode}/{decode_attn}] warm", flush=True)
        t0 = time.monotonic()
        reqs = [engine.submit(batch(), max_tokens=64) for _ in range(n_requests)]
        tok = 0
        for r in reqs:
            for ev in engine.stream(r):
                if ev.token_id is not None:
                    tok += 1
        wall = time.monotonic() - t0
        print(
            f"engine[{cache_mode}/{decode_attn}]: {tok} tokens in "
            f"{wall:.1f}s = {tok/wall:.0f} tok/s "
            f"(8 slots, 1.5K prompt, 2K ctx)",
            flush=True,
        )
    finally:
        engine.stop()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--which", default="all", choices=["op", "engine", "all"])
    ap.add_argument(
        "--engine-modes",
        default="slots/xla,paged/xla,paged/kernel",
        help="comma-separated cache_mode/decode_attn pairs",
    )
    args = ap.parse_args()
    if args.which in ("op", "all"):
        bench_op()
    if args.which in ("engine", "all"):
        for pair in args.engine_modes.split(","):
            cm, da = pair.split("/")
            bench_engine(cm, da)


if __name__ == "__main__":
    main()
