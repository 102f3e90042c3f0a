"""Per-program cost breakdown for speculative decoding on the real TPU.

Times the serving engine's compiled device programs in isolation at the
driver-bench shapes (8 slots, ~1.5K live context, 2K window, 1B flagship):

  decode_1        one single-step decode dispatch
  decode_block8   one 8-step block dispatch       (8 tokens)
  spec_round      one draft+verify round (K=8)    (1..9 tokens)
  spec_block8     one 8-round speculative block   (8..72 tokens)

plus verify-forward component ablations to find where the (K+1)-token
verify pays vs a 1-token step. Run under the ambient axon backend:

    python scripts/profile_spec_parts.py [--mode slots|paged] [--steps 20]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def timeit(name, fn, steps):
    from ultravox_tpu.utils.profiling import fence

    out = fn()  # compile
    fence(jax.tree.leaves(out)[-1])
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn()
    fence(jax.tree.leaves(out)[-1])
    dt = (time.perf_counter() - t0) / steps * 1e3
    print(f"{name:24s} {dt:8.2f} ms", flush=True)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="slots")
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--ctx", type=int, default=1500)
    ap.add_argument("--spec-k", type=int, default=8)
    args = ap.parse_args()

    import __graft_entry__ as graft
    from ultravox_tpu.inference.serving.engine import ServingEngine
    from ultravox_tpu.models import ultravox as uv_model

    cfg = graft._flagship_config()
    params = uv_model.init_params(cfg, jax.random.key(0), jnp.bfloat16)
    eng = ServingEngine(
        params, cfg, num_slots=8, max_seq_len=2048, cache_mode=args.mode,
        mel_len_buckets=(400,), spec_decode="ngram", spec_k=args.spec_k,
    )
    B = 8
    V = cfg.text_config.vocab_size
    rng_np = np.random.default_rng(0)
    cache_lens = jnp.full((B,), args.ctx, jnp.int32)
    last = jnp.asarray(rng_np.integers(1, V, (B,)), jnp.int32)
    hist0 = np.zeros((B, 2048), np.int32)
    # cycling motif so ngram drafting has matches (echo regime)
    motif = rng_np.integers(1, V, (24,))
    hist0[:, : args.ctx] = np.tile(motif, args.ctx // 24 + 1)[: args.ctx]
    hist = jnp.asarray(hist0)
    mask = jnp.ones((B,), bool)
    samp = jnp.zeros((B, 4), jnp.float32).at[:, 2].set(1.0)  # greedy
    key = jax.random.key(1)

    state = {"cache": eng.cache, "lens": cache_lens, "last": last,
             "hist": hist}
    pt = eng.page_table if args.mode == "paged" else None

    def dec1():
        sampled, cache, lens, lt = eng._decode(
            eng.params, state["cache"], state["last"], cache_lens, mask,
            samp, key, seeds=None, page_table=pt,
        )
        state["cache"] = cache
        return sampled

    def dec_block():
        bargs = (eng.params, state["cache"], state["last"], cache_lens,
                 mask, samp, key)
        if pt is not None:
            bargs += (pt,)
        sampled, cache, lens, lt = eng._decode_block(*bargs, n_steps=8)
        state["cache"] = cache
        return sampled

    def spec1():
        # cache AND hist are donated (argnums 1, 2): thread both
        out, acc, cache, lens, lt, h = eng._spec(
            eng.params, state["cache"], state["hist"], state["last"],
            cache_lens, mask, samp, key, page_table=pt,
        )
        state["cache"], state["hist"] = cache, h
        return acc

    import functools

    spec_block_prog = jax.jit(
        functools.partial(
            eng._spec_block_fn, n_rounds=eng.spec_rounds,
            **eng._spec_block_kw,
        ),
        donate_argnums=(1, 2),
    )

    def spec_block():
        bargs = (eng.params, state["cache"], state["hist"], state["last"],
                 cache_lens, mask, samp, key)
        if pt is not None:
            bargs += (pt,)
        out, acc, cache, lens, lt, h = spec_block_prog(*bargs)
        state["cache"], state["hist"] = cache, h
        return acc

    t1 = timeit("decode_1", dec1, args.steps)
    tb = timeit("decode_block8", dec_block, args.steps)
    ts1 = timeit("spec_round (K+1 fwd)", spec1, args.steps)
    tsb = timeit("spec_block8", spec_block, args.steps)
    print(f"block step cost        {tb / 8:8.2f} ms/step")
    print(f"spec round / dec step  {ts1 / t1:8.2f}x (single-dispatch)")
    print(f"spec blk round / blk step {tsb / tb:8.2f}x")
    print(
        "break-even accept/round: "
        f"{tsb / tb:.2f} tokens (spec blk8 vs blk8)"
    )

    # ---- verify-forward ablations (where does the T=9 forward pay?) ----
    from ultravox_tpu.models import decoder as dl

    tc = cfg.text_config
    lm = eng.params["language_model"]
    if args.mode == "paged":
        print("(ablations use slot-shaped synthetic cache)")
    L = tc.num_layers
    Hkv, Dh = tc.num_kv_heads, tc.head_dim
    ck = jnp.zeros((L, B, 2048, Hkv, Dh), jnp.bfloat16)
    cache = dl.KVCache(k=ck, v=ck)
    for T in (1, 9):
        ids = jnp.asarray(rng_np.integers(1, V, (B, T)), jnp.int32)
        pos = cache_lens[:, None] + jnp.arange(T, dtype=jnp.int32)[None]

        def fwd(ids=ids, pos=pos, T=T, want_logits=True):
            out, _ = dl.decoder_forward(
                lm, tc, input_ids=ids, positions=pos,
                kv_valid_len=cache_lens + T, cache=cache,
                write_pos=cache_lens, return_hidden=not want_logits,
            )
            return out

        f_logits = jax.jit(lambda i, p: fwd(i, p, T, True))
        f_hidden = jax.jit(lambda i, p: fwd(i, p, T, False))
        tl = timeit(f"fwd T={T} +logits", lambda: f_logits(ids, pos),
                    args.steps)
        th = timeit(f"fwd T={T} hidden-only", lambda: f_hidden(ids, pos),
                    args.steps)
        print(f"  logits cost at T={T}: {tl - th:.2f} ms")

    # drafting cost alone
    from ultravox_tpu.inference.serving.engine import _ngram_drafts

    f_draft = jax.jit(
        lambda h, hl: _ngram_drafts(h, hl, args.spec_k, eng.spec_ngram)
    )
    timeit("ngram_drafts", lambda: f_draft(hist, cache_lens + 1), args.steps)


if __name__ == "__main__":
    main()
