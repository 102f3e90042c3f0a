"""Prompt-lookup speculative decoding profile on the real TPU: the same
serving workload with spec off vs on, under two draft regimes —
ECHO (prompts whose continuation the model actually reproduces: the
token history contains the model's own greedy cycle, the high-acceptance
case) and RANDOM (incompressible prompts, the zero-acceptance worst case,
which must cost ~nothing).

Usage: python scripts/profile_spec.py [--slots 8] [--requests 16]
       [--max-tokens 256] [--spec-k 8] [--decode-block 8]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def run_load(engine, prompts, max_tokens):
    reqs = [
        engine.submit(
            {
                "input_ids": ids[None].astype(np.int32),
                "attention_mask": np.ones((1, len(ids)), np.int32),
            },
            max_tokens=max_tokens,
        )
        for ids in prompts
    ]
    tokens = 0
    t0 = time.perf_counter()
    for r in reqs:
        for ev in engine.stream(r):
            if ev.token_id is not None:
                tokens += 1
    dt = time.perf_counter() - t0
    return tokens, dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--slots", type=int, default=8)
    ap.add_argument("--requests", type=int, default=16)
    ap.add_argument("--prompt-len", type=int, default=512)
    ap.add_argument("--max-tokens", type=int, default=256)
    ap.add_argument("--max-seq-len", type=int, default=2048)
    ap.add_argument("--spec-k", type=int, default=8)
    ap.add_argument("--decode-block", type=int, default=None)
    ap.add_argument("--cache-mode", default="auto")
    args = ap.parse_args()

    import __graft_entry__ as graft
    from ultravox_tpu.inference.serving.engine import ServingEngine
    from ultravox_tpu.models import ultravox as uv_model

    cfg = graft._flagship_config()
    params = uv_model.init_params(cfg, jax.random.key(0), jnp.bfloat16)
    V = cfg.text_config.vocab_size
    rng = np.random.default_rng(0)

    # RANDOM: incompressible prompts (no n-gram repeats to draft from)
    random_prompts = [
        rng.integers(1, V, (args.prompt_len,)) for _ in range(args.requests)
    ]
    # ECHO: a short motif tiled through the prompt — the greedy continuation
    # quickly enters a cycle the history contains, the high-acceptance case
    echo_prompts = []
    for _ in range(args.requests):
        motif = rng.integers(1, V, (24,))
        reps = args.prompt_len // len(motif) + 1
        echo_prompts.append(np.tile(motif, reps)[: args.prompt_len])

    results = {}
    for name, prompts in (("random", random_prompts), ("echo", echo_prompts)):
        for spec in (None, "ngram"):
            eng = ServingEngine(
                params, cfg, num_slots=args.slots,
                max_seq_len=args.max_seq_len, cache_mode=args.cache_mode,
                mel_len_buckets=(400,), spec_decode=spec,
                spec_k=args.spec_k,
                **(
                    {"decode_block_steps": args.decode_block}
                    if args.decode_block is not None
                    else {}
                ),
            )
            eng.start()
            try:
                run_load(eng, prompts, 16)  # compile
                eng.spec_dispatches = eng.spec_emitted_tokens = 0
                eng.spec_syncs = eng.spec_single_dispatches = 0
                eng.spec_wasted_tokens = 0
                eng.spec_sync_s = 0.0
                eng.spec_rows = eng.spec_accepted_sum = 0
                eng.spec_autopauses = 0
                eng._spec_window.clear()
                eng._spec_paused_flag = False
                tokens, dt = run_load(eng, prompts, args.max_tokens)
            finally:
                eng.stop()
            key = f"{name}_{'spec' if spec else 'base'}"
            results[key] = tokens / dt
            line = f"{key}: {tokens / dt:8.1f} tok/s"
            if spec:
                acc = eng.spec_accepted_sum / max(eng.spec_rows, 1)
                line += (
                    f"  (accept/round/slot {acc:.2f}, "
                    f"{eng.spec_dispatches} rounds, "
                    f"{eng.spec_autopauses} autopauses, "
                    f"{eng.spec_syncs} syncs costing {eng.spec_sync_s:.2f}s, "
                    f"{eng.spec_single_dispatches} single-round dispatches, "
                    f"{eng.spec_wasted_tokens} wasted tokens; "
                    f"run wall {dt:.2f}s)"
                )
            print(line, flush=True)

    for name in ("random", "echo"):
        base, spec = results[f"{name}_base"], results[f"{name}_spec"]
        print(f"{name}: spec is {spec / base:.2f}x of baseline")


if __name__ == "__main__":
    main()
