"""Serving-engine load profile on the real TPU: concurrent requests against
ServingEngine (continuous batching + chunked prefill), reporting TTFT
percentiles, per-stream decode cadence, and aggregate tokens/sec.

Usage: python scripts/profile_serving.py [--requests 32] [--slots 16]
       [--quantize int8] [--audio-secs 10]
"""

import argparse
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--requests", type=int, default=32)
    ap.add_argument("--slots", type=int, default=16)
    ap.add_argument("--max-tokens", type=int, default=64)
    ap.add_argument("--audio-secs", type=float, default=10.0)
    ap.add_argument("--quantize", default=None, choices=[None, "int8"])
    ap.add_argument("--decode-block", type=int, default=1)
    ap.add_argument("--cache-mode", default="slots", choices=["slots", "paged"])
    ap.add_argument("--page-size", type=int, default=256)
    ap.add_argument("--num-pages", type=int, default=None)
    ap.add_argument(
        "--decode-attn", default="xla", choices=["xla", "kernel"],
        help="kernel = (paged) flash-decoding Pallas kernel",
    )
    args = ap.parse_args()

    import __graft_entry__ as graft
    from ultravox_tpu.inference.serving.engine import ServingEngine
    from ultravox_tpu.models import ultravox as uv_model

    cfg = graft._flagship_config()
    params = uv_model.init_params(cfg, jax.random.key(0), jnp.bfloat16)
    engine = ServingEngine(
        params, cfg,
        num_slots=args.slots,
        max_seq_len=1024,
        encoder_attn_impl="fused",
        prefill_attn_impl="fused",
        decode_attn_impl=args.decode_attn,
        quantize=args.quantize,
        decode_block_steps=args.decode_block,
        cache_mode=args.cache_mode,
        page_size=args.page_size,
        num_pages=args.num_pages,
    )

    # one synthetic request: 10 s audio + short text prompt
    rng = np.random.default_rng(0)
    n_mel = int(args.audio_secs * 100)
    n_tok = -(-n_mel // cfg.audio_token_compression)
    prompt_len = 8 + n_tok
    ids = np.full((1, prompt_len), 7, np.int32)

    def make_batch(i):
        return {
            "input_ids": ids.copy(),
            "attention_mask": np.ones_like(ids),
            "audio_values": (
                rng.standard_normal((1, 80, n_mel)) * 0.1
            ).astype(np.float32),
            "audio_lens": np.asarray([n_mel], np.int32),
            "audio_token_len": np.asarray([n_tok], np.int32),
            "audio_token_start_idx": np.asarray([4], np.int32),
            "audio_chunk_batch_idx": np.asarray([0], np.int32),
        }

    engine.start()
    # warm the compile caches with one request (long enough to exercise the
    # block-decode program too)
    req = engine.submit(
        make_batch(-1), max_tokens=max(4, 2 * args.decode_block)
    )
    for _ in engine.stream(req):
        pass
    print("compile warmup done", flush=True)

    ttfts, gaps, totals = [], [], []
    lock = threading.Lock()
    # numpy Generators are not thread-safe: build all batches up front
    batches = [make_batch(i) for i in range(args.requests)]

    def run_one(i):
        t_submit = time.monotonic()
        req = engine.submit(batches[i], max_tokens=args.max_tokens)
        t_first = None
        t_prev = None
        local_gaps = []
        n = 0
        for ev in engine.stream(req):
            now = time.monotonic()
            if ev.token_id is None:
                break
            n += 1
            if t_first is None:
                t_first = now
            elif t_prev is not None:
                local_gaps.append(now - t_prev)
            t_prev = now
        with lock:
            if t_first is not None:
                ttfts.append(t_first - t_submit)
            gaps.extend(local_gaps)
            totals.append(n)

    t0 = time.monotonic()
    threads = [
        threading.Thread(target=run_one, args=(i,))
        for i in range(args.requests)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.monotonic() - t0

    ttfts.sort()
    gaps.sort()
    total_toks = sum(totals)
    p = lambda arr, q: arr[min(len(arr) - 1, int(q * len(arr)))] if arr else 0
    print(
        f"requests={args.requests} slots={args.slots} "
        f"audio={args.audio_secs}s quantize={args.quantize} "
        f"block={args.decode_block} cache={args.cache_mode} "
        f"decode_attn={args.decode_attn}\n"
        f"TTFT p50/p90/p99: {p(ttfts,0.5)*1000:.0f}/"
        f"{p(ttfts,0.9)*1000:.0f}/{p(ttfts,0.99)*1000:.0f} ms\n"
        f"inter-token gap p50/p99: {p(gaps,0.5)*1000:.1f}/"
        f"{p(gaps,0.99)*1000:.1f} ms\n"
        f"aggregate: {total_toks} tokens in {wall:.1f}s = "
        f"{total_toks/wall:.0f} tok/s",
        flush=True,
    )
    engine.stop()


if __name__ == "__main__":
    main()
