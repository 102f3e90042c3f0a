"""Per-dispatch timing of the echo-regime speculative serving run.

BENCH_r05 preview measured spec_echo_speedup_x = 0.11 (r4: 1.31) — ~25
block dispatches eating ~1.3 s each where the device cost should be
~57 ms. This instruments the exact bench workload (bench._echo_metrics)
to attribute per-dispatch wall: dispatch-call time, fetch (np.asarray)
time, sync time, and which program (probe/single/block-N) ran.

Usage: python scripts/profile_spec_echo.py [--spec ngram|none]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--spec", default="ngram")
    ap.add_argument("--new", type=int, default=400)
    args = ap.parse_args()
    spec = None if args.spec == "none" else args.spec

    import __graft_entry__ as graft
    from ultravox_tpu.inference.serving.engine import ServingEngine
    from ultravox_tpu.models import ultravox as uv_model

    cfg = graft._flagship_config()
    params = uv_model.init_params(cfg, jax.random.key(0), jnp.bfloat16)
    lm = dict(params["language_model"])
    lm["layers"] = jax.tree.map(lambda a: a * 0, lm["layers"])
    params_echo = dict(params)
    params_echo["language_model"] = lm
    del params, lm

    B, PROMPT, NEW = 8, 1500, args.new
    rng = np.random.default_rng(0)

    eng = ServingEngine(
        params_echo, cfg, num_slots=8, max_seq_len=2048,
        mel_len_buckets=(400,), spec_decode=spec,
    )

    events = []  # (t, kind, dur, detail)

    orig_dispatch_spec = eng._dispatch_spec

    def timed_dispatch_spec(headroom):
        t0 = time.monotonic()
        r = orig_dispatch_spec(headroom)
        events.append((t0, "dispatch_spec", time.monotonic() - t0, headroom))
        return r

    eng._dispatch_spec = timed_dispatch_spec

    orig_proc = eng._process_oldest_decode

    def timed_proc():
        kind = eng._inflight[0][0] if eng._inflight else "?"
        t0 = time.monotonic()
        r = orig_proc()
        events.append((t0, f"process[{kind}]", time.monotonic() - t0, None))
        return r

    eng._process_oldest_decode = timed_proc

    orig_decode = eng._dispatch_decode

    def timed_decode(n_steps):
        t0 = time.monotonic()
        r = orig_decode(n_steps)
        events.append((t0, f"dispatch_decode[{n_steps}]",
                       time.monotonic() - t0, None))
        return r

    eng._dispatch_decode = timed_decode

    orig_sync = eng._sync_spec_hist

    def timed_sync():
        t0 = time.monotonic()
        r = orig_sync()
        events.append((t0, "sync_hist", time.monotonic() - t0, None))
        return r

    eng._sync_spec_hist = timed_sync

    eng.start()

    def submit_all():
        reqs = []
        for _ in range(B):
            ids = rng.integers(1, cfg.text_config.vocab_size, (1, PROMPT))
            reqs.append(
                eng.submit(
                    {
                        "input_ids": ids.astype(np.int32),
                        "attention_mask": np.ones_like(ids, np.int32),
                    },
                    max_tokens=NEW,
                )
            )
        return reqs

    def drain(reqs):
        n = 0
        for r in reqs:
            for ev in eng.stream(r, timeout=1800):
                if ev.token_id is not None:
                    n += 1
        return n

    print("compile drain ...", flush=True)
    t0 = time.monotonic()
    drain(submit_all())
    print(f"compile drain done in {time.monotonic()-t0:.1f}s", flush=True)
    events.clear()
    t0 = time.monotonic()
    toks = drain(submit_all())
    dt = time.monotonic() - t0
    print(f"timed: {toks} tokens in {dt:.2f}s = {toks/dt:.1f} tok/s")

    # attribute wall: aggregate by kind
    agg = {}
    for _, kind, dur, _ in events:
        c, s, mx = agg.get(kind, (0, 0.0, 0.0))
        agg[kind] = (c + 1, s + dur, max(mx, dur))
    for kind, (c, s, mx) in sorted(agg.items(), key=lambda kv: -kv[1][1]):
        print(f"  {kind:24s} n={c:5d} total={s:7.2f}s max={mx*1e3:8.1f}ms")
    # top-10 slowest single events with timeline position
    print("slowest events:")
    for t, kind, dur, detail in sorted(events, key=lambda e: -e[2])[:10]:
        print(f"  +{t-t0:7.2f}s {kind:24s} {dur*1e3:8.1f}ms detail={detail}")
    if spec:
        print(f"spec_dispatches(rounds)={eng.spec_dispatches} "
              f"single={eng.spec_single_dispatches} "
              f"probe={eng.spec_probe_dispatches} syncs={eng.spec_syncs} "
              f"rows={eng.spec_rows} accepted={eng.spec_accepted_sum}")
    eng.stop()


if __name__ == "__main__":
    main()
