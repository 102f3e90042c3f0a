"""Paged-cache serving mode: correctness vs the offline engine, pool
backpressure, page accounting, and copy-on-adopt prefix caching (retained
prefixes survive adoption and serve concurrent requests)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.helpers import make_tiny_tokenizer
from ultravox_tpu.inference.engine import GenerationEngine
from ultravox_tpu.inference.serving.engine import ServingEngine
from ultravox_tpu.models import DecoderConfig, UltravoxConfig, WhisperEncoderConfig
from ultravox_tpu.models import ultravox as uv
from ultravox_tpu.models.processor import DataCollatorWithAudio, UltravoxProcessor

V = 384


@pytest.fixture(scope="module")
def setup():
    cfg = UltravoxConfig(
        audio_config=WhisperEncoderConfig(
            d_model=32, num_layers=1, num_heads=2, ffn_dim=64
        ),
        text_config=DecoderConfig(
            vocab_size=V, hidden_size=48, intermediate_size=96,
            num_layers=2, num_heads=4, num_kv_heads=2, head_dim=12,
        ),
        hidden_size=64,
    )
    params = uv.init_params(cfg, jax.random.key(0))
    tokenizer = make_tiny_tokenizer()
    processor = UltravoxProcessor(tokenizer)
    collator = DataCollatorWithAudio(
        pad_token_id=tokenizer.pad_token_id, pad_multiple=1,
        mel_pad_multiple=400,
    )
    return cfg, params, processor, collator


def _mini_batch(processor, collator, text, audio=None):
    f = processor(text=text, audio=audio)
    return collator([f])


def _drain(engine, req):
    ids = []
    finish = None
    for ev in engine.stream(req):
        if ev.token_id is None:
            finish = ev.finish_reason
            break
        ids.append(ev.token_id)
    return ids, finish


def _check_page_accounting(engine):
    owned = sum(len(p) for p in engine._slot_pages)
    assert owned + len(engine._free_pages) == engine.num_pages
    assert len(set(engine._free_pages)) == len(engine._free_pages)
    all_owned = [p for pages in engine._slot_pages for p in pages]
    assert len(set(all_owned)) == len(all_owned)  # exclusive ownership
    assert not (set(all_owned) & set(engine._free_pages))


def test_paged_serving_matches_offline_greedy(setup):
    cfg, params, processor, collator = setup
    rng = np.random.default_rng(0)
    texts = [
        "hello world how are you",
        "transcribe <|audio|> please",
        "the quick brown fox",
    ]
    audios = [None, (rng.standard_normal(8000) * 0.1).astype(np.float32), None]

    offline = GenerationEngine(
        params, cfg, max_cache_len=128, cache_dtype=jnp.float32
    )
    expected = [
        offline.generate(
            _mini_batch(processor, collator, t, a), max_new_tokens=8
        ).token_ids[0]
        for t, a in zip(texts, audios)
    ]

    serving = ServingEngine(
        params, cfg, num_slots=4, max_seq_len=128, cache_dtype=jnp.float32,
        prefill_len_buckets=(64, 128), mel_len_buckets=(400,),
        cache_mode="paged", page_size=16, num_pages=20,
    )
    # pool is deliberately SMALLER than slot-equivalent (4*8=32 pages):
    # requests contend for pages and the allocator must still serve all
    serving.start()
    try:
        reqs = [
            serving.submit(
                _mini_batch(processor, collator, t, a), max_tokens=8
            )
            for t, a in zip(texts, audios)
        ]
        results = [_drain(serving, r) for r in reqs]
        _check_page_accounting(serving)
    finally:
        serving.stop()

    for (ids, finish), exp in zip(results, expected):
        assert ids == exp
        assert finish == "length"


def test_paged_pool_backpressure_serializes(setup):
    """A pool holding barely one request still completes everything (later
    requests wait for pages, retained conversations are evicted)."""
    cfg, params, processor, collator = setup
    serving = ServingEngine(
        params, cfg, num_slots=4, max_seq_len=64, cache_dtype=jnp.float32,
        prefill_len_buckets=(64,), mel_len_buckets=(400,),
        cache_mode="paged", page_size=16, num_pages=2,
    )
    serving.start()
    try:
        reqs = [
            serving.submit(
                _mini_batch(processor, collator, f"count to {i} now"),
                max_tokens=6,
            )
            for i in range(3)
        ]
        results = [_drain(serving, r) for r in reqs]
        _check_page_accounting(serving)
    finally:
        serving.stop()
    for ids, finish in results:
        assert finish == "length"
        assert len(ids) == 6


def test_paged_request_larger_than_pool_fails_cleanly(setup):
    cfg, params, processor, collator = setup
    serving = ServingEngine(
        params, cfg, num_slots=2, max_seq_len=64, cache_dtype=jnp.float32,
        prefill_len_buckets=(64,), mel_len_buckets=(400,),
        cache_mode="paged", page_size=16, num_pages=1,
    )
    serving.start()
    try:
        req = serving.submit(
            _mini_batch(processor, collator, "a much longer prompt please"),
            max_tokens=32,
        )
        ids, finish = _drain(serving, req)
    finally:
        serving.stop()
    assert finish == "pool_exhausted"
    assert ids == []


def test_paged_conversation_reuse_adopts_pages(setup):
    """Turn 2 reuses turn 1's pages in place (reused_prefix > 0) and matches
    a fresh engine's output exactly."""
    cfg, params, processor, collator = setup

    def turn_batch(messages):
        return _mini_batch(processor, collator, messages)

    t1 = "system prompt here user says hello"
    t2 = t1 + " assistant replies and user asks more"

    serving = ServingEngine(
        params, cfg, num_slots=2, max_seq_len=128, cache_dtype=jnp.float32,
        prefill_len_buckets=(64, 128), mel_len_buckets=(400,),
        cache_mode="paged", page_size=16,
    )
    serving.start()
    try:
        r1 = serving.submit(turn_batch(t1), max_tokens=4)
        ids1, _ = _drain(serving, r1)
        r2 = serving.submit(turn_batch(t2), max_tokens=6)
        ids2, _ = _drain(serving, r2)
        reused = serving.reused_prefix_tokens
        _check_page_accounting(serving)
    finally:
        serving.stop()
    assert reused > 0

    fresh = ServingEngine(
        params, cfg, num_slots=2, max_seq_len=128, cache_dtype=jnp.float32,
        prefill_len_buckets=(64, 128), mel_len_buckets=(400,),
        cache_mode="paged", page_size=16,
    )
    fresh.start()
    try:
        f2 = fresh.submit(turn_batch(t2), max_tokens=6)
        fids2, _ = _drain(fresh, f2)
    finally:
        fresh.stop()
    assert ids2 == fids2


def test_paged_prefix_cache_survives_adoption(setup):
    """Copy-on-adopt: a retained turn-1 prefix serves MULTIPLE later
    requests — the second adoption must also reuse (the entry survived the
    first), and both outputs must match a fresh engine exactly."""
    cfg, params, processor, collator = setup
    t1 = "shared system prompt for everyone here"
    t2a = t1 + " first user continues this way"
    t2b = t1 + " second user goes a different way"

    serving = ServingEngine(
        params, cfg, num_slots=4, max_seq_len=128, cache_dtype=jnp.float32,
        prefill_len_buckets=(64, 128), mel_len_buckets=(400,),
        cache_mode="paged", page_size=16,
    )
    serving.start()
    try:
        r1 = serving.submit(_mini_batch(processor, collator, t1), max_tokens=4)
        _drain(serving, r1)
        reused_0 = serving.reused_prefix_tokens
        ra = serving.submit(_mini_batch(processor, collator, t2a), max_tokens=5)
        ids_a, _ = _drain(serving, ra)
        reused_a = serving.reused_prefix_tokens
        rb = serving.submit(_mini_batch(processor, collator, t2b), max_tokens=5)
        ids_b, _ = _drain(serving, rb)
        reused_b = serving.reused_prefix_tokens
        assert reused_a > reused_0, "first adoption did not reuse"
        assert reused_b > reused_a, "retained prefix did not survive adoption"
        assert not serving._pinned  # all pins released
        _check_page_accounting(serving)
    finally:
        serving.stop()

    for text, ids in ((t2a, ids_a), (t2b, ids_b)):
        fresh = ServingEngine(
            params, cfg, num_slots=4, max_seq_len=128,
            cache_dtype=jnp.float32, prefill_len_buckets=(64, 128),
            mel_len_buckets=(400,), cache_mode="paged", page_size=16,
        )
        fresh.start()
        try:
            fr = fresh.submit(_mini_batch(processor, collator, text), max_tokens=5)
            fids, _ = _drain(fresh, fr)
        finally:
            fresh.stop()
        assert ids == fids


def test_paged_concurrent_adopters_share_one_prefix(setup):
    """Two requests submitted together can both adopt one retained prefix
    (pin counting keeps the source alive until each has read it)."""
    cfg, params, processor, collator = setup
    t1 = "another shared system prompt to cache"

    serving = ServingEngine(
        params, cfg, num_slots=4, max_seq_len=128, cache_dtype=jnp.float32,
        prefill_len_buckets=(64, 128), mel_len_buckets=(400,),
        cache_mode="paged", page_size=16,
    )
    serving.start()
    try:
        r1 = serving.submit(_mini_batch(processor, collator, t1), max_tokens=4)
        _drain(serving, r1)
        base = serving.reused_prefix_tokens
        reqs = [
            serving.submit(
                _mini_batch(processor, collator, t1 + f" user number {i}"),
                max_tokens=5,
            )
            for i in range(2)
        ]
        results = [_drain(serving, r) for r in reqs]
        gained = serving.reused_prefix_tokens - base
        assert all(f == "length" for _, f in results)
        # both adopters reused a nontrivial prefix
        assert gained >= 2 * serving.min_reuse_tokens, gained
        assert not serving._pinned
        _check_page_accounting(serving)
    finally:
        serving.stop()


def test_paged_adoption_degrades_when_pool_cannot_hold_source(setup):
    """When the pool cannot hold a request AND its adoption source, the
    engine serves WITHOUT reuse (evicting the source) rather than failing
    or corrupting the prefix — and the output still matches a fresh run."""
    cfg, params, processor, collator = setup
    t1 = "tiny shared prefix here"
    t2 = t1 + " plus a longer continuation from the user"

    serving = ServingEngine(
        params, cfg, num_slots=4, max_seq_len=64, cache_dtype=jnp.float32,
        prefill_len_buckets=(64,), mel_len_buckets=(400,),
        cache_mode="paged", page_size=16, num_pages=4,
    )
    serving.start()
    try:
        r1 = serving.submit(_mini_batch(processor, collator, t1), max_tokens=4)
        _drain(serving, r1)
        reused_before = serving.reused_prefix_tokens
        # t2 is 40 tokens; +20 budget = 4 pages = the WHOLE pool, while the
        # retained source holds 2: adoption cannot coexist with the source
        r2 = serving.submit(_mini_batch(processor, collator, t2), max_tokens=20)
        ids2, finish = _drain(serving, r2)
        assert finish == "length"
        assert serving.reused_prefix_tokens == reused_before  # no reuse
        assert not serving._pinned
        _check_page_accounting(serving)
    finally:
        serving.stop()

    fresh = ServingEngine(
        params, cfg, num_slots=4, max_seq_len=64, cache_dtype=jnp.float32,
        prefill_len_buckets=(64,), mel_len_buckets=(400,),
        cache_mode="paged", page_size=16, num_pages=4,
    )
    fresh.start()
    try:
        fr = fresh.submit(_mini_batch(processor, collator, t2), max_tokens=20)
        fids, _ = _drain(fresh, fr)
    finally:
        fresh.stop()
    assert ids2 == fids


def test_paged_with_int8_quantization(setup):
    """cache_mode='paged' composes with int8 weight quantization: tokens
    match the int8 slots-mode engine."""
    cfg, params, processor, collator = setup
    texts = ["hello there friend", "the quick brown fox"]

    ref = ServingEngine(
        params, cfg, num_slots=2, max_seq_len=64, cache_dtype=jnp.float32,
        prefill_len_buckets=(64,), mel_len_buckets=(400,), quantize="int8",
    )
    ref.start()
    try:
        expected = [
            _drain(ref, ref.submit(_mini_batch(processor, collator, t),
                                   max_tokens=6))[0]
            for t in texts
        ]
    finally:
        ref.stop()

    paged = ServingEngine(
        params, cfg, num_slots=2, max_seq_len=64, cache_dtype=jnp.float32,
        prefill_len_buckets=(64,), mel_len_buckets=(400,), quantize="int8",
        cache_mode="paged", page_size=16,
    )
    paged.start()
    try:
        got = [
            _drain(paged, paged.submit(_mini_batch(processor, collator, t),
                                       max_tokens=6))[0]
            for t in texts
        ]
    finally:
        paged.stop()
    assert got == expected


def test_paged_block_decode_matches_single_step(setup):
    """Paged multi-step decode blocks (pages gathered once per block, tail
    published as one page scatter at block end) emit exactly the same
    greedy tokens as single-step paged decoding, including a request that
    stops mid-block; page accounting and retained-prefix trimming must
    survive block writes past a finished request's budget."""
    cfg, params, processor, collator = setup
    batches = [
        _mini_batch(processor, collator, "hello world how are you"),
        _mini_batch(processor, collator, "the quick brown fox"),
    ]
    offline = GenerationEngine(
        params, cfg, max_cache_len=128, cache_dtype=jnp.float32
    )
    expected = [
        offline.generate(b, max_new_tokens=11).token_ids[0] for b in batches
    ]
    stop = expected[0][5]  # request 0 stops mid-block

    serving = ServingEngine(
        params, cfg, num_slots=2, max_seq_len=128, cache_dtype=jnp.float32,
        prefill_len_buckets=(64,), mel_len_buckets=(400,),
        cache_mode="paged", page_size=16, num_pages=16,
        decode_block_steps=4,
    )
    serving.start()
    try:
        r0 = serving.submit(
            dict(batches[0]), max_tokens=11, stop_token_ids=(stop,)
        )
        r1 = serving.submit(dict(batches[1]), max_tokens=11)
        ids0, fin0 = _drain(serving, r0)
        ids1, fin1 = _drain(serving, r1)
        _check_page_accounting(serving)
    finally:
        serving.stop()
    assert ids0 == expected[0][:5] and fin0 == "stop"
    assert ids1 == expected[1] and fin1 == "length"


def test_paged_cancel_releases_pages(setup):
    """Cancelling a paged request — mid-prefill or mid-decode — must
    release its page reservation exactly (accounting stays consistent)
    and leave the pool fully serviceable."""
    cfg, params, processor, collator = setup
    batch = _mini_batch(processor, collator, "hello world how are you")
    offline = GenerationEngine(
        params, cfg, max_cache_len=128, cache_dtype=jnp.float32
    )
    expected = offline.generate(batch, max_new_tokens=8).token_ids[0]

    serving = ServingEngine(
        params, cfg, num_slots=2, max_seq_len=128, cache_dtype=jnp.float32,
        prefill_len_buckets=(64, 128), mel_len_buckets=(400,),
        cache_mode="paged", page_size=16, num_pages=16,
        prefill_chunk_tokens=16,
    )
    serving.prefill_tokens_per_tick = 16  # one chunk/tick: stay prefilling
    serving.start()
    try:
        long_prompt = {
            "input_ids": np.ones((1, 120), np.int32) * 5,
            "attention_mask": np.ones((1, 120), np.int32),
        }
        r1 = serving.submit(long_prompt, max_tokens=500)
        serving.cancel(r1)  # likely mid-prefill (8 chunks)
        ev = r1.out_queue.get(timeout=60)
        while ev.token_id is not None:
            ev = r1.out_queue.get(timeout=60)
        assert ev.finish_reason == "cancelled"
        _check_page_accounting(serving)

        r2 = serving.submit(dict(batch), max_tokens=5000)
        first = r2.out_queue.get(timeout=60)
        assert first.token_id is not None
        serving.cancel(r2)  # mid-decode
        ev = r2.out_queue.get(timeout=60)
        while ev.token_id is not None:
            ev = r2.out_queue.get(timeout=60)
        assert ev.finish_reason == "cancelled"
        _check_page_accounting(serving)

        r3 = serving.submit(dict(batch), max_tokens=8)
        ids, fin = _drain(serving, r3)
        _check_page_accounting(serving)
    finally:
        serving.stop()
    assert ids == expected and fin == "length"


def test_paged_block_decode_to_cache_edge(setup):
    """Paged twin of the cache-edge test: blocks + pipelined dispatch up to
    cache_full must stay inside the page reservation (a lagged write past
    the table width would be dropped — or corrupt a neighbour if the guard
    math were wrong), match offline greedy, and keep page accounting
    exact."""
    cfg, params, processor, collator = setup
    batch = _mini_batch(processor, collator, "hello world")
    prompt_len = int(batch["attention_mask"].sum())
    MAX_SEQ = 64
    offline = GenerationEngine(
        params, cfg, max_cache_len=MAX_SEQ, cache_dtype=jnp.float32
    )
    n_fit = MAX_SEQ - 1 - prompt_len
    expected = offline.generate(batch, max_new_tokens=n_fit).token_ids[0]

    serving = ServingEngine(
        params, cfg, num_slots=2, max_seq_len=MAX_SEQ,
        cache_dtype=jnp.float32, prefill_len_buckets=(64,),
        mel_len_buckets=(400,), cache_mode="paged", page_size=16,
        num_pages=8, decode_block_steps=4,
    )
    serving.start()
    try:
        req = serving.submit(dict(batch), max_tokens=500)
        ids, fin = _drain(serving, req)
        _check_page_accounting(serving)
    finally:
        serving.stop()
    assert fin == "cache_full"
    assert len(ids) == n_fit
    assert ids == expected


def test_paged_block_decode_preserves_retained_prefix(setup):
    """Block decode on OTHER slots must not corrupt a finished slot's
    retained pages (inactive slots' tail writes redirect out of range), and
    the follow-up turn must still adopt the retained prefix."""
    cfg, params, processor, collator = setup
    tok = processor.tokenizer

    def turn_batch(messages):
        text = tok.apply_chat_template(
            messages, tokenize=False, add_generation_prompt=True
        )
        return collator([processor(text=text)])

    msgs1 = [{"role": "user", "content": "the quick brown fox jumps"}]
    serving = ServingEngine(
        params, cfg, num_slots=2, max_seq_len=128, cache_dtype=jnp.float32,
        prefill_len_buckets=(64, 128), mel_len_buckets=(400,),
        cache_mode="paged", page_size=16, num_pages=16,
        decode_block_steps=4,
    )
    serving.start()
    try:
        r1 = serving.submit(turn_batch(msgs1), max_tokens=6)
        ids1, _ = _drain(serving, r1)
        reply = tok.decode(ids1, skip_special_tokens=True)
        filler = serving.submit(
            _mini_batch(processor, collator, "hello world"), max_tokens=24
        )
        _drain(serving, filler)
        msgs2 = msgs1 + [
            {"role": "assistant", "content": reply},
            {"role": "user", "content": "hello world how are you"},
        ]
        r2 = serving.submit(turn_batch(msgs2), max_tokens=6)
        ids2, _ = _drain(serving, r2)
        assert r2.reused_prefix >= serving.min_reuse_tokens
        # correctness oracle: offline greedy on the full second-turn prompt
        offline = GenerationEngine(
            params, cfg, max_cache_len=128, cache_dtype=jnp.float32
        )
        exp = offline.generate(turn_batch(msgs2), max_new_tokens=6).token_ids[0]
        assert ids2 == exp
        _check_page_accounting(serving)
    finally:
        serving.stop()


def test_paged_scheduler_stress_random_mix(setup):
    """Randomized churn: 24 requests with mixed prompt lengths, budgets,
    temperatures, shared prefixes, and audio against a small pool — every
    request must finish cleanly and the allocator must balance."""
    cfg, params, processor, collator = setup
    rng = np.random.default_rng(42)
    prefixes = ["alpha system prompt", "beta system prompt"]
    serving = ServingEngine(
        params, cfg, num_slots=4, max_seq_len=128, cache_dtype=jnp.float32,
        prefill_len_buckets=(64, 128), mel_len_buckets=(400,),
        cache_mode="paged", page_size=16, num_pages=24,
    )
    serving.start()
    try:
        reqs = []
        for i in range(24):
            text = prefixes[i % 2] + " user " + " ".join(
                rng.choice(["one", "two", "red", "blue", "go"],
                           size=rng.integers(1, 8))
            )
            audio = (
                (rng.standard_normal(8000) * 0.1).astype(np.float32)
                if i % 5 == 0
                else None
            )
            if audio is not None:
                text = "listen <|audio|> " + text
            reqs.append(
                serving.submit(
                    _mini_batch(processor, collator, text, audio),
                    max_tokens=int(rng.integers(2, 12)),
                    temperature=float(rng.choice([0.0, 0.0, 0.8])),
                )
            )
        results = [_drain(serving, r) for r in reqs]
        finishes = {f for _, f in results}
        assert finishes <= {"stop", "length", "cache_full"}, finishes
        assert all(
            len(ids) > 0 or f == "stop" for ids, f in results
        )
        assert not serving._pinned
        _check_page_accounting(serving)
    finally:
        serving.stop()


def test_paged_scheduler_stress_with_cancels_and_sampling(setup):
    """Churn + the round-3 machinery together: randomized cancels land on
    pending/prefilling/active requests while others use seeds, penalties,
    top-p, and logit_bias. Every stream must terminate with a legal finish
    reason, cancelled ones with \"cancelled\", and the page allocator must
    balance exactly afterwards."""
    cfg, params, processor, collator = setup
    rng = np.random.default_rng(7)
    serving = ServingEngine(
        params, cfg, num_slots=4, max_seq_len=128, cache_dtype=jnp.float32,
        prefill_len_buckets=(64, 128), mel_len_buckets=(400,),
        cache_mode="paged", page_size=16, num_pages=24,
    )
    serving.start()
    try:
        reqs = []
        for i in range(20):
            text = "user " + " ".join(
                rng.choice(["one", "two", "red", "blue", "go"],
                           size=rng.integers(1, 8))
            )
            kw = {}
            pick = i % 5
            if pick == 1:
                kw = dict(temperature=0.8, seed=int(rng.integers(1, 999)))
            elif pick == 2:
                kw = dict(presence_penalty=0.5, frequency_penalty=0.1)
            elif pick == 3:
                kw = dict(temperature=0.7, top_p=0.9, top_k=20)
            elif pick == 4:
                kw = dict(logit_bias={int(rng.integers(1, V)): 5.0})
            reqs.append(
                serving.submit(
                    _mini_batch(processor, collator, text),
                    max_tokens=int(rng.integers(2, 12)),
                    **kw,
                )
            )
            if i % 4 == 3:
                # cancel a random earlier request: may be pending,
                # prefilling, active, or already finished
                serving.cancel(reqs[int(rng.integers(0, len(reqs)))])
        results = [_drain(serving, r) for r in reqs]
        finishes = {f for _, f in results}
        assert finishes <= {"stop", "length", "cache_full", "cancelled"}, (
            finishes
        )
        assert not serving._pinned
        _check_page_accounting(serving)
        # the engine must still serve cleanly after the churn
        ids, fin = _drain(
            serving,
            serving.submit(
                _mini_batch(processor, collator, "hello world"), max_tokens=4
            ),
        )
        assert len(ids) == 4 and fin == "length"
    finally:
        serving.stop()


def test_paged_scheduler_stress_with_spec_decode(setup):
    """Churn with prompt-lookup speculation enabled: greedy and sampled
    requests mix (spec engages/disengages), cancels land mid-flight, and
    histories resync repeatedly. Because greedy outputs are
    schedule-independent, every non-cancelled GREEDY request must emit
    exactly the offline reference tokens regardless of when speculation
    was engaged around it."""
    from ultravox_tpu.inference.engine import GenerationEngine

    cfg, params, processor, collator = setup
    rng = np.random.default_rng(11)
    offline = GenerationEngine(
        params, cfg, max_cache_len=128, cache_dtype=jnp.float32
    )
    serving = ServingEngine(
        params, cfg, num_slots=4, max_seq_len=128, cache_dtype=jnp.float32,
        prefill_len_buckets=(64, 128), mel_len_buckets=(400,),
        cache_mode="paged", page_size=16, num_pages=24,
        spec_decode="ngram", spec_k=4, decode_block_steps=2,
    )
    serving.start()
    try:
        reqs, expected, cancelled = [], {}, set()
        for i in range(20):
            text = "user " + " ".join(
                rng.choice(["one", "two", "red", "blue", "go"],
                           size=rng.integers(1, 8))
            )
            batch = _mini_batch(processor, collator, text)
            n = int(rng.integers(2, 12))
            kw = {}
            if i % 4 == 1:
                kw = dict(temperature=0.8, seed=int(rng.integers(1, 999)))
            elif i % 4 == 3:
                kw = dict(repetition_penalty=1.2)
            else:
                expected[i] = offline.generate(
                    batch, max_new_tokens=n
                ).token_ids[0]
            reqs.append(serving.submit(batch, max_tokens=n, **kw))
            if i % 6 == 5:
                j = int(rng.integers(0, len(reqs)))
                serving.cancel(reqs[j])
                cancelled.add(j)
        results = [_drain(serving, r) for r in reqs]
        finishes = {f for _, f in results}
        assert finishes <= {"stop", "length", "cache_full", "cancelled"}, (
            finishes
        )
        for i, (ids, fin) in enumerate(results):
            if i in expected and fin == "length":
                assert ids == expected[i], f"request {i} diverged"
        # during the churn a sampled/penalized request is almost always
        # active, so spec rightly stays disengaged; a pure-greedy phase
        # afterwards must engage it and still match offline exactly
        batch = _mini_batch(processor, collator, "red blue go red blue go")
        exp = offline.generate(batch, max_new_tokens=10).token_ids[0]
        ids, fin = _drain(serving, serving.submit(batch, max_tokens=10))
        assert ids == exp and fin == "length"
        assert serving.spec_dispatches > 0  # speculation did engage
        assert not serving._pinned
        _check_page_accounting(serving)
    finally:
        serving.stop()


def test_paged_stress_with_lora_and_spec(setup):
    """Everything at once: multi-LoRA routing + speculation + cancels +
    sampled requests under paged churn. Schedule-independence: every
    non-cancelled GREEDY request must match its adapter's offline
    reference exactly."""
    from ultravox_tpu.inference.engine import GenerationEngine
    from ultravox_tpu.models import lora as lora_lib
    from ultravox_tpu.models.config import LoraConfig

    cfg, params, processor, collator = setup
    rng = np.random.default_rng(23)
    lcfg = LoraConfig(r=4, target_modules=("q_proj", "v_proj"))
    adapters = {}
    for i, name in enumerate(("a", "b")):
        lm = lora_lib.add_lora(
            params["language_model"], lcfg, jax.random.key(30 + i),
            lora_lib.DECODER_TARGETS,
        )
        for tgt in ("q_proj", "v_proj"):
            shp = lm["layers"][tgt]["lora_b"].shape
            lm["layers"][tgt]["lora_b"] = (
                jax.random.normal(jax.random.key(300 + i), shp) * 0.5
            )
        adapters[name] = {"language_model": lm}

    offline = {}
    for name in (None, "a", "b"):
        p = dict(params)
        if name is not None:
            p["language_model"] = adapters[name]["language_model"]
        offline[name] = GenerationEngine(
            p, cfg, max_cache_len=128, cache_dtype=jnp.float32
        )

    serving = ServingEngine(
        params, cfg, num_slots=4, max_seq_len=128, cache_dtype=jnp.float32,
        prefill_len_buckets=(64,), mel_len_buckets=(400,),
        cache_mode="paged", page_size=16, num_pages=28,
        lora_adapters=adapters, spec_decode="ngram", spec_k=4,
        decode_block_steps=2,
    )
    serving.start()
    try:
        reqs, expected = [], {}
        for i in range(16):
            text = "user " + " ".join(
                rng.choice(["one", "two", "red", "blue"],
                           size=rng.integers(1, 6))
            )
            batch = _mini_batch(processor, collator, text)
            n = int(rng.integers(2, 10))
            name = (None, "a", "b")[i % 3]
            kw = {"lora": name} if name else {}
            if i % 5 == 4:
                kw["temperature"] = 0.8  # sampled: legality only
            else:
                expected[i] = offline[name].generate(
                    batch, max_new_tokens=n
                ).token_ids[0]
            reqs.append(serving.submit(batch, max_tokens=n, **kw))
            if i == 9:
                serving.cancel(reqs[int(rng.integers(0, len(reqs)))])
        results = [_drain(serving, r) for r in reqs]
        for i, (ids, fin) in enumerate(results):
            assert fin in {"stop", "length", "cache_full", "cancelled"}
            if i in expected and fin == "length":
                assert ids == expected[i], f"request {i} diverged"
        assert not serving._pinned
        _check_page_accounting(serving)
    finally:
        serving.stop()
