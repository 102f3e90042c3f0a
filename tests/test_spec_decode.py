"""Prompt-lookup speculative decoding: device-side n-gram drafting + one
(K+1)-token verify per dispatch. Greedy outputs must be EXACTLY the
non-speculative outputs — speculation only changes how many weight reads
they cost (beyond-reference: the reference serves via vLLM, whose
prompt-lookup speculation this mirrors TPU-natively)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.helpers import make_tiny_tokenizer
from ultravox_tpu.inference.engine import GenerationEngine
from ultravox_tpu.inference.serving.engine import (
    ServingEngine,
    _ngram_drafts,
)
from ultravox_tpu.models import (
    DecoderConfig,
    UltravoxConfig,
    WhisperEncoderConfig,
)
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


def _mini_batch(processor, collator, text):
    return collator([processor(text=text)])


def _drain(engine, req):
    ids, finish = [], None
    for ev in engine.stream(req):
        if ev.token_id is None:
            finish = ev.finish_reason
            break
        ids.append(ev.token_id)
    return ids, finish


def test_ngram_drafts_unit():
    """Drafting finds the most recent prior occurrence of the LONGEST
    sequence-final n-gram and proposes its continuation; shorter n-grams
    are fallbacks; rows without any match are harmless."""
    S, K = 32, 4
    hist = np.zeros((4, S), np.int32)
    # row 0: [5 6 7 8 5 6] — final bigram (5,6) matched at j=0, drafts 7 8 5 6
    hist[0, :6] = [5, 6, 7, 8, 5, 6]
    # row 1: two occurrences — [1 2 9 1 2 3 1 2]: most recent PRIOR match of
    # (1,2) is j=3 (continuation 3 1 2 ...), not j=0
    hist[1, :8] = [1, 2, 9, 1, 2, 3, 1, 2]
    # row 2: no repeat at any n — [10 11 12 13]
    hist[2, :4] = [10, 11, 12, 13]
    # row 3: no bigram (4,3) repeat, but the 1-GRAM fallback matches the
    # final token 3 at j=1 -> drafts continue from j+1: 9 4 3 0
    hist[3, :5] = [7, 3, 9, 4, 3]
    hl = jnp.asarray([6, 8, 4, 5], jnp.int32)
    drafts = np.asarray(_ngram_drafts(jnp.asarray(hist), hl, K, 2))
    assert drafts[0].tolist() == [7, 8, 5, 6]
    assert drafts[1].tolist() == [3, 1, 2, 0]  # continuation from j=3
    # row 2: whatever came back, it must not crash; shape is (K,)
    assert drafts.shape == (4, K)
    assert drafts[3].tolist() == [9, 4, 3, 0]  # 1-gram fallback


@pytest.mark.parametrize("cache_mode", ["slots", "paged"])
def test_spec_decode_matches_offline(setup, cache_mode):
    """Speculative serving emits EXACTLY the offline greedy tokens for
    concurrent mixed prompts, and speculation actually engages."""
    cfg, params, processor, collator = setup
    texts = [
        "hello world how are you",
        "the quick brown fox the quick brown fox the quick brown fox",
        "one two three one two three one two",
    ]
    batches = [_mini_batch(processor, collator, t) for t in texts]
    offline = GenerationEngine(
        params, cfg, max_cache_len=256, cache_dtype=jnp.float32
    )
    expected = [
        offline.generate(b, max_new_tokens=40).token_ids[0] for b in batches
    ]

    kw = {"page_size": 16} if cache_mode == "paged" else {}
    serving = ServingEngine(
        params, cfg, num_slots=4, max_seq_len=256,
        cache_dtype=jnp.float32, prefill_len_buckets=(64, 128),
        mel_len_buckets=(400,), cache_mode=cache_mode,
        spec_decode="ngram", spec_k=4, **kw,
    )
    serving.start()
    try:
        reqs = [serving.submit(b, max_tokens=40) for b in batches]
        results = [_drain(serving, r) for r in reqs]
    finally:
        serving.stop()
    for (ids, finish), exp in zip(results, expected):
        assert ids == exp
        assert finish == "length"
    assert serving.spec_dispatches > 0
    # tiny random models decode into short greedy cycles, which prompt
    # lookup exploits: this deterministic setup must accept >1 token per
    # speculative dispatch on average
    assert serving.spec_emitted_tokens > serving.spec_dispatches


def test_spec_disengages_for_sampling_and_penalties(setup):
    """SEEDED sampled requests and penalized requests must force the exact
    non-speculative programs: seeds promise a reproducible stream (which
    speculation would change for temperature>0) and penalties need
    per-step count state."""
    cfg, params, processor, collator = setup
    batch = _mini_batch(processor, collator, "hello world how are you")

    base = ServingEngine(
        params, cfg, num_slots=2, max_seq_len=128, cache_dtype=jnp.float32,
        prefill_len_buckets=(64,), mel_len_buckets=(400,),
    )
    base.start()
    try:
        r = base.submit(batch, max_tokens=10, temperature=0.8, seed=7)
        sampled_ref, _ = _drain(base, r)
        r = base.submit(batch, max_tokens=10, repetition_penalty=1.3)
        pen_ref, _ = _drain(base, r)
    finally:
        base.stop()

    spec = ServingEngine(
        params, cfg, num_slots=2, max_seq_len=128, cache_dtype=jnp.float32,
        prefill_len_buckets=(64,), mel_len_buckets=(400,),
        spec_decode="ngram", spec_k=4,
    )
    spec.start()
    try:
        r = spec.submit(batch, max_tokens=10, temperature=0.8, seed=7)
        sampled, _ = _drain(spec, r)
        r = spec.submit(batch, max_tokens=10, repetition_penalty=1.3)
        pen, _ = _drain(spec, r)
    finally:
        spec.stop()
    assert sampled == sampled_ref
    assert pen == pen_ref
    assert spec.spec_dispatches == 0  # never engaged


def test_spec_with_churn_and_stop_tokens(setup):
    """Requests arriving mid-speculation (disengage -> re-engage with a
    history resync) and stop tokens that cut an accepted run short both
    preserve exact greedy outputs."""
    cfg, params, processor, collator = setup
    offline = GenerationEngine(
        params, cfg, max_cache_len=256, cache_dtype=jnp.float32
    )
    b1 = _mini_batch(
        processor, collator,
        "the quick brown fox the quick brown fox",
    )
    b2 = _mini_batch(processor, collator, "one two three one two three")
    exp1 = offline.generate(b1, max_new_tokens=32).token_ids[0]
    exp2_free = offline.generate(b2, max_new_tokens=32).token_ids[0]
    stop = exp2_free[5]
    exp2 = exp2_free[:exp2_free.index(stop)]

    serving = ServingEngine(
        params, cfg, num_slots=2, max_seq_len=256, cache_dtype=jnp.float32,
        prefill_len_buckets=(64,), mel_len_buckets=(400,),
        spec_decode="ngram", spec_k=4,
    )
    serving.start()
    try:
        r1 = serving.submit(b1, max_tokens=32)
        got1 = []
        it = serving.stream(r1)
        for ev in it:
            if ev.token_id is None:
                break
            got1.append(ev.token_id)
            if len(got1) == 6:
                # mid-stream arrival: spec must disengage for the prefill
                # then re-engage with a fresh history
                r2 = serving.submit(
                    b2, max_tokens=32, stop_token_ids=(stop,)
                )
        got2, fin2 = _drain(serving, r2)
    finally:
        serving.stop()
    assert got1 == exp1
    assert got2 == exp2 and fin2 == "stop"


def test_spec_composes_with_multi_lora(setup):
    """Speculative decode + multi-LoRA banks: per-slot adapters apply
    inside the verify forward too."""
    from ultravox_tpu.models import lora as lora_lib
    from ultravox_tpu.models.config import LoraConfig

    cfg, params, processor, collator = setup
    lcfg = LoraConfig(r=4, target_modules=("q_proj", "v_proj"))
    lm = lora_lib.add_lora(
        params["language_model"], lcfg, jax.random.key(11),
        lora_lib.DECODER_TARGETS,
    )
    for tgt in ("q_proj", "v_proj"):
        shp = lm["layers"][tgt]["lora_b"].shape
        lm["layers"][tgt]["lora_b"] = (
            jax.random.normal(jax.random.key(101), shp) * 0.5
        )
    adapters = {"styled": {"language_model": lm}}

    batch = _mini_batch(
        processor, collator, "the quick brown fox the quick brown fox"
    )
    p_ad = dict(params)
    p_ad["language_model"] = lm
    exp_base = GenerationEngine(
        params, cfg, max_cache_len=256, cache_dtype=jnp.float32
    ).generate(batch, max_new_tokens=24).token_ids[0]
    exp_ad = GenerationEngine(
        p_ad, cfg, max_cache_len=256, cache_dtype=jnp.float32
    ).generate(batch, max_new_tokens=24).token_ids[0]

    serving = ServingEngine(
        params, cfg, num_slots=2, max_seq_len=256, cache_dtype=jnp.float32,
        prefill_len_buckets=(64,), mel_len_buckets=(400,),
        lora_adapters=adapters, spec_decode="ngram", spec_k=4,
    )
    serving.start()
    try:
        r_base = serving.submit(batch, max_tokens=24)
        r_ad = serving.submit(batch, max_tokens=24, lora="styled")
        got_base, _ = _drain(serving, r_base)
        got_ad, _ = _drain(serving, r_ad)
    finally:
        serving.stop()
    assert got_base == exp_base
    assert got_ad == exp_ad
    assert serving.spec_dispatches > 0


@pytest.mark.parametrize("cache_mode", ["slots", "paged"])
def test_spec_block_multi_round_matches_offline(setup, cache_mode):
    """Multi-round speculative blocks (n_rounds draft+verify rounds in one
    dispatch, segmented tail KV) emit exactly the offline greedy tokens."""
    cfg, params, processor, collator = setup
    texts = [
        "hello world how are you today my friend hello world",
        "one two three one two three one two three one two",
    ]
    batches = [_mini_batch(processor, collator, t) for t in texts]
    offline = GenerationEngine(
        params, cfg, max_cache_len=256, cache_dtype=jnp.float32
    )
    expected = [
        offline.generate(b, max_new_tokens=48).token_ids[0] for b in batches
    ]
    kw = {"page_size": 16} if cache_mode == "paged" else {}
    serving = ServingEngine(
        params, cfg, num_slots=2, max_seq_len=256,
        cache_dtype=jnp.float32, prefill_len_buckets=(64,),
        mel_len_buckets=(400,), cache_mode=cache_mode,
        spec_decode="ngram", spec_k=4, decode_block_steps=4, **kw,
    )
    assert serving.spec_rounds == 4
    assert serving._spec_round_buckets == [4, 2]
    serving.start()
    try:
        reqs = [serving.submit(b, max_tokens=48) for b in batches]
        results = [_drain(serving, r) for r in reqs]
    finally:
        serving.stop()
    for (ids, finish), exp in zip(results, expected):
        assert ids == exp
        assert finish == "length"
    assert serving.spec_dispatches > 0


def test_spec_with_conversation_reuse_and_audio(setup):
    """Spec composes with conversation-prefix reuse (turn 2 prefills only
    the suffix, then speculates over the combined history) and with audio
    prompts (placeholder-token regions in the history are harmless draft
    sources). Exactness vs the non-speculative engine."""
    from ultravox_tpu.data.sample import audio_to_wav_bytes  # noqa: F401

    cfg, params, processor, collator = setup
    rng = np.random.default_rng(0)
    audio = (rng.standard_normal(16000) * 0.1).astype(np.float32)
    prefix = "please listen very carefully to this audio clip <|audio|> and transcribe it"
    f1 = processor(text=prefix, audio=audio)
    b1 = collator([f1])

    def run(spec: bool):
        eng = ServingEngine(
            params, cfg, num_slots=2, max_seq_len=256,
            cache_dtype=jnp.float32, prefill_len_buckets=(64,),
            mel_len_buckets=(400,),
            **(dict(spec_decode="ngram", spec_k=4) if spec else {}),
        )
        eng.start()
        try:
            ids1, _ = _drain(eng, eng.submit(b1, max_tokens=16))
            # turn 2: same audio + appended text -> prefix reuse
            text2 = prefix + " and then continue with more detail"
            b2 = collator([processor(text=text2, audio=audio)])
            ids2, _ = _drain(eng, eng.submit(b2, max_tokens=16))
            reused = eng.reused_prefix_tokens
        finally:
            eng.stop()
        return ids1, ids2, reused

    base1, base2, _ = run(spec=False)
    spec1, spec2, reused = run(spec=True)
    assert spec1 == base1
    assert spec2 == base2
    assert reused > 0  # reuse stayed engaged under spec


def test_spec_accept_slots_distribution():
    """The rejection-sampling acceptance rule must emit tokens distributed
    EXACTLY as ancestral sampling from the (filtered) model distribution,
    for any draft: marginal of the first emitted token == p0; conditioned
    on rejection the residual excludes the draft; greedy rows reduce to
    argmax."""
    from ultravox_tpu.ops.sampling import spec_accept_slots

    Vs, K = 8, 2
    rng0 = np.random.default_rng(3)
    logits_row = jnp.asarray(rng0.standard_normal(Vs), jnp.float32)
    p0 = np.asarray(jax.nn.softmax(logits_row))
    draft_tok = int(np.argmax(p0))  # a likely draft -> both branches seen
    N = 40_000

    # one batch row, T=K+1 positions with the same logits at position 0
    logits = jnp.broadcast_to(logits_row, (1, K + 1, Vs))
    drafts = jnp.asarray([[draft_tok, 1]], jnp.int32)
    samp = jnp.asarray([[1.0, 0, 1.0, 0]], jnp.float32)  # temp 1, no filters

    def emit_first(key):
        out, acc = spec_accept_slots(logits, drafts, samp, key)
        return out[0, 0], acc[0]

    keys = jax.random.split(jax.random.key(42), N)
    firsts, accs = jax.jit(jax.vmap(emit_first))(keys)
    firsts = np.asarray(firsts)
    accs = np.asarray(accs)
    counts = np.bincount(firsts, minlength=Vs) / N
    tv = 0.5 * np.abs(counts - p0).sum()
    assert tv < 0.02, f"total variation {tv:.4f} vs p0"
    # acceptance probability of the draft == p0[draft]
    acc_rate = (firsts == draft_tok).mean()
    assert abs(acc_rate - p0[draft_tok]) < 0.02
    # rejected -> first token ~ residual (never the draft), and the
    # conditional matches p0 renormalized without the draft
    rej = firsts[firsts != draft_tok]
    residual = p0.copy()
    residual[draft_tok] = 0
    residual /= residual.sum()
    rc = np.bincount(rej, minlength=Vs) / max(len(rej), 1)
    assert 0.5 * np.abs(rc - residual).sum() < 0.03
    # greedy row: exact argmax acceptance, deterministic
    samp_g = jnp.asarray([[0.0, 0, 1.0, 0]], jnp.float32)
    out_g, acc_g = spec_accept_slots(
        logits, drafts, samp_g, jax.random.key(0)
    )
    assert int(out_g[0, 0]) == draft_tok  # draft == argmax -> accepted
    assert int(acc_g[0]) >= 2  # and the chain continued past it


def test_spec_engages_for_unseeded_sampling(setup):
    """Unseeded temperature>0 requests speculate via rejection sampling:
    streams terminate legally, co-batched greedy requests stay exactly
    offline-greedy, and seeded sampled requests still force the exact
    path (their stream must match a no-spec engine's bit-for-bit)."""
    cfg, params, processor, collator = setup
    b_greedy = _mini_batch(
        processor, collator, "the quick brown fox the quick brown fox"
    )
    b_samp = _mini_batch(processor, collator, "one two three one two three")
    offline = GenerationEngine(
        params, cfg, max_cache_len=256, cache_dtype=jnp.float32
    )
    exp_greedy = offline.generate(b_greedy, max_new_tokens=24).token_ids[0]

    base = ServingEngine(
        params, cfg, num_slots=2, max_seq_len=256, cache_dtype=jnp.float32,
        prefill_len_buckets=(64,), mel_len_buckets=(400,),
    )
    base.start()
    try:
        seeded_ref, _ = _drain(
            base, base.submit(b_samp, max_tokens=12, temperature=0.9, seed=5)
        )
    finally:
        base.stop()

    spec = ServingEngine(
        params, cfg, num_slots=2, max_seq_len=256, cache_dtype=jnp.float32,
        prefill_len_buckets=(64,), mel_len_buckets=(400,),
        spec_decode="ngram", spec_k=4,
    )
    spec.start()
    try:
        r1 = spec.submit(b_greedy, max_tokens=24)
        r2 = spec.submit(b_samp, max_tokens=24, temperature=0.9)
        ids1, fin1 = _drain(spec, r1)
        ids2, fin2 = _drain(spec, r2)
        engaged = spec.spec_dispatches
        assert engaged > 0  # sampled request did not block speculation
        assert ids1 == exp_greedy and fin1 == "length"
        assert len(ids2) == 24 and fin2 == "length"
        # seeded sampled request: exact path, stream matches no-spec engine
        seeded, _ = _drain(
            spec, spec.submit(b_samp, max_tokens=12, temperature=0.9, seed=5)
        )
        assert seeded == seeded_ref
        assert spec.spec_dispatches == engaged  # it never speculated
    finally:
        spec.stop()


def test_seeded_greedy_speculates(setup):
    """A seed on a GREEDY request never draws, so it must not block
    speculation (or blocks) and stays bit-identical to offline greedy."""
    cfg, params, processor, collator = setup
    batch = _mini_batch(
        processor, collator, "the quick brown fox the quick brown fox"
    )
    offline = GenerationEngine(
        params, cfg, max_cache_len=256, cache_dtype=jnp.float32
    )
    exp = offline.generate(batch, max_new_tokens=24).token_ids[0]
    serving = ServingEngine(
        params, cfg, num_slots=2, max_seq_len=256, cache_dtype=jnp.float32,
        prefill_len_buckets=(64,), mel_len_buckets=(400,),
        spec_decode="ngram", spec_k=4,
    )
    serving.start()
    try:
        ids, fin = _drain(
            serving, serving.submit(batch, max_tokens=24, seed=123)
        )
    finally:
        serving.stop()
    assert ids == exp and fin == "length"
    assert serving.spec_dispatches > 0


@pytest.mark.parametrize("cache_mode", ["slots", "paged"])
def test_spec_decode_to_cache_edge(setup, cache_mode):
    """Speculating right up to the cache boundary: the capacity guard must
    degrade multi-round -> single-round -> plain decode without dropping
    accepted KV, and outputs stay exactly offline-greedy until the
    cache_full finish."""
    cfg, params, processor, collator = setup
    batch = _mini_batch(
        processor, collator, "one two three one two three one two three"
    )
    offline = GenerationEngine(
        params, cfg, max_cache_len=96, cache_dtype=jnp.float32
    )
    prompt_len = int(np.asarray(batch["attention_mask"]).sum())
    room = 96 - 1 - prompt_len  # engine finishes at max_seq_len - 1
    exp = offline.generate(batch, max_new_tokens=room).token_ids[0]

    kw = {"page_size": 16} if cache_mode == "paged" else {}
    serving = ServingEngine(
        params, cfg, num_slots=2, max_seq_len=96, cache_dtype=jnp.float32,
        prefill_len_buckets=(64,), mel_len_buckets=(400,),
        cache_mode=cache_mode, spec_decode="ngram", spec_k=4,
        decode_block_steps=4, **kw,
    )
    serving.start()
    try:
        # ask for more than fits: must finish cache_full at the edge
        ids, fin = _drain(serving, serving.submit(batch, max_tokens=500))
    finally:
        serving.stop()
    assert fin == "cache_full"
    assert ids == exp[: len(ids)] and len(ids) == room


def test_spec_autopause_and_reprobe(setup):
    """Acceptance health guard: when drafts keep missing, speculation must
    PAUSE (a verify round costs ~1.2x a decode step — near-1 acceptance is
    a guaranteed loss), re-probe after ``spec_probe_period`` dispatches,
    and never change the emitted tokens."""
    cfg, params, processor, collator = setup
    batch = _mini_batch(processor, collator, "alpha beta gamma delta")
    offline = GenerationEngine(
        params, cfg, max_cache_len=256, cache_dtype=jnp.float32
    )
    expected = offline.generate(batch, max_new_tokens=120).token_ids[0]

    serving = ServingEngine(
        params, cfg, num_slots=2, max_seq_len=256,
        cache_dtype=jnp.float32, prefill_len_buckets=(64,),
        mel_len_buckets=(400,), cache_mode="slots",
        spec_decode="ngram", spec_k=4,
        # floor above the K+1=5 max: the guard MUST fire once the window
        # holds >=24 rounds; a tiny probe period forces re-probes
        spec_min_accept=6.0, spec_probe_period=4,
    )
    serving.start()
    try:
        req = serving.submit(batch, max_tokens=120)
        ids, finish = _drain(serving, req)
    finally:
        serving.stop()
    assert ids == expected
    assert finish == "length"
    assert serving.spec_autopauses >= 1
    # cold start IS a probe (r5): the engine opens in single-round probe
    # mode, so an undraftable workload pays ~4 cheap rounds before the
    # first pause instead of 24 full-block rounds
    assert serving.spec_probe_dispatches >= 1
    if serving.spec_autopauses >= 2:
        # failed probes back off the next probe period exponentially
        assert serving._spec_fail_streak >= 1


def test_spec_health_reports_per_slot_acceptance(setup):
    """spec_accepted_sum / spec_rows is the PER-ROUND-PER-SLOT acceptance
    (r3's emitted/dispatches read ~num_slots too high); it must sit in
    [1, K+1] whenever speculation ran."""
    cfg, params, processor, collator = setup
    texts = ["one two three one two three one two", "hello world hello"]
    batches = [_mini_batch(processor, collator, t) for t in texts]
    serving = ServingEngine(
        params, cfg, num_slots=4, max_seq_len=256,
        cache_dtype=jnp.float32, prefill_len_buckets=(64,),
        mel_len_buckets=(400,), cache_mode="slots",
        spec_decode="ngram", spec_k=4, spec_min_accept=0,  # guard off
    )
    serving.start()
    try:
        reqs = [serving.submit(b, max_tokens=60) for b in batches]
        for r in reqs:
            _drain(serving, r)
    finally:
        serving.stop()
    assert serving.spec_rows > 0
    mean = serving.spec_accepted_sum / serving.spec_rows
    assert 1.0 <= mean <= serving.spec_k + 1
