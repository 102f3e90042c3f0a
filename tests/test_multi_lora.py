"""Multi-LoRA serving: one base model + N adapter banks, each request
picking its own adapter (the vLLM multi-LoRA serving role — the reference's
single-adapter peft integration has no equivalent; we verify against
single-adapter offline generation instead)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.helpers import make_tiny_tokenizer
from ultravox_tpu.inference.engine import GenerationEngine
from ultravox_tpu.inference.serving.engine import ServingEngine
from ultravox_tpu.models import (
    DecoderConfig,
    LoraConfig,
    UltravoxConfig,
    WhisperEncoderConfig,
)
from ultravox_tpu.models import lora as lora_lib
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
    lcfg = LoraConfig(r=4, target_modules=("q_proj", "v_proj", "gate_proj"))
    adapters = {}
    for i, name in enumerate(("helpful", "pirate")):
        lm = lora_lib.add_lora(
            params["language_model"], lcfg, jax.random.key(10 + i),
            lora_lib.DECODER_TARGETS,
        )
        # nonzero lora_b so each adapter actually changes the logits,
        # scaled large enough that greedy outputs diverge between adapters
        for tgt in ("q_proj", "v_proj", "gate_proj"):
            shp = lm["layers"][tgt]["lora_b"].shape
            lm["layers"][tgt]["lora_b"] = (
                jax.random.normal(jax.random.key(100 + i), shp) * 0.5
            )
        adapters[name] = {"language_model": lm}
    return cfg, params, processor, collator, adapters


def _mini_batch(processor, collator, text, audio=None):
    return collator([processor(text=text, audio=audio)])


def _drain(engine, req):
    ids, finish = [], None
    for ev in engine.stream(req):
        if ev.token_id is None:
            finish = ev.finish_reason
            break
        ids.append(ev.token_id)
    return ids, finish


def _offline_expected(cfg, params, adapters, batches, names, n_tokens):
    """Greedy reference: a fresh offline engine per adapter (unbanked LoRA
    leaves ride proj_apply directly)."""
    out = []
    engines = {}
    for batch, name in zip(batches, names):
        if name not in engines:
            p = dict(params)
            if name is not None:
                p["language_model"] = adapters[name]["language_model"]
            engines[name] = GenerationEngine(
                p, cfg, max_cache_len=128, cache_dtype=jnp.float32
            )
        out.append(
            engines[name].generate(batch, max_new_tokens=n_tokens).token_ids[0]
        )
    return out


def test_banked_apply_matches_unbanked(setup):
    """apply_lora_banks row gathers reproduce each adapter's unbanked
    forward exactly; bank row 0 is the base model."""
    from ultravox_tpu.models import decoder as decoder_lib

    cfg, params, _, _, adapters = setup
    tc = cfg.text_config
    banks, index = lora_lib.build_lora_banks(
        {k: v["language_model"] for k, v in adapters.items()}
    )
    ids = jnp.asarray(
        np.random.default_rng(0).integers(0, V, (3, 6)), jnp.int32
    )
    pos = jnp.broadcast_to(jnp.arange(6, dtype=jnp.int32)[None], (3, 6))
    kv = jnp.full((3,), 6, jnp.int32)

    def fwd(p):
        logits, _ = decoder_lib.decoder_forward(
            p, tc, input_ids=ids, positions=pos, kv_valid_len=kv
        )
        return np.asarray(logits)

    # all three rows run the same adapter via the bank == unbanked adapter
    for name in adapters:
        banked = lora_lib.apply_lora_banks(
            params["language_model"], banks,
            jnp.full((3,), index[name], jnp.int32),
        )
        np.testing.assert_allclose(
            fwd(banked), fwd(adapters[name]["language_model"]),
            rtol=1e-5, atol=1e-5,
        )
    # bank row 0 == base (zero adapter is exact)
    base_banked = lora_lib.apply_lora_banks(
        params["language_model"], banks, jnp.zeros((3,), jnp.int32)
    )
    np.testing.assert_allclose(
        fwd(base_banked), fwd(params["language_model"]), rtol=1e-6, atol=1e-6
    )
    # mixed rows: each row matches its own adapter's row in the pure run
    mixed_idx = jnp.asarray(
        [0, index["helpful"], index["pirate"]], jnp.int32
    )
    mixed = fwd(
        lora_lib.apply_lora_banks(params["language_model"], banks, mixed_idx)
    )
    np.testing.assert_allclose(
        mixed[0], fwd(params["language_model"])[0], rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        mixed[1], fwd(adapters["helpful"]["language_model"])[1],
        rtol=1e-5, atol=1e-5,
    )
    np.testing.assert_allclose(
        mixed[2], fwd(adapters["pirate"]["language_model"])[2],
        rtol=1e-5, atol=1e-5,
    )


@pytest.mark.parametrize("cache_mode", ["slots", "paged"])
def test_multi_lora_serving_matches_offline(setup, cache_mode):
    """Concurrent requests on different adapters (and the base) in one
    engine produce exactly the per-adapter offline greedy outputs — through
    single-step decode AND multi-step blocks."""
    cfg, params, processor, collator, adapters = setup
    texts = [
        "hello world how are you",
        "hello world how are you",
        "hello world how are you",
        "the quick brown fox",
    ]
    names = [None, "helpful", "pirate", "pirate"]
    batches = [_mini_batch(processor, collator, t) for t in texts]
    expected = _offline_expected(cfg, params, adapters, batches, names, 8)

    kw = {"page_size": 16} if cache_mode == "paged" else {}
    serving = ServingEngine(
        params, cfg, num_slots=4, max_seq_len=128,
        cache_dtype=jnp.float32, prefill_len_buckets=(64, 128),
        mel_len_buckets=(400,), lora_adapters=adapters,
        cache_mode=cache_mode, decode_block_steps=4, **kw,
    )
    serving.start()
    try:
        reqs = [
            serving.submit(b, max_tokens=8, lora=n)
            for b, n in zip(batches, names)
        ]
        results = [_drain(serving, r) for r in reqs]
    finally:
        serving.stop()
    for (ids, finish), exp in zip(results, expected):
        assert ids == exp
        assert finish == "length"


def test_unknown_adapter_rejected(setup):
    cfg, params, processor, collator, adapters = setup
    serving = ServingEngine(
        params, cfg, num_slots=2, max_seq_len=128,
        cache_dtype=jnp.float32, prefill_len_buckets=(64,),
        mel_len_buckets=(400,), lora_adapters=adapters,
    )
    serving.start()
    try:
        req = serving.submit(
            _mini_batch(processor, collator, "hello"), max_tokens=4,
            lora="nonexistent",
        )
        ids, finish = _drain(serving, req)
    finally:
        serving.stop()
    assert ids == [] and finish == "unknown_lora"


def test_prefix_reuse_gated_by_adapter(setup):
    """A retained conversation prefix is only adopted by requests running
    the SAME adapter — the cached KV differs per adapter even for
    identical tokens."""
    cfg, params, processor, collator, adapters = setup
    batch = _mini_batch(
        processor, collator, "hello world how are you today my friend"
    )
    serving = ServingEngine(
        params, cfg, num_slots=1, max_seq_len=128,
        cache_dtype=jnp.float32, prefill_len_buckets=(64,),
        mel_len_buckets=(400,), lora_adapters=adapters,
    )
    serving.start()
    try:
        _drain(serving, serving.submit(batch, max_tokens=4, lora="helpful"))
        # different adapter, identical tokens: must NOT reuse
        _drain(serving, serving.submit(batch, max_tokens=4, lora="pirate"))
        assert serving.reused_prefix_tokens == 0
        # same adapter: reuses
        _drain(serving, serving.submit(batch, max_tokens=4, lora="pirate"))
        assert serving.reused_prefix_tokens > 0
    finally:
        serving.stop()


def _enc_adapters(params, with_text_lora_on="accent"):
    """Two encoder-LoRA adapters (v0.6-style audio LoRA, reference
    v0.6_config_llama3_8b.yaml:1-9); ``with_text_lora_on`` also carries a
    decoder adapter, exercising mixed-tower banking."""
    lcfg_enc = LoraConfig(r=2, target_modules=("q_proj", "v_proj", "fc1"))
    lcfg_txt = LoraConfig(r=4, target_modules=("q_proj", "v_proj"))
    adapters = {}
    for i, name in enumerate(("whisper_ft", "accent")):
        tower = lora_lib.add_lora(
            params["audio_tower"], lcfg_enc, jax.random.key(30 + i),
            lora_lib.ENCODER_TARGETS,
        )
        for tgt in ("q_proj", "v_proj", "fc1"):
            shp = tower["layers"][tgt]["lora_b"].shape
            tower["layers"][tgt]["lora_b"] = (
                jax.random.normal(jax.random.key(200 + i), shp) * 0.5
            )
        tree = {"audio_tower": tower}
        if name == with_text_lora_on:
            lm = lora_lib.add_lora(
                params["language_model"], lcfg_txt, jax.random.key(40 + i),
                lora_lib.DECODER_TARGETS,
            )
            for tgt in ("q_proj", "v_proj"):
                shp = lm["layers"][tgt]["lora_b"].shape
                lm["layers"][tgt]["lora_b"] = (
                    jax.random.normal(jax.random.key(300 + i), shp) * 0.5
                )
            tree["language_model"] = lm
        adapters[name] = tree
    return adapters


def test_encoder_lora_banked_serving_matches_offline(setup):
    """Encoder (audio-tower) adapters served as a bank: each audio request
    gathers its adapter at admission (the tower runs once per request) and
    the outputs exactly match per-adapter offline generation — including a
    mixed adapter that banks BOTH towers."""
    cfg, params, processor, collator, _ = setup
    adapters = _enc_adapters(params)
    rng = np.random.default_rng(3)
    audio = (rng.standard_normal(8000) * 0.1).astype(np.float32)
    batch = _mini_batch(
        processor, collator, "transcribe <|audio|> now", audio=audio
    )
    names = [None, "whisper_ft", "accent"]
    expected = []
    for name in names:
        p = dict(params)
        if name is not None:
            p.update(adapters[name])
        eng = GenerationEngine(
            p, cfg, max_cache_len=128, cache_dtype=jnp.float32
        )
        expected.append(eng.generate(batch, max_new_tokens=8).token_ids[0])
    # the adapters must actually change the output for the test to mean
    # anything (encoder LoRA reaches logits only through the audio tokens)
    assert len({tuple(e) for e in expected}) == 3

    serving = ServingEngine(
        params, cfg, num_slots=4, max_seq_len=128,
        cache_dtype=jnp.float32, prefill_len_buckets=(64, 128),
        mel_len_buckets=(400,), lora_adapters=adapters,
    )
    serving.start()
    try:
        reqs = [serving.submit(batch, max_tokens=8, lora=n) for n in names]
        results = [_drain(serving, r) for r in reqs]
    finally:
        serving.stop()
    for (ids, finish), exp in zip(results, expected):
        assert ids == exp
        assert finish == "length"


def test_encoder_lora_paged_spec_stress(setup):
    """Encoder adapters under the paged + speculative + block machinery:
    outputs stay exactly the per-adapter offline greedy streams."""
    cfg, params, processor, collator, _ = setup
    adapters = _enc_adapters(params)
    rng = np.random.default_rng(4)
    audio = (rng.standard_normal(8000) * 0.1).astype(np.float32)
    batch = _mini_batch(
        processor, collator, "say <|audio|> again", audio=audio
    )
    names = ["whisper_ft", "accent"]
    expected = []
    for name in names:
        p = dict(params)
        p.update(adapters[name])
        eng = GenerationEngine(
            p, cfg, max_cache_len=128, cache_dtype=jnp.float32
        )
        expected.append(eng.generate(batch, max_new_tokens=24).token_ids[0])

    serving = ServingEngine(
        params, cfg, num_slots=2, max_seq_len=128,
        cache_dtype=jnp.float32, prefill_len_buckets=(64, 128),
        mel_len_buckets=(400,), lora_adapters=adapters,
        cache_mode="paged", page_size=16, decode_block_steps=4,
        spec_decode="ngram", spec_k=4, spec_min_accept=0,
    )
    serving.start()
    try:
        reqs = [
            serving.submit(batch, max_tokens=24, lora=n) for n in names
        ]
        results = [_drain(serving, r) for r in reqs]
    finally:
        serving.stop()
    for (ids, finish), exp in zip(results, expected):
        assert ids == exp
        assert finish == "length"


def test_encoder_fused_banks_match_canonical(setup):
    """fuse_lora_banks over the encoder's fused qkv_proj (q/v targeted, k
    not — partial members) reproduces the canonical per-target bank math
    through encoder_forward."""
    from ultravox_tpu.models import whisper_encoder as we

    cfg, params, _, _, _ = setup
    ac = cfg.audio_config
    trees = {}
    for i, name in enumerate(("a", "b")):
        tower = lora_lib.add_lora(
            params["audio_tower"],
            LoraConfig(r=2, target_modules=("q_proj", "v_proj")),
            jax.random.key(50 + i), lora_lib.ENCODER_TARGETS,
        )
        for tgt in ("q_proj", "v_proj"):
            shp = tower["layers"][tgt]["lora_b"].shape
            tower["layers"][tgt]["lora_b"] = (
                jax.random.normal(jax.random.key(60 + i), shp) * 0.3
            )
        trees[name] = tower
    banks, index = lora_lib.build_lora_banks(trees)
    fused_tower = we.fuse_encoder_inference_params(params["audio_tower"])
    assert "qkv_proj" in fused_tower["layers"]
    D = ac.d_model
    fused_banks = lora_lib.fuse_lora_banks(
        banks, qkv_dims=(D, D, D), gateup_dims=()
    )
    mel = (
        jnp.asarray(
            np.random.default_rng(2).standard_normal(
                (1, ac.num_mel_bins, 200)
            ),
            jnp.float32,
        )
        * 0.1
    )
    lens = jnp.asarray([100], jnp.int32)
    for name in ("a", "b"):
        idx = jnp.asarray(index[name], jnp.int32)
        ref = we.encoder_forward(
            lora_lib.apply_lora_banks(params["audio_tower"], banks, idx),
            ac, mel, lens,
        )
        got = we.encoder_forward(
            lora_lib.apply_lora_banks(fused_tower, fused_banks, idx),
            ac, mel, lens,
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5
        )


def test_http_model_field_routes_to_adapter(setup):
    """OpenAI-server multi-LoRA routing: "model": "<adapter>" serves that
    adapter; /v1/models lists base + adapters."""
    import json
    import threading
    import urllib.request
    from http.server import ThreadingHTTPServer

    from ultravox_tpu.inference.serving.api_server import (
        ServingAPI,
        make_handler,
    )

    cfg, params, processor, collator, adapters = setup
    engine = ServingEngine(
        params, cfg, num_slots=2, max_seq_len=128,
        cache_dtype=jnp.float32, prefill_len_buckets=(64, 128),
        mel_len_buckets=(400,), lora_adapters=adapters,
    )
    api = ServingAPI(engine, processor, collator)
    engine.start()
    server = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(api))
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/v1/models"
        ) as r:
            ids = {m["id"] for m in json.load(r)["data"]}
        assert {"helpful", "pirate"} <= ids

        def post(model):
            body = {
                "model": model,
                "max_tokens": 6,
                "messages": [
                    {"role": "user", "content": "hello world how are you"}
                ],
            }
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/v1/chat/completions",
                data=json.dumps(body).encode(),
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req) as r:
                return json.load(r)["choices"][0]["message"]["content"]

        base = post(api.model_name)
        helpful = post("helpful")
        pirate = post("pirate")
        # greedy outputs must be reproducible per adapter...
        assert post("pirate") == pirate
        assert post("helpful") == helpful
        # ...and the adapters actually change the output vs base
        assert len({base, helpful, pirate}) >= 2
    finally:
        server.shutdown()
        engine.stop()


def test_fused_banks_match_canonical_banks(setup):
    """fuse_lora_banks' block-diagonal recombination over qkv/gateup fused
    projections computes exactly the canonical per-target bank math."""
    from ultravox_tpu.models import decoder as decoder_lib

    cfg, params, _, _, adapters = setup
    tc = cfg.text_config
    lms = {k: v["language_model"] for k, v in adapters.items()}
    banks, index = lora_lib.build_lora_banks(lms)
    fused_lm = decoder_lib.fuse_inference_params(
        params["language_model"], tc
    )
    assert "qkv_proj" in fused_lm["layers"]  # fusion actually happened
    fused_banks = lora_lib.fuse_lora_banks(
        banks,
        qkv_dims=(
            tc.num_heads * tc.head_dim,
            tc.num_kv_heads * tc.head_dim,
            tc.num_kv_heads * tc.head_dim,
        ),
        gateup_dims=(tc.intermediate_size, tc.intermediate_size),
    )
    ids = jnp.asarray(
        np.random.default_rng(1).integers(0, V, (3, 5)), jnp.int32
    )
    pos = jnp.broadcast_to(jnp.arange(5, dtype=jnp.int32)[None], (3, 5))
    kv = jnp.full((3,), 5, jnp.int32)
    idx = jnp.asarray([0, index["helpful"], index["pirate"]], jnp.int32)

    def fwd(p):
        logits, _ = decoder_lib.decoder_forward(
            p, tc, input_ids=ids, positions=pos, kv_valid_len=kv
        )
        return np.asarray(logits)

    ref = fwd(
        lora_lib.apply_lora_banks(params["language_model"], banks, idx)
    )
    got = fwd(lora_lib.apply_lora_banks(fused_lm, fused_banks, idx))
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


def test_multi_lora_composes_with_int8(setup):
    """lora_adapters + quantize='int8' serve together (QLoRA-style: int8
    fused base + bf16 low-rank branch); tokens match the int8 offline
    engine running the same adapter unbanked."""
    cfg, params, processor, collator, adapters = setup
    texts = ["hello world how are you", "the quick brown fox"]
    names = ["pirate", None]
    batches = [_mini_batch(processor, collator, t) for t in texts]
    expected = []
    for batch, name in zip(batches, names):
        p = dict(params)
        if name is not None:
            p["language_model"] = adapters[name]["language_model"]
        eng = GenerationEngine(
            p, cfg, max_cache_len=128, cache_dtype=jnp.float32,
            quantize="int8",
        )
        expected.append(eng.generate(batch, max_new_tokens=8).token_ids[0])

    serving = ServingEngine(
        params, cfg, num_slots=2, max_seq_len=128, cache_dtype=jnp.float32,
        prefill_len_buckets=(64,), mel_len_buckets=(400,),
        lora_adapters=adapters, quantize="int8",
    )
    serving.start()
    try:
        reqs = [
            serving.submit(b, max_tokens=8, lora=n)
            for b, n in zip(batches, names)
        ]
        results = [_drain(serving, r) for r in reqs]
    finally:
        serving.stop()
    for (ids, finish), exp in zip(results, expected):
        assert ids == exp
        assert finish == "length"


def test_multi_lora_composes_with_mesh(setup):
    """lora_adapters + mesh= (TP/FSDP-sharded base) serve together on the
    virtual device mesh; tokens match per-adapter unsharded offline."""
    from ultravox_tpu.parallel import MeshConfig, make_mesh, shard_params

    cfg, params, processor, collator, adapters = setup
    mesh = make_mesh(MeshConfig(1, 2, 2))
    sharded = shard_params(params, mesh)
    texts = ["hello world how are you", "the quick brown fox"]
    names = ["helpful", "pirate"]
    batches = [_mini_batch(processor, collator, t) for t in texts]
    expected = _offline_expected(cfg, params, adapters, batches, names, 6)

    serving = ServingEngine(
        sharded, cfg, num_slots=2, max_seq_len=128, cache_dtype=jnp.float32,
        prefill_len_buckets=(64, 128), mel_len_buckets=(400,), mesh=mesh,
        lora_adapters=adapters,
    )
    serving.start()
    try:
        reqs = [
            serving.submit(b, max_tokens=6, lora=n)
            for b, n in zip(batches, names)
        ]
        results = [_drain(serving, r) for r in reqs]
    finally:
        serving.stop()
    for (ids, finish), exp in zip(results, expected):
        assert ids == exp
        assert finish == "length"


def test_enc_adapters_validated_at_construction(setup):
    """Encoder-adapter banks that cannot apply to the served model fail at
    ServingEngine construction (r5 review finding: the KeyError used to
    surface at the first admission's trace inside the scheduler tick,
    erroring every queued request via _fail_all_requests)."""
    cfg, params, processor, collator, _ = setup
    adapters = _enc_adapters(params)
    kw = dict(
        num_slots=1, max_seq_len=64, cache_dtype=jnp.float32,
        prefill_len_buckets=(64,), mel_len_buckets=(400,),
        lora_adapters=adapters,
    )
    # (a) served params have no audio tower at all
    llm_only = {k: v for k, v in params.items() if k != "audio_tower"}
    with pytest.raises(ValueError, match="no audio tower"):
        ServingEngine(llm_only, cfg, **kw)
    # (b) tower exists but lacks a banked target (fc1)
    tower = dict(params["audio_tower"])
    layers = dict(tower["layers"])
    layers.pop("fc1")
    tower["layers"] = layers
    broken = dict(params)
    broken["audio_tower"] = tower
    with pytest.raises(ValueError, match="fc1"):
        ServingEngine(broken, cfg, **kw)
    # (c) dims mismatch (a wav2vec-shaped tower vs a whisper-trained bank)
    wide = dict(params["audio_tower"])
    wlayers = dict(wide["layers"])
    fc1 = dict(wlayers["fc1"])
    fc1["kernel"] = jnp.zeros(
        (fc1["kernel"].shape[0], 64, fc1["kernel"].shape[2]),
        fc1["kernel"].dtype,
    )
    wlayers["fc1"] = fc1
    wide["layers"] = wlayers
    mismatched = dict(params)
    mismatched["audio_tower"] = wide
    with pytest.raises(ValueError, match="fc1"):
        ServingEngine(mismatched, cfg, **kw)
    # the matching tower still constructs fine
    ServingEngine(params, cfg, **kw)
