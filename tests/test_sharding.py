"""Multi-chip sharding tests on a virtual 8-device CPU mesh: sharded forward
and train step must compile, execute, and agree with the single-device path
(replaces the reference's untestable-distributed-path gap, SURVEY.md §4)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from tests.helpers import make_tiny_tokenizer
from ultravox_tpu.models import DecoderConfig, LossConfig, UltravoxConfig, WhisperEncoderConfig
from ultravox_tpu.models import ultravox as uv
from ultravox_tpu.models.processor import DataCollatorWithAudio, UltravoxProcessor
from ultravox_tpu.parallel import MeshConfig, make_mesh, param_pspecs, shard_params
from ultravox_tpu.parallel.sharding import shard_batch
from ultravox_tpu.training import train_step as ts

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


@pytest.fixture(scope="module")
def setup():
    cfg = UltravoxConfig(
        audio_config=WhisperEncoderConfig(
            d_model=64, num_layers=2, num_heads=4, ffn_dim=128
        ),
        text_config=DecoderConfig(
            vocab_size=384, hidden_size=64, intermediate_size=128,
            num_layers=2, num_heads=4, num_kv_heads=2, head_dim=16,
        ),
        hidden_size=64,
    )
    params = uv.init_params(cfg, jax.random.key(0))
    tokenizer = make_tiny_tokenizer()
    processor = UltravoxProcessor(tokenizer)
    coll = DataCollatorWithAudio(pad_token_id=tokenizer.pad_token_id)
    rng = np.random.default_rng(0)
    feats = []
    for i in range(8):
        f = processor(
            text=f"sample {i} <|audio|> text",
            audio=(rng.standard_normal(4000 + 800 * i) * 0.1).astype(np.float32),
        )
        labels = np.asarray(f["input_ids"][0]).copy()
        labels[: len(labels) // 2] = -100
        f["labels"] = labels
        feats.append(f)
    batch = coll(feats)
    return cfg, params, batch


def test_mesh_resolution():
    mc = MeshConfig(data=2, fsdp=-1, tensor=2)
    assert mc.resolve(8) == (2, 2, 2, 1)
    mesh = make_mesh(MeshConfig(data=1, fsdp=4, tensor=2))
    assert dict(mesh.shape) == {"data": 1, "fsdp": 4, "tensor": 2, "pipe": 1}
    assert MeshConfig(data=1, fsdp=2, tensor=1, pipe=-1).resolve(8) == (
        1, 2, 1, 4
    )


def test_pipe_rules_shard_layer_stack(setup):
    """With pipe > 1 every decoder layer-stacked leaf shards its leading L
    axis over the pipe axis (each stage holds only its slice; the fallback
    rule covers norms/biases the named rules don't)."""
    from ultravox_tpu.parallel.sharding import rules_for_mesh

    cfg, params, _ = setup
    mesh = make_mesh(MeshConfig(data=1, fsdp=2, tensor=2, pipe=2))
    specs = param_pspecs(params, rules_for_mesh(mesh), mesh)
    layers = specs["language_model"]["layers"]
    for path, spec in jax.tree_util.tree_leaves_with_path(
        layers, is_leaf=lambda x: isinstance(x, P)
    ):
        assert len(spec) >= 1 and spec[0] == "pipe", (path, spec)
    # non-layer params unchanged; pipe-free meshes keep DEFAULT_RULES
    assert specs["language_model"]["embed_tokens"][0] != "pipe"
    mesh1 = make_mesh(MeshConfig(data=1, fsdp=4, tensor=2))
    from ultravox_tpu.parallel.sharding import DEFAULT_RULES

    assert rules_for_mesh(mesh1) is DEFAULT_RULES


def test_param_specs_cover_tree(setup):
    cfg, params, _ = setup
    mesh = make_mesh(MeshConfig(data=1, fsdp=4, tensor=2))
    specs = param_pspecs(params, mesh=mesh)
    flat = jax.tree_util.tree_leaves(specs, is_leaf=lambda x: isinstance(x, P))
    assert len(flat) == len(jax.tree_util.tree_leaves(params))
    # the big matmuls must actually be sharded
    assert specs["language_model"]["layers"]["q_proj"]["kernel"] != P()
    assert specs["language_model"]["embed_tokens"] != P()


def test_sharded_forward_matches_single_device(setup):
    cfg, params, batch = setup
    ref = np.asarray(
        uv.ultravox_forward(params, cfg, {k: jnp.asarray(v) for k, v in batch.items()})
    )
    for mc in [MeshConfig(1, 4, 2), MeshConfig(2, 2, 2), MeshConfig(8, 1, 1)]:
        mesh = make_mesh(mc)
        sharded = shard_params(params, mesh)
        jbatch = shard_batch({k: jnp.asarray(v) for k, v in batch.items()}, mesh)
        fwd = jax.jit(lambda p, b: uv.ultravox_forward(p, cfg, b))
        out = np.asarray(fwd(sharded, jbatch))
        np.testing.assert_allclose(out, ref, atol=2e-4)


def test_sharded_train_step(setup):
    """One full training step over a 2×2×2 mesh (dp×fsdp×tp): compiles,
    executes, loss finite and equal to the unsharded step's loss."""
    cfg, params, batch = setup
    loss_cfg = LossConfig()
    opt = ts.make_optimizer(1e-3, warmup_steps=0, total_steps=10, schedule="constant")
    step_fn = None

    # unsharded reference
    state, template = ts.init_train_state(params, opt)
    ref_step = jax.jit(ts.make_train_step(cfg, loss_cfg, opt, template, remat=True))
    jbatch = {k: jnp.asarray(v) for k, v in batch.items()}
    _, ref_metrics = ref_step(state, jbatch)

    mesh = make_mesh(MeshConfig(2, 2, 2))
    sharded_params = shard_params(params, mesh)
    state_s, template_s = ts.init_train_state(sharded_params, opt)
    step_s = jax.jit(ts.make_train_step(cfg, loss_cfg, opt, template_s, remat=True))
    sbatch = shard_batch(jbatch, mesh)
    new_state, metrics = step_s(state_s, sbatch)
    assert np.isfinite(float(metrics["loss"]))
    np.testing.assert_allclose(
        float(metrics["loss"]), float(ref_metrics["loss"]), rtol=1e-4
    )
    np.testing.assert_allclose(
        float(metrics["grad_norm"]), float(ref_metrics["grad_norm"]), rtol=1e-3
    )


def test_sharded_serving_engine(setup):
    """ServingEngine over a sharded model on the virtual mesh must produce
    the same tokens as the unsharded offline engine."""
    from ultravox_tpu.inference.engine import GenerationEngine
    from ultravox_tpu.inference.serving.engine import ServingEngine

    cfg, params, batch = setup
    mesh = make_mesh(MeshConfig(1, 2, 2))
    sharded = shard_params(params, mesh)

    one = {
        "input_ids": np.asarray(batch["input_ids"][:1]),
        "attention_mask": np.asarray(batch["attention_mask"][:1]),
    }
    offline = GenerationEngine(params, cfg, max_cache_len=128, cache_dtype=jnp.float32)
    expected = offline.generate(one, max_new_tokens=6).token_ids[0]

    serving = ServingEngine(
        sharded, cfg, num_slots=2, max_seq_len=128, cache_dtype=jnp.float32,
        prefill_len_buckets=(128,), mel_len_buckets=(400,), mesh=mesh,
    )
    serving.start()
    try:
        req = serving.submit(one, max_tokens=6)
        ids = []
        for ev in serving.stream(req):
            if ev.token_id is None:
                break
            ids.append(ev.token_id)
    finally:
        serving.stop()
    assert ids == expected


def test_sharded_serving_engine_paged(setup):
    """Paged mode over a sharded model: the page pool shards its head axis
    over 'tensor' like the slot cache, and tokens match the unsharded
    offline engine."""
    from ultravox_tpu.inference.engine import GenerationEngine
    from ultravox_tpu.inference.serving.engine import ServingEngine

    cfg, params, batch = setup
    mesh = make_mesh(MeshConfig(1, 2, 2))
    sharded = shard_params(params, mesh)

    one = {
        "input_ids": np.asarray(batch["input_ids"][:1]),
        "attention_mask": np.asarray(batch["attention_mask"][:1]),
    }
    offline = GenerationEngine(
        params, cfg, max_cache_len=128, cache_dtype=jnp.float32
    )
    expected = offline.generate(one, max_new_tokens=6).token_ids[0]

    serving = ServingEngine(
        sharded, cfg, num_slots=2, max_seq_len=128, cache_dtype=jnp.float32,
        prefill_len_buckets=(128,), mel_len_buckets=(400,), mesh=mesh,
        cache_mode="paged", page_size=16,
    )
    serving.start()
    try:
        req = serving.submit(one, max_tokens=6)
        ids = []
        for ev in serving.stream(req):
            if ev.token_id is None:
                break
            ids.append(ev.token_id)
    finally:
        serving.stop()
    assert ids == expected


def test_sharded_serving_with_spec_decode(setup):
    """Speculative decoding over a TP-sharded model: the verify forward and
    history machinery compile on the mesh and emit exactly the unsharded
    offline greedy tokens."""
    from ultravox_tpu.inference.engine import GenerationEngine
    from ultravox_tpu.inference.serving.engine import ServingEngine

    cfg, params, batch = setup
    mesh = make_mesh(MeshConfig(1, 2, 2))
    sharded = shard_params(params, mesh)

    one = {
        "input_ids": np.asarray(batch["input_ids"][:1]),
        "attention_mask": np.asarray(batch["attention_mask"][:1]),
    }
    offline = GenerationEngine(
        params, cfg, max_cache_len=128, cache_dtype=jnp.float32
    )
    expected = offline.generate(one, max_new_tokens=12).token_ids[0]

    serving = ServingEngine(
        sharded, cfg, num_slots=2, max_seq_len=128, cache_dtype=jnp.float32,
        prefill_len_buckets=(128,), mel_len_buckets=(400,), mesh=mesh,
        spec_decode="ngram", spec_k=4,
    )
    serving.start()
    try:
        req = serving.submit(one, max_tokens=12)
        ids = []
        for ev in serving.stream(req):
            if ev.token_id is None:
                break
            ids.append(ev.token_id)
    finally:
        serving.stop()
    assert ids == expected
    assert serving.spec_dispatches > 0
