"""Pipeline-parallel (GPipe) decoder tests: the pipelined layer stack must
match the plain scanned decoder exactly — forward hidden states AND
gradients (reverse-mode AD through ppermute IS the backward schedule)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from ultravox_tpu.models import DecoderConfig
from ultravox_tpu.models import decoder as dl
from ultravox_tpu.parallel.pipeline import (
    pipeline_layers,
    pipelined_decoder_hidden,
)


@pytest.fixture(scope="module")
def setup():
    cfg = DecoderConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_layers=4, num_heads=4, num_kv_heads=2, head_dim=8,
    )
    params = dl.init_params(cfg, jax.random.key(0))
    B, T = 8, 16
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(1, 128, (B, T)), jnp.int32)
    positions = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32), (B, T))
    valid = jnp.full((B,), T, jnp.int32)
    return cfg, params, ids, positions, valid


def _pipe_mesh(n):
    return Mesh(np.array(jax.devices()[:n]), ("pipe",))


def _reference_hidden(params, cfg, embeds, positions, valid):
    h, _ = dl.decoder_forward(
        params, cfg, inputs_embeds=embeds, positions=positions,
        kv_valid_len=valid, return_hidden=True,
    )
    return h


@pytest.mark.parametrize("stages,n_micro", [(4, 4), (2, 8), (8, 4)])
def test_pipelined_hidden_matches_scan(setup, stages, n_micro):
    cfg, params, ids, positions, valid = setup
    if stages == 8:
        # 4 layers over 8 stages is invalid; widen to 8 layers
        cfg = DecoderConfig(
            vocab_size=128, hidden_size=32, intermediate_size=64,
            num_layers=8, num_heads=4, num_kv_heads=2, head_dim=8,
        )
        params = dl.init_params(cfg, jax.random.key(1))
    embeds = dl.embed_lookup(params, ids)
    ref = _reference_hidden(params, cfg, embeds, positions, valid)
    mesh = _pipe_mesh(stages)
    out = jax.jit(
        lambda p, e: pipelined_decoder_hidden(
            p, cfg, e, positions, valid, mesh=mesh, n_micro=n_micro
        )
    )(params, embeds)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5
    )


def test_pipelined_gradients_match(setup):
    """grad through the pipeline (ppermute transposes to the reverse hops)
    equals grad through the plain scan, for both weights and inputs."""
    cfg, params, ids, positions, valid = setup
    embeds = dl.embed_lookup(params, ids)
    mesh = _pipe_mesh(4)

    def loss_ref(p, e):
        h = _reference_hidden(p, cfg, e, positions, valid)
        return jnp.mean(h.astype(jnp.float32) ** 2)

    def loss_pipe(p, e):
        h = pipelined_decoder_hidden(
            p, cfg, e, positions, valid, mesh=mesh, n_micro=4
        )
        return jnp.mean(h.astype(jnp.float32) ** 2)

    (l0, g0) = jax.jit(jax.value_and_grad(loss_ref, argnums=(0, 1)))(
        params, embeds
    )
    (l1, g1) = jax.jit(jax.value_and_grad(loss_pipe, argnums=(0, 1)))(
        params, embeds
    )
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    flat0, tree0 = jax.tree.flatten(g0)
    flat1, tree1 = jax.tree.flatten(g1)
    assert tree0 == tree1
    for a, b in zip(flat0, flat1):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=3e-5, rtol=3e-5
        )


def test_pipelined_remat_matches(setup):
    cfg, params, ids, positions, valid = setup
    embeds = dl.embed_lookup(params, ids)
    mesh = _pipe_mesh(2)

    def loss(p, remat):
        h = pipelined_decoder_hidden(
            p, cfg, embeds, positions, valid, mesh=mesh, n_micro=4,
            remat=remat,
        )
        return jnp.mean(h.astype(jnp.float32) ** 2)

    g0 = jax.jit(jax.grad(lambda p: loss(p, False)))(params)
    g1 = jax.jit(jax.grad(lambda p: loss(p, True)))(params)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6, rtol=1e-6
        )


def test_pipeline_layers_generic_identity():
    """The generic scheduler applies every stage's layers exactly once and
    in order: with layer_fn = append-marker, outputs record the full layer
    sequence per microbatch."""
    mesh = _pipe_mesh(4)
    L, M = 8, 4
    # each "layer" multiplies by a distinct prime; order-sensitive check
    primes = jnp.asarray([2, 3, 5, 7, 11, 13, 17, 19], jnp.float32)
    acts = {"h": jnp.ones((M, 2, 2), jnp.float32)}

    def layer_fn(p, act):
        return {"h": act["h"] * p}

    out = jax.jit(
        jax.shard_map(
            lambda pr, a: pipeline_layers(
                layer_fn, pr, a, n_micro=M, n_stages=4
            ),
            mesh=mesh,
            in_specs=(jax.sharding.PartitionSpec("pipe"),
                      jax.sharding.PartitionSpec()),
            out_specs=jax.sharding.PartitionSpec(),
            check_vma=False,
        )
    )(primes, acts)
    expect = float(np.prod(np.asarray(primes)))
    np.testing.assert_allclose(np.asarray(out["h"]), expect, rtol=1e-5)


def test_pipeline_validates_divisibility(setup):
    cfg, params, ids, positions, valid = setup
    embeds = dl.embed_lookup(params, ids)
    mesh = _pipe_mesh(4)
    with pytest.raises(ValueError, match="n_micro"):
        pipelined_decoder_hidden(
            params, cfg, embeds, positions, valid, mesh=mesh, n_micro=3
        )
    mesh8 = _pipe_mesh(8)
    with pytest.raises(ValueError, match="pipeline stages"):
        pipelined_decoder_hidden(  # 4 layers over 8 stages
            params, cfg, embeds, positions, valid, mesh=mesh8, n_micro=8
        )
