"""Pipeline parallelism (GPipe) over the decoder layer stack.

Beyond-reference machinery: the reference scales with DP/FSDP/TP only
(SURVEY.md §2.4 — "PP: absent"). On TPU slices, pipeline parallelism over
the layer axis complements FSDP/TP for 70B-class models: each ``pipe``
stage holds ``num_layers / P`` contiguous layers, microbatches stream
through the stages via ``lax.ppermute`` hops over ICI, and reverse-mode AD
derives the backward schedule automatically — the transpose of a ppermute
is the inverse ppermute, so ``jax.grad`` through the forward pipeline IS
the backward pipeline (no hand-written schedule).

This maps directly onto the repo's weight convention: per-layer weights
already live stacked on a leading ``L`` axis (models/decoder.py), so a
stage's slice is simply ``PartitionSpec("pipe", ...)`` on that axis — the
same mechanism FSDP uses, pointed at a different axis.

Schedule (classic GPipe): T = M + P - 1 steps for M microbatches over P
stages. At step t, stage 0 ingests microbatch t (while t < M), every stage
runs its local layer slice on its current activation, the last stage
captures its result, and activations rotate one stage forward. Bubble
fraction = (P-1)/(M+P-1) — pick M ≥ 4·P to keep it under ~20%.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P


def pipeline_layers(
    layer_fn: Callable[[Any, Any], Any],
    stacked_local: Any,
    acts: Any,
    *,
    axis_name: str = "pipe",
    n_micro: int,
    n_stages: int,
    remat: bool = False,
) -> Any:
    """Run every microbatch through ALL layers distributed over the
    ``axis_name`` mesh axis. Must be called INSIDE ``shard_map``.

    ``layer_fn(layer_params, act) -> act`` applies ONE layer;
    ``stacked_local`` is this stage's layer slice (leading axis =
    ``num_layers / n_stages``, any pytree); ``acts`` is the microbatch
    stack (leading axis ``n_micro`` on every leaf — activations plus any
    per-microbatch context like rope tables or attention biases, which
    ride the pipeline untouched alongside the hidden states).

    Returns the ``acts`` pytree after all layers, replicated over the pipe
    axis. Differentiable end-to-end (scan + ppermute + where + psum).
    """
    p = jax.lax.axis_index(axis_name)

    def body(act, xs):
        return layer_fn(xs, act), None

    if remat:
        body = jax.checkpoint(body)

    def stage(act):
        act, _ = jax.lax.scan(body, act, stacked_local)
        return act

    zero = jax.tree.map(lambda a: jnp.zeros_like(a[0]), acts)
    perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]

    def step(state, t):
        m = jnp.clip(t, 0, n_micro - 1)
        inject = jax.tree.map(
            lambda a: jax.lax.dynamic_index_in_dim(a, m, 0, keepdims=False),
            acts,
        )
        take = (p == 0) & (t < n_micro)
        state = jax.tree.map(
            lambda i, s: jnp.where(take, i, s), inject, state
        )
        state = stage(state)
        out = state  # meaningful on the last stage once the pipe is full
        state = jax.tree.map(
            lambda s: jax.lax.ppermute(s, axis_name, perm), state
        )
        return state, out

    _, outs = jax.lax.scan(
        step, zero, jnp.arange(n_micro + n_stages - 1, dtype=jnp.int32)
    )
    # microbatch m reaches the last stage at step m + P - 1
    outs = jax.tree.map(
        lambda o: jax.lax.dynamic_slice_in_dim(
            o, n_stages - 1, n_micro, axis=0
        ),
        outs,
    )
    on_last = p == n_stages - 1
    outs = jax.tree.map(lambda o: jnp.where(on_last, o, 0), outs)
    # replicate the last stage's outputs to every stage (tiny vs the
    # per-step activation hops; a deployment keeping activations
    # stage-resident would skip this and compute the loss on stage P-1)
    return jax.tree.map(lambda o: jax.lax.psum(o, axis_name), outs)


def pipelined_decoder_hidden(
    params: Any,
    cfg,
    inputs_embeds: jax.Array,  # (B, T, D)
    positions: jax.Array,  # (B, T) int32
    kv_valid_len: jax.Array,  # (B,)
    *,
    mesh: jax.sharding.Mesh,
    n_micro: Optional[int] = None,
    axis_name: str = "pipe",
    remat: bool = False,
) -> jax.Array:
    """Cache-less (training) decoder forward with the layer stack
    pipelined over ``mesh[axis_name]`` — the pipeline-parallel counterpart
    of ``decoder_forward(..., return_hidden=True)`` (models/decoder.py).

    ``B`` must divide by ``n_micro`` and ``cfg.num_layers`` by the stage
    count. When ``n_micro`` is None it defaults to the largest multiple of
    the stage count that divides ``B`` (capped at 4x stages — the M >=
    4*P guideline above keeps the bubble under ~20%; M = P alone would
    idle ~half the pipeline). Rope tables and attention biases are built
    once per microbatch and ride the pipeline as context, so stages never
    recompute (or mis-index) per-microbatch masks.
    """
    from ultravox_tpu.models import decoder as dl

    n_stages = mesh.shape[axis_name]
    if cfg.num_layers % n_stages:
        raise ValueError(
            f"num_layers={cfg.num_layers} not divisible by "
            f"{n_stages} pipeline stages"
        )
    if n_micro is None:
        B_ = inputs_embeds.shape[0]
        n_micro = n_stages
        for m in (4 * n_stages, 3 * n_stages, 2 * n_stages):
            if B_ % m == 0:
                n_micro = m
                break
    M = n_micro
    B = inputs_embeds.shape[0]
    if B % M:
        raise ValueError(f"batch {B} not divisible by n_micro={M}")

    x = inputs_embeds
    if cfg.scale_embeddings:
        x = x * jnp.asarray(cfg.hidden_size**0.5, dtype=x.dtype)

    bias_global, bias_local = dl.make_attention_bias(
        cfg, positions, x.shape[1], kv_valid_len
    )
    inv_freq = jnp.asarray(
        dl.rope_frequencies(cfg.head_dim, cfg.rope_theta, cfg.rope_scaling)
    )
    cos_g, sin_g = dl.rope_cos_sin(positions, inv_freq)
    if cfg.rope_local_base_freq is not None:
        inv_freq_l = jnp.asarray(
            dl.rope_frequencies(cfg.head_dim, cfg.rope_local_base_freq)
        )
        cos_l, sin_l = dl.rope_cos_sin(positions, inv_freq_l)
    else:
        cos_l, sin_l = cos_g, sin_g

    def split(a):
        return a.reshape((M, B // M) + a.shape[1:])

    acts = {
        "h": split(x),
        "cos_g": split(cos_g),
        "sin_g": split(sin_g),
        "cos_l": split(cos_l),
        "sin_l": split(sin_l),
        "bias_g": split(bias_global),
    }
    if bias_local is not None:
        acts["bias_l"] = split(bias_local)

    local_flags = jnp.asarray(dl.is_local_layer(cfg))

    def layer_fn(xs, act):
        p_l, is_loc = xs
        h, _, _ = dl._decoder_layer(
            cfg, act["h"], p_l, None,
            act["cos_g"], act["sin_g"], act["cos_l"], act["sin_l"],
            act["bias_g"], act.get("bias_l"), is_loc,
            None, None, None,
        )
        return {**act, "h": h}

    run = functools.partial(
        pipeline_layers,
        layer_fn,
        axis_name=axis_name,
        n_micro=M,
        n_stages=n_stages,
        remat=remat,
    )

    # manual ONLY over the pipe axis (axis_names): layers split their
    # leading L axis into per-stage slices, acts replicate over pipe. Any
    # other mesh axes (data/fsdp/tensor) stay XLA-AUTOMATIC inside the
    # body, so the standard sharding rules (batch over (data, fsdp),
    # parameters over fsdp/tensor) compose with the pipeline unchanged.
    out = jax.shard_map(
        run,
        mesh=mesh,
        in_specs=(P(axis_name), P()),
        out_specs=P(),
        axis_names=frozenset({axis_name}),
        check_vma=False,
    )((params["layers"], local_flags), acts)

    h = out["h"].reshape((B,) + out["h"].shape[2:])
    return dl.rms_norm(
        h, params["norm"], cfg.rms_norm_eps,
        plus_one=cfg.arch in ("gemma2", "gemma3"),
    )
