"""The pjit training step: adapter-only / partially-frozen training with
optional KL distillation, sharded over a (data, fsdp, tensor) mesh.

TPU-native re-design of the reference's HF-Trainer-based loop (train.py,
trainer.py): one compiled function computes the student forward (with audio),
the no-grad text-only teacher forward (same LLM weight tree — the weights
exist once in HBM), the loss, gradients for the *trainable subtree only*
(frozen params never get a gradient buffer), the cross-data-parallel gradient
mean (XLA inserts the psum), and the optimizer update.

Freezing semantics follow the reference's ``apply_lora`` with r == 0
(ultravox_model.py:690-709): a parameter is trainable iff its path matches a
trainable pattern (projector by default) or an ``unfreeze_layers`` regex.
"""

from __future__ import annotations

import dataclasses
import re
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax

from ultravox_tpu.models import ultravox as uv
from ultravox_tpu.models.config import LossConfig, UltravoxConfig
from ultravox_tpu.parallel.sharding import _path_str

Params = Any


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    step: jax.Array
    trainable: Params  # the optimized subtree (flat path -> leaf dict)
    frozen: Params  # everything else
    opt_state: Any


def trainable_mask(
    params: Params,
    trainable_patterns: Sequence[str] = (r".*projector/.*",),
) -> Params:
    """Bool pytree: True where the param is optimized."""
    regexes = [re.compile(p) for p in trainable_patterns]

    def mark(path, leaf):
        s = _path_str(path)
        return any(r.fullmatch(s) or r.match(s) for r in regexes)

    return jax.tree_util.tree_map_with_path(mark, params)


def partition_params(params: Params, mask: Params) -> Tuple[Dict, Dict]:
    """Split into flat {path: leaf} dicts (trainable, frozen). Flat dicts keep
    pjit sharding rules applicable via the path strings."""
    flat, _ = jax.tree_util.tree_flatten_with_path(params)
    mflat, _ = jax.tree_util.tree_flatten_with_path(mask)
    trainable, frozen = {}, {}
    for (path, leaf), (_, m) in zip(flat, mflat):
        (trainable if m else frozen)[_path_str(path)] = leaf
    return trainable, frozen


def merge_params(
    params_template: Params, trainable: Dict, frozen: Dict
) -> Params:
    """Rebuild the full tree from the two flat dicts."""
    merged = {**frozen, **trainable}

    def rebuild(path, _leaf):
        return merged[_path_str(path)]

    return jax.tree_util.tree_map_with_path(rebuild, params_template)


def make_optimizer(
    learning_rate: float = 2e-3,
    *,
    schedule: str = "cosine_with_min_lr",
    warmup_steps: int = 1000,
    total_steps: int = 10_000,
    min_lr_rate: float = 0.1,
    weight_decay: float = 0.0,
    max_grad_norm: float = 1.0,
    b1: float = 0.9,
    b2: float = 0.999,
) -> optax.GradientTransformation:
    """AdamW with the reference's default schedule: linear warmup then cosine
    decay to ``min_lr_rate × lr`` (meta_config.yaml: lr_scheduler
    cosine_with_min_lr)."""
    if schedule == "cosine_with_min_lr":
        lr = optax.warmup_cosine_decay_schedule(
            init_value=0.0,
            peak_value=learning_rate,
            warmup_steps=warmup_steps,
            decay_steps=max(total_steps, warmup_steps + 1),
            end_value=learning_rate * min_lr_rate,
        )
    elif schedule == "constant":
        lr = optax.join_schedules(
            [
                optax.linear_schedule(0.0, learning_rate, warmup_steps),
                optax.constant_schedule(learning_rate),
            ],
            [warmup_steps],
        )
    elif schedule == "linear":
        lr = optax.join_schedules(
            [
                optax.linear_schedule(0.0, learning_rate, warmup_steps),
                optax.linear_schedule(
                    learning_rate, 0.0, max(total_steps - warmup_steps, 1)
                ),
            ],
            [warmup_steps],
        )
    else:
        raise ValueError(f"unknown schedule {schedule}")
    chain = []
    if max_grad_norm:
        chain.append(optax.clip_by_global_norm(max_grad_norm))
    chain.append(optax.adamw(lr, b1=b1, b2=b2, weight_decay=weight_decay))
    return optax.chain(*chain)


def init_train_state(
    params: Params,
    optimizer: optax.GradientTransformation,
    trainable_patterns: Sequence[str] = (r".*projector/.*",),
) -> Tuple[TrainState, Params]:
    """Returns (state, params_template). The template (a tree of
    ShapeDtypeStructs) is needed to re-merge flat dicts into the model tree.
    """
    mask = trainable_mask(params, trainable_patterns)
    trainable, frozen = partition_params(params, mask)
    template = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), params
    )
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        trainable=trainable,
        frozen=frozen,
        opt_state=optimizer.init(trainable),
    )
    return state, template


def make_train_step(
    cfg: UltravoxConfig,
    loss_config: LossConfig,
    optimizer: optax.GradientTransformation,
    params_template: Params,
    *,
    remat: bool = True,
    attn_impl: str = "xla",
    vocab_chunk: Optional[int] = None,
    pipe_mesh=None,  # Mesh with "pipe" > 1: GPipe the decoder layer stack
    pipe_micro: Optional[int] = None,
) -> Callable:
    """Build the (jit-able) train step: (state, batch) -> (state, metrics)."""

    def train_step(state: TrainState, batch: Dict[str, jax.Array]):
        def loss_fn(trainable):
            params = merge_params(params_template, trainable, state.frozen)
            return uv.ultravox_loss(
                params, cfg, batch, loss_config, remat=remat,
                attn_impl=attn_impl, vocab_chunk=vocab_chunk,
                pipe_mesh=pipe_mesh, pipe_micro=pipe_micro,
            )

        loss, grads = jax.value_and_grad(loss_fn)(state.trainable)
        updates, opt_state = optimizer.update(
            grads, state.opt_state, state.trainable
        )
        trainable = optax.apply_updates(state.trainable, updates)
        metrics = {
            "loss": loss,
            "grad_norm": optax.global_norm(grads),
            "param_norm": optax.global_norm(trainable),
        }
        new_state = TrainState(
            step=state.step + 1,
            trainable=trainable,
            frozen=state.frozen,
            opt_state=opt_state,
        )
        return new_state, metrics

    return train_step


def make_eval_step(
    cfg: UltravoxConfig,
    loss_config: LossConfig,
    params_template: Params,
    *,
    vocab_chunk: Optional[int] = None,
    attn_impl: str = "xla",
    pipe_mesh=None,
    pipe_micro: Optional[int] = None,
) -> Callable:
    """Validation loss step (reference: evaluation/validate.py teacher-forcing
    loss): (state, batch) -> (loss_sum, label_count) for weighted averaging.

    ``vocab_chunk`` projects to the vocabulary chunkwise (no (B, T, V)
    tensor) and ``attn_impl`` selects the attention path, both matching the
    train step's options so val loss runs through the same numerics."""

    def eval_step(state: TrainState, batch: Dict[str, jax.Array]):
        params = merge_params(params_template, state.trainable, state.frozen)
        labels = batch["labels"]
        if vocab_chunk:
            hidden = uv.ultravox_forward(
                params, cfg, batch, return_hidden=True, attn_impl=attn_impl,
                pipe_mesh=pipe_mesh, pipe_micro=pipe_micro,
            )
            s, c = uv.chunked_nll_sums(
                params["language_model"], cfg.text_config, hidden, labels,
                chunk=vocab_chunk,
            )
            return s, c
        logits = uv.ultravox_forward(params, cfg, batch, attn_impl=attn_impl)
        shift_labels = labels[:, 1:]
        valid = shift_labels != -100
        safe = jnp.where(valid, shift_labels, 0)
        logp = jax.nn.log_softmax(logits[:, :-1], axis=-1)
        nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
        return jnp.where(valid, nll, 0.0).sum(), valid.sum()

    return eval_step
