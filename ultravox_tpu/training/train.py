"""Training CLI: ``python -m ultravox_tpu.training.train --config_path <yaml>``.

Re-design of the reference's ``training/train.py``: instead of torchrun + HF
Trainer + accelerate, a single pjit-compiled train step over a
(data, fsdp, tensor) mesh, host-side data loading with a background prefetch
thread, orbax diff-checkpoints, and TensorBoard/JSONL logging.
"""

from __future__ import annotations

import dataclasses
import json
import logging
import os
import queue
import threading
import time
from typing import Any, Dict, Iterator, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ultravox_tpu.data import registry
from ultravox_tpu.data import types as data_types
from ultravox_tpu.data.aug import AugmentationArgs, create_augmentation
from ultravox_tpu.data.datasets import InterleaveDataset, Range
from ultravox_tpu.parallel import MeshConfig, make_mesh, shard_params
from ultravox_tpu.parallel import multihost
from ultravox_tpu.parallel.collectives import is_global_master, sync_hosts
from ultravox_tpu.parallel.mesh import initialize_multihost
from ultravox_tpu.training import checkpoint as ckpt_lib
from ultravox_tpu.training import train_step as ts
from ultravox_tpu.training.config import TrainConfig, get_train_config
from ultravox_tpu.training.model_factory import create_model_pack

logger = logging.getLogger(__name__)


def batch_iterator(
    dataset, collator, batch_size: int, infinite: bool = True
) -> Iterator[Dict[str, np.ndarray]]:
    """Group dataset features into collated batches, cycling if needed."""
    while True:
        buf: List[Dict[str, Any]] = []
        n = 0
        for features in dataset:
            buf.append(features)
            if len(buf) == batch_size:
                yield collator(buf)
                buf = []
            n += 1
        if buf:
            yield collator(buf)
        if not infinite or n == 0:
            return


class Prefetcher:
    """Background-thread batch prefetch (replaces torch DataLoader workers)."""

    def __init__(self, iterator: Iterator, depth: int = 4):
        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._iterator = iterator
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _run(self):
        try:
            for item in self._iterator:
                self._q.put(item)
        except BaseException as e:  # surfaced on the consumer side
            self._q.put(e)
        self._q.put(None)

    def __iter__(self):
        while True:
            item = self._q.get()
            if item is None:
                return
            if isinstance(item, BaseException):
                raise item
            yield item


class MetricsLogger:
    """Metrics sinks: JSONL always; TensorBoard and W&B when configured and
    importable (reference logs to W&B/TensorBoard via report_logs_to,
    config_base.py:171)."""

    def __init__(self, config: TrainConfig):
        self.config = config
        self._tb = None
        self._wandb = None
        self._jsonl = None
        os.makedirs(config.output_dir, exist_ok=True)
        if "tensorboard" in config.report_logs_to:
            try:
                from tensorboardX import SummaryWriter

                self._tb = SummaryWriter(
                    os.path.join(config.output_dir, "tensorboard")
                )
            except ImportError:
                logger.warning("tensorboardX unavailable; skipping TB logs")
        if "wandb" in config.report_logs_to:
            try:
                import wandb

                self._wandb = wandb
                wandb.init(
                    project=os.environ.get("WANDB_PROJECT", "ultravox-tpu"),
                    name=config.exp_name,
                    config=dataclasses.asdict(config),
                    dir=config.output_dir,
                )
            except ImportError:
                logger.warning("wandb unavailable; skipping W&B logs")
        self._jsonl = open(
            os.path.join(config.output_dir, "train_log.jsonl"), "a"
        )

    def log(self, step: int, metrics: Dict[str, float]):
        if self._tb is not None:
            for k, v in metrics.items():
                self._tb.add_scalar(k, v, step)
        if self._wandb is not None:
            self._wandb.log(metrics, step=step)
        self._jsonl.write(json.dumps({"step": step, **metrics}) + "\n")
        self._jsonl.flush()
        logger.info(
            "step %d | %s",
            step,
            " ".join(f"{k}={v:.4f}" for k, v in metrics.items()),
        )

    def log_checkpoint(self, path: Optional[str]):
        """Log a checkpoint dir as a W&B model artifact when
        WANDB_LOG_MODEL is set (reference: train.py WANDB_LOG_MODEL flow)."""
        if (
            self._wandb is not None
            and path
            and os.environ.get("WANDB_LOG_MODEL")
        ):
            from ultravox_tpu.utils.wandb_utils import log_checkpoint_artifact

            log_checkpoint_artifact(self._wandb.run, path)

    def close(self):
        if self._tb is not None:
            self._tb.close()
        if self._wandb is not None:
            self._wandb.finish()
        self._jsonl.close()


def prepare_dataset(
    config: TrainConfig,
    model_pack,
    data_sets: List[str],
    args: data_types.VoiceDatasetArgs,
    num_samples: Optional[int] = None,
    augmentation=None,
):
    datasets = [registry.create_dataset(name, args) for name in data_sets]
    ds = (
        InterleaveDataset(datasets, config.data_weights)
        if len(datasets) > 1
        else datasets[0]
    )
    ds = model_pack.wrap_with_data_proc(ds, config, augmentation=augmentation)
    if num_samples:
        ds = Range(ds, num_samples)
    return ds


def train(config: TrainConfig) -> Dict[str, float]:
    logging.basicConfig(
        level=logging.DEBUG if config.verbose else logging.INFO,
        format="%(asctime)s %(levelname)s %(message)s",
    )
    t_start = time.time()
    # multi-host rendezvous BEFORE any device access (reference:
    # dist.init_process_group, train.py:126-130)
    initialize_multihost(
        config.coordinator_address, config.num_processes, config.process_id
    )
    n_proc = jax.process_count()
    logger.info(
        "process %d/%d | devices: %s", jax.process_index(), n_proc, jax.devices()
    )
    os.makedirs(config.output_dir, exist_ok=True)
    if is_global_master():
        with open(
            os.path.join(config.output_dir, "train_config.json"), "w"
        ) as f:
            json.dump(dataclasses.asdict(config), f, indent=2, default=str)

    mesh = make_mesh(
        MeshConfig(config.mesh_data, config.mesh_fsdp, config.mesh_tensor,
                   config.mesh_pipe)
    )
    model_pack = create_model_pack(config)
    params = shard_params(model_pack.params, mesh)

    # -- optimizer & state ---------------------------------------------------
    import optax

    optimizer = ts.make_optimizer(
        config.lr,
        schedule=config.lr_scheduler,
        warmup_steps=config.lr_warmup_steps,
        total_steps=config.max_steps,
        min_lr_rate=config.min_lr_rate,
        weight_decay=config.weight_decay,
        max_grad_norm=config.max_grad_norm,
        b1=config.optimizer_betas[0],
        b2=config.optimizer_betas[1],
    )
    if config.grad_accum_steps > 1:
        optimizer = optax.MultiSteps(optimizer, config.grad_accum_steps)
    state, template = ts.init_train_state(
        params, optimizer, config.effective_trainable_patterns
    )
    n_trainable = sum(int(np.prod(x.shape)) for x in state.trainable.values())
    n_frozen = sum(int(np.prod(x.shape)) for x in state.frozen.values())
    logger.info(
        "trainable params: %s || frozen: %s || trainable%%: %.2f%%",
        f"{n_trainable:,d}",
        f"{n_frozen:,d}",
        100 * n_trainable / max(n_trainable + n_frozen, 1),
    )

    if config.model_load_dir and config.resume_from_load_dir:
        latest = ckpt_lib.latest_checkpoint(config.model_load_dir)
        if latest:
            state = ckpt_lib.restore_checkpoint(latest, state)
            logger.info("resumed from %s at step %d", latest, int(state.step))

    step_fn = jax.jit(
        ts.make_train_step(
            model_pack.config,
            config.loss_config,
            optimizer,
            template,
            remat=config.remat,
            attn_impl=config.attn_impl,
            vocab_chunk=config.vocab_loss_chunk,
            pipe_mesh=mesh if config.mesh_pipe > 1 else None,
            pipe_micro=config.pipe_microbatches,
        ),
        donate_argnums=(0,),
    )

    # -- data -----------------------------------------------------------------
    augmentation = None
    if config.augmentations:
        augs = [
            create_augmentation(a, AugmentationArgs(seed=config.seed))
            for a in config.augmentations
        ]
        if len(augs) == 1:
            augmentation = augs[0]
        else:
            from ultravox_tpu.data.aug.base import Augmentation

            augmentation = Augmentation(
                AugmentationArgs(seed=config.seed), children=augs
            )
    train_args = data_types.TrainDatasetArgs(
        shuffle=config.shuffle_data,
        shuffle_buffer_size=config.shuffle_buffer_size,
        max_audio_duration_secs=config.max_audio_duration_secs,
        max_input_characters=config.max_input_characters,
    )
    train_ds = prepare_dataset(
        config, model_pack, config.data_sets, train_args,
        num_samples=config.num_samples, augmentation=augmentation,
    )
    # per-host sharded feeding: each process loads a mod-N sample shard and
    # contributes local rows of the global batch
    # (jax.make_array_from_process_local_data); pure-TP meshes fall back to
    # identical replicated feeding on every host
    replicated_feed = multihost.needs_replicated_feed(mesh)
    local_batch_size = config.batch_size
    if n_proc > 1 and not replicated_feed:
        if config.batch_size % n_proc:
            raise ValueError(
                f"batch_size {config.batch_size} not divisible by "
                f"{n_proc} processes"
            )
        local_batch_size = config.batch_size // n_proc
        train_ds = multihost.ShardedDataset(train_ds, n_proc, jax.process_index())
    put_batch = (
        multihost.make_replicated_batch
        if replicated_feed
        else multihost.make_global_batch
    )
    batches = Prefetcher(
        batch_iterator(train_ds, model_pack.collator, local_batch_size)
    )

    # -- loop -------------------------------------------------------------------
    metrics_logger = MetricsLogger(config) if is_global_master() else None
    opt_steps = config.max_steps * config.grad_accum_steps
    final_metrics: Dict[str, float] = {}
    step = int(state.step)
    try:
        for batch in batches:
            if step >= opt_steps:
                break
            jb = put_batch(batch, mesh)
            state, metrics = step_fn(state, jb)
            step = int(state.step)
            if step % config.logging_steps == 0 or step == 1:
                host_metrics = {k: float(v) for k, v in metrics.items()}
                host_metrics["samples_per_s"] = (
                    step * config.batch_size / (time.time() - t_start)
                )
                if metrics_logger is not None:
                    metrics_logger.log(step, host_metrics)
                final_metrics = host_metrics
            if config.save_steps and step % config.save_steps == 0:
                path = save_checkpoint_multihost(config.output_dir, state)
                logger.info("saved checkpoint %s", path)
                if metrics_logger is not None:
                    metrics_logger.log_checkpoint(path)
            if config.val_steps and step % config.val_steps == 0 and config.val_sets:
                val = validate(config, model_pack, state, template, mesh)
                if metrics_logger is not None:
                    metrics_logger.log(step, val)
    except BaseException:
        logger.exception("training failed at step %d", step)
        raise
    finally:
        if metrics_logger is not None:
            metrics_logger.close()

    # final artifacts
    save_checkpoint_multihost(config.output_dir, state)
    if n_proc > 1:
        host_state = multihost.gather_tree_to_host(state)
        if is_global_master():
            ckpt_lib.export_safetensors(
                host_state,
                os.path.join(config.output_dir, "model.safetensors"),
            )
        sync_hosts("export")
    else:
        ckpt_lib.export_safetensors(
            state, os.path.join(config.output_dir, "model.safetensors")
        )

    # post-train in-process eval (reference: train.py:343-382 merges LoRA and
    # runs LocalInference over the eval sets)
    if config.do_eval and config.eval_sets:
        final_metrics.update(
            post_train_eval(config, model_pack, state, template)
        )
    logger.info("training done in %.1fs", time.time() - t_start)
    return final_metrics


def save_checkpoint_multihost(output_dir: str, state) -> Optional[str]:
    """Checkpoint write for (possibly) cross-host sharded state. Orbax is
    multihost-aware — every process must participate in the save (it runs its
    own global syncs internally), assuming a shared filesystem."""
    return ckpt_lib.save_checkpoint(output_dir, state)


def post_train_eval(config, model_pack, state, template) -> Dict[str, float]:
    from ultravox_tpu.evaluation.eval import EvalConfig, eval_datasets
    from ultravox_tpu.inference.infer import LocalInference
    from ultravox_tpu.models.lora import merge_lora

    params = ts.merge_params(template, state.trainable, state.frozen)
    params = merge_lora(params)
    inference = LocalInference(
        params, model_pack.config, model_pack.processor,
        max_cache_len=2048,
    )
    scores = eval_datasets(
        inference,
        EvalConfig(
            eval_sets=config.eval_sets,
            num_samples=config.eval_num_samples,
            batch_size=config.eval_batch_size,
            max_tokens=config.eval_max_tokens,
            output_dir=os.path.join(config.output_dir, "eval"),
        ),
    )
    return {
        f"eval/{name}": float(s["score"]) for name, s in scores.items()
    }


def validate(config, model_pack, state, template, mesh) -> Dict[str, float]:
    """Weighted val loss over the configured val sets (reference:
    evaluation/validate.py semantics). Multi-process runs feed the val set
    replicated (identical on every host) — val sets are small and capped by
    ``val_num_samples``."""
    eval_fn = jax.jit(
        ts.make_eval_step(
            model_pack.config, config.loss_config, template,
            vocab_chunk=config.vocab_loss_chunk,
            attn_impl=config.attn_impl,
            pipe_mesh=mesh if config.mesh_pipe > 1 else None,
            pipe_micro=config.pipe_microbatches,
        )
    )
    out: Dict[str, float] = {}
    args = data_types.ValDatasetArgs()
    put_batch = (
        multihost.make_replicated_batch
        if jax.process_count() > 1
        else multihost.make_global_batch
    )
    for name in config.val_sets:
        ds = prepare_dataset(
            config, model_pack, [name], args,
            num_samples=config.val_num_samples,
        )
        total, count = 0.0, 0
        for batch in batch_iterator(
            ds, model_pack.collator, config.batch_size, infinite=False
        ):
            jb = put_batch(batch, mesh)
            s, c = eval_fn(state, jb)
            total += float(s)
            count += int(c)
        if count:
            out[f"val_loss/{name}"] = total / count
    return out


def main():
    config = get_train_config()
    train(config)


if __name__ == "__main__":
    main()
