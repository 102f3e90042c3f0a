"""Continuous-batching serving engine.

Slot-based KV cache: a fixed pool of ``num_slots`` sequences, each with a
``max_seq_len`` cache row. A background thread runs the serving loop:

1. finished / cancelled slots are freed;
2. pending requests prefill into free slots (audio tower + projector +
   splice + LLM prefill in one compiled call, bucketed by prompt length),
   and their k/v is inserted into the slot cache;
3. one compiled decode step advances ALL active slots by one token;
4. sampled tokens stream out through per-request queues.

All device work is jitted with static shapes; slot state (lengths, active
mask, per-slot rng) lives in a single on-device struct donated through the
decode step. This is the architecture vLLM implements in C++/CUDA
(reference: run_vllm_inference.py drives it externally); here the scheduler
is host Python (cheap — one dispatch per decode step for the whole batch)
and the hot loop is XLA.
"""

from __future__ import annotations

import dataclasses
import functools
import itertools
import logging
import queue
import threading
import time
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ultravox_tpu.models import decoder as decoder_lib
from ultravox_tpu.models import ultravox as uv
from ultravox_tpu.models.config import UltravoxConfig
from ultravox_tpu.ops.sampling import sample_token

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class Request:
    request_id: int
    batch: Dict[str, np.ndarray]  # single-row collated features
    max_tokens: int = 256
    temperature: float = 0.0
    stop_token_ids: Tuple[int, ...] = ()
    out_queue: "queue.Queue" = dataclasses.field(default_factory=queue.Queue)
    submit_time: float = dataclasses.field(default_factory=time.monotonic)
    # filled by the engine
    slot: int = -1
    prompt_len: int = 0
    generated: int = 0
    first_token_time: Optional[float] = None


@dataclasses.dataclass
class StreamEvent:
    token_id: Optional[int]  # None => end of stream
    finish_reason: Optional[str] = None
    ttft_s: Optional[float] = None


def _bucket(n: int, buckets) -> int:
    for b in buckets:
        if n <= b:
            return b
    raise ValueError(f"{n} exceeds largest bucket {buckets[-1]}")


class ServingEngine:
    def __init__(
        self,
        params: Any,
        cfg: UltravoxConfig,
        *,
        num_slots: int = 16,
        max_seq_len: int = 2048,
        cache_dtype=jnp.bfloat16,
        prefill_len_buckets: Optional[Tuple[int, ...]] = None,
        mel_len_buckets: Tuple[int, ...] = (400, 1000, 2000, 3000),
        max_prefills_per_step: int = 2,
        encoder_attn_impl: str = "xla",
        decode_attn_impl: str = "xla",
        mesh=None,
    ):
        """``mesh``: serve a sharded model — params should already be placed
        via ``parallel.shard_params``; the KV cache shards its head axis over
        ``tensor`` and its slot axis over ``(data, fsdp)``."""
        self.params = params
        self.cfg = cfg
        self.num_slots = num_slots
        self.max_seq_len = max_seq_len
        if prefill_len_buckets is None:
            # powers of two up to the cache length, so the advertised context
            # is actually prefillable
            buckets = [64]
            while buckets[-1] < max_seq_len:
                buckets.append(min(buckets[-1] * 2, max_seq_len))
            prefill_len_buckets = tuple(buckets)
        self.prefill_len_buckets = prefill_len_buckets
        self.mel_len_buckets = mel_len_buckets
        self.max_prefills_per_step = max_prefills_per_step

        tc = cfg.text_config
        self.cache = decoder_lib.KVCache.zeros(
            tc, num_slots, max_seq_len, cache_dtype
        )
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            heads_ok = tc.num_kv_heads % mesh.shape["tensor"] == 0
            spec = P(
                None, None, None, "tensor" if heads_ok else None, None
            )
            self.cache = decoder_lib.KVCache(
                k=jax.device_put(self.cache.k, NamedSharding(mesh, spec)),
                v=jax.device_put(self.cache.v, NamedSharding(mesh, spec)),
            )
        self.cache_lens = jnp.zeros((num_slots,), jnp.int32)
        self.last_tokens = jnp.zeros((num_slots,), jnp.int32)
        self._rng = jax.random.key(0)

        self._prefill = jax.jit(
            functools.partial(
                _prefill_kv, cfg=cfg, encoder_attn_impl=encoder_attn_impl
            )
        )
        self._insert = jax.jit(_insert_kv, donate_argnums=(0,), static_argnums=(4,))
        self._decode = jax.jit(
            functools.partial(
                _decode_all_slots, cfg=cfg,
                decode_kernel=decode_attn_impl == "kernel",
            ),
            donate_argnums=(1,),
        )
        self._sample = jax.jit(
            sample_token, static_argnames=("temperature", "top_k", "top_p")
        )

        self._pending: "queue.Queue[Request]" = queue.Queue()
        self._active: Dict[int, Request] = {}  # slot -> request
        self._free_slots = list(range(num_slots))
        self._requests: Dict[int, Request] = {}
        self._id_counter = itertools.count()
        self._lock = threading.Lock()
        self._wake = threading.Event()
        self._running = False
        self._thread: Optional[threading.Thread] = None

    # -- public API --------------------------------------------------------

    def start(self):
        if self._running:
            return
        self._running = True
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def stop(self):
        self._running = False
        self._wake.set()
        if self._thread:
            self._thread.join(timeout=30)

    def submit(
        self,
        batch: Dict[str, np.ndarray],
        *,
        max_tokens: int = 256,
        temperature: float = 0.0,
        stop_token_ids: Tuple[int, ...] = (),
    ) -> Request:
        req = Request(
            request_id=next(self._id_counter),
            batch=batch,
            max_tokens=max_tokens,
            temperature=temperature,
            stop_token_ids=tuple(stop_token_ids),
        )
        self._requests[req.request_id] = req
        self._pending.put(req)
        self._wake.set()
        return req

    def stream(self, req: Request):
        """Yield StreamEvents until the request finishes."""
        while True:
            event: StreamEvent = req.out_queue.get()
            yield event
            if event.token_id is None:
                return

    # -- serving loop ----------------------------------------------------------

    def _loop(self):
        while self._running:
            did_work = False
            # admit new requests
            admitted = 0
            while (
                admitted < self.max_prefills_per_step
                and self._free_slots
                and not self._pending.empty()
            ):
                try:
                    req = self._pending.get_nowait()
                except queue.Empty:
                    break
                try:
                    self._admit(req)
                except Exception:  # noqa: BLE001 — fail the request, not the loop
                    logger.exception("admit failed for request %d", req.request_id)
                    if req.slot >= 0 and req.slot in self._active:
                        del self._active[req.slot]
                        self._free_slots.append(req.slot)
                    req.out_queue.put(
                        StreamEvent(token_id=None, finish_reason="error")
                    )
                    self._requests.pop(req.request_id, None)
                admitted += 1
                did_work = True

            if self._active:
                try:
                    self._decode_step()
                except Exception:  # noqa: BLE001 — fail active requests, keep serving
                    logger.exception("decode step failed; failing active requests")
                    for slot, req in list(self._active.items()):
                        req.out_queue.put(
                            StreamEvent(token_id=None, finish_reason="error")
                        )
                        del self._active[slot]
                        self._free_slots.append(slot)
                        self.cache_lens = self.cache_lens.at[slot].set(0)
                        self._requests.pop(req.request_id, None)
                did_work = True

            if not did_work:
                self._wake.wait(timeout=0.01)
                self._wake.clear()

    def _pad_request(self, batch: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
        batch = dict(batch)
        T = batch["input_ids"].shape[-1]
        Tp = _bucket(T, self.prefill_len_buckets)
        for key in ("input_ids", "attention_mask"):
            arr = np.asarray(batch[key]).reshape(1, -1)
            batch[key] = np.pad(arr, ((0, 0), (0, Tp - T)))
        if "audio_values" in batch and batch["audio_values"] is not None:
            mel = np.asarray(batch["audio_values"])
            Tm = mel.shape[-1]
            Tmp = _bucket(Tm, self.mel_len_buckets)
            batch["audio_values"] = np.pad(mel, ((0, 0), (0, 0), (0, Tmp - Tm)))
            if "audio_chunk_batch_idx" not in batch:
                batch["audio_chunk_batch_idx"] = np.zeros(
                    (mel.shape[0],), np.int32
                )
        return batch

    def _admit(self, req: Request):
        prompt_len = int(np.asarray(req.batch["attention_mask"]).sum())
        # a prompt of max_seq_len - 1 is servable (one token, then
        # cache_full); anything beyond that — or beyond the largest prefill
        # bucket — cannot be prefilled
        limit = min(self.max_seq_len - 1, self.prefill_len_buckets[-1])
        if prompt_len > limit:
            req.out_queue.put(
                StreamEvent(token_id=None, finish_reason="prompt_too_long")
            )
            self._requests.pop(req.request_id, None)
            return
        slot = self._free_slots.pop()
        try:
            req.slot = slot
            req.prompt_len = prompt_len
            padded = self._pad_request(req.batch)
            jbatch = {k: jnp.asarray(v) for k, v in padded.items()}
            logits_last, kv = self._prefill(self.params, jbatch)
            self.cache = self._insert(
                self.cache, kv, jnp.asarray(slot), jnp.asarray(req.prompt_len),
                self.max_seq_len,
            )
            self._rng, rng = jax.random.split(self._rng)
            tok = self._sample(
                logits_last, rng, temperature=req.temperature, top_k=0, top_p=1.0
            )
            tok_i = int(tok[0])
        except Exception:
            self._free_slots.append(slot)  # the slot must not leak
            req.slot = -1
            raise
        self.cache_lens = self.cache_lens.at[slot].set(req.prompt_len)
        self.last_tokens = self.last_tokens.at[slot].set(tok_i)
        self._active[slot] = req
        req.first_token_time = time.monotonic()
        self._emit(req, tok_i)

    def _decode_step(self):
        slots = sorted(self._active)
        active_mask = np.zeros((self.num_slots,), bool)
        active_mask[slots] = True
        self._rng, rng = jax.random.split(self._rng)
        # decode all slots (inactive ones compute garbage, ignored)
        logits, self.cache, self.cache_lens = self._decode(
            self.params,
            self.cache,
            self.last_tokens,
            self.cache_lens,
            jnp.asarray(active_mask),
        )
        # per-slot sampling: greedy fast path batched; temperature per request
        greedy = self._sample(logits, rng, temperature=0.0, top_k=0, top_p=1.0)
        greedy_np = np.asarray(greedy)
        sampled_np = greedy_np.copy()
        temp_slots = [s for s in slots if self._active[s].temperature > 0]
        if temp_slots:
            for s in temp_slots:
                self._rng, r2 = jax.random.split(self._rng)
                t = self._sample(
                    logits[s : s + 1], r2,
                    temperature=self._active[s].temperature, top_k=0, top_p=1.0,
                )
                sampled_np[s] = int(t[0])
        new_last = self.last_tokens
        for s in slots:
            req = self._active[s]
            tok = int(sampled_np[s])
            self._emit(req, tok)
            new_last = new_last.at[s].set(tok)
        self.last_tokens = new_last

    def _emit(self, req: Request, token_id: int):
        finish = None
        if token_id in req.stop_token_ids:
            finish = "stop"
        else:
            req.generated += 1
            req.out_queue.put(StreamEvent(token_id=token_id))
            if req.generated >= req.max_tokens:
                finish = "length"
            total = req.prompt_len + req.generated
            if finish is None and total >= self.max_seq_len - 1:
                finish = "cache_full"
        if finish is not None:
            ttft = (
                req.first_token_time - req.submit_time
                if req.first_token_time
                else None
            )
            req.out_queue.put(
                StreamEvent(token_id=None, finish_reason=finish, ttft_s=ttft)
            )
            if req.slot in self._active:
                del self._active[req.slot]
                self._free_slots.append(req.slot)
                self.cache_lens = self.cache_lens.at[req.slot].set(0)
            self._requests.pop(req.request_id, None)


def _prefill_kv(params, batch, *, cfg: UltravoxConfig, encoder_attn_impl="xla"):
    """Single-request prefill: returns (last-position logits (1, V), kv with
    shape (L, 1, T, Hkv, Dh))."""
    input_ids = batch["input_ids"]
    mask = batch["attention_mask"]
    B, T = input_ids.shape
    embeds = uv.ultravox_embed(
        params, cfg, input_ids, batch, encoder_attn_impl=encoder_attn_impl
    )
    positions = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32)[None], (B, T))
    seq_lens = mask.sum(axis=-1).astype(jnp.int32)
    logits, kv = decoder_lib.decoder_forward(
        params["language_model"],
        cfg.text_config,
        inputs_embeds=embeds,
        positions=positions,
        kv_valid_len=seq_lens,
        return_kv=True,
    )
    last = jnp.take_along_axis(
        logits, jnp.maximum(seq_lens - 1, 0)[:, None, None], axis=1
    )[:, 0]
    return last, kv


def _insert_kv(cache, kv, slot, prompt_len, max_seq_len: int):
    """Copy a prefilled request's k/v into its slot (cache dtype cast).
    prompt_len is only semantic — the padded tail is masked by cache_lens."""
    L, _, T, H, D = kv.k.shape
    def ins(big, small):
        # big: (L, S_slots, S_max, H, D); small: (L, 1, T, H, D)
        return jax.lax.dynamic_update_slice(
            big,
            small[:, 0].astype(big.dtype)[:, None],
            (0, slot, 0, 0, 0),
        )
    return decoder_lib.KVCache(k=ins(cache.k, kv.k), v=ins(cache.v, kv.v))


def _decode_all_slots(
    params, cache, tokens, cache_lens, active_mask, *, cfg,
    decode_kernel: bool = False,
):
    """One decode step for every slot. Inactive slots keep cache_len and
    produce ignored logits (position clamps keep indices in range)."""
    B = tokens.shape[0]
    embeds = jnp.take(params["language_model"]["embed_tokens"], tokens, axis=0)[
        :, None
    ]
    positions = cache_lens[:, None]
    logits, cache = decoder_lib.decoder_forward(
        params["language_model"],
        cfg.text_config,
        inputs_embeds=embeds,
        positions=positions,
        kv_valid_len=cache_lens + 1,
        cache=cache,
        write_pos=cache_lens,
        decode_kernel=decode_kernel,
    )
    new_lens = jnp.where(active_mask, cache_lens + 1, cache_lens)
    return logits[:, 0], cache, new_lens
