"""LocalInference: offline single/batch/streaming inference with
conversation-mode KV reuse (reference: inference/infer.py:20-342).

TPU-native differences from the reference:
- generation runs through the compiled ``GenerationEngine`` (bucketed
  prefill + decode) instead of HF ``generate`` + a streamer thread;
- conversation mode persists the KV cache and reuses it via *token-prefix
  matching*: each turn renders the full conversation, and if the cached
  token ids form a prefix, only the suffix is prefilled (replaces the
  reference's two-pass replay with deep-copied past_key_values,
  infer.py:196-265).
"""

from __future__ import annotations

import dataclasses
import re
import time
import threading
import queue as queue_lib
from typing import Any, Dict, List, Optional

import numpy as np

from ultravox_tpu.data.sample import SAMPLE_RATE, VoiceSample
from ultravox_tpu.inference import base
from ultravox_tpu.inference.engine import GenerationEngine
from ultravox_tpu.models.config import UltravoxConfig
from ultravox_tpu.models.processor import DataCollatorWithAudio, UltravoxProcessor
from ultravox_tpu.utils.audio import resample

MAX_NEW_TOKENS = 1024
THINK_RE = re.compile(r"<think>(.*?)</think>\s*(.*)", re.DOTALL)


def _split_thinking(text: str):
    m = THINK_RE.match(text)
    if m:
        return m.group(1).strip(), m.group(2).strip()
    return None, text


class LocalInference(base.VoiceInference):
    def __init__(
        self,
        params: Any,
        cfg: UltravoxConfig,
        processor: UltravoxProcessor,
        *,
        max_cache_len: int = 4096,
        conversation_mode: bool = False,
        chat_template: Optional[str] = None,
        extra_stop_tokens: tuple = (),
        cache_dtype=None,
        fused_greedy_decode: bool = False,
        quantize: Optional[str] = None,
    ):
        import jax.numpy as jnp

        self.cfg = cfg
        self.processor = processor
        self.tokenizer = processor.tokenizer
        stop_ids = {self.tokenizer.eos_token_id}
        for tok in extra_stop_tokens:
            tid = self.tokenizer.convert_tokens_to_ids(tok)
            if tid is not None:
                stop_ids.add(tid)
        self.engine = GenerationEngine(
            params,
            cfg,
            max_cache_len=max_cache_len,
            stop_token_ids=tuple(stop_ids),
            cache_dtype=cache_dtype or jnp.bfloat16,
            quantize=quantize,
        )
        self.collator = DataCollatorWithAudio(
            pad_token_id=self.tokenizer.pad_token_id,
            max_audio_len=processor.audio_context_size or 3000,
        )
        if chat_template:
            self.tokenizer.chat_template = chat_template
        self.conversation_mode = conversation_mode
        self.fused_greedy_decode = fused_greedy_decode
        self.past_messages: List[Dict[str, str]] = []
        # audios referenced by <|audio|> placeholders in past messages, in
        # order (the prefix-reuse path skips re-encoding them; a cache miss
        # re-encodes from here)
        self.past_audios: List[np.ndarray] = []
        # conversation KV state: tokens written to the cache so far + the
        # cache itself (engine-owned arrays)
        self._conv_tokens: List[int] = []
        self._conv_cache = None

    # -- data prep ---------------------------------------------------------

    def _dataproc(
        self, sample: VoiceSample, past_audios: Optional[List[np.ndarray]] = None
    ) -> Dict[str, np.ndarray]:
        if sample.audio is not None and sample.sample_rate != SAMPLE_RATE:
            sample = dataclasses.replace(
                sample,
                audio=resample(sample.audio, sample.sample_rate, SAMPLE_RATE),
                sample_rate=SAMPLE_RATE,
            )
        text = self.tokenizer.apply_chat_template(
            sample.messages, tokenize=False, add_generation_prompt=True
        )
        audios = list(past_audios or [])
        if sample.audio is not None:
            audios.append(sample.audio)
        return self.processor(text=text, audios=audios or None)

    # -- public API ----------------------------------------------------------

    def infer(
        self,
        sample: VoiceSample,
        max_tokens: Optional[int] = None,
        temperature: Optional[float] = None,
    ) -> base.VoiceOutput:
        return self.infer_batch([sample], max_tokens, temperature)[0]

    def infer_batch(
        self,
        samples: List[VoiceSample],
        max_tokens: Optional[int] = None,
        temperature: Optional[float] = None,
    ) -> List[base.VoiceOutput]:
        samples = [self._with_past(s) for s in samples]
        if self.conversation_mode and len(samples) == 1:
            result = self._generate_conversational(
                samples[0], max_tokens, temperature
            )
            prompt_lens = result.prompt_lens
            results = [(result.token_ids[0], prompt_lens[0])]
        else:
            feats = [self._dataproc(s) for s in samples]
            batch = self.collator(feats)
            if self.fused_greedy_decode:
                # fused decode loop: one dispatch per call; always runs
                # max_new_tokens steps, so best when dispatch latency
                # dominates (remote-attached devices) or answers are long.
                # Sampling happens on device, so temperature works here too.
                result = self.engine.generate_fused(
                    batch,
                    max_new_tokens=max_tokens or MAX_NEW_TOKENS,
                    temperature=temperature or 0.0,
                )
            else:
                result = self.engine.generate(
                    batch,
                    max_new_tokens=max_tokens or MAX_NEW_TOKENS,
                    temperature=temperature or 0.0,
                )
            results = list(zip(result.token_ids, result.prompt_lens))
        outputs = []
        for ids, n_in in results:
            text = self.tokenizer.decode(ids, skip_special_tokens=True)
            thinking, text = _split_thinking(text)
            outputs.append(
                base.VoiceOutput(
                    text=text,
                    input_tokens=n_in,
                    output_tokens=len(ids),
                    thinking_content=thinking,
                )
            )
        if self.conversation_mode and len(samples) == 1:
            self.past_messages = samples[0].messages + [
                {"role": "assistant", "content": outputs[0].text}
            ]
            if samples[0].audio is not None:
                self.past_audios.append(samples[0].audio)
        return outputs

    # -- conversation KV reuse ------------------------------------------------

    def _split_prefix(self, feats: Dict[str, np.ndarray]):
        """Longest reusable cached prefix (token-id match, never splitting an
        audio chunk), and the suffix batch in local coordinates."""
        ids = np.asarray(feats["input_ids"][0])
        cached = self._conv_tokens
        p = 0
        limit = min(len(cached), len(ids) - 1)  # keep ≥1 suffix token
        while p < limit and cached[p] == int(ids[p]):
            p += 1
        if "audio_token_start_idx" in feats:
            starts = np.asarray(feats["audio_token_start_idx"])
            lens = np.asarray(feats["audio_token_len"])
            for s, l in zip(starts, lens):
                if s < p < s + l:  # don't split a chunk
                    p = int(s)
        suffix: Dict[str, np.ndarray] = {
            "input_ids": ids[None, p:],
            "attention_mask": np.ones((1, len(ids) - p), np.int32),
        }
        if "audio_values" in feats:
            starts = np.asarray(feats["audio_token_start_idx"])
            keep = starts >= p
            if keep.any():
                suffix["audio_values"] = np.asarray(feats["audio_values"])[keep]
                suffix["audio_lens"] = np.asarray(feats["audio_lens"])[keep]
                suffix["audio_token_len"] = np.asarray(feats["audio_token_len"])[
                    keep
                ]
                suffix["audio_token_start_idx"] = (starts[keep] - p).astype(
                    np.int32
                )
                suffix["audio_chunk_batch_idx"] = np.zeros(
                    int(keep.sum()), np.int32
                )
        return p, suffix, ids

    def _generate_conversational(
        self, sample, max_tokens, temperature, token_callback=None
    ):
        """``sample`` must already include past messages (see _with_past)."""
        feats = self._dataproc(sample, past_audios=self.past_audios)
        p, suffix, full_ids = self._split_prefix(feats)
        result = self.engine.generate(
            suffix,
            max_new_tokens=max_tokens or MAX_NEW_TOKENS,
            temperature=temperature or 0.0,
            cache=self._conv_cache if p > 0 else None,
            start_pos=p,
            return_cache=True,
            token_callback=token_callback,
        )
        self._conv_cache = result.cache
        cache_len = int(result.cache_lens[0])
        written = list(full_ids) + result.token_ids[0]
        self._conv_tokens = written[:cache_len]
        # report the full prompt length (not just the suffix)
        result.prompt_lens = [len(full_ids)]
        return result

    def infer_stream(
        self,
        sample: VoiceSample,
        max_tokens: Optional[int] = None,
        temperature: Optional[float] = None,
    ) -> base.InferenceGenerator:
        conversational = self.conversation_mode
        sample = self._with_past(sample)
        if not conversational:
            feats = self._dataproc(sample)
            batch = self.collator([feats])
        t_start = time.monotonic()
        ttft: List[Optional[float]] = [None]

        q: "queue_lib.Queue" = queue_lib.Queue()
        emitted = [0]
        all_ids: List[int] = []

        def callback(step, tokens, done):
            if ttft[0] is None:
                ttft[0] = time.monotonic() - t_start
            if not done[0]:
                all_ids.append(int(tokens[0]))
                text = self.tokenizer.decode(all_ids, skip_special_tokens=True)
                # withhold trailing bytes that don't decode cleanly yet
                if not text.endswith("�") and len(text) > emitted[0]:
                    q.put(text[emitted[0] :])
                    emitted[0] = len(text)

        result_box: Dict[str, Any] = {}

        def run():
            try:
                if conversational:
                    result_box["result"] = self._generate_conversational(
                        sample, max_tokens, temperature, token_callback=callback
                    )
                else:
                    result_box["result"] = self.engine.generate(
                        batch,
                        max_new_tokens=max_tokens or MAX_NEW_TOKENS,
                        temperature=temperature or 0.0,
                        token_callback=callback,
                    )
            except BaseException as e:  # surfaced to the consumer
                result_box["error"] = e
            finally:
                q.put(None)

        worker = threading.Thread(target=run, daemon=True)
        worker.start()
        while True:
            chunk = q.get()
            if chunk is None:
                break
            yield base.InferenceChunk(chunk)
        worker.join()
        if "error" in result_box:
            raise result_box["error"]
        result = result_box["result"]
        full_text = self.tokenizer.decode(
            result.token_ids[0], skip_special_tokens=True
        )
        if self.conversation_mode:
            self.past_messages = sample.messages + [
                {"role": "assistant", "content": full_text}
            ]
            if sample.audio is not None:
                self.past_audios.append(sample.audio)
        yield base.InferenceStats(
            input_tokens=result.prompt_lens[0],
            output_tokens=len(result.token_ids[0]),
            ttft_s=ttft[0],
            total_s=time.monotonic() - t_start,
        )

    def update_conversation(self, past_messages=None, past_cache=None) -> None:
        self.past_messages = past_messages or []
        if not past_messages:
            self.past_audios = []
            self._conv_tokens = []
            self._conv_cache = None

    def _with_past(self, sample: VoiceSample) -> VoiceSample:
        if not self.conversation_mode or not self.past_messages:
            return sample
        out = dataclasses.replace(sample)
        out.messages = self.past_messages + sample.messages
        return out
