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
        )
        self.collator = DataCollatorWithAudio(
            pad_token_id=self.tokenizer.pad_token_id
        )
        if chat_template:
            self.tokenizer.chat_template = chat_template
        self.conversation_mode = conversation_mode
        self.past_messages: List[Dict[str, str]] = []

    # -- data prep ---------------------------------------------------------

    def _dataproc(self, sample: VoiceSample) -> Dict[str, np.ndarray]:
        if sample.audio is not None and sample.sample_rate != SAMPLE_RATE:
            sample = dataclasses.replace(
                sample,
                audio=resample(sample.audio, sample.sample_rate, SAMPLE_RATE),
                sample_rate=SAMPLE_RATE,
            )
        text = self.tokenizer.apply_chat_template(
            sample.messages, tokenize=False, add_generation_prompt=True
        )
        return self.processor(text=text, audio=sample.audio)

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
        feats = [self._dataproc(s) for s in samples]
        batch = self.collator(feats)
        result = self.engine.generate(
            batch,
            max_new_tokens=max_tokens or MAX_NEW_TOKENS,
            temperature=temperature or 0.0,
        )
        outputs = []
        for ids, n_in in zip(result.token_ids, result.prompt_lens):
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
        return outputs

    def infer_stream(
        self,
        sample: VoiceSample,
        max_tokens: Optional[int] = None,
        temperature: Optional[float] = None,
    ) -> base.InferenceGenerator:
        sample = self._with_past(sample)
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
            result_box["result"] = self.engine.generate(
                batch,
                max_new_tokens=max_tokens or MAX_NEW_TOKENS,
                temperature=temperature or 0.0,
                token_callback=callback,
            )
            q.put(None)

        worker = threading.Thread(target=run, daemon=True)
        worker.start()
        while True:
            chunk = q.get()
            if chunk is None:
                break
            yield base.InferenceChunk(chunk)
        worker.join()
        result = result_box["result"]
        full_text = self.tokenizer.decode(
            result.token_ids[0], skip_special_tokens=True
        )
        if self.conversation_mode:
            self.past_messages = sample.messages + [
                {"role": "assistant", "content": full_text}
            ]
        yield base.InferenceStats(
            input_tokens=result.prompt_lens[0],
            output_tokens=len(result.token_ids[0]),
            ttft_s=ttft[0],
            total_s=time.monotonic() - t_start,
        )

    def update_conversation(self, past_messages=None, past_cache=None) -> None:
        self.past_messages = past_messages or []

    def _with_past(self, sample: VoiceSample) -> VoiceSample:
        if not self.conversation_mode or not self.past_messages:
            return sample
        out = dataclasses.replace(sample)
        out.messages = self.past_messages + sample.messages
        return out
