"""Dataset factory CLI (reference: tools/ds_tool/ds_tool.py:25-287).

Processes an HF dataset in chunks through a task (text generation via an
OpenAI-compatible endpoint, TTS synthesis, augmentation, near-dedup,
audio splitting), with per-chunk retry-by-subdivision and disk caching, then
uploads/saves the result incrementally.

Tasks are plain dataclasses with ``map_split(dataset, exclude_fields)``;
clients (chat/TTS) are injectable for offline tests.
"""

from __future__ import annotations

import argparse
import dataclasses
import hashlib
import logging
import math
import os
from typing import Any, Dict, List, Optional

from ultravox_tpu.tools.ds_tool.caching import CachingChatWrapper, DiskCache

logger = logging.getLogger(__name__)


# --------------------------------------------------------------------------
# Tasks
# --------------------------------------------------------------------------


@dataclasses.dataclass
class TextGenerationTask:
    """Generate a new column with an LLM (reference: tasks textgen; e.g.
    continuation generation for the -continuation training sets)."""

    new_column_name: str = "continuation"
    template: str = "Continue the following text:\n\n{{ text }}"
    model: str = "gpt-4o-mini"
    max_tokens: int = 128
    temperature: float = 0.0
    client: Any = None  # OpenAI-compatible; required at run time
    cache_dir: str = ".cache/ds_tool/chat"

    def map_split(self, dataset, num_proc: int = 1):
        import jinja2

        tmpl = jinja2.Template(self.template)
        chat = CachingChatWrapper(self.client, self.cache_dir)

        def generate(row):
            prompt = tmpl.render(**row)
            row[self.new_column_name] = chat.chat_completion(
                model=self.model,
                messages=[{"role": "user", "content": prompt}],
                max_tokens=self.max_tokens,
                temperature=self.temperature,
            )
            return row

        return dataset.map(generate)


@dataclasses.dataclass
class TtsTask:
    """Synthesize audio for a text column via an injectable TTS client
    (reference: tasks/tts.py). The client must expose
    ``synthesize(text, voice) -> (np.ndarray, sample_rate)``."""

    column_name: str = "question"
    audio_column_name: str = "question_audio"
    voice: Optional[str] = None
    client: Any = None

    def map_split(self, dataset, num_proc: int = 1):
        def synth(row):
            audio, sr = self.client.synthesize(row[self.column_name], self.voice)
            row[self.audio_column_name] = {
                "array": audio,
                "sampling_rate": sr,
            }
            return row

        return dataset.map(synth)


@dataclasses.dataclass
class AugmentTask:
    """Apply a registered augmentation to the audio column offline
    (reference: tasks augment)."""

    audio_column_name: str = "audio"
    augmentation: str = "telephony"

    def map_split(self, dataset, num_proc: int = 1):
        from ultravox_tpu.data.aug import create_augmentation

        aug = create_augmentation(self.augmentation)
        aug.p = 1.0

        def apply(row):
            entry = dict(row[self.audio_column_name])
            entry["array"] = aug.apply_audio(entry["array"])
            row[self.audio_column_name] = entry
            return row

        return dataset.map(apply)


@dataclasses.dataclass
class DedupTask:
    """Drop near-duplicate rows by normalised-text hash (replaces the
    reference's annoy-based embedding dedup with a deterministic offline
    method)."""

    column_name: str = "text"
    _seen: set = dataclasses.field(default_factory=set)

    def map_split(self, dataset, num_proc: int = 1):
        def key(row):
            norm = " ".join(str(row[self.column_name]).lower().split())
            return hashlib.sha1(norm.encode()).hexdigest()

        def unique(row):
            k = key(row)
            if k in self._seen:
                return False
            self._seen.add(k)
            return True

        return dataset.filter(unique)


@dataclasses.dataclass
class AsrTask:
    """Transcribe an audio column via an injectable ASR client (reference:
    tasks asr — Deepgram). The client must expose
    ``transcribe(audio: np.ndarray, sample_rate: int) -> str``."""

    audio_column_name: str = "audio"
    text_column_name: str = "asr_text"
    client: Any = None

    def map_split(self, dataset, num_proc: int = 1):
        def transcribe(row):
            entry = row[self.audio_column_name]
            row[self.text_column_name] = self.client.transcribe(
                entry["array"], entry.get("sampling_rate", 16000)
            )
            return row

        return dataset.map(transcribe)


@dataclasses.dataclass
class AudioSplitTask:
    """Split long audio rows into fixed windows, one output row per window
    (reference: tasks audiosplit)."""

    audio_column_name: str = "audio"
    window_secs: float = 30.0
    min_window_secs: float = 1.0

    def map_split(self, dataset, num_proc: int = 1):
        def split(batch):
            import numpy as np

            out = {k: [] for k in batch}
            for i in range(len(batch[self.audio_column_name])):
                entry = batch[self.audio_column_name][i]
                audio = np.asarray(entry["array"], dtype=np.float32)
                sr = entry.get("sampling_rate", 16000)
                window = int(self.window_secs * sr)
                for start in range(0, len(audio), window):
                    chunk = audio[start : start + window]
                    if len(chunk) < self.min_window_secs * sr:
                        continue
                    for key in batch:
                        if key == self.audio_column_name:
                            out[key].append(
                                {"array": chunk, "sampling_rate": sr}
                            )
                        else:
                            out[key].append(batch[key][i])
            return out

        return dataset.map(split, batched=True)


@dataclasses.dataclass
class VoiceDsGenTask:
    """Generate question/answer pairs grounded in a transcript column via an
    LLM (reference: tasks voice_ds_gen — manufactures voice-QA training sets
    whose questions are later TTS-synthesised)."""

    transcript_column: str = "text"
    question_column: str = "question"
    answer_column: str = "answer"
    model: str = "gpt-4o-mini"
    max_tokens: int = 256
    client: Any = None
    cache_dir: str = ".cache/ds_tool/chat"
    template: str = (
        "Passage:\n{{ transcript }}\n\n"
        "Write one question a listener could ask about this passage, then "
        "answer it. Respond in the form:\nQ: <question>\nA: <answer>"
    )

    def map_split(self, dataset, num_proc: int = 1):
        import re

        import jinja2

        tmpl = jinja2.Template(self.template)
        chat = CachingChatWrapper(self.client, self.cache_dir)

        def generate(row):
            prompt = tmpl.render(transcript=row[self.transcript_column])
            text = chat.chat_completion(
                model=self.model,
                messages=[{"role": "user", "content": prompt}],
                max_tokens=self.max_tokens,
                temperature=0.0,
            )
            m = re.search(r"Q:\s*(.+?)\s*A:\s*(.+)", text, re.DOTALL)
            row[self.question_column] = m.group(1).strip() if m else ""
            row[self.answer_column] = m.group(2).strip() if m else text.strip()
            return row

        return dataset.map(generate)


TASKS = {
    "textgen": TextGenerationTask,
    "tts": TtsTask,
    "augment": AugmentTask,
    "dedup": DedupTask,
    "asr": AsrTask,
    "audiosplit": AudioSplitTask,
    "voice_ds_gen": VoiceDsGenTask,
}


# --------------------------------------------------------------------------
# Chunked processing
# --------------------------------------------------------------------------


@dataclasses.dataclass
class DatasetChunkProcessor:
    """Process a dataset split in chunks with recursive subdivision on
    failure and an on-disk record of completed chunks
    (reference: ds_tool.py:137-211)."""

    task: Any
    output_dir: str
    chunk_size: int = 1000
    min_chunk_size: int = 10
    num_proc: int = 1

    def __post_init__(self):
        self._done = DiskCache(os.path.join(self.output_dir, ".chunks_done"))

    def process_split(self, dataset, split_name: str = "train") -> List[str]:
        """Returns the list of saved chunk directories."""
        n = len(dataset)
        saved: List[str] = []
        for start in range(0, n, self.chunk_size):
            end = min(start + self.chunk_size, n)
            saved.extend(self._process_range(dataset, split_name, start, end))
        return saved

    def _process_range(self, dataset, split_name, start, end) -> List[str]:
        tag = {"split": split_name, "start": start, "end": end}
        out_path = os.path.join(
            self.output_dir, f"{split_name}-{start:08d}-{end:08d}"
        )
        if os.path.exists(out_path):
            return [out_path]
        chunk = dataset.select(range(start, end))
        try:
            processed = self.task.map_split(chunk, self.num_proc)
            processed.save_to_disk(out_path)
            return [out_path]
        except Exception as e:  # noqa: BLE001
            size = end - start
            if size <= self.min_chunk_size:
                logger.error("chunk %s failed permanently: %s", tag, e)
                return []
            logger.warning("chunk %s failed (%s); subdividing", tag, e)
            mid = start + size // 2
            return self._process_range(
                dataset, split_name, start, mid
            ) + self._process_range(dataset, split_name, mid, end)


def main():
    import datasets as hf_datasets

    parser = argparse.ArgumentParser()
    parser.add_argument("task", choices=sorted(TASKS))
    parser.add_argument("--dataset", required=True)
    parser.add_argument("--subset", default=None)
    parser.add_argument("--split", default="train")
    parser.add_argument("--output_dir", required=True)
    parser.add_argument("--chunk_size", type=int, default=1000)
    parser.add_argument("--task_args", default="{}")
    args = parser.parse_args()

    import yaml

    logging.basicConfig(level=logging.INFO)
    task_kwargs = yaml.safe_load(args.task_args) or {}
    task_cls = TASKS[args.task]
    if args.task == "textgen" and "client" not in task_kwargs:
        import openai

        task_kwargs["client"] = openai.OpenAI()
    task = task_cls(**task_kwargs)

    ds = hf_datasets.load_dataset(args.dataset, args.subset, split=args.split)
    proc = DatasetChunkProcessor(
        task=task, output_dir=args.output_dir, chunk_size=args.chunk_size
    )
    saved = proc.process_split(ds, args.split)
    print(f"saved {len(saved)} chunks to {args.output_dir}")


if __name__ == "__main__":
    main()
