"""Standalone processor for published Ultravox-TPU checkpoints.

Shipped into each published repo (auto_map -> AutoProcessor). Same
text/audio contract as this framework's UltravoxProcessor
(models/processor.py): ``<|audio|>`` placeholders expand to
``ceil(mel_frames / (encoder_ds * stack_factor))`` EOS-token repeats, long
audio chunks into 30 s encoder windows that share one placeholder, and the
batch carries explicit per-chunk (start, len, batch_idx) splice
coordinates. Mel extraction uses transformers' WhisperFeatureExtractor —
the frontend published repos conventionally pair with these checkpoints.
"""

import math
from typing import Any, Dict, List, Optional, Sequence

import numpy as np

import transformers

AUDIO_PLACEHOLDER = "<|audio|>"


class UltravoxProcessor(transformers.ProcessorMixin):
    attributes = ["audio_processor", "tokenizer"]
    audio_processor_class = "WhisperFeatureExtractor"
    tokenizer_class = "AutoTokenizer"

    def __init__(
        self,
        audio_processor=None,
        tokenizer=None,
        stack_factor: int = 8,
        encoder_ds_factor: int = 2,
        audio_context_size: int = 3000,
        **kwargs,
    ):
        if audio_processor is None:
            audio_processor = transformers.WhisperFeatureExtractor()
        self.stack_factor = int(stack_factor)
        self.encoder_ds_factor = int(encoder_ds_factor)
        self.audio_context_size = int(audio_context_size)
        super().__init__(audio_processor=audio_processor, tokenizer=tokenizer)
        if self.tokenizer.pad_token_id is None:
            self.tokenizer.pad_token_id = self.tokenizer.eos_token_id
        self.audio_replacement_token_id = self.tokenizer.eos_token_id

    @property
    def token_compression(self) -> int:
        return self.encoder_ds_factor * self.stack_factor

    def _extract(self, audios: Sequence[np.ndarray], sampling_rate: int):
        """(N_chunks, n_mels, T), per-chunk valid frames, per-chunk
        continuation flags."""
        hop = self.audio_processor.hop_length
        chunks: List[np.ndarray] = []
        lens: List[int] = []
        cont: List[bool] = []
        src: List[int] = []
        ctx = self.audio_context_size
        for i, a in enumerate(audios):
            a = np.asarray(a, dtype=np.float32)
            frames = max(-(-len(a) // hop), 2)
            for off_frames in range(0, frames, ctx):
                n = min(frames - off_frames, ctx)
                piece = a[off_frames * hop : (off_frames + n) * hop]
                feat = self.audio_processor(
                    piece,
                    sampling_rate=sampling_rate,
                    padding="longest",
                    pad_to_multiple_of=hop,
                    return_attention_mask=False,
                )["input_features"][0]
                chunks.append(np.asarray(feat))
                lens.append(n)
                cont.append(off_frames > 0)
                src.append(i)
        T = max(c.shape[-1] for c in chunks)
        chunks = [
            np.pad(c, ((0, 0), (0, T - c.shape[-1]))) for c in chunks
        ]
        return np.stack(chunks), np.asarray(lens, np.int64), cont, src

    def __call__(
        self,
        text: Optional[str] = None,
        audio: Optional[np.ndarray] = None,
        audios: Optional[Sequence[np.ndarray]] = None,
        sampling_rate: int = 16000,
        return_tensors: str = "np",
        **kwargs,
    ) -> Dict[str, Any]:
        if audio is not None and audios is not None:
            raise ValueError("pass only one of `audio` / `audios`")
        if audio is not None:
            audios = [audio]
        elif audios is None:
            audios = []

        data: Dict[str, Any] = {}
        cont: List[bool] = []
        token_lens: List[int] = []
        if audios:
            values, lens, cont, src = self._extract(audios, sampling_rate)
            token_lens = [
                int(math.ceil(n / self.token_compression)) for n in lens
            ]
            data.update(
                audio_values=values.astype(np.float32),
                audio_lens=np.asarray(lens, np.int64),
                audio_token_len=np.asarray(token_lens, np.int32),
            )

        if text is not None:
            parts = self.tokenizer(
                text.split(AUDIO_PLACEHOLDER), add_special_tokens=False
            )["input_ids"]
            input_ids: List[int] = []
            starts: List[int] = []
            ph = -1
            for i, tl in enumerate(token_lens):
                if not cont[i]:
                    ph += 1
                    if ph >= len(parts):
                        raise ValueError(
                            f"too few {AUDIO_PLACEHOLDER} placeholders for "
                            f"{len(audios)} audios"
                        )
                    input_ids.extend(parts[ph])
                starts.append(len(input_ids))
                input_ids.extend([self.audio_replacement_token_id] * tl)
            ph += 1
            if ph != len(parts) - 1:
                raise ValueError(
                    f"too many {AUDIO_PLACEHOLDER} placeholders for "
                    f"{len(audios)} audios"
                )
            input_ids.extend(parts[ph])
            if audios:
                data["audio_token_start_idx"] = np.asarray(starts, np.int32)
                data["audio_chunk_batch_idx"] = np.zeros(
                    len(starts), np.int32
                )
            data["input_ids"] = np.asarray([input_ids], np.int64)
            data["attention_mask"] = np.ones_like(data["input_ids"])

        if return_tensors == "pt":
            import torch

            data = {k: torch.from_numpy(np.asarray(v)) for k, v in data.items()}
        return transformers.BatchFeature(data=data)

    def batch_decode(self, *args, **kwargs):
        return self.tokenizer.batch_decode(*args, **kwargs)

    def decode(self, *args, **kwargs):
        return self.tokenizer.decode(*args, **kwargs)


UltravoxProcessor.register_for_auto_class()
transformers.AutoProcessor.register("UltravoxProcessor", UltravoxProcessor)
