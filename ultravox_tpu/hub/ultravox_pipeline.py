"""Standalone ``transformers.Pipeline`` for published Ultravox-TPU repos.

Shipped into each published checkpoint so reference-ecosystem users keep
the one-call entry point::

    pipe = transformers.pipeline(
        model="<published repo>", trust_remote_code=True)
    pipe({"audio": wav, "sampling_rate": 16000,
          "turns": [...], "prompt": "<|audio|>"})

(reference role: model/ultravox_pipeline.py:15-133, registered as
``ultravox-pipeline`` at :128-133 and synced into repos by
tools/update_hf_models.py:21-27).

The pipeline glues the repo's own standalone pieces together: the
tokenizer bootstrap (``ultravox_tokenizer``), the processor
(``ultravox_processing``), and the model (``ultravox_model``).
"""

import logging
from typing import Any, Dict, Optional

import numpy as np
import transformers

try:  # transformers' dynamic loader imports this file inside a package
    from .ultravox_model import UltravoxModel
    from .ultravox_processing import AUDIO_PLACEHOLDER, UltravoxProcessor
    from .ultravox_tokenizer import from_pretrained_text_tokenizer
    from .ultravox_tokenizer import get_audio_token_id
except ImportError:  # direct top-level import from a checkout/checkpoint dir
    from ultravox_model import UltravoxModel
    from ultravox_processing import AUDIO_PLACEHOLDER, UltravoxProcessor
    from ultravox_tokenizer import from_pretrained_text_tokenizer
    from ultravox_tokenizer import get_audio_token_id

logger = logging.getLogger(__name__)


class UltravoxPipeline(transformers.Pipeline):
    """Audio(+chat-history) -> text. Input is a dict with optional keys
    ``audio`` (1-D waveform), ``sampling_rate``, ``turns`` (chat messages),
    and ``prompt`` (user text containing ``<|audio|>``)."""

    def __init__(
        self,
        model: UltravoxModel,
        tokenizer=None,
        audio_processor=None,
        chat_template: Optional[str] = None,
        **kwargs,
    ):
        if tokenizer is None:
            # Checkpoint dirs published by tools/publish.py carry the
            # tokenizer next to the weights; fall back to the text model id.
            try:
                tokenizer = from_pretrained_text_tokenizer(
                    model.config._name_or_path
                )
            except Exception:
                tokenizer = from_pretrained_text_tokenizer(
                    model.config.text_model_id
                    or model.config.text_config._name_or_path
                )
        if chat_template:
            tokenizer.chat_template = chat_template
        model.config.audio_token_index = get_audio_token_id(tokenizer)

        if audio_processor is None:
            audio_src = (
                model.config.audio_model_id
                or getattr(model.config.audio_config, "_name_or_path", "")
            )
            if audio_src:
                try:
                    audio_processor = (
                        transformers.AutoProcessor.from_pretrained(audio_src)
                    )
                except Exception:
                    # offline / id not resolvable: whisper mel parameters
                    # are architecture-standard, so a default extractor
                    # (sized to the config's mel bins) is exact
                    audio_processor = transformers.WhisperFeatureExtractor(
                        feature_size=getattr(
                            model.config.audio_config, "num_mel_bins", 80
                        )
                    )

        super().__init__(model=model, tokenizer=tokenizer, **kwargs)

        self.processor = UltravoxProcessor(
            audio_processor=getattr(
                audio_processor, "feature_extractor", audio_processor
            ),
            tokenizer=tokenizer,
            stack_factor=model.config.stack_factor,
        )

    def _sanitize_parameters(self, **kwargs):
        gen_keys = ("temperature", "max_new_tokens", "repetition_penalty")
        forward_kwargs = {k: kwargs[k] for k in gen_keys if k in kwargs}
        return {}, forward_kwargs, {}

    def preprocess(self, inputs: Dict[str, Any]):
        turns = list(inputs.get("turns", []))
        audio = inputs.get("audio")

        if isinstance(audio, np.ndarray):
            # Match VoiceSample dtype normalisation (reference
            # data_sample.py:88-100): ints are PCM full-scale.
            if audio.dtype == np.float64:
                audio = audio.astype(np.float32)
            elif audio.dtype == np.int16:
                audio = audio.astype(np.float32) / np.float32(32768.0)
            elif audio.dtype == np.int32:
                audio = audio.astype(np.float32) / np.float32(2**31)

        if audio is not None and (not turns or turns[-1]["role"] != "user"):
            prompt = inputs.get("prompt", AUDIO_PLACEHOLDER)
            if AUDIO_PLACEHOLDER not in prompt:
                logger.warning(
                    "prompt has no %s placeholder; appending one",
                    AUDIO_PLACEHOLDER,
                )
                prompt += " " + AUDIO_PLACEHOLDER
            turns.append({"role": "user", "content": prompt})

        text = self.processor.tokenizer.apply_chat_template(
            turns, add_generation_prompt=True, tokenize=False
        )

        if audio is not None and "sampling_rate" not in inputs:
            logger.warning(
                "no sampling_rate given; assuming 16 kHz"
            )

        batch = self.processor(
            text=text,
            audio=audio,
            sampling_rate=inputs.get("sampling_rate", 16000),
            return_tensors="pt",
        )
        if "audio_values" in batch:
            batch["audio_values"] = batch["audio_values"].to(self.model.dtype)
        return batch

    def _forward(
        self,
        model_inputs: Dict[str, Any],
        temperature: Optional[float] = None,
        max_new_tokens: Optional[int] = None,
        repetition_penalty: float = 1.1,
    ):
        temperature = temperature or None

        terminators = [self.tokenizer.eos_token_id]
        if "<|eot_id|>" in getattr(self.tokenizer, "added_tokens_encoder", {}):
            terminators.append(
                self.tokenizer.convert_tokens_to_ids("<|eot_id|>")
            )

        # UltravoxModel.generate feeds inputs_embeds (spliced), so the
        # returned sequence contains ONLY new tokens — no prompt to strip.
        out = self.model.generate(
            **model_inputs,
            do_sample=temperature is not None,
            temperature=temperature,
            max_new_tokens=max_new_tokens,
            repetition_penalty=repetition_penalty,
            eos_token_id=terminators,
        )
        return out[0]

    def postprocess(self, model_outputs) -> str:
        return self.tokenizer.decode(model_outputs, skip_special_tokens=True)


transformers.pipelines.PIPELINE_REGISTRY.register_pipeline(
    "ultravox-pipeline",
    pipeline_class=UltravoxPipeline,
    pt_model=transformers.AutoModel,
    type="multimodal",
)
