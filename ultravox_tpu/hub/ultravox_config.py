"""Standalone HF config for published Ultravox-TPU checkpoints.

Shipped into each published repo (see ultravox_tpu/hub/__init__.py) so
``AutoConfig.from_pretrained(repo, trust_remote_code=True)`` works with only
``transformers`` installed. Mirrors the config.json schema written by
ultravox_tpu/tools/publish.py::config_to_hf_dict, which is itself
compatible with the reference's published-repo schema
(reference: ultravox/model/ultravox_config.py — re-derived, not copied).
"""

from typing import Any, Dict, Optional

import transformers


class UltravoxConfig(transformers.PretrainedConfig):
    model_type = "ultravox"

    def __init__(
        self,
        audio_config: Optional[Dict[str, Any]] = None,
        text_config: Optional[Dict[str, Any]] = None,
        audio_model_id: Optional[str] = None,
        text_model_id: Optional[str] = None,
        ignore_index: int = -100,
        audio_token_index: int = 32000,
        hidden_size: int = 4096,
        stack_factor: int = 8,
        norm_init: float = 0.4,
        projector_act: str = "swiglu",
        projector_ln_mid: bool = False,
        audio_latency_block_size: Optional[int] = None,
        llm_only_training: bool = False,
        **kwargs,
    ):
        self.audio_model_id = audio_model_id
        self.text_model_id = text_model_id
        self.ignore_index = ignore_index
        self.audio_token_index = audio_token_index
        self.hidden_size = hidden_size
        self.stack_factor = stack_factor
        self.norm_init = norm_init
        self.projector_act = projector_act
        self.projector_ln_mid = projector_ln_mid
        self.audio_latency_block_size = audio_latency_block_size
        self.llm_only_training = llm_only_training

        if isinstance(audio_config, transformers.PretrainedConfig):
            self.audio_config = audio_config
        else:
            audio_config = dict(audio_config or {"model_type": "whisper"})
            self.audio_config = transformers.CONFIG_MAPPING[
                audio_config.get("model_type", "whisper")
            ](**{k: v for k, v in audio_config.items() if k != "model_type"})
        if isinstance(text_config, transformers.PretrainedConfig):
            self.text_config = text_config
        else:
            text_config = dict(text_config or {"model_type": "llama"})
            self.text_config = transformers.CONFIG_MAPPING[
                text_config.get("model_type", "llama")
            ](**{k: v for k, v in text_config.items() if k != "model_type"})

        # generation-side conveniences some loaders expect
        self.vocab_size = self.text_config.vocab_size
        self.initializer_range = getattr(
            self.text_config, "initializer_range", 0.02
        )
        super().__init__(**kwargs)

    def to_diff_dict(self) -> Dict[str, Any]:
        # keep the nested configs fully serialized (PretrainedConfig's diff
        # logic would drop defaulted nested keys the loader needs)
        data = self.to_dict()
        return data
