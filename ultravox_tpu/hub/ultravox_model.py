"""Standalone torch Ultravox model for published checkpoints.

Loaded via ``trust_remote_code`` with only ``transformers`` installed
(auto_map in config.json points here). A torch transcription of this
framework's JAX modules — models/projector.py (projector + frame stacking),
models/whisper_encoder.py (length + block-causal latency masks), and
models/ultravox.py (audio splice) — against the checkpoint key layout that
tools/publish.py emits (multi_modal_projector.*, audio_tower.*,
language_model.*). Fills the role of the reference's synced
ultravox_model.py (reference: tools/update_hf_models.py:21-27).
"""

from typing import Optional

import torch
import torch.nn as nn
import torch.nn.functional as F

import transformers
from transformers.models.whisper import modeling_whisper as whisper

try:  # transformers' dynamic loader imports this file inside a package
    from .ultravox_config import UltravoxConfig
except ImportError:  # direct top-level import from a checkout/checkpoint dir
    from ultravox_config import UltravoxConfig


class UltravoxRMSNorm(nn.Module):
    """RMSNorm, fp32 internals (LlamaRMSNorm semantics)."""

    def __init__(self, dim: int, init: float = 0.4, eps: float = 1e-6):
        super().__init__()
        self.weight = nn.Parameter(torch.full((dim,), float(init)))
        self.eps = eps

    def forward(self, x):
        dtype = x.dtype
        xf = x.to(torch.float32)
        var = xf.pow(2).mean(-1, keepdim=True)
        xf = xf * torch.rsqrt(var + self.eps)
        return (xf * self.weight.to(torch.float32)).to(dtype)


def stack_audio_frames(x: torch.Tensor, stack_factor: int) -> torch.Tensor:
    """(B, T, C) -> (B, ceil(T/S), C*S), zero-padding T to a multiple of S."""
    B, T, C = x.shape
    T_pad = -(-T // stack_factor) * stack_factor
    x = F.pad(x, (0, 0, 0, T_pad - T))
    return x.reshape(B, T_pad // stack_factor, C * stack_factor)


class UltravoxProjector(nn.Module):
    """stack -> RMSNorm(ln_pre) -> Linear -> act [-> ln_mid] -> Linear
    [-> ln_post]; SwiGLU gates with the SECOND half: silu(gate) * value."""

    def __init__(self, config: UltravoxConfig):
        super().__init__()
        self.stack_factor = config.stack_factor
        self.act = config.projector_act
        dim_in = config.audio_config.d_model * config.stack_factor
        hidden = config.hidden_size
        dim_mid = hidden // 2 if config.projector_act == "swiglu" else hidden
        dim_out = config.text_config.hidden_size
        self.ln_pre = UltravoxRMSNorm(dim_in, config.norm_init)
        self.linear_1 = nn.Linear(dim_in, hidden, bias=False)
        self.linear_2 = nn.Linear(dim_mid, dim_out, bias=False)
        if config.projector_ln_mid:
            self.ln_mid = UltravoxRMSNorm(dim_mid, config.norm_init)
            self.ln_post = None
        else:
            self.ln_mid = None
            self.ln_post = UltravoxRMSNorm(dim_out, config.norm_init)

    def forward(self, audio_features: torch.Tensor) -> torch.Tensor:
        x = stack_audio_frames(audio_features, self.stack_factor)
        x = self.ln_pre(x)
        x = self.linear_1(x)
        if self.act == "swiglu":
            val, gate = x.chunk(2, dim=-1)
            x = F.silu(gate) * val
        elif self.act == "silu":
            x = F.silu(x)
        elif self.act == "gelu":
            x = F.gelu(x)
        else:
            raise ValueError(f"unsupported projector_act {self.act!r}")
        if self.ln_mid is not None:
            x = self.ln_mid(x)
        x = self.linear_2(x)
        if self.ln_post is not None:
            x = self.ln_post(x)
        return x


class ModifiedWhisperEncoder(whisper.WhisperEncoder):
    """Whisper encoder accepting <30 s mels (position embeddings sliced to
    the actual length), per-chunk valid-length masking, and the optional
    block-causal streaming latency mask."""

    audio_latency_block_size: Optional[int] = None

    def forward(  # noqa: D102 — see class docstring
        self,
        input_features: torch.Tensor,  # (N, n_mels, T_mel)
        audio_lens: Optional[torch.Tensor] = None,  # (N,) valid mel frames
        **kwargs,
    ):
        x = F.gelu(self.conv1(input_features))
        x = F.gelu(self.conv2(x))
        x = x.permute(0, 2, 1)  # (N, T, D)
        T = x.shape[1]
        x = x + self.embed_positions.weight[:T]

        mask = None
        neg_inf = torch.finfo(x.dtype).min
        if audio_lens is not None:
            # mel frames -> encoder positions (conv2 stride 2)
            feat_lens = (audio_lens - 1) // 2 + 1
            pos = torch.arange(T, device=x.device)
            key_ok = pos[None, :] < feat_lens[:, None]  # (N, T)
            mask = torch.where(key_ok, 0.0, neg_inf)[:, None, None, :].to(
                x.dtype
            )
        if self.audio_latency_block_size:
            blk = torch.arange(T, device=x.device) // int(
                self.audio_latency_block_size
            )
            allowed = blk[None, :] <= blk[:, None]  # (T, T)
            lat = torch.where(allowed, 0.0, neg_inf)[None, None].to(x.dtype)
            mask = lat if mask is None else torch.minimum(mask, lat)
        if mask is not None:
            mask = mask.expand(x.shape[0], 1, T, T)

        for layer in self.layers:
            out = layer(x, mask, None)
            x = out[0] if isinstance(out, tuple) else out
        return self.layer_norm(x)


class UltravoxModel(transformers.PreTrainedModel, transformers.GenerationMixin):
    config_class = UltravoxConfig
    base_model_prefix = "ultravox"
    _supports_flash_attn_2 = False
    _no_split_modules = ["WhisperEncoderLayer"]

    def __init__(self, config: UltravoxConfig):
        super().__init__(config)
        self.audio_tower = ModifiedWhisperEncoder(config.audio_config)
        self.audio_tower.audio_latency_block_size = (
            config.audio_latency_block_size
        )
        self.multi_modal_projector = UltravoxProjector(config)
        self.language_model = transformers.AutoModelForCausalLM.from_config(
            config.text_config
        )
        self.post_init()

    def get_input_embeddings(self):
        return self.language_model.get_input_embeddings()

    def set_input_embeddings(self, value):
        self.language_model.set_input_embeddings(value)

    def get_output_embeddings(self):
        return self.language_model.get_output_embeddings()

    def _audio_embeds(self, audio_values, audio_lens, dtype):
        enc = self.audio_tower(
            audio_values.to(dtype), audio_lens=audio_lens
        )
        return self.multi_modal_projector(enc)

    def _spliced_embeds(
        self,
        input_ids,
        audio_values=None,
        audio_lens=None,
        audio_token_start_idx=None,
        audio_token_len=None,
        audio_chunk_batch_idx=None,
    ):
        inputs_embeds = self.get_input_embeddings()(input_ids)
        if audio_values is None:
            return inputs_embeds
        if audio_chunk_batch_idx is None:
            # one chunk per batch row (the common single-audio case)
            audio_chunk_batch_idx = torch.arange(
                audio_values.shape[0], device=input_ids.device
            )
        audio_embeds = self._audio_embeds(
            audio_values, audio_lens, inputs_embeds.dtype
        )
        inputs_embeds = inputs_embeds.clone()
        for n in range(audio_embeds.shape[0]):
            b = int(audio_chunk_batch_idx[n])
            s = int(audio_token_start_idx[n])
            ln = int(audio_token_len[n])
            inputs_embeds[b, s : s + ln] = audio_embeds[n, :ln]
        return inputs_embeds

    def forward(
        self,
        input_ids: Optional[torch.Tensor] = None,
        attention_mask: Optional[torch.Tensor] = None,
        audio_values: Optional[torch.Tensor] = None,
        audio_lens: Optional[torch.Tensor] = None,
        audio_token_start_idx: Optional[torch.Tensor] = None,
        audio_token_len: Optional[torch.Tensor] = None,
        audio_chunk_batch_idx: Optional[torch.Tensor] = None,
        inputs_embeds: Optional[torch.Tensor] = None,
        labels: Optional[torch.Tensor] = None,
        **kwargs,
    ):
        if inputs_embeds is None:
            inputs_embeds = self._spliced_embeds(
                input_ids,
                audio_values,
                audio_lens,
                audio_token_start_idx,
                audio_token_len,
                audio_chunk_batch_idx,
            )
        return self.language_model(
            inputs_embeds=inputs_embeds,
            attention_mask=attention_mask,
            labels=labels,
            **kwargs,
        )

    @torch.no_grad()
    def generate(
        self,
        input_ids: Optional[torch.Tensor] = None,
        attention_mask: Optional[torch.Tensor] = None,
        audio_values: Optional[torch.Tensor] = None,
        audio_lens: Optional[torch.Tensor] = None,
        audio_token_start_idx: Optional[torch.Tensor] = None,
        audio_token_len: Optional[torch.Tensor] = None,
        audio_chunk_batch_idx: Optional[torch.Tensor] = None,
        **kwargs,
    ):
        inputs_embeds = self._spliced_embeds(
            input_ids,
            audio_values,
            audio_lens,
            audio_token_start_idx,
            audio_token_len,
            audio_chunk_batch_idx,
        )
        return self.language_model.generate(
            inputs_embeds=inputs_embeds,
            attention_mask=attention_mask,
            **kwargs,
        )


UltravoxConfig.register_for_auto_class()
UltravoxModel.register_for_auto_class()
transformers.AutoConfig.register("ultravox", UltravoxConfig, exist_ok=True)
transformers.AutoModel.register(UltravoxConfig, UltravoxModel, exist_ok=True)
