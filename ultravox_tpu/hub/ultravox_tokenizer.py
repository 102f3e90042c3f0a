"""Standalone tokenizer bootstrap for published Ultravox-TPU checkpoints.

Shipped into each published repo so downstream stacks (vLLM-style servers,
the pipeline below) can materialise a text tokenizer that carries the
``<|audio|>`` special token without this framework installed
(reference role: model/ultravox_tokenizer.py:8-25, synced into published
repos by tools/update_hf_models.py:21-27).
"""

import logging

import transformers

AUDIO_TOKEN = "<|audio|>"

logger = logging.getLogger(__name__)


def from_pretrained_text_tokenizer(*args, **kwargs):
    """AutoTokenizer.from_pretrained + the ``<|audio|>`` special token.

    Serving stacks that tokenize prompts themselves need the placeholder
    registered as ONE special token (a plain-text ``<|audio|>`` would
    otherwise split into several pieces and the processor's splice
    coordinates would be wrong).
    """
    tokenizer = transformers.AutoTokenizer.from_pretrained(*args, **kwargs)
    tokenizer.add_special_tokens({"additional_special_tokens": [AUDIO_TOKEN]})
    logger.info("audio token id: %d", get_audio_token_id(tokenizer))
    return tokenizer


def get_audio_token_id(tokenizer) -> int:
    """Id of the ``<|audio|>`` placeholder (must encode to one token)."""
    ids = tokenizer.encode(AUDIO_TOKEN, add_special_tokens=False)
    if len(ids) != 1:
        raise ValueError(
            f"{AUDIO_TOKEN!r} must encode to exactly one token, got {ids}"
        )
    return ids[0]
