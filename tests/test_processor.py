"""Processor + collator unit tests, mirroring the reference's
ultravox_processing_test.py coverage: text-only, single/multiple audios,
chunked long audio, placeholder-count errors, collation."""

import numpy as np
import pytest

from tests.helpers import make_tiny_tokenizer
from ultravox_tpu.models.processor import DataCollatorWithAudio, UltravoxProcessor


@pytest.fixture(scope="module")
def processor():
    return UltravoxProcessor(make_tiny_tokenizer())


def test_text_only(processor):
    out = processor(text="hello world")
    ref = processor.tokenizer("hello world", add_special_tokens=False)["input_ids"]
    assert out["input_ids"].tolist() == [ref]
    assert out["attention_mask"].shape == out["input_ids"].shape
    assert "audio_values" not in out


def test_single_audio_token_layout(processor):
    # 0.5 s -> 50 mel frames -> ceil(50/16) = 4 audio tokens
    audio = np.zeros(8000, dtype=np.float32)
    out = processor(text="transcribe <|audio|> please", audio=audio)
    assert out["audio_values"].shape[0] == 1
    assert out["audio_lens"].tolist() == [50]
    assert out["audio_token_len"].tolist() == [4]

    eos_id = processor.audio_replacement_token_id
    prefix = processor.tokenizer("transcribe ", add_special_tokens=False)["input_ids"]
    suffix = processor.tokenizer(" please", add_special_tokens=False)["input_ids"]
    ids = out["input_ids"][0].tolist()
    assert ids == prefix + [eos_id] * 4 + suffix
    assert out["audio_token_start_idx"].tolist() == [len(prefix)]


def test_audio_shorter_than_two_hops_is_padded(processor):
    out = processor(text="<|audio|>", audio=np.zeros(100, dtype=np.float32))
    assert out["audio_lens"].tolist() == [2]
    assert out["audio_token_len"].tolist() == [1]


def test_multiple_audios(processor):
    a1 = np.zeros(16000, dtype=np.float32)  # 100 frames -> 7 tokens
    a2 = np.zeros(4000, dtype=np.float32)  # 25 frames -> 2 tokens
    out = processor(text="a <|audio|> b <|audio|> c", audios=[a1, a2])
    assert out["audio_values"].shape[0] == 2
    assert out["audio_token_len"].tolist() == [7, 2]
    # both audios are padded to the longest (100 frames)
    assert out["audio_values"].shape[-1] == 100
    assert out["audio_lens"].tolist() == [100, 25]
    eos_id = processor.audio_replacement_token_id
    ids = out["input_ids"][0].tolist()
    s0, s1 = out["audio_token_start_idx"].tolist()
    assert ids[s0 : s0 + 7] == [eos_id] * 7
    assert ids[s1 : s1 + 2] == [eos_id] * 2


def test_long_audio_is_chunked(processor):
    """60 s -> 6000 frames -> two 3000-frame chunks sharing one placeholder
    (reference: ultravox_processing_test.py long-audio expectations)."""
    audio = np.random.default_rng(0).standard_normal(16000 * 60).astype(np.float32)
    out = processor(text="x <|audio|> y", audio=audio)
    assert out["audio_values"].shape == (2, 80, 3000)
    assert out["audio_lens"].tolist() == [3000, 3000]
    assert out["audio_token_len"].tolist() == [188, 188]
    assert out["audio_num_chunks"].tolist() == [2]
    s0, s1 = out["audio_token_start_idx"].tolist()
    # the continuation chunk's tokens directly follow the first chunk's
    assert s1 == s0 + 188
    eos_id = processor.audio_replacement_token_id
    ids = out["input_ids"][0].tolist()
    assert ids[s0 : s1 + 188] == [eos_id] * 376


def test_placeholder_count_errors(processor):
    audio = np.zeros(8000, dtype=np.float32)
    # Reference semantics (ultravox_processing.py:340-360): any
    # placeholder/clip count mismatch raises — missing and extra
    # placeholders both trip the final count check ("0 ... but 1" /
    # "2 ... but 1"); "too few" fires when the audio count exceeds the
    # available text parts mid-loop.
    with pytest.raises(ValueError, match="0 audio placeholder"):
        processor(text="no placeholder here", audio=audio)
    with pytest.raises(ValueError, match="2 audio placeholder"):
        processor(text="<|audio|> and <|audio|>", audio=audio)
    with pytest.raises(ValueError, match="too few"):
        processor(text="x <|audio|> y", audios=[audio, audio, audio])


def test_collator_flattens_chunks(processor):
    a1 = np.zeros(16000, dtype=np.float32)
    a2 = np.zeros(16000 * 40, dtype=np.float32)  # chunks into 2
    f1 = processor(text="one <|audio|> x", audio=a1)
    f2 = processor(text="two <|audio|> y", audio=a2)
    f3 = processor(text="text only")
    coll = DataCollatorWithAudio(pad_token_id=processor.tokenizer.pad_token_id)
    batch = coll([f1, f2, f3])

    assert batch["audio_values"].shape[0] == 3  # 1 + 2 chunks
    assert batch["audio_chunk_batch_idx"].tolist() == [0, 1, 1]
    assert batch["input_ids"].shape[0] == 3
    assert batch["input_ids"].shape[1] % coll.pad_multiple == 0
    assert batch["attention_mask"][0].sum() == f1["input_ids"].shape[-1]
    # mel padded to a bucket boundary
    assert batch["audio_values"].shape[-1] % coll.mel_pad_multiple == 0 or (
        batch["audio_values"].shape[-1] == 3000
    )


def test_collator_alt_fields(processor):
    f = processor(text="hello <|audio|> world", audio=np.zeros(8000, np.float32))
    f["labels"] = np.full_like(f["input_ids"][0], -100)
    f["alt_input_ids"] = np.asarray([1, 2, 3], np.int32)
    f["alt_labels"] = np.asarray([-100, 2, 3], np.int32)
    coll = DataCollatorWithAudio(
        pad_token_id=processor.tokenizer.pad_token_id, include_alt_fields=True
    )
    batch = coll([f])
    assert batch["alt_input_ids"].shape == batch["alt_labels"].shape
    assert (batch["alt_labels"][0][3:] == -100).all()
