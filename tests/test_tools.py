"""Tools tests: model soup, projector up-projection math, ds_tool chunked
processing with caching, OpenAI client payloads."""

import json
import os
from unittest import mock

import numpy as np
import pytest


def test_average_state_dicts():
    from ultravox_tpu.tools.model_averaging import average_state_dicts

    a = {"w": np.asarray([1.0, 2.0], np.float32)}
    b = {"w": np.asarray([3.0, 4.0], np.float32)}
    out = average_state_dicts([a, b])
    np.testing.assert_allclose(out["w"], [2.0, 3.0])
    with pytest.raises(ValueError, match="disagree"):
        average_state_dicts([a, {"v": a["w"]}])


def test_average_checkpoints_roundtrip(tmp_path):
    import safetensors.numpy

    from ultravox_tpu.tools.model_averaging import average_checkpoints

    for i, val in enumerate([0.0, 2.0]):
        d = tmp_path / f"in{i}"
        d.mkdir()
        safetensors.numpy.save_file(
            {"multi_modal_projector.ln_pre.weight": np.full(4, val, np.float32)},
            str(d / "model.safetensors"),
        )
    out = average_checkpoints(
        [str(tmp_path / "in0"), str(tmp_path / "in1")], str(tmp_path / "avg")
    )
    sd = safetensors.numpy.load_file(os.path.join(out, "model.safetensors"))
    np.testing.assert_allclose(
        sd["multi_modal_projector.ln_pre.weight"], np.full(4, 1.0)
    )


def test_projector_regression_and_combine():
    """Mirrors the reference's projector_combine_tool_test: with an exactly
    linear relationship between embedding spaces, the combined projector must
    reproduce small-projector-then-map outputs."""
    import jax
    import jax.numpy as jnp

    from ultravox_tpu.models import UltravoxConfig, WhisperEncoderConfig, DecoderConfig
    from ultravox_tpu.models import projector as projector_lib
    from ultravox_tpu.tools.projector_tools import fit_embedding_map, combine_projector

    rng = np.random.default_rng(0)
    d_small, d_big, V = 16, 24, 200
    M_true = rng.standard_normal((d_small, d_big)).astype(np.float32) * 0.3
    emb_small = rng.standard_normal((V, d_small)).astype(np.float32)
    emb_big = emb_small @ M_true

    M = fit_embedding_map(emb_small, emb_big, ridge=1e-8)
    np.testing.assert_allclose(M, M_true, atol=1e-4)

    cfg = UltravoxConfig(
        audio_config=WhisperEncoderConfig(d_model=8),
        text_config=DecoderConfig(hidden_size=d_small),
        hidden_size=32,
        projector_ln_mid=True,  # no ln_post => exact composition
    )
    proj = projector_lib.init_params(cfg, jax.random.key(0))
    x = jnp.asarray(rng.standard_normal((1, 16, 8)).astype(np.float32))
    small_out = projector_lib.projector_forward(proj, cfg, x)

    combined = combine_projector(proj, M)
    cfg_big = UltravoxConfig(
        audio_config=WhisperEncoderConfig(d_model=8),
        text_config=DecoderConfig(hidden_size=d_big),
        hidden_size=32,
        projector_ln_mid=True,
    )
    big_out = projector_lib.projector_forward(combined, cfg_big, x)
    np.testing.assert_allclose(
        np.asarray(big_out), np.asarray(small_out) @ M, atol=1e-4
    )


def test_disk_cache(tmp_path):
    from ultravox_tpu.tools.ds_tool.caching import DiskCache

    cache = DiskCache(str(tmp_path))
    calls = []
    fn = lambda: calls.append(1) or {"x": 1}
    assert cache.get_or_compute({"k": "a"}, fn) == {"x": 1}
    assert cache.get_or_compute({"k": "a"}, fn) == {"x": 1}
    assert len(calls) == 1  # second call served from disk


def test_caching_chat_wrapper(tmp_path):
    from ultravox_tpu.tools.ds_tool.caching import CachingChatWrapper

    client = mock.MagicMock()
    client.chat.completions.create.return_value.choices[0].message.content = "hi"
    chat = CachingChatWrapper(client, str(tmp_path))
    assert chat.chat_completion(model="m", messages=[]) == "hi"
    assert chat.chat_completion(model="m", messages=[]) == "hi"
    assert client.chat.completions.create.call_count == 1


def test_ds_tool_tasks_and_chunking(tmp_path):
    import datasets as hf_datasets

    from ultravox_tpu.tools.ds_tool.ds_tool import (
        DatasetChunkProcessor,
        DedupTask,
        TextGenerationTask,
    )

    ds = hf_datasets.Dataset.from_dict(
        {"text": ["one", "two", "one", "THREE", "three"]}
    )
    deduped = DedupTask(column_name="text").map_split(ds)
    assert deduped["text"] == ["one", "two", "THREE"]

    client = mock.MagicMock()
    client.chat.completions.create.return_value.choices[0].message.content = "gen"
    task = TextGenerationTask(
        client=client, new_column_name="out", cache_dir=str(tmp_path / "chat")
    )
    proc = DatasetChunkProcessor(
        task=task, output_dir=str(tmp_path / "out"), chunk_size=2
    )
    saved = proc.process_split(ds, "train")
    assert len(saved) == 3  # ceil(5 / 2)
    reloaded = hf_datasets.load_from_disk(saved[0])
    assert reloaded["out"] == ["gen", "gen"]


def test_chunk_subdivision_on_failure(tmp_path):
    import datasets as hf_datasets

    from ultravox_tpu.tools.ds_tool.ds_tool import DatasetChunkProcessor

    class FlakyTask:
        def map_split(self, dataset, num_proc=1):
            if len(dataset) > 2:
                raise RuntimeError("too big")
            return dataset

    ds = hf_datasets.Dataset.from_dict({"x": list(range(8))})
    proc = DatasetChunkProcessor(
        task=FlakyTask(), output_dir=str(tmp_path), chunk_size=8, min_chunk_size=1
    )
    saved = proc.process_split(ds)
    assert len(saved) == 4  # subdivided 8 -> 4,4 -> 2,2,2,2


def test_openai_client_payload():
    from ultravox_tpu.data.sample import VoiceSample
    from ultravox_tpu.tools.infer_api import OpenAIInference

    client = OpenAIInference("http://example.invalid")
    audio = np.zeros(1600, np.float32)
    sample = VoiceSample.from_prompt_and_audio("transcribe <|audio|> now", audio)
    messages = client._messages_payload(sample)
    parts = messages[0]["content"]
    assert [p["type"] for p in parts] == ["text", "input_audio", "text"]
    assert parts[1]["input_audio"]["format"] == "wav"


def test_tts_clients_mocked_transport(tmp_path, monkeypatch):
    """Concrete Azure/ElevenLabs TTS clients (reference tts.py:25-186) run
    against a mocked HTTP transport: correct URL/headers/body, PCM16 decode,
    and TtsTask consumes them end-to-end over a real dataset split."""
    import datasets as hf_datasets

    from ultravox_tpu.tools.ds_tool.ds_tool import TtsTask
    from ultravox_tpu.tools.ds_tool.tts import (
        AzureTts,
        ElevenTts,
        create_client,
    )

    pcm = (np.arange(-4, 4, dtype="<i2") * 1000).tobytes()

    class FakeResp:
        content = pcm

        def raise_for_status(self):
            pass

    session = mock.MagicMock()
    session.post.return_value = FakeResp()

    monkeypatch.setenv("AZURE_TTS_API_KEY", "k-azure")
    azure = AzureTts(sample_rate=16000, session=session)
    wav, sr = azure.synthesize("hello <world>", voice=None)
    assert sr == 16000 and wav.dtype == np.float32 and len(wav) == 8
    np.testing.assert_allclose(wav, np.arange(-4, 4) * 1000 / 32768.0)
    (url,), kwargs = session.post.call_args
    assert url == "https://westus.tts.speech.microsoft.com/cognitiveservices/v1"
    assert kwargs["headers"]["Ocp-Apim-Subscription-Key"] == "k-azure"
    assert kwargs["headers"]["X-Microsoft-OutputFormat"] == (
        "raw-16khz-16bit-mono-pcm"
    )
    body = kwargs["data"].decode()
    assert "en-US-JennyNeural" in body and "&lt;world&gt;" in body

    monkeypatch.setenv("ELEVEN_API_KEY", "k-11")
    eleven = ElevenTts(sample_rate=24000, session=session)
    wav, sr = eleven.synthesize("hi", voice="random")
    assert sr == 24000 and len(wav) == 8
    (url,), kwargs = session.post.call_args
    assert url.endswith("/stream?output_format=pcm_24000")
    assert kwargs["headers"]["xi-api-key"] == "k-11"
    assert kwargs["json"]["model_id"] == ElevenTts.DEFAULT_MODEL
    assert url.split("/stream")[0].rsplit("/", 1)[1] in ElevenTts.ALL_VOICES

    # missing keys raise a clear error instead of posting
    monkeypatch.delenv("ELEVEN_API_KEY")
    with pytest.raises(RuntimeError, match="ELEVEN_API_KEY"):
        ElevenTts(session=session).synthesize("x")
    with pytest.raises(ValueError, match="unknown TTS implementation"):
        create_client("nope")

    # TtsTask resolves the provider name via create_client and maps a split
    task = TtsTask(client="azure", column_name="text")
    task.client._session = session
    ds = hf_datasets.Dataset.from_dict({"text": ["a", "b"]})
    out = task.map_split(ds)
    assert len(out["question_audio"]) == 2
    assert out["question_audio"][0]["sampling_rate"] == 16000


def test_audiomix_task():
    """audiomix surrounds each sample with volume-matched pool audio and
    drops rows over max_length (reference: tasks/audio_mix_task.py)."""
    import datasets as hf_datasets
    import numpy as np

    from ultravox_tpu.tools.ds_tool.ds_tool import AudioMixTask

    sr = 16000
    rng = np.random.default_rng(0)
    pool = [
        {"audio": {"array": rng.standard_normal(sr).astype(np.float32),
                   "sampling_rate": sr}}
        for _ in range(3)
    ]
    rows = {
        "audio": [
            {"array": (np.ones(sr, np.float32) * 0.3), "sampling_rate": sr},
            # too long: dropped at max_length=2.0
            {"array": np.zeros(3 * sr, np.float32), "sampling_rate": sr},
        ],
        "text": ["short", "long"],
    }
    ds = hf_datasets.Dataset.from_dict(rows)
    task = AudioMixTask(mix_rows=pool, max_length=2.0, seed=1)
    out = task.map_split(ds)
    assert len(out) == 1
    mixed = np.asarray(out[0]["audio"]["array"], np.float32)
    assert len(mixed) >= sr  # original plus mix prefix/suffix
    assert len(mixed) <= int(2.0 * sr) + 2
    assert np.max(np.abs(mixed)) <= 1.0 + 1e-6
    # the original audio appears contiguously inside the mix
    target = np.ones(sr, np.float32) * 0.3
    found = any(
        np.allclose(mixed[i : i + sr], target)
        for i in range(len(mixed) - sr + 1)
    )
    assert found


def test_timestamp_task_with_fake_aligner(tmp_path):
    """timestamp writes a corpus, invokes the aligner, and parses TextGrid
    word tiers (reference: tasks/timestamp_gen_task.py)."""
    import os

    import datasets as hf_datasets
    import numpy as np

    from ultravox_tpu.tools.ds_tool.ds_tool import TimestampTask

    TEXTGRID = '''File type = "ooTextFile"
Object class = "TextGrid"
xmin = 0
xmax = 1.0
tiers? <exists>
size = 2
item []:
    item [1]:
        class = "IntervalTier"
        name = "words"
        xmin = 0
        xmax = 1.0
        intervals: size = 3
        intervals [1]:
            xmin = 0.0
            xmax = 0.25
            text = "hello"
        intervals [2]:
            xmin = 0.25
            xmax = 0.5
            text = ""
        intervals [3]:
            xmin = 0.5
            xmax = 0.9
            text = "world"
    item [2]:
        class = "IntervalTier"
        name = "phones"
        xmin = 0
        xmax = 1.0
        intervals: size = 1
        intervals [1]:
            xmin = 0.0
            xmax = 1.0
            text = "HH"
'''

    def fake_aligner(corpus_dir, out_dir):
        os.makedirs(out_dir, exist_ok=True)
        wavs = [f for f in os.listdir(corpus_dir) if f.endswith(".wav")]
        txts = [f for f in os.listdir(corpus_dir) if f.endswith(".txt")]
        assert len(wavs) == len(txts) == 2
        for w in wavs:
            base = w[:-4]
            with open(os.path.join(out_dir, base + ".TextGrid"), "w") as f:
                f.write(TEXTGRID)

    sr = 16000
    ds = hf_datasets.Dataset.from_dict(
        {
            "audio": [
                {"array": np.zeros(sr, np.float32), "sampling_rate": sr},
                {"array": np.zeros(sr, np.float32), "sampling_rate": sr},
            ],
            "text": ["hello world", "hello world"],
        }
    )
    task = TimestampTask(template="{{ text }}", aligner=fake_aligner)
    out = task.map_split(ds)
    ts = out[0]["timestamps"]
    assert ts == [
        {"start": 0.0, "end": 0.25, "text": "hello"},
        {"start": 0.5, "end": 0.9, "text": "world"},
    ]


def test_timestamp_task_requires_mfa(monkeypatch):
    import shutil

    import pytest as _pytest

    from ultravox_tpu.tools.ds_tool.ds_tool import TimestampTask

    monkeypatch.setattr(shutil, "which", lambda name: None)
    with _pytest.raises(RuntimeError, match="mfa"):
        TimestampTask()


def test_pipeline_surface(tmp_path):
    """ultravox_tpu.pipeline() loads a checkpoint and answers a dict input
    (reference: ultravox_pipeline.py contract)."""
    import jax
    import numpy as np

    import ultravox_tpu
    from tests.helpers import make_tiny_tokenizer
    from ultravox_tpu.models import (
        DecoderConfig,
        UltravoxConfig,
        WhisperEncoderConfig,
    )
    from ultravox_tpu.models import ultravox as uv
    from ultravox_tpu.tools.publish import save_pretrained

    cfg = UltravoxConfig(
        audio_config=WhisperEncoderConfig(
            d_model=32, num_layers=1, num_heads=2, ffn_dim=64
        ),
        text_config=DecoderConfig(
            vocab_size=384, hidden_size=48, intermediate_size=96,
            num_layers=2, num_heads=4, num_kv_heads=2, head_dim=12,
        ),
        hidden_size=64,
    )
    params = uv.init_params(cfg, jax.random.key(3))
    ckpt = save_pretrained(
        params, cfg, str(tmp_path / "pipe_ckpt"), make_tiny_tokenizer()
    )
    import jax.numpy as jnp

    pipe = ultravox_tpu.pipeline(ckpt, dtype=jnp.float32, max_cache_len=256)
    rng = np.random.default_rng(0)
    # int16 audio + no placeholder prompt: pipeline normalises + appends
    audio16 = (rng.standard_normal(8000) * 3000).astype(np.int16)
    text = pipe(
        {"audio": audio16, "sampling_rate": 16000, "prompt": "transcribe"},
        max_new_tokens=5,
    )
    assert isinstance(text, str)
    # text-only turns also work
    text2 = pipe(
        {"turns": [{"role": "user", "content": "hello"}]}, max_new_tokens=5
    )
    assert isinstance(text2, str)
