"""MDS shard format round-trip + GenericDataset-over-MDS loading
(reference: data/datasets.py:159-182, tools/mds_tool.py)."""

import numpy as np
import pytest

from ultravox_tpu.data import mds
from ultravox_tpu.data import types as data_types
from ultravox_tpu.data.datasets import GenericDataset
from ultravox_tpu.data.sample import audio_to_wav_bytes


def test_mds_roundtrip_all_encodings(tmp_path):
    columns = {
        "text": "str",
        "blob": "bytes",
        "count": "int",
        "score": "float32",
        "meta": "json",
        "vec": "ndarray:float32:4",
        "dyn": "ndarray",
    }
    rows = [
        {
            "text": f"sample {i} — ünïcødé",
            "blob": bytes([i, i + 1, i + 2]),
            "count": i * 1000 - 5,
            "score": i / 7.0,
            "meta": {"i": i, "tags": ["a", "b"]},
            "vec": np.arange(4, dtype=np.float32) + i,
            "dyn": np.ones((2, i + 1), np.int64) * i,
        }
        for i in range(17)
    ]
    with mds.MDSWriter(str(tmp_path / "ds"), columns, size_limit=512) as w:
        for r in rows:
            w.write(r)

    ds = mds.LocalMDSDataset(str(tmp_path / "ds"))
    assert len(ds) == 17
    assert len(ds.shards) > 1  # size_limit forced multiple shards
    for i, r in enumerate(rows):
        got = ds[i]
        assert got["text"] == r["text"]
        assert got["blob"] == r["blob"]
        assert got["count"] == r["count"]
        assert abs(got["score"] - np.float32(r["score"])) < 1e-6
        assert got["meta"] == r["meta"]
        np.testing.assert_array_equal(got["vec"], r["vec"])
        np.testing.assert_array_equal(got["dyn"], r["dyn"])

    # iteration + shuffle determinism
    plain = [r["count"] for r in ds]
    assert plain == [r["count"] for r in rows]
    ds_s = mds.LocalMDSDataset(str(tmp_path / "ds"), shuffle=True, shuffle_seed=3)
    shuffled = [r["count"] for r in ds_s]
    assert sorted(shuffled) == sorted(plain) and shuffled != plain


def _write_voice_mds(path, n=6, split="train"):
    columns = {"audio": "bytes", "text": "str"}
    rng = np.random.default_rng(0)
    with mds.MDSWriter(str(path / split), columns) as w:
        for i in range(n):
            audio = (rng.standard_normal(8000) * 0.1).astype(np.float32)
            w.write(
                {
                    "audio": audio_to_wav_bytes(audio),
                    "text": f"utterance number {i}",
                }
            )


def test_generic_dataset_over_mds(tmp_path):
    """A DatasetConfig with an MDS source iterates end-to-end (VERDICT r1
    next-step #6)."""
    _write_voice_mds(tmp_path, n=6)
    config = data_types.DatasetConfig(
        name="local-mds",
        path=str(tmp_path),
        use_mds=True,
        splits=[{"name": "train", "num_samples": 6}],
        user_template="transcribe <|audio|>",
        assistant_template="{{text}}",
        transcript_template="{{text}}",
    )
    args = data_types.VoiceDatasetArgs(shuffle=False)
    ds = GenericDataset(config, args)
    samples = list(ds)
    assert len(samples) == 6
    for i, s in enumerate(samples):
        assert s.audio is not None and s.audio.dtype == np.float32
        assert len(s.audio) == 8000
        assert s.messages[-1] == {
            "role": "assistant",
            "content": f"utterance number {i}",
        }


def test_remote_mds_requires_streaming_package(tmp_path):
    with pytest.raises(ImportError, match="mosaicml-streaming"):
        mds.load_mds_dataset("gs://bucket/ds")


def test_mds_tool_convert(tmp_path):
    """tools/mds_tool converts list-of-rows datasets via the local writer."""
    from ultravox_tpu.tools.mds_tool import convert_to_mds

    rng = np.random.default_rng(1)
    rows = [
        {
            "audio": {
                "array": rng.standard_normal(4000).astype(np.float32),
                "sampling_rate": 16000,
            },
            "text": f"row {i}",
            "id": i,
        }
        for i in range(3)
    ]
    out = convert_to_mds(rows, str(tmp_path / "conv"))
    ds = mds.LocalMDSDataset(out)
    assert len(ds) == 3
    assert ds[1]["text"] == "row 1"
    assert isinstance(ds[1]["audio"], bytes)
