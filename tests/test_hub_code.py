"""Standalone Hub loading: a published checkpoint directory (config +
safetensors + synced ultravox_*.py code) must load via
``AutoModel.from_pretrained(dir, trust_remote_code=True)`` with only
transformers installed and reproduce this framework's logits
(reference role: tools/update_hf_models.py syncs model code into repos so
they load without the fixie package)."""

import json
import os
import sys

import numpy as np
import pytest
import torch
import transformers

import jax
import jax.numpy as jnp

from tests.helpers import make_tiny_tokenizer


@pytest.fixture(scope="module")
def published_dir(tmp_path_factory):
    from ultravox_tpu.models import (
        DecoderConfig,
        UltravoxConfig,
        WhisperEncoderConfig,
    )
    from ultravox_tpu.models import ultravox as uv
    from ultravox_tpu.tools.publish import save_pretrained

    cfg = UltravoxConfig(
        audio_config=WhisperEncoderConfig(
            d_model=64, num_layers=2, num_heads=4, ffn_dim=128,
            max_source_positions=1500,
        ),
        text_config=DecoderConfig(
            vocab_size=384, hidden_size=48, intermediate_size=96,
            num_layers=2, num_heads=4, num_kv_heads=2, head_dim=12,
            rope_theta=10000.0, max_position_embeddings=512,
        ),
        hidden_size=64,
        stack_factor=8,
        projector_ln_mid=True,
    )
    params = uv.init_params(cfg, jax.random.key(7))
    out = tmp_path_factory.mktemp("hub_ckpt")
    save_pretrained(
        params, cfg, str(out), tokenizer=make_tiny_tokenizer(),
        include_code=True,
    )
    return cfg, params, str(out)


def test_code_files_and_auto_map_published(published_dir):
    _, _, out = published_dir
    for fname in (
        "ultravox_config.py", "ultravox_model.py", "ultravox_processing.py",
        "ultravox_tokenizer.py", "ultravox_pipeline.py",
    ):
        assert os.path.exists(os.path.join(out, fname)), fname
    with open(os.path.join(out, "config.json")) as f:
        cfg = json.load(f)
    assert cfg["auto_map"]["AutoModel"] == "ultravox_model.UltravoxModel"
    assert cfg["auto_map"]["AutoConfig"] == "ultravox_config.UltravoxConfig"


def _load_standalone(out):
    """Load via the checkpoint's own code files, the way trust_remote_code
    does — imported from the PUBLISHED DIRECTORY, not the package (proves
    the directory is self-contained)."""
    import importlib.util

    mods = {}
    for name in (
        "ultravox_config", "ultravox_model", "ultravox_processing",
        "ultravox_tokenizer", "ultravox_pipeline",
    ):
        spec = importlib.util.spec_from_file_location(
            name, os.path.join(out, f"{name}.py")
        )
        mod = importlib.util.module_from_spec(spec)
        # the code files import each other relatively when loaded by
        # transformers' dynamic module machinery; satisfy `from
        # .ultravox_config import ...` by registering under both names
        sys.modules[name] = mod
        mods[name] = (spec, mod)
    for name, (spec, mod) in mods.items():
        spec.loader.exec_module(mod)
    return mods


def test_standalone_torch_model_matches_jax_logits(published_dir):
    cfg, params, out = published_dir
    from ultravox_tpu.models import ultravox as uv

    mods = _load_standalone(out)
    model_mod = mods["ultravox_model"][1]
    config_mod = mods["ultravox_config"][1]
    with open(os.path.join(out, "config.json")) as f:
        hf_cfg = config_mod.UltravoxConfig(**{
            k: v for k, v in json.load(f).items()
            if k not in ("auto_map", "model_type")
        })
    model = model_mod.UltravoxModel(hf_cfg)
    import safetensors.torch

    sd = safetensors.torch.load_file(os.path.join(out, "model.safetensors"))
    missing, unexpected = model.load_state_dict(sd, strict=False)
    # tied/buffer keys aside, every checkpoint tensor must land
    assert not unexpected, unexpected
    real_missing = [
        m for m in missing if "rotary" not in m and "position_ids" not in m
    ]
    assert not real_missing, real_missing
    model.eval()

    rng = np.random.default_rng(0)
    T = 48
    ids = rng.integers(0, 300, size=(1, T)).astype(np.int64)
    n_mel_frames = 400
    mel = rng.standard_normal((1, 80, n_mel_frames)).astype(np.float32) * 0.3
    n_tok = -(-n_mel_frames // 16)  # ds 2 x stack 8
    start = 5
    batch_jax = {
        "input_ids": jnp.asarray(ids.astype(np.int32)),
        "attention_mask": jnp.ones((1, T), jnp.int32),
        "audio_values": jnp.asarray(mel),
        "audio_lens": jnp.asarray([n_mel_frames], jnp.int32),
        "audio_token_start_idx": jnp.asarray([start], jnp.int32),
        "audio_token_len": jnp.asarray([n_tok], jnp.int32),
        "audio_chunk_batch_idx": jnp.asarray([0], jnp.int32),
    }
    with jax.default_matmul_precision("highest"):
        jax_logits = np.asarray(uv.ultravox_forward(params, cfg, batch_jax))

    with torch.no_grad():
        torch_out = model(
            input_ids=torch.from_numpy(ids),
            attention_mask=torch.ones(1, T, dtype=torch.long),
            audio_values=torch.from_numpy(mel),
            audio_lens=torch.tensor([n_mel_frames]),
            audio_token_start_idx=torch.tensor([start]),
            audio_token_len=torch.tensor([n_tok]),
            audio_chunk_batch_idx=torch.tensor([0]),
        )
    torch_logits = torch_out.logits.float().numpy()
    np.testing.assert_allclose(jax_logits, torch_logits, atol=2e-4, rtol=2e-4)


def test_standalone_processor_matches_package_processor(published_dir):
    """The shipped processor must produce the same token expansion
    (ids, placeholder starts, token lens) as the in-package processor."""
    _, _, out = published_dir
    from ultravox_tpu.models.processor import UltravoxProcessor as PkgProc

    mods = _load_standalone(out)
    proc_mod = mods["ultravox_processing"][1]
    tok = make_tiny_tokenizer()
    hub_proc = proc_mod.UltravoxProcessor(tokenizer=tok)
    pkg_proc = PkgProc(tok)

    rng = np.random.default_rng(1)
    audio = (rng.standard_normal(16000) * 0.1).astype(np.float32)
    text = "please transcribe <|audio|> exactly"
    got = hub_proc(text=text, audio=audio)
    want = pkg_proc(text=text, audio=audio)
    assert got["input_ids"].reshape(-1).tolist() == (
        want["input_ids"].reshape(-1).tolist()
    )
    assert got["audio_token_start_idx"].tolist() == (
        want["audio_token_start_idx"].tolist()
    )
    assert got["audio_token_len"].tolist() == want["audio_token_len"].tolist()
    # placeholder-count errors surface identically
    with pytest.raises(ValueError):
        hub_proc(text="no placeholder", audio=audio)
    with pytest.raises(ValueError):
        hub_proc(text="a <|audio|> b <|audio|> c", audio=audio)


def test_standalone_pipeline_end_to_end(published_dir):
    """The shipped ultravox_pipeline.py must run audio->text against the
    published dir with only the dir's own code files (reference:
    model/ultravox_pipeline.py registered as 'ultravox-pipeline')."""
    cfg, params, out = published_dir
    import safetensors.torch

    mods = _load_standalone(out)
    model_mod = mods["ultravox_model"][1]
    config_mod = mods["ultravox_config"][1]
    tok_mod = mods["ultravox_tokenizer"][1]
    pipe_mod = mods["ultravox_pipeline"][1]

    with open(os.path.join(out, "config.json")) as f:
        hf_cfg = config_mod.UltravoxConfig(**{
            k: v for k, v in json.load(f).items()
            if k not in ("auto_map", "model_type")
        })
    model = model_mod.UltravoxModel(hf_cfg)
    sd = safetensors.torch.load_file(os.path.join(out, "model.safetensors"))
    model.load_state_dict(sd, strict=False)
    model.eval()

    # the tokenizer bootstrap loads the dir's tokenizer + <|audio|> token
    tok = tok_mod.from_pretrained_text_tokenizer(out)
    assert tok_mod.get_audio_token_id(tok) == len(tok) - 1

    pipe = pipe_mod.UltravoxPipeline(model=model, tokenizer=tok)
    rng = np.random.default_rng(3)
    wav = (rng.standard_normal(8000) * 0.1).astype(np.float32)
    text = pipe(
        {"audio": wav, "sampling_rate": 16000, "prompt": "say <|audio|>"},
        max_new_tokens=4,
    )
    assert isinstance(text, str)
    # text-only turns (no audio) must also work
    text2 = pipe(
        {"turns": [{"role": "user", "content": "hello"}]}, max_new_tokens=3
    )
    assert isinstance(text2, str)
    # registered with transformers' pipeline registry under the same name
    assert (
        "ultravox-pipeline"
        in transformers.pipelines.PIPELINE_REGISTRY.get_supported_tasks()
    )


class _FakeModelInfo:
    def __init__(self, id, private=False):
        self.id = id
        self.private = private


class _FakeApi:
    def __init__(self, tmpdir):
        self.tmpdir = tmpdir
        self.commits = []

    def list_models(self, **kw):
        return [
            _FakeModelInfo("acme/ultravox-v0_6-tpu-8b"),
            _FakeModelInfo("acme/ultravox-v0_6-tpu-70b"),
            _FakeModelInfo("acme/ultravox-private", private=True),
        ]

    def hf_hub_download(self, repo_id, filename, local_dir):
        path = os.path.join(local_dir, filename)
        with open(path, "w") as f:
            json.dump({"model_type": "ultravox", "stack_factor": 8}, f)
        return path

    def create_commit(self, repo_id, operations, commit_message):
        self.commits.append((repo_id, operations, commit_message))


def test_update_hf_models_syncs_code_and_config(tmp_path):
    from ultravox_tpu.tools import update_hf_models as tool

    api = _FakeApi(str(tmp_path))
    repos = tool.main(["--author", "acme"], api=api)
    assert repos == [
        "acme/ultravox-v0_6-tpu-8b", "acme/ultravox-v0_6-tpu-70b"
    ]  # private repo excluded
    assert len(api.commits) == 2
    repo_id, ops, _ = api.commits[0]
    paths = sorted(op.path_in_repo for op in ops)
    assert paths == [
        "config.json", "ultravox_config.py", "ultravox_model.py",
        "ultravox_pipeline.py", "ultravox_processing.py",
        "ultravox_tokenizer.py",
    ]
    cfg_op = [op for op in ops if op.path_in_repo == "config.json"][0]
    cfg = json.loads(cfg_op.path_or_fileobj.decode())
    assert cfg["auto_map"]["AutoModel"] == "ultravox_model.UltravoxModel"
    assert cfg["stack_factor"] == 8  # existing keys preserved


def test_update_hf_models_config_changes(tmp_path):
    from ultravox_tpu.tools import update_hf_models as tool

    api = _FakeApi(str(tmp_path))
    tool.main(
        ["--repos", "acme/one", "--config_changes", "torch_dtype=bfloat16"],
        api=api,
    )
    _, ops, _ = api.commits[0]
    cfg_op = [op for op in ops if op.path_in_repo == "config.json"][0]
    cfg = json.loads(cfg_op.path_or_fileobj.decode())
    assert cfg["torch_dtype"] == "bfloat16"
