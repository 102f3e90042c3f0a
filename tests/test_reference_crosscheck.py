"""Cross-implementation golden test: a checkpoint published by THIS framework
is loaded by the *reference implementation's own model code* (mounted
read-only at /root/reference) and must produce matching fp32 logits on the
same audio+text batch.

This is the strongest parity statement available offline: it proves a user of
the reference can switch checkpoints between the two frameworks. Skipped when
the reference tree isn't mounted.
"""

import os
import sys

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

REFERENCE = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE, "ultravox")),
    reason="reference tree not mounted",
)


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
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
        projector_ln_mid=False,
    )
    params = uv.init_params(cfg, jax.random.key(3))
    out = tmp_path_factory.mktemp("xckpt")
    save_pretrained(params, cfg, str(out), tokenizer=make_tiny_tokenizer())
    return cfg, params, str(out)


def _load_reference_model(ckpt_dir):
    sys.path.insert(0, REFERENCE)
    import safetensors.torch
    import transformers

    from ultravox.model.ultravox_config import UltravoxConfig as RefConfig
    from ultravox.model.ultravox_model import UltravoxModel as RefModel

    import json

    with open(os.path.join(ckpt_dir, "config.json")) as f:
        cfg_dict = json.load(f)
    ref_cfg = RefConfig(
        audio_config=cfg_dict["audio_config"],
        text_config=cfg_dict["text_config"],
        hidden_size=cfg_dict["hidden_size"],
        stack_factor=cfg_dict["stack_factor"],
        norm_init=cfg_dict["norm_init"],
        projector_act=cfg_dict["projector_act"],
        projector_ln_mid=cfg_dict["projector_ln_mid"],
    )
    # _init_weights False => reference builds submodels from config on the
    # meta device (its own untrained-model path); materialise and load ours
    old = transformers.modeling_utils._init_weights
    transformers.modeling_utils._init_weights = False
    try:
        model = RefModel(ref_cfg)
    finally:
        transformers.modeling_utils._init_weights = old
    sd = safetensors.torch.load_file(
        os.path.join(ckpt_dir, "model.safetensors")
    )
    missing, unexpected = model.load_state_dict(sd, strict=False, assign=True)
    # rotary inv_freq buffers are recomputed, everything else must load
    real_missing = [
        m for m in missing if "rotary_emb" not in m and "inv_freq" not in m
    ]
    assert not real_missing, f"missing params: {real_missing[:8]}"
    assert not unexpected, f"unexpected params: {unexpected[:8]}"
    return model.eval().float()


def test_reference_loads_our_checkpoint_and_logits_match(setup):
    from tests.helpers import make_tiny_tokenizer
    from ultravox_tpu.models import ultravox as uv
    from ultravox_tpu.models.processor import (
        DataCollatorWithAudio,
        UltravoxProcessor,
    )

    cfg, params, ckpt_dir = setup
    ref_model = _load_reference_model(ckpt_dir)

    processor = UltravoxProcessor(make_tiny_tokenizer())
    rng = np.random.default_rng(0)
    feats = [
        processor(
            text="transcribe <|audio|> now",
            audio=(rng.standard_normal(12000) * 0.1).astype(np.float32),
        ),
        processor(text="plain text question"),
    ]
    coll = DataCollatorWithAudio(pad_token_id=processor.tokenizer.pad_token_id)
    batch = coll(feats)

    # ours
    jbatch = {k: jnp.asarray(v) for k, v in batch.items()}
    ours = np.asarray(uv.ultravox_forward(params, cfg, jbatch))

    # reference forward on the same features (its collator contract uses
    # audio_batch_size = chunks per row instead of our explicit row map)
    counts = np.bincount(
        batch["audio_chunk_batch_idx"], minlength=batch["input_ids"].shape[0]
    )
    with torch.no_grad():
        ref_out = ref_model(
            input_ids=torch.from_numpy(np.asarray(batch["input_ids"])).long(),
            attention_mask=torch.from_numpy(
                np.asarray(batch["attention_mask"])
            ).long(),
            audio_values=torch.from_numpy(
                np.asarray(batch["audio_values"])
            ).float(),
            audio_lens=torch.from_numpy(np.asarray(batch["audio_lens"])).long(),
            audio_token_len=torch.from_numpy(
                np.asarray(batch["audio_token_len"])
            ).long(),
            audio_token_start_idx=torch.from_numpy(
                np.asarray(batch["audio_token_start_idx"])
            ).long(),
            audio_batch_size=torch.from_numpy(counts).long(),
        )
    ref = ref_out.logits.numpy()

    for b in range(2):
        n = int(np.asarray(batch["attention_mask"])[b].sum())
        np.testing.assert_allclose(ours[b, :n], ref[b, :n], atol=1e-3)


def test_processor_outputs_match_reference():
    """North-star check (BASELINE.md): processor outputs identical to the
    reference UltravoxProcessor on the same text+audio inputs."""
    import transformers

    sys.path.insert(0, REFERENCE)
    from ultravox.model.ultravox_processing import (
        UltravoxProcessor as RefProcessor,
    )

    from tests.helpers import make_tiny_tokenizer
    from ultravox_tpu.models.processor import UltravoxProcessor

    tok = make_tiny_tokenizer()
    fe = transformers.WhisperFeatureExtractor()  # 80 mels
    # WhisperProcessor insists on a WhisperTokenizer; the reference only uses
    # its feature_extractor, so bypass __init__ (no WhisperTokenizer assets
    # offline) and wire the attributes directly.
    whisper_proc = transformers.WhisperProcessor.__new__(
        transformers.WhisperProcessor
    )
    whisper_proc.feature_extractor = fe
    whisper_proc.tokenizer = tok
    whisper_proc.current_processor = fe
    whisper_proc._in_target_context_manager = False
    ref_proc = RefProcessor(audio_processor=whisper_proc, tokenizer=tok)
    our_proc = UltravoxProcessor(tok)

    rng = np.random.default_rng(0)
    cases = [
        ("transcribe <|audio|> please", [(rng.standard_normal(16000) * 0.1)]),
        (
            "a <|audio|> b <|audio|> c",
            [rng.standard_normal(8000) * 0.1, rng.standard_normal(12000) * 0.1],
        ),
        # 40 s audio -> chunked into 3000 + 1000 frames
        ("long <|audio|> audio", [rng.standard_normal(16000 * 40) * 0.1]),
        ("text only, no audio", None),
    ]
    for text, audios in cases:
        audios_f = (
            [a.astype(np.float32) for a in audios] if audios else None
        )
        ours = our_proc(text=text, audios=audios_f)
        ref = ref_proc(
            text=text, audios=audios_f, sampling_rate=16000, return_tensors="np"
        )
        np.testing.assert_array_equal(
            ours["input_ids"], np.asarray(ref["input_ids"]), err_msg=text
        )
        if audios:
            np.testing.assert_array_equal(
                ours["audio_token_len"], np.asarray(ref["audio_token_len"])
            )
            np.testing.assert_array_equal(
                ours["audio_token_start_idx"],
                np.asarray(ref["audio_token_start_idx"]),
            )
            np.testing.assert_array_equal(
                ours["audio_lens"], np.asarray(ref["audio_lens"])
            )
            np.testing.assert_allclose(
                ours["audio_values"],
                np.asarray(ref["audio_values"]),
                atol=5e-6,
                err_msg=text,
            )
