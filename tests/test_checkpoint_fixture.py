"""Committed tiny-checkpoint regression fixture: the checkpoint FORMAT
(safetensors key names, config.json schema) and the converter's output are
pinned by artifacts frozen in git — a save+load pair that drifts together
still round-trips in freshly-generated tests while silently invalidating
every previously published checkpoint (reference counterpart: committed
assets/tiny_ultravox + state-dict-exact assertions,
ultravox/model/ultravox_model_test.py:84-111).

Regenerate ONLY for intentional format changes:
python scripts/make_tiny_checkpoint_fixture.py (and say so in the commit).
"""

import json
import os

import numpy as np

import jax

from ultravox_tpu.models import weights as weights_lib
from ultravox_tpu.models.config import UltravoxConfig

FIXTURE = os.path.join(os.path.dirname(__file__), "assets", "tiny_ultravox")


def _flatten(params):
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        key = "/".join(str(getattr(p, "key", p)) for p in path)
        flat[key] = np.asarray(leaf)
    return flat


def test_safetensors_key_names_frozen():
    import safetensors.numpy

    sd = safetensors.numpy.load_file(
        os.path.join(FIXTURE, "model.safetensors")
    )
    with open(os.path.join(FIXTURE, "expected_keys.json")) as f:
        expected = json.load(f)
    assert sorted(sd) == expected


def test_converter_output_exact():
    """Loading the committed checkpoint must reproduce the committed param
    tree bit-exactly — catches drift in key mapping, transposes, stacking
    order, and dtype handling."""
    with open(os.path.join(FIXTURE, "config.json")) as f:
        cfg = UltravoxConfig.from_hf_dict(json.load(f))
    sd = weights_lib.load_safetensors_dir(FIXTURE)
    params = weights_lib.convert_ultravox(sd, cfg)
    got = _flatten(params)
    expected = dict(np.load(os.path.join(FIXTURE, "expected_params.npz")))
    assert sorted(got) == sorted(expected), (
        sorted(set(got) ^ set(expected))
    )
    for key in expected:
        assert got[key].dtype == expected[key].dtype, key
        np.testing.assert_array_equal(got[key], expected[key], err_msg=key)


def test_fixture_checkpoint_forward_runs():
    """The committed checkpoint is actually servable end-to-end (guards the
    config.json schema, not just the tensor payloads)."""
    import jax.numpy as jnp

    from ultravox_tpu.models import ultravox as uv

    with open(os.path.join(FIXTURE, "config.json")) as f:
        cfg = UltravoxConfig.from_hf_dict(json.load(f))
    sd = weights_lib.load_safetensors_dir(FIXTURE)
    params = weights_lib.convert_ultravox(sd, cfg)
    ids = jnp.asarray(np.arange(12, dtype=np.int32)[None] % 300)
    logits = uv.ultravox_forward(
        params, cfg, {"input_ids": ids, "attention_mask": jnp.ones_like(ids)}
    )
    assert logits.shape == (1, 12, cfg.text_config.vocab_size)
    assert bool(jnp.isfinite(logits).all())
