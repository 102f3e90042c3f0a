"""Generate the committed tiny-checkpoint regression fixture
(tests/assets/tiny_ultravox) — run ONCE; the fixture is then frozen in git.

The committed artifact pins the on-disk checkpoint format (safetensors key
names + config.json schema) AND the converter's output (exact param values):
a save-path + load-path change that drift together would still round-trip in
tests created fresh each run, while silently invalidating every previously
published checkpoint. Reference counterpart: the committed
assets/tiny_ultravox fixture asserted state-dict-exact in
ultravox/model/ultravox_model_test.py:84-111.
"""

import json
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ultravox_tpu.models import (  # noqa: E402
    DecoderConfig,
    UltravoxConfig,
    WhisperEncoderConfig,
)
from ultravox_tpu.models import ultravox as uv  # noqa: E402
from ultravox_tpu.tools.publish import save_pretrained  # noqa: E402

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "assets", "tiny_ultravox",
)


def main():
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
    params = uv.init_params(cfg, jax.random.key(1234))
    save_pretrained(params, cfg, OUT)

    # freeze the converter's EXPECTED output: the flat param tree
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        key = "/".join(str(getattr(p, "key", p)) for p in path)
        flat[key] = np.asarray(leaf)
    np.savez(os.path.join(OUT, "expected_params.npz"), **flat)

    import safetensors.numpy

    sd = safetensors.numpy.load_file(os.path.join(OUT, "model.safetensors"))
    with open(os.path.join(OUT, "expected_keys.json"), "w") as f:
        json.dump(sorted(sd), f, indent=1)
    print(f"wrote fixture to {OUT}: {len(sd)} tensors, "
          f"{len(flat)} param leaves")


if __name__ == "__main__":
    main()
