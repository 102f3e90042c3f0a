"""Every committed recipe must parse and reference only registered
datasets — a recipe that names a dataset the registry can't resolve fails
at step 0 of a multi-day run (reference ships its recipes exercised by
release training: training/configs/*.yaml, evaluation/configs/*.yaml)."""

import glob
import os

import pytest
import yaml

from ultravox_tpu.data import registry
from ultravox_tpu.evaluation.eval import EvalConfig
from ultravox_tpu.training.config import CONFIGS_DIR, get_train_config

EVAL_CONFIGS_DIR = os.path.join(
    os.path.dirname(CONFIGS_DIR), "..", "evaluation", "configs"
)

TRAIN_RECIPES = sorted(glob.glob(os.path.join(CONFIGS_DIR, "*.yaml")))
EVAL_RECIPES = sorted(glob.glob(os.path.join(EVAL_CONFIGS_DIR, "*.yaml")))

# eval sets handled outside the registry (evaluation/eval.py special-cases)
SPECIAL_EVAL_SETS = {"synthetic-asr"}


@pytest.mark.parametrize(
    "path", TRAIN_RECIPES, ids=[os.path.basename(p) for p in TRAIN_RECIPES]
)
def test_train_recipe_parses_and_datasets_resolve(path):
    if os.path.basename(path) == "meta_config.yaml":
        cfg = get_train_config([])
    else:
        cfg = get_train_config(["--config_path", path])
    for name in list(cfg.data_sets) + list(cfg.val_sets) + list(cfg.eval_sets):
        if name in SPECIAL_EVAL_SETS:
            continue
        registry._resolve_config(name)  # raises on unknown names
    if cfg.data_weights is not None:
        assert len(cfg.data_weights) == len(cfg.data_sets)


@pytest.mark.parametrize(
    "path", EVAL_RECIPES, ids=[os.path.basename(p) for p in EVAL_RECIPES]
)
def test_eval_recipe_parses_and_datasets_resolve(path):
    with open(path) as f:
        raw = yaml.safe_load(f)
    cfg = EvalConfig(**raw)
    assert cfg.eval_sets
    for name in cfg.eval_sets:
        if name in SPECIAL_EVAL_SETS:
            continue
        registry._resolve_config(name)


def test_flagship_70b_recipe_shape():
    """The 70B flagship recipe (reference v0.6_config_llama3_70b.yaml)
    keeps the reference's optimization surface: KL loss, audio LoRA r=8,
    lr 1e-4, 160-sample global batch."""
    cfg = get_train_config(
        ["--config_path", os.path.join(CONFIGS_DIR, "v0.6_llama3_70b_tpu.yaml")]
    )
    assert cfg.loss_function == "kl"
    assert cfg.audio_model_lora["r"] == 8
    assert cfg.lr == 1e-4
    assert cfg.batch_size * 1 == 160
    assert cfg.mesh_fsdp == -1


def test_streaming_recipe_sets_latency_mask():
    """Parity with reference streaming_tinyllama.yaml:24."""
    cfg = get_train_config(
        ["--config_path",
         os.path.join(CONFIGS_DIR, "streaming_tinyllama_tpu.yaml")]
    )
    assert cfg.audio_latency_block_size == 100


def test_data_set_spec_expansion():
    """Template/dict data_sets entries normalise to flat names+weights
    (the legacy v0.4.1-v0.5.1 recipes use them; reference expresses the
    same mixes as literal {name, weight} lists)."""
    from ultravox_tpu.training.config import TrainConfig, expand_data_set_specs

    names, weights = expand_data_set_specs([
        "plain",
        {"name": "weighted", "weight": 2.5},
        {"template": "cv-{lang}-t", "langs": ["en", "hi"],
         "weight": 0.1, "weights": {"hi": 10}},
    ])
    assert names == ["plain", "weighted", "cv-en-t", "cv-hi-t"]
    assert weights == [1.0, 2.5, 0.1, 10.0]

    cfg = TrainConfig(data_sets=[
        "a", {"template": "x-{lang}", "langs": ["b", "c"], "weights": {"c": 3}}
    ])
    assert cfg.data_sets == ["a", "x-b", "x-c"]
    assert cfg.data_weights == [1.0, 1.0, 3.0]

    with pytest.raises(ValueError, match="not both"):
        TrainConfig(data_sets=[{"name": "a", "weight": 2}], data_weights=[1.0])


def test_extends_overlay(tmp_path):
    """A recipe with ``extends:`` inherits and overrides its base (the
    v0.5.1 70b recipe extends the 8b one, like the reference pair differs
    only in model/cadence keys)."""
    from ultravox_tpu.training.config import load_yaml

    (tmp_path / "base.yaml").write_text("a: 1\nb: 2\n")
    (tmp_path / "child.yaml").write_text("extends: base.yaml\nb: 3\nc: 4\n")
    assert load_yaml(str(tmp_path / "child.yaml")) == {"a": 1, "b": 3, "c": 4}


def test_v051_70b_recipe_extends_8b():
    cfg8 = get_train_config(
        ["--config_path", os.path.join(CONFIGS_DIR, "v0.5.1_llama3_8b.yaml")]
    )
    cfg70 = get_train_config(
        ["--config_path", os.path.join(CONFIGS_DIR, "v0.5.1_llama3_70b.yaml")]
    )
    assert cfg70.data_sets == cfg8.data_sets
    assert cfg70.data_weights == cfg8.data_weights
    assert cfg70.text_model.endswith("70B-Instruct")
    assert cfg70.mesh_fsdp == -1 and cfg70.save_steps == 2000
    # hindi-specific sets carry the reference's 40/20/60/20 weights
    w = dict(zip(cfg8.data_sets, cfg8.data_weights))
    assert w["kathbath-hindi-transcription"] == 60.0
    assert w["seamless-hindi-continuation"] == 20.0
    assert w["commonvoice-hi-continuation"] == 10.0
