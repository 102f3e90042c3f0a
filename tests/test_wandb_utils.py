"""wandb:// checkpoint resolution + artifact logging with a mocked wandb API
(the package isn't installed in CI — reference: model/wandb_utils.py:10-52,
WANDB_LOG_MODEL train flow)."""

import sys
import types
from unittest import mock

import pytest


@pytest.fixture
def fake_wandb(tmp_path, monkeypatch):
    ckpt = tmp_path / "artifact"
    ckpt.mkdir()
    (ckpt / "config.json").write_text("{}")

    mod = types.ModuleType("wandb")
    artifact = mock.MagicMock()
    artifact.download.return_value = str(ckpt)
    api = mock.MagicMock()
    api.artifact.return_value = artifact
    mod.Api = mock.MagicMock(return_value=api)
    mod.Artifact = mock.MagicMock()
    monkeypatch.setitem(sys.modules, "wandb", mod)
    return mod, api, artifact, str(ckpt)


def test_wandb_url_resolution(fake_wandb):
    from ultravox_tpu.inference.ultravox_infer import resolve_checkpoint
    from ultravox_tpu.utils import wandb_utils

    mod, api, artifact, ckpt = fake_wandb
    assert wandb_utils.is_wandb_url("wandb://fixie/ultravox/model-x:v3")
    assert not wandb_utils.is_wandb_url("hf://fixie-ai/ultravox")

    path = resolve_checkpoint("wandb://fixie/ultravox/model-x:v3")
    assert path == ckpt
    api.artifact.assert_called_once_with("fixie/ultravox/model-x:v3")


def test_log_checkpoint_artifact(fake_wandb, tmp_path):
    from ultravox_tpu.utils.wandb_utils import log_checkpoint_artifact

    mod, api, artifact, ckpt = fake_wandb
    made = mock.MagicMock()
    mod.Artifact.return_value = made
    run = mock.MagicMock()
    ckpt_dir = tmp_path / "checkpoint-42"
    ckpt_dir.mkdir()
    log_checkpoint_artifact(run, str(ckpt_dir))
    mod.Artifact.assert_called_once()
    assert mod.Artifact.call_args.kwargs["name"] == "model-checkpoint-42"
    made.add_dir.assert_called_once_with(str(ckpt_dir))
    run.log_artifact.assert_called_once_with(made)


def test_metrics_logger_checkpoint_hook(fake_wandb, tmp_path, monkeypatch):
    """MetricsLogger.log_checkpoint logs an artifact iff WANDB_LOG_MODEL is
    set and a wandb run is active."""
    from ultravox_tpu.training.config import TrainConfig
    from ultravox_tpu.training.train import MetricsLogger

    mod, *_ = fake_wandb
    mod.init = mock.MagicMock()
    mod.run = mock.MagicMock()
    mod.log = mock.MagicMock()
    mod.finish = mock.MagicMock()
    made = mock.MagicMock()
    mod.Artifact.return_value = made

    config = TrainConfig(
        data_sets=["synthetic-asr"],
        output_dir=str(tmp_path / "out"),
        report_logs_to=["wandb"],
    )
    logger = MetricsLogger(config)
    ckpt_dir = tmp_path / "checkpoint-1"
    ckpt_dir.mkdir()

    logger.log_checkpoint(str(ckpt_dir))  # WANDB_LOG_MODEL unset -> no-op
    mod.Artifact.assert_not_called()

    monkeypatch.setenv("WANDB_LOG_MODEL", "checkpoint")
    logger.log_checkpoint(str(ckpt_dir))
    mod.Artifact.assert_called_once()
    logger.close()


def test_eval_wandb_table(fake_wandb, tmp_path):
    """eval logs per-sample tables + files to an active W&B run
    (reference: eval.py:268-291)."""
    import sys
    from unittest import mock as _mock

    from ultravox_tpu.evaluation.eval import _log_wandb_table
    from ultravox_tpu.evaluation.metrics import EvalSample

    mod = sys.modules["wandb"]
    mod.run = _mock.MagicMock()
    mod.Table = _mock.MagicMock()
    mod.log = _mock.MagicMock()
    mod.save = _mock.MagicMock()
    samples = [
        EvalSample(index=0, question="q", expected_answer="a",
                   generated_answer="b", transcript=None)
    ]
    out = tmp_path / "x.json"
    out.write_text("{}")
    _log_wandb_table("ds1", "wer", 12.5, samples, str(out))
    mod.Table.assert_called_once()
    mod.log.assert_called_once()
    mod.save.assert_called_once_with(str(out))

    # absent run -> no-op
    mod.run = None
    mod.log.reset_mock()
    _log_wandb_table("ds1", "wer", 12.5, samples, str(out))
    mod.log.assert_not_called()
