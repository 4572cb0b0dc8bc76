"""Aux subsystems: CLI config overrides, metrics logger, checkpoint roundtrip
(SURVEY.md §5)."""

import json
import os

import numpy as np
import pytest

from geometrics_tpu.train import AutoEncoderConfig, TrainConfig
from geometrics_tpu.utils.checkpoint import Checkpointer
from geometrics_tpu.utils.cli import parse_into
from geometrics_tpu.utils.logging import MetricsLogger


def test_cli_basic_types():
    cfg = parse_into(TrainConfig(), [
        "--batch_size", "4", "--learning_rate", "1e-2",
        "--use_fused_chamfer", "false", "--encoder_checkpoint", "runs/ae"])
    assert cfg.batch_size == 4 and isinstance(cfg.batch_size, int)
    assert cfg.learning_rate == pytest.approx(1e-2)
    assert cfg.use_fused_chamfer is False
    assert cfg.encoder_checkpoint == "runs/ae"


def test_cli_nested_and_tuple():
    cfg = parse_into(TrainConfig(), [
        "--model.hidden=24", "--model.cnn_widths", "8,16",
        "--mesh.v_max", "128", "--loss.chamfer", "2.0"])
    assert cfg.model.hidden == 24
    assert cfg.model.cnn_widths == (8, 16)
    assert cfg.mesh.v_max == 128
    assert cfg.loss.chamfer == pytest.approx(2.0)


def test_cli_optional_none():
    cfg = parse_into(TrainConfig(), ["--encoder_checkpoint", "none"])
    assert cfg.encoder_checkpoint is None


def test_cli_unknown_field_raises():
    with pytest.raises(KeyError):
        parse_into(AutoEncoderConfig(), ["--nonsense", "1"])


def test_metrics_logger_jsonl(tmp_path):
    lg = MetricsLogger(str(tmp_path), "m", echo=False)
    lg.log(0, {"loss": np.float32(1.5)}, epoch=0)
    lg.log(10, {"loss": 0.5})
    lg.close()
    lines = [json.loads(l) for l in open(tmp_path / "m.jsonl")]
    assert lines[0]["step"] == 0 and lines[0]["loss"] == pytest.approx(1.5)
    assert lines[1]["step"] == 10


def test_checkpoint_roundtrip(tmp_path):
    ck = Checkpointer(str(tmp_path / "ck"))
    tree = {"params": {"w": np.arange(6, dtype=np.float32).reshape(2, 3)},
            "step": 7}
    ck.save(7, tree, wait=True)
    assert ck.latest_step() == 7
    restored = ck.restore({"params": {"w": np.zeros((2, 3), np.float32)},
                           "step": 0})
    np.testing.assert_array_equal(restored["params"]["w"], tree["params"]["w"])
    assert restored["step"] == 7


def test_config_json_roundtrip(tmp_path):
    """trainer's persisted config.json rebuilds an identical TrainConfig."""
    import dataclasses
    import json

    from geometrics_tpu.train.config import (
        MeshBudget, ModelConfig, config_from_json)

    cfg = TrainConfig(
        model=ModelConfig(hidden=24, cnn_widths=(8, 16), scan_layers=True),
        mesh=MeshBudget(v_max=100, init_obj=None),
        batch_size=6, encoder_checkpoint=None, lr_schedule="cosine")
    blob = json.dumps(dataclasses.asdict(cfg), default=str)
    back = config_from_json(json.loads(blob))
    assert back == cfg
