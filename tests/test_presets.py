"""Preset configs construct, override, and map to the BASELINE ladder."""

import dataclasses

import pytest

from geometrics_tpu.train.config import AutoEncoderConfig, TrainConfig
from geometrics_tpu.train.presets import PRESETS
from geometrics_tpu.utils.cli import parse_into


def test_all_presets_construct():
    for name, factory in PRESETS.items():
        cfg = factory()
        assert isinstance(cfg, (TrainConfig, AutoEncoderConfig)), name


def test_ladder_properties():
    o = PRESETS["overfit"]()
    assert o.models_per_class == 1 and o.model.splits_per_round == 0
    ft = PRESETS["fixed_topo"]()
    assert ft.model.splits_per_round == 0 and ft.loss.latent == 0.0
    sp = PRESETS["splitting"]()
    assert sp.model.splits_per_round > 0
    fu = PRESETS["full"]()
    assert fu.num_classes == 13 and fu.encoder_checkpoint is not None
    # full preset pins the bench.py program family (see presets.py docstring)
    assert fu.model.scan_layers and fu.model.adjacency_mode == "dense"
    assert fu.model.bfloat16 and fu.mesh.v_max == 384


def test_presets_cli_override():
    cfg = parse_into(PRESETS["full"](), ["--epochs", "3",
                                         "--loss.latent", "0.0"])
    assert cfg.epochs == 3 and cfg.loss.latent == 0.0
