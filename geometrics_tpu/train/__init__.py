"""Training & evaluation loops (reference L4/L5 — SURVEY.md §1)."""

from .config import AutoEncoderConfig, EvalConfig, MeshBudget, ModelConfig, TrainConfig
from .losses import LossWeights, geometrics_loss
from .autoencoder import MeshVoxelAE, make_ae_train_step, train_autoencoder
from .trainer import (
    build_init_mesh,
    build_model,
    evaluate,
    make_eval_step,
    make_train_step,
    train_geometrics,
)

__all__ = [
    "AutoEncoderConfig",
    "EvalConfig",
    "LossWeights",
    "MeshBudget",
    "MeshVoxelAE",
    "ModelConfig",
    "TrainConfig",
    "build_init_mesh",
    "build_model",
    "evaluate",
    "geometrics_loss",
    "make_ae_train_step",
    "make_eval_step",
    "make_train_step",
    "train_autoencoder",
    "train_geometrics",
]
