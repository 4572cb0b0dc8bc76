"""Aux subsystems: logging/tracing, checkpointing, CLI config (SURVEY.md §5)."""

from .checkpoint import Checkpointer, load_frozen_encoder
from .cli import parse_into
from .logging import MetricsLogger, maybe_profile, trace_annotation

__all__ = [
    "Checkpointer",
    "MetricsLogger",
    "load_frozen_encoder",
    "maybe_profile",
    "parse_into",
    "trace_annotation",
]
