"""Dataclass-config CLI overrides (SURVEY.md §5 config/flag system).

``parse_into(TrainConfig, argv)`` maps ``--batch_size 8 --model.hidden 256``
style flags onto (possibly nested) frozen dataclasses — the typed replacement
for the reference scripts' per-file argparse blocks.
"""

from __future__ import annotations

import dataclasses
import sys
from typing import Any, List, Optional, Sequence, Type, TypeVar, get_args, get_origin

T = TypeVar("T")


def _convert(value: str, typ: Any) -> Any:
    origin = get_origin(typ)
    if origin is not None:
        args = get_args(typ)
        if origin is tuple:
            elems = [v for v in value.replace(",", " ").split() if v]
            elem_t = args[0] if args else str
            return tuple(_convert(e, elem_t) for e in elems)
        if type(None) in args:  # Optional[X]
            if value.lower() in ("none", "null"):
                return None
            inner = [a for a in args if a is not type(None)][0]
            return _convert(value, inner)
    if typ is bool:
        return value.lower() in ("1", "true", "yes", "on")
    if typ in (int, float, str):
        return typ(value)
    return value


def _set_nested(cfg: Any, path: List[str], value: str) -> Any:
    field_map = {f.name: f for f in dataclasses.fields(cfg)}
    head = path[0]
    if head not in field_map:
        raise KeyError(
            f"unknown config field '{head}' on {type(cfg).__name__}; "
            f"valid: {sorted(field_map)}")
    if len(path) == 1:
        # `from __future__ import annotations` stores field types as strings;
        # resolve them to real types before conversion.
        import typing

        hints = typing.get_type_hints(type(cfg))
        typ = hints.get(head, field_map[head].type)
        return dataclasses.replace(cfg, **{head: _convert(value, typ)})
    sub = _set_nested(getattr(cfg, head), path[1:], value)
    return dataclasses.replace(cfg, **{head: sub})


def parse_into(config: T, argv: Optional[Sequence[str]] = None) -> T:
    """Apply ``--a.b.c value`` overrides to a dataclass instance."""
    argv = list(sys.argv[1:] if argv is None else argv)
    i = 0
    while i < len(argv):
        tok = argv[i]
        if not tok.startswith("--"):
            raise ValueError(f"expected --flag, got {tok!r}")
        key = tok[2:]
        if "=" in key:
            key, value = key.split("=", 1)
            i += 1
        else:
            if i + 1 >= len(argv):
                raise ValueError(f"flag {tok} missing a value")
            value = argv[i + 1]
            i += 2
        config = _set_nested(config, key.split("."), value)
    return config
