"""Numerical-safety guards (SURVEY.md §5 "race detection / sanitizers" slot).

The reference has no sanitizers (single-threaded Python).  The failure class
that actually bites this framework is silent NaN/Inf propagation through the
fused loss graph; these helpers wrap a train step with ``checkify`` so a
non-finite loss or gradient fails loudly with a located error instead of
corrupting the run.  Off by default (adds checks to the compiled graph);
enable with ``TrainConfig.debug_nan_checks``.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import checkify


def assert_all_finite(tree: Any, label: str) -> None:
    """checkify-visible finiteness assertion over a pytree (use under jit)."""
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        if jnp.issubdtype(leaf.dtype, jnp.floating):
            checkify.check(
                jnp.all(jnp.isfinite(leaf)),
                f"non-finite value in {label}{jax.tree_util.keystr(path)}")


def checkify_step(step_fn: Callable) -> Callable:
    """Wrap a jitted train step so numerical checks raise on the host.

    Returns a function with the same signature; raises ``ValueError`` with
    the located check message if any embedded check fails.
    """
    checked = checkify.checkify(step_fn, errors=checkify.float_checks)

    def wrapped(*args, **kwargs):
        err, out = checked(*args, **kwargs)
        err.throw()
        return out

    return wrapped
