"""Device-mesh and sharding helpers — the framework's SPMD layer.

The reference is single-process single-device (SURVEY.md §2.3): there is no
comm backend to port.  The TPU-native scaling story is pure SPMD:

  * a 1-D ``('data',)`` mesh over all chips in the slice — every batch-leading
    array is sharded on axis 0, parameters and the init-mesh template are
    replicated; jit/pjit then inserts the gradient all-reduce over ICI
    automatically (no NCCL analog, no hand-written collectives on this path);
  * an optional ``('data','model')`` 2-D mesh is supported for completeness
    (SURVEY.md §2.3 reserves the 'model' axis) — the GEOMetrics models are far
    too small to need TP, so the default keeps model=1;
  * point-axis ("context-parallel") sharding of giant point sets is provided
    by ops/chamfer (tiled kernel) + `shard_points_axis` here if a point cloud
    ever exceeds one chip (SURVEY.md §5 long-context analog).

Tested on a virtual 8-device CPU mesh (tests/conftest.py) and dry-run-compiled
multichip via __graft_entry__.dryrun_multichip.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    model_parallel: int = 1,
    devices: Optional[Sequence[Any]] = None,
) -> Mesh:
    """1-D ('data',) mesh by default; ('data','model') if model_parallel>1."""
    devs = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devs = devs[:n_devices]
    n = len(devs)
    if n % model_parallel:
        raise ValueError(f"{n} devices not divisible by model_parallel={model_parallel}")
    if model_parallel > 1:
        arr = np.array(devs).reshape(n // model_parallel, model_parallel)
        return Mesh(arr, ("data", "model"))
    return Mesh(np.array(devs), ("data",))


def make_mesh_for_batch(batch_size: int,
                        model_parallel: int = 1) -> Mesh:
    """Largest data-axis that evenly divides ``batch_size`` — keeps small
    debug batches runnable on wide device pools (sharding requires the batch
    axis divisible by the mesh axis)."""
    n = len(jax.devices()) // model_parallel
    while n > 1 and batch_size % n:
        n -= 1
    return make_mesh(n_devices=n * model_parallel,
                     model_parallel=model_parallel)


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Shard axis 0 (batch) over 'data'; all other axes replicated."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Place a host batch dict onto the mesh, batch-axis sharded.

    Scalars/0-d entries are replicated.  This is the single host→device
    transfer point of the training loop.
    """
    ds, rep = data_sharding(mesh), replicated(mesh)

    def put(x):
        x = np.asarray(x)
        return jax.device_put(x, ds if x.ndim >= 1 else rep)

    return {k: put(v) for k, v in batch.items()}


def replicate_tree(tree: Any, mesh: Mesh) -> Any:
    """Replicate a pytree (params / init-mesh template) across the mesh."""
    rep = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), tree)


def shard_points_axis(points: jax.Array, mesh: Mesh) -> jax.Array:
    """Shard a [N, 3] (or [B, N, 3]) point set along the point axis — the
    context-parallel analog for point sets exceeding one chip's HBM
    (SURVEY.md §5 long-context entry).  Row/col-min Chamfer reductions then
    ride XLA's automatic collectives."""
    spec = P(None, "data") if points.ndim == 3 else P("data")
    return jax.device_put(points, NamedSharding(mesh, spec))
