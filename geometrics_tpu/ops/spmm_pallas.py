"""Fused adjacency-aggregation (SpMM) Pallas kernel.

The GCN aggregation ``mean_{j∈N(i)} h_j`` on TPU is fastest as a dense
matmul at this framework's vertex budgets (V ≤ ~1k; see core/adjacency.py).
The lax pipeline for it is three passes over the V×V adjacency:
binarize (collapse the directed-edge multiset counts), row-sum for degrees,
then matmul + divide.  This kernel fuses all of it: each (row-block ×
col-block) tile is binarized in VMEM, partial products accumulate in the
output block on the MXU, degrees accumulate in VMEM scratch, and the final
column step divides — the adjacency is read from HBM exactly ONCE and the
normalized Â never exists anywhere.

Inputs are raw multiset counts straight from the COO scatter
(``adjacency_counts_dense``), so the XLA-side preprocessing is just one
scatter-add.  Equivalence vs the lax oracle is tested in
tests/test_spmm_pallas.py; runs in interpreter mode off-TPU.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.adjacency import face_edges

_TV = 128   # row block (output rows)
_TC = 128   # column block (neighbor dim, contracted)
_TD = 128   # feature block


def adjacency_counts_dense(faces: jax.Array, face_mask: jax.Array,
                           v_max: int) -> jax.Array:
    """Raw directed-edge multiset counts [V, V] (one scatter-add, unbatched)."""
    src, dst, emask = face_edges(faces, face_mask)
    return jnp.zeros((v_max, v_max)).at[src, dst].add(emask)


def _spmm_kernel(adj_ref, feats_ref, out_ref, deg_ref, *, normalize: bool):
    j = pl.program_id(2)  # contracted (column) dimension — innermost

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)
        deg_ref[:] = jnp.zeros_like(deg_ref)

    a = jnp.minimum(adj_ref[:], 1.0)           # binarize multiset counts
    out_ref[:] += jnp.dot(a, feats_ref[:], preferred_element_type=jnp.float32)
    deg_ref[:] += jnp.sum(a, axis=1, keepdims=True)

    if normalize:
        @pl.when(j == pl.num_programs(2) - 1)
        def _():
            out_ref[:] = out_ref[:] / jnp.maximum(deg_ref[:], 1.0)


def _spmm_call(adj_counts: jax.Array, feats: jax.Array, *, normalize: bool,
               interpret: Optional[bool] = None) -> jax.Array:
    """Raw kernel launch (unbatched, not differentiable): [V,V],[V,D]→[V,D]."""
    if interpret is None:
        from ._backend import is_tpu

        interpret = not is_tpu()
    v, d = feats.shape
    pad_v = (-v) % _TV
    pad_d = (-d) % _TD
    adj_p = jnp.pad(adj_counts.astype(jnp.float32),
                    ((0, pad_v), (0, pad_v)))
    feats_p = jnp.pad(feats.astype(jnp.float32), ((0, pad_v), (0, pad_d)))
    vp, dp = v + pad_v, d + pad_d

    grid = (vp // _TV, dp // _TD, vp // _TC)
    out = pl.pallas_call(
        functools.partial(_spmm_kernel, normalize=normalize),
        grid=grid,
        in_specs=[
            pl.BlockSpec((_TV, _TC), lambda i, k, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TC, _TD), lambda i, k, j: (j, k),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_TV, _TD), lambda i, k, j: (i, k),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((vp, dp), jnp.float32),
        scratch_shapes=[pltpu.VMEM((_TV, 1), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(adj_p, feats_p)
    return out[:v, :d]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _spmm_mean(adj_counts: jax.Array, feats: jax.Array,
               interpret: Optional[bool]) -> jax.Array:
    return _spmm_call(adj_counts, feats, normalize=True, interpret=interpret)


def _spmm_mean_fwd(adj_counts, feats, interpret):
    return _spmm_mean(adj_counts, feats, interpret), adj_counts


def _spmm_mean_bwd(interpret, adj_counts, g):
    """out_i = Σ_j Â_ij x_j with Â = binarize(A)/deg ⇒ ∂x = Âᵀ g =
    binarize(A)ᵀ (g/deg).  Counts get a zero cotangent (integer topology)."""
    deg = jnp.sum(jnp.minimum(adj_counts, 1.0), axis=-1, keepdims=True)
    gx = _spmm_call(jnp.swapaxes(adj_counts, -1, -2),
                    g / jnp.maximum(deg, 1.0), normalize=False,
                    interpret=interpret)
    return jnp.zeros_like(adj_counts), gx


_spmm_mean.defvjp(_spmm_mean_fwd, _spmm_mean_bwd)


def spmm_mean_pallas(adj_counts: jax.Array, feats: jax.Array,
                     *, interpret: Optional[bool] = None) -> jax.Array:
    """Mean-neighbor aggregation from raw counts (unbatched): [V,V],[V,D]→[V,D].

    Differentiable w.r.t. ``feats`` (custom VJP — the backward pass is the
    transposed kernel launch) for ANY ``interpret`` setting: the flag rides
    through the custom_vjp as a static nondiff argument, so forcing
    interpreter mode (off-TPU tests) keeps the documented differentiable
    behavior (ADVICE r2)."""
    return _spmm_mean(adj_counts, feats, interpret)


def spmm_mean_batched(adj_counts: jax.Array, feats: jax.Array,
                      **kw) -> jax.Array:
    """[B,V,V] × [B,V,D] → [B,V,D] (differentiable, vmapped kernel)."""
    return jax.vmap(lambda a, f: spmm_mean_pallas(a, f, **kw))(
        adj_counts, feats)


def adjacency_counts_batched(faces: jax.Array, face_mask: jax.Array,
                             v_max: int) -> jax.Array:
    """[B,F,3],[B,F] → [B,V,V] raw directed-edge counts (models' entry point:
    built once per deformation block, consumed by spmm_mean_batched per
    layer — the scatter-add is the only XLA-side preprocessing)."""
    return jax.vmap(lambda f, m: adjacency_counts_dense(f, m, v_max))(
        faces, face_mask)
