"""Hand-derived FLOP count for the flagship train step (round-4 verdict #2a).

BENCH_r04 shipped ``mfu: 1.12`` — physically impossible for a single v5e —
with the XLA ``cost_analysis()`` estimate as its only FLOPs basis.  This
module is the independent, auditable basis: every matmul/conv in the step is
counted from first principles so the utilization claim no longer rests on an
opaque compiler counter.  ``bench.py`` reports both and uses THIS count for
MFU; the ratio between the two is recorded in the payload.

Counting rules (matmul/conv-dominated accounting):
  * a matmul ``[M,K]x[K,N]`` costs ``2*M*K*N`` FLOPs (multiply + add — the
    same convention XLA's HloCostAnalysis uses for dot/conv);
  * backward of a Dense/conv: ``dX = g W^T`` and ``dW = X^T g`` are each the
    forward's size → **3x** forward in total;
  * dense-Â neighbor aggregation (``Â H``): Â is built from topology with
    stop-gradient semantics (no grad to faces), so backward is only
    ``dH = Â^T g`` → **2x** forward;
  * the Chamfer pairwise term ``-2 x y^T``: both operands carry grads →
    **3x**; its O(S*G) elementwise norm/add/min work is counted once per
    direction (a deliberate slight undercount — reductions are cheap);
  * gathers (perceptual pooling), inverse-CDF sampling, splitting, optimizer
    updates, EMA, masking: O(V), O(S) or O(params) elementwise — excluded
    (<1% of the total at flagship shapes; this makes the count, and hence
    the reported MFU, slightly CONSERVATIVE... i.e. the true utilization is
    marginally higher than reported, never lower).

The shapes are the PADDED static buffer shapes (v_max etc.) — exactly what
XLA compiles and the MXU executes, independent of how many vertices are
"live" after splitting.
"""

from __future__ import annotations

from typing import Sequence, Tuple


def _ceil_div(a: int, b: int) -> int:
    return -(-a // b)


def cnn_forward_flops(image: int, widths: Sequence[int],
                      in_channels: int = 3) -> float:
    """ImageEncoder forward: per stage one stride-2 + two stride-1 3x3 convs
    (models/image_encoder.py); SAME padding → H_out = ceil(H/stride)."""
    f = 0.0
    h, cin = image, in_channels
    for w in widths:
        h = _ceil_div(h, 2)
        f += 2.0 * h * h * cin * w * 9        # down conv
        f += 2 * (2.0 * h * h * w * w * 9)    # the two stride-1 convs
        cin = w
    return f


def gcn_block_flops(v: int, d_in: int, hidden: int, depth: int,
                    carried: int) -> Tuple[float, float]:
    """(dense_3x, agg_2x) forward FLOPs of one GCNDeformationBlock with
    dense-Â aggregation (models/gcn.py): lift conv (d_in→hidden), ``depth``
    residual convs (hidden→hidden), feat head (hidden→carried) — each a
    GraphConv with TWO projections (self + neighbor) and ONE Â·H aggregation
    — plus the single-Dense delta head (hidden→3).  Split by backward
    multiplier: dense layers replay 3x fwd+bwd, Â·H only 2x (Â constant)."""
    dense = 0.0
    dense += 2 * (2.0 * v * d_in * hidden)            # lift: self + nbr proj
    dense += depth * 2 * (2.0 * v * hidden * hidden)  # residual convs
    dense += 2 * (2.0 * v * hidden * carried)         # feat head
    dense += 2.0 * v * hidden * 3                     # delta head
    agg = 2.0 * v * v * d_in                          # lift aggregates d_in
    agg += (depth + 1) * (2.0 * v * v * hidden)       # convs + feat head
    return dense, agg


def chamfer_stage_flops(samples: int, gt: int) -> Tuple[float, float]:
    """(matmul_3x, elementwise_1x) forward FLOPs of one symmetric Chamfer
    stage in the lax matmul form (core/chamfer.py): the [S,G] pairwise
    table is ``|x|^2 + |y|^2 - 2 x.y^T`` (one [S,3]x[3,G] matmul + two
    broadcast adds) and two min-reductions."""
    matmul = 2.0 * samples * gt * 3
    elementwise = 4.0 * samples * gt   # two adds + two min-reduce passes
    return matmul, elementwise


def analytic_train_step_flops(
    batch: int,
    image: int = 137,
    widths: Sequence[int] = (32, 64, 128, 256),
    v_max: int = 384,
    hidden: int = 192,
    depth: int = 6,
    num_blocks: int = 3,
    carried: int = 192,
    surface_samples: int = 2048,
    gt_points: int = 2048,
    chamfer_stages: int = 3,
) -> float:
    """Total fwd+bwd FLOPs of ONE optimizer step at the bench config
    (defaults = bench.py's flagship shapes; multi_stage_chamfer evaluates
    one Chamfer stage per deformation block)."""
    f = 3.0 * cnn_forward_flops(image, widths)
    d_in = 3 + sum(widths) + carried
    dense, agg = gcn_block_flops(v_max, d_in, hidden, depth, carried)
    f += num_blocks * (3.0 * dense + 2.0 * agg)
    mm, ew = chamfer_stage_flops(surface_samples, gt_points)
    f += chamfer_stages * (3.0 * mm + ew)
    return batch * f
