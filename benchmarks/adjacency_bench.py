"""Adjacency-aggregation shoot-out at the flagship/highres budgets.

VERDICT round-1 Weak #4: the aggregation choice must be justified by numbers
measured at the model's own vertex budget, with proper blocking.  This times
one GCNDeformationBlock forward+backward (the unit the mode actually changes)
for adjacency_mode in {segment, dense, pallas} at both the flagship (V=384)
and highres (V=1152) budgets, and prints a JSON line per (mode, budget).

Run on the chip:  python benchmarks/adjacency_bench.py
Local smoke:      python benchmarks/adjacency_bench.py --cpu --steps 3
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def bench_block(mode: str, batch: int, v_max: int, f_max: int, subdiv: int,
                hidden: int, depth: int, steps: int, warmup: int) -> float:
    import jax
    import jax.numpy as jnp

    from geometrics_tpu.core.mesh import icosphere_np, make_mesh_buffer
    from geometrics_tpu.models.gcn import GCNDeformationBlock

    verts, faces = icosphere_np(subdiv, radius=0.3)
    # fill the buffer to CAPACITY so the timing reflects the budget, not a
    # small live prefix: pad vertices with random sphere points and tile the
    # face list across the slack with rotating index offsets, so every vertex
    # row is live and the ~6-neighbor degree distribution covers all of v_max
    rng = np.random.default_rng(0)
    extra = rng.normal(size=(v_max - len(verts), 3)).astype(np.float32)
    extra *= 0.3 / np.maximum(np.linalg.norm(extra, axis=1, keepdims=True), 1e-9)
    verts_full = np.concatenate([verts, extra], axis=0)
    reps = -(-f_max // len(faces))
    offs = (np.arange(reps) * len(verts))[:, None, None]
    faces_full = ((faces[None] + offs) % v_max).reshape(-1, 3)[:f_max]
    faces_full = faces_full.astype(np.int32)
    mesh = make_mesh_buffer(verts_full, faces_full, v_max, f_max, batch)
    pooled = jnp.asarray(rng.normal(size=(batch, v_max, 448)).astype(np.float32))
    block = GCNDeformationBlock(hidden=hidden, depth=depth,
                                out_features=hidden, adjacency_mode=mode,
                                scan_layers=True)
    params = block.init(jax.random.PRNGKey(0), mesh.verts, pooled, None,
                        mesh.faces, mesh.face_mask, mesh.vert_mask)

    def loss(p, coords):
        d, f = block.apply(p, coords, pooled, None, mesh.faces,
                           mesh.face_mask, mesh.vert_mask)
        return jnp.sum(d ** 2) + jnp.sum(f ** 2)

    step = jax.jit(jax.value_and_grad(loss, argnums=(0, 1)))
    coords = mesh.verts
    out = None
    for _ in range(warmup):
        out = step(params, coords)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(steps):
        out = step(params, coords)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / steps * 1e3  # ms


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("--warmup", type=int, default=5)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--hidden", type=int, default=192)
    p.add_argument("--depth", type=int, default=6)
    p.add_argument("--budgets", type=str, default="flagship,highres",
                   help="comma-separated subset of flagship,highres,paperres")
    p.add_argument("--modes", type=str, default="segment,dense,pallas")
    args = p.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    budgets = [b for b in [("flagship", 384, 960, 2),
                           ("highres", 1152, 2304, 2),
                           ("paperres", 2560, 5120, 3)]
               if b[0] in args.budgets.split(",")]
    for name, v_max, f_max, subdiv in budgets:
        for mode in args.modes.split(","):
            ms = bench_block(mode, args.batch, v_max, f_max, subdiv,
                             args.hidden, args.depth, args.steps, args.warmup)
            print(json.dumps({"budget": name, "v_max": v_max, "mode": mode,
                              "block_fwd_bwd_ms": round(ms, 3),
                              "batch": args.batch}), flush=True)


if __name__ == "__main__":
    main()
