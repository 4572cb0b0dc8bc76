"""Component microbenchmarks with trustworthy timing (VERDICT round-1 Weak #3).

Every timing jits the component, warms it up, and wraps the timed loop in
``jax.block_until_ready`` — no async-dispatch artifacts.  All components run
at the SAME flagship shapes as bench.py (batch 32, V=384, hidden 192,
2048-point Chamfer, bf16 on TPU) so the numbers reconcile against the full
step: Σ(forward components) ≈ full forward, and full step ≈ forward +
backward + Adam ≈ 3× forward.

Run on the chip:  python benchmarks/components.py
Local smoke:      python benchmarks/components.py --cpu --steps 2
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def timed(fn, args, steps: int, warmup: int) -> float:
    import jax

    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / steps * 1e3  # ms


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("--warmup", type=int, default=5)
    p.add_argument("--batch", type=int, default=32)
    args = p.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    import optax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from geometrics_tpu.core.sampling import sample_surface_batched
    from geometrics_tpu.core.splitting import (
        face_curvature_scores_batched, split_mesh_buffer)
    from geometrics_tpu.models import Camera
    from geometrics_tpu.models.image_encoder import ImageEncoder
    from geometrics_tpu.models.perceptual_pooling import perceptual_pool
    from geometrics_tpu.train import (
        MeshBudget, ModelConfig, TrainConfig, build_init_mesh, build_model,
        make_train_step,
    )

    from geometrics_tpu.ops import is_tpu

    on_tpu = is_tpu()
    config = TrainConfig(
        model=ModelConfig(splits_per_round=48, split_threshold=0.0,
                          bfloat16=on_tpu, scan_layers=True,
                          adjacency_mode="dense"),
        mesh=MeshBudget(subdivisions=2, v_max=384, f_max=960),
        batch_size=args.batch, surface_samples=2048, gt_points=2048,
        use_fused_chamfer=on_tpu, multi_stage_chamfer=True)
    b = args.batch
    model = build_model(config)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.random((b, 137, 137, 3), dtype=np.float32))
    camera = Camera(jnp.asarray(rng.random(b, ).astype(np.float32) * 6.28),
                    jnp.full((b,), 0.5), jnp.full((b,), 1.22))
    mesh = build_init_mesh(config, b)
    gt = jnp.asarray((rng.normal(size=(b, 2048, 3)) * 0.2).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), images, camera, mesh)["params"]
    key = jax.random.PRNGKey(1)
    results = {}

    # --- full train step (the reconciliation target) ---------------------
    tx = optax.adam(3e-4)
    step_fn = make_train_step(model, tx, config)
    batch = {"image": images, "azimuth": camera.azimuth,
             "elevation": camera.elevation, "distance": camera.distance,
             "gt_points": gt}
    state = {"p": params, "o": tx.init(params)}  # step donates its inputs

    def run_step(k):
        state["p"], state["o"], aux = step_fn(state["p"], state["o"], batch,
                                              mesh, k)
        return aux["total"]

    results["full_train_step"] = timed(run_step, (key,), args.steps,
                                       args.warmup)
    params = state["p"]

    # --- full forward (everything passed as arguments: closed-over device
    # arrays become embedded constants, pathologically slow via the relay) --
    fwd = jax.jit(lambda p, im, cam, m: model.apply(
        {"params": p}, im, cam, m).mesh.verts)
    results["full_forward"] = timed(fwd, (params, images, camera, mesh),
                                    args.steps, args.warmup)

    # --- CNN encoder ------------------------------------------------------
    enc = ImageEncoder(widths=config.model.cnn_widths,
                       dtype=jnp.bfloat16 if on_tpu else None)
    enc_params = enc.init(jax.random.PRNGKey(0), images)
    enc_fwd = jax.jit(lambda p, im: enc.apply(p, im))
    results["cnn_forward"] = timed(enc_fwd, (enc_params, images), args.steps,
                                   args.warmup)
    fmaps = enc_fwd(enc_params, images)

    # --- perceptual pooling (one of three per forward) --------------------
    pool = jax.jit(lambda v, fm, cam: perceptual_pool(fm, v, cam, 137))
    results["perceptual_pool"] = timed(pool, (mesh.verts, fmaps, camera),
                                       args.steps, args.warmup)

    # --- one GCN deformation block (of three) -----------------------------
    from geometrics_tpu.models.gcn import GCNDeformationBlock

    block = GCNDeformationBlock(hidden=192, depth=6, out_features=192,
                                adjacency_mode="dense", scan_layers=True,
                                dtype=jnp.bfloat16 if on_tpu else None)
    pooled = pool(mesh.verts, fmaps, camera)
    bp = block.init(jax.random.PRNGKey(0), mesh.verts, pooled, None,
                    mesh.faces, mesh.face_mask, mesh.vert_mask)
    blk = jax.jit(lambda p, m, po: block.apply(
        p, m.verts, po, None, m.faces, m.face_mask, m.vert_mask)[0])
    results["gcn_block_forward"] = timed(blk, (bp, mesh, pooled), args.steps,
                                         args.warmup)

    # --- differentiable surface sampling ----------------------------------
    samp = jax.jit(lambda k, m: sample_surface_batched(
        k, m.verts, m.faces, m.face_mask, 2048))
    results["surface_sampling_2048"] = timed(samp, (key, mesh), args.steps,
                                             args.warmup)
    pts = samp(key, mesh)

    # --- Chamfer (fused on TPU, lax off) ----------------------------------
    from geometrics_tpu.ops import chamfer as chamfer_op

    cham = jax.jit(lambda x, y: chamfer_op(x, y))
    results["chamfer_2048x2048"] = timed(cham, (pts, gt), args.steps,
                                         args.warmup)

    # --- one masked splitting round (incl. curvature scoring) -------------
    feats = jnp.zeros(mesh.verts.shape[:2] + (192,), jnp.float32)

    def split_once(m, ft):
        scores = face_curvature_scores_batched(m.verts, m.faces, m.face_mask)
        return split_mesh_buffer(m, ft, scores, 48, 0.0)[0].verts

    splt = jax.jit(split_once)
    results["split_round_48"] = timed(splt, (mesh, feats), args.steps,
                                      args.warmup)

    fwd_parts = (results["cnn_forward"] + 3 * results["perceptual_pool"]
                 + 3 * results["gcn_block_forward"]
                 + 2 * results["split_round_48"]
                 + results["surface_sampling_2048"])
    for k, v in results.items():
        print(json.dumps({"component": k, "ms": round(v, 3),
                          "batch": b}), flush=True)
    print(json.dumps({"component": "sum_forward_components",
                      "ms": round(fwd_parts, 3),
                      "note": "cnn + 3*pool + 3*block + 2*split + sampling; "
                              "compare against full_forward"}), flush=True)


if __name__ == "__main__":
    main()
