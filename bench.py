"""Round benchmark: flagship train-step throughput in meshes/sec/chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` is measured against the reference-equivalent torch-CPU
implementation (benchmarks/torch_baseline.py) — the reference publishes no
throughput numbers (BASELINE.md), so the baseline is measured in-process on
this machine, per SURVEY.md §6.

Runs on whatever the default JAX backend is (the tunneled TPU chip under the
driver; CPU works for local smoke via --cpu).
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def _enable_compile_cache() -> None:
    """Persistent XLA compile cache: first-compile through the TPU tunnel is
    minutes; later invocations (e.g. the driver's round-end run) reuse it."""
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def bench_jax(batch_size: int, steps: int, warmup: int, splits: int,
              surface_samples: int, windows: int = 3) -> list:
    """Measured window rates (meshes/sec), one per window.

    The TPU pool is SHARED and identical programs can vary several-fold in
    wall time between moments (CLAUDE.md); a single window is hostage to the
    pool moment, so the number of record is the MEDIAN of ``windows``
    independent blocked windows, with the spread reported alongside."""
    import jax
    import jax.numpy as jnp
    import optax

    _enable_compile_cache()

    from geometrics_tpu.models import Camera
    from geometrics_tpu.parallel import make_mesh_for_batch, replicate_tree, shard_batch
    from geometrics_tpu.train import (
        MeshBudget, ModelConfig, TrainConfig, build_init_mesh, build_model,
        make_train_step,
    )

    on_tpu = jax.default_backend() in ("tpu", "axon")
    config = TrainConfig(
        model=ModelConfig(splits_per_round=splits, split_threshold=0.0,
                          bfloat16=on_tpu, scan_layers=True,
                          adjacency_mode="dense"),
        mesh=MeshBudget(subdivisions=2, v_max=384, f_max=960),
        batch_size=batch_size,
        surface_samples=surface_samples,
        gt_points=surface_samples,
        use_fused_chamfer=on_tpu,
        multi_stage_chamfer=True,
    )
    model = build_model(config)
    devmesh = make_mesh_for_batch(batch_size)
    b = config.batch_size

    rng = np.random.default_rng(0)
    batch = {
        "image": rng.random((b, 137, 137, 3), dtype=np.float32),
        "azimuth": rng.random(b).astype(np.float32) * 6.28,
        "elevation": np.full((b,), 0.5, np.float32),
        "distance": np.full((b,), 2.2, np.float32),
        "gt_points": (rng.normal(size=(b, surface_samples, 3)) * 0.4
                      ).astype(np.float32),
    }
    init_mesh_host = build_init_mesh(config, b)
    images = jnp.asarray(batch["image"])
    camera = Camera(jnp.asarray(batch["azimuth"]),
                    jnp.asarray(batch["elevation"]),
                    jnp.asarray(batch["distance"]))
    params = model.init(jax.random.PRNGKey(0), images, camera,
                        init_mesh_host)["params"]

    tx = optax.adam(3e-4)
    opt_state = tx.init(params)
    params = replicate_tree(params, devmesh)
    opt_state = replicate_tree(opt_state, devmesh)
    init_mesh = replicate_tree(init_mesh_host, devmesh)
    sharded = shard_batch(batch, devmesh)
    step_fn = make_train_step(model, tx, config)

    key = jax.random.PRNGKey(1)
    for i in range(warmup):
        key, sub = jax.random.split(key)
        params, opt_state, aux = step_fn(params, opt_state, sharded,
                                         init_mesh, sub)
    jax.block_until_ready(aux["total"])

    rates = []
    for w in range(windows):
        t0 = time.perf_counter()
        for i in range(steps):
            key, sub = jax.random.split(key)
            params, opt_state, aux = step_fn(params, opt_state, sharded,
                                             init_mesh, sub)
        jax.block_until_ready(aux["total"])
        dt = time.perf_counter() - t0
        rates.append(batch_size * steps / dt)
    assert np.isfinite(float(jax.device_get(aux["total"])))
    return rates


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--warmup", type=int, default=3)
    p.add_argument("--windows", type=int, default=3)
    p.add_argument("--splits", type=int, default=48)
    p.add_argument("--surface_samples", type=int, default=2048)
    p.add_argument("--baseline_steps", type=int, default=4)
    p.add_argument("--baseline_windows", type=int, default=3)
    p.add_argument("--baseline_batch", type=int, default=2)
    p.add_argument("--cpu", action="store_true", help="force CPU (local smoke)")
    p.add_argument("--skip_baseline", action="store_true")
    args = p.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    rates = bench_jax(args.batch_size, args.steps, args.warmup, args.splits,
                      args.surface_samples, windows=args.windows)
    mps = float(np.median(rates))

    if args.skip_baseline:
        base = float("nan")
        base_rates = []
    else:
        sys.path.insert(0, "benchmarks")
        from torch_baseline import run_baseline

        # same median-of-windows treatment for the denominator: the 1-core
        # host is shared too, and the headline ratio divides by this number
        base_rates = [
            run_baseline(batch_size=args.baseline_batch,
                         steps=args.baseline_steps, warmup=1 if w == 0 else 0,
                         n_points=args.surface_samples,
                         splits_per_round=args.splits)
            for w in range(args.baseline_windows)]
        base = float(np.median(base_rates))

    print(json.dumps({
        "metric": "train_meshes_per_sec_per_chip",
        "value": round(mps, 3),
        "unit": "meshes/sec/chip",
        "vs_baseline": round(mps / base, 3) if base == base else None,
        "windows": [round(r, 3) for r in rates],
        "spread": {"min": round(min(rates), 3), "max": round(max(rates), 3)},
        "baseline_windows": [round(r, 3) for r in base_rates],
    }))


if __name__ == "__main__":
    main()
