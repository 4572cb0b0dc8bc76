"""The reserved ('data','model') 2-D mesh must EXECUTE, not just construct
(SURVEY.md §2.3 reserves the model axis; until round 5 only make_mesh was
tested).  The GEOMetrics models need no TP, so params are replicated over
'model' — the executed contract is: a full train step on the 2-D mesh
produces the same losses as the 1-D data mesh, and the batch stays sharded
over 'data' only."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _tiny_step_setup(mesh):
    import optax

    from geometrics_tpu.models import Camera
    from geometrics_tpu.parallel import replicate_tree, shard_batch
    from geometrics_tpu.train import (
        MeshBudget, ModelConfig, TrainConfig, build_init_mesh, build_model,
        make_train_step)

    cfg = TrainConfig(
        model=ModelConfig(image_size=32, hidden=16, block_depth=1,
                          carried_dim=8, cnn_widths=(4, 8),
                          splits_per_round=4, split_threshold=0.0),
        mesh=MeshBudget(subdivisions=1, v_max=64, f_max=160),
        batch_size=4, surface_samples=128, gt_points=128,
        use_fused_chamfer=False,
    )
    model = build_model(cfg)
    b = cfg.batch_size
    rng = np.random.default_rng(0)
    batch = {
        "image": rng.random((b, 32, 32, 3), dtype=np.float32),
        "azimuth": rng.random(b).astype(np.float32),
        "elevation": np.full((b,), 0.5, np.float32),
        "distance": np.full((b,), 2.2, np.float32),
        "gt_points": rng.normal(size=(b, 128, 3)).astype(np.float32) * 0.3,
    }
    init_mesh_host = build_init_mesh(cfg, b)
    cam = Camera(jnp.asarray(batch["azimuth"]), jnp.asarray(batch["elevation"]),
                 jnp.asarray(batch["distance"]))
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(batch["image"]),
                        cam, init_mesh_host)["params"]
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)
    step_fn = make_train_step(model, tx, cfg)
    return (step_fn,
            replicate_tree(params, mesh), replicate_tree(opt_state, mesh),
            shard_batch(batch, mesh), replicate_tree(init_mesh_host, mesh))


def _run_losses(mesh, steps=3):
    step_fn, params, opt, batch, init_mesh = _tiny_step_setup(mesh)
    key = jax.random.PRNGKey(1)
    out = []
    for _ in range(steps):
        key, sub = jax.random.split(key)
        params, opt, aux = step_fn(params, opt, batch, init_mesh, sub)
        out.append(float(aux["total"]))
    return out


def test_train_step_runs_on_2d_mesh_and_matches_1d():
    from geometrics_tpu.parallel import make_mesh_for_batch

    assert len(jax.devices()) >= 8  # conftest pins the 8-device CPU pool
    mesh_1d = make_mesh_for_batch(4)
    mesh_2d = make_mesh_for_batch(4, model_parallel=2)
    assert mesh_1d.axis_names == ("data",)
    assert mesh_2d.axis_names == ("data", "model")
    assert mesh_2d.devices.shape == (4, 2)

    l1 = _run_losses(mesh_1d)
    l2 = _run_losses(mesh_2d)
    assert all(np.isfinite(l1)) and all(np.isfinite(l2))
    # replication over 'model' is semantically a no-op: same step, same
    # PRNG chain, same data -> same losses (f32 tolerance)
    np.testing.assert_allclose(l1, l2, rtol=1e-5, atol=1e-6)


def test_shard_batch_on_2d_mesh_shards_data_axis_only():
    from geometrics_tpu.parallel import data_sharding, make_mesh_for_batch, shard_batch

    mesh = make_mesh_for_batch(4, model_parallel=2)
    batch = shard_batch({"x": np.zeros((4, 6, 3), np.float32)}, mesh)
    spec = batch["x"].sharding.spec
    # first axis over 'data', nothing over 'model'
    assert spec[0] == "data"
    assert all(s is None for s in spec[1:])
