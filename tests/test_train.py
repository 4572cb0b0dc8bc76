"""End-to-end training smokes (SURVEY.md §4.4 integration ladder, shrunk to
CI scale): AE pretrain step, full GEOMetrics step with every loss term, the
overfit-one-sample config [B:7], and the multichip dryrun entry."""

import os
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from geometrics_tpu.data.synthetic import SyntheticConfig, SyntheticShapeDataset
from geometrics_tpu.train import (
    AutoEncoderConfig,
    LossWeights,
    MeshBudget,
    ModelConfig,
    TrainConfig,
    train_autoencoder,
    train_geometrics,
)


@pytest.fixture(scope="module")
def tiny_dataset(tmp_path_factory):
    return SyntheticShapeDataset(SyntheticConfig(
        num_classes=2, models_per_class=4, gt_points=256,
        image_size=32, voxel_res=16, subdivisions=1))


def _tiny_train_config(tmp_path, **overrides) -> TrainConfig:
    defaults = dict(
        model=ModelConfig(image_size=32, hidden=16, block_depth=1,
                          carried_dim=8, cnn_widths=(4, 8),
                          splits_per_round=4, split_threshold=0.0),
        mesh=MeshBudget(subdivisions=1, v_max=64, f_max=160),
        batch_size=4, surface_samples=128, gt_points=128,
        epochs=1, num_classes=2, models_per_class=4,
        checkpoint_dir=str(tmp_path / "run"),
        use_fused_chamfer=False, log_every=1000,
        encoder_latent_dim=16, encoder_hidden=8, encoder_depth=1,
    )
    defaults.update(overrides)
    return TrainConfig(**defaults)


def test_autoencoder_smoke(tiny_dataset, tmp_path):
    cfg = AutoEncoderConfig(
        latent_dim=16, encoder_hidden=8, encoder_depth=1, voxel_res=16,
        batch_size=4, epochs=1, num_classes=2, models_per_class=4,
        checkpoint_dir=str(tmp_path / "ae"), log_every=1000)
    out = train_autoencoder(cfg, dataset=tiny_dataset, max_steps=3)
    assert np.isfinite(out["metrics"]["bce"])
    assert os.path.isdir(out["checkpoint_dir"])


def test_geometrics_train_smoke_with_all_losses(tiny_dataset, tmp_path):
    """Full composite loss incl. frozen-encoder latent term + splitting."""
    from geometrics_tpu.train.autoencoder import MeshVoxelAE

    cfg = _tiny_train_config(tmp_path)
    # fabricate a frozen encoder matching cfg.encoder_* dims
    ae = MeshVoxelAE(latent_dim=16, encoder_hidden=8, encoder_depth=1,
                     voxel_res=16)
    s = tiny_dataset.get(0)
    gv = jnp.asarray(s["gt_verts"])[None]
    gf = jnp.asarray(s["gt_faces"])[None]
    enc_params = ae.init(jax.random.PRNGKey(0), gv, gf,
                         jnp.ones((1, gf.shape[1])), jnp.ones((1, gv.shape[1]))
                         )["params"]["encoder"]
    out = train_geometrics(cfg, dataset=tiny_dataset,
                           encoder_params=enc_params, max_steps=2)
    m = out["metrics"]
    for term in ("total", "chamfer", "latent", "edge", "laplacian",
                 "laplacian_move"):
        assert np.isfinite(m[term]), term
    assert m["latent"] > 0.0  # encoder actually used


def test_overfit_single_sample_chamfer_drops(tiny_dataset, tmp_path):
    """Config [B:7]: loss on one repeated sample must fall substantially."""
    cfg = _tiny_train_config(
        tmp_path,
        model=ModelConfig(image_size=32, hidden=32, block_depth=2,
                          carried_dim=16, cnn_widths=(8, 16),
                          splits_per_round=0),
        batch_size=2, learning_rate=3e-3, epochs=200,
        loss=LossWeights(chamfer=1.0, latent=0.0, edge=0.05, laplacian=0.02,
                         laplacian_move=0.02),
        models_per_class=1, num_classes=1, test_fraction=0.0,
        multi_stage_chamfer=False,
    )

    class OneSample:
        config = SyntheticConfig(num_classes=1, models_per_class=1)

        def __init__(self, base):
            self.s = base.get(0)

        def __len__(self):
            return 2

        def class_of(self, i):
            return 0

        def get(self, i):
            return self.s

    ds = OneSample(tiny_dataset)
    import geometrics_tpu.data.loader as loader_mod

    train_idx = np.array([0, 1])
    # run manually to capture first/last loss
    from geometrics_tpu.train.trainer import (
        build_init_mesh, build_model, make_train_step, batch_camera)
    from geometrics_tpu.parallel import make_mesh_for_batch, replicate_tree, shard_batch
    import optax

    model = build_model(cfg)
    init_mesh_host = build_init_mesh(cfg, cfg.batch_size)
    b0 = {k: jnp.asarray(v)[None].repeat(cfg.batch_size, axis=0)
          for k, v in ds.get(0).items()}
    params = model.init(jax.random.PRNGKey(0), b0["image"], batch_camera(b0),
                        init_mesh_host)["params"]
    tx = optax.adam(cfg.learning_rate)
    opt_state = tx.init(params)
    devmesh = make_mesh_for_batch(cfg.batch_size)
    params = replicate_tree(params, devmesh)
    opt_state = replicate_tree(opt_state, devmesh)
    init_mesh = replicate_tree(init_mesh_host, devmesh)
    step_fn = make_train_step(model, tx, cfg)
    batch = {k: np.asarray(v) for k, v in b0.items()
             if k in ("image", "azimuth", "elevation", "distance", "gt_points")}
    batch["gt_points"] = batch["gt_points"][:, :cfg.gt_points]
    sharded = shard_batch(batch, devmesh)
    key = jax.random.PRNGKey(1)
    losses = []
    for i in range(60):
        key, sub = jax.random.split(key)
        params, opt_state, aux = step_fn(params, opt_state, sharded,
                                         init_mesh, sub)
        losses.append(float(aux["chamfer"]))
    first = np.mean(losses[:5])
    last = np.mean(losses[-5:])
    assert last < first * 0.5, f"chamfer did not drop: {first:.4f} -> {last:.4f}"


def test_evaluate_covers_every_sample(tiny_dataset, tmp_path):
    """Eval must pad-and-mask the remainder batch, not drop it (VERDICT
    round-1 Weak #6): num_samples == split size for a non-dividing batch."""
    from geometrics_tpu.train.config import EvalConfig
    from geometrics_tpu.train.trainer import build_model, evaluate

    cfg = _tiny_train_config(tmp_path)
    model = build_model(cfg)
    s = tiny_dataset.get(0)
    b0 = {k: jnp.asarray(v)[None].repeat(cfg.batch_size, axis=0)
          for k, v in s.items()}
    from geometrics_tpu.train.trainer import batch_camera, build_init_mesh

    params = model.init(jax.random.PRNGKey(0), b0["image"], batch_camera(b0),
                        build_init_mesh(cfg, cfg.batch_size))["params"]
    indices = np.arange(7)  # 7 % 4 != 0 → one full batch + remainder of 3
    res = evaluate(params, model, cfg, tiny_dataset, indices,
                   eval_config=EvalConfig(batch_size=4, eval_points=128),
                   dump_meshes_to=str(tmp_path / "dump"))
    assert res["num_samples"] == 7
    assert np.isfinite(res["mean_chamfer"])
    # qualitative artifacts: .obj dumps + input|pred|GT render grid
    assert os.path.exists(str(tmp_path / "dump" / "sample00.obj"))
    assert os.path.exists(str(tmp_path / "dump" / "grid.png"))


def test_dryrun_multichip_8():
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_dryrun_multichip_driver_env():
    """Round-1 regression (VERDICT Weak #1): the driver runs
    ``python __graft_entry__.py`` in a FRESH process where sitecustomize has
    pinned JAX_PLATFORMS=axon — the in-suite test above never exercises that
    path because conftest forces CPU first.  The entry must apply its CPU
    override before anything initializes the pinned backend."""
    import subprocess

    env = dict(os.environ)
    # undo conftest's in-process additions; keep the sitecustomize pin
    env.pop("XLA_FLAGS", None)
    env.setdefault("JAX_PLATFORMS", "axon")
    res = subprocess.run(
        [sys.executable, os.path.join("/root/repo", "__graft_entry__.py")],
        env=env, capture_output=True, text=True, timeout=900)
    assert res.returncode == 0, f"driver entry failed:\n{res.stderr[-2000:]}"
    assert "ok" in res.stdout, res.stdout


def test_entry_compiles():
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    fn, example_args = ge.entry()
    out = jax.jit(fn)(*example_args)
    jax.block_until_ready(out)
    assert np.all(np.isfinite(np.asarray(out[0])))


def test_resume_restores_step(tiny_dataset, tmp_path):
    """Checkpoint/resume (SURVEY.md §5): params+opt+step roundtrip."""
    cfg = _tiny_train_config(tmp_path, epochs=1)
    out1 = train_geometrics(cfg, dataset=tiny_dataset, max_steps=1)
    out2 = train_geometrics(cfg, dataset=tiny_dataset, max_steps=2)
    # second run resumed at step 1 and took exactly one more step
    import orbax.checkpoint as _  # noqa
    from geometrics_tpu.utils.checkpoint import Checkpointer

    ck = Checkpointer(str(tmp_path / "run"))
    assert ck.latest_step() == 2


def test_init_obj_asset(tmp_path):
    """Bundled .obj init mesh loads identically to the generated icosphere."""
    import jax.numpy as jnp

    from geometrics_tpu.core.mesh import icosphere_np, save_obj_np
    from geometrics_tpu.train.trainer import build_init_mesh

    cfg = _tiny_train_config(tmp_path)
    v, f = icosphere_np(1, radius=cfg.mesh.init_radius)
    p = str(tmp_path / "sphere.obj")
    save_obj_np(p, v, f)
    cfg2 = TrainConfig(**{**cfg.__dict__,
                          "mesh": MeshBudget(subdivisions=1, v_max=64,
                                             f_max=160, init_obj=p)})
    a = build_init_mesh(cfg, 2)
    b = build_init_mesh(cfg2, 2)
    np.testing.assert_allclose(np.asarray(a.verts), np.asarray(b.verts),
                               atol=1e-5)
    np.testing.assert_array_equal(np.asarray(a.faces), np.asarray(b.faces))


def test_epoch_mode_trains(tiny_dataset, tmp_path):
    """Device-resident epoch dispatch (steps_per_call>1) end-to-end."""
    cfg = _tiny_train_config(
        tmp_path, checkpoint_dir=str(tmp_path / "em"),
        batch_size=2, epochs=2, steps_per_call=4, resume=False,
        lr_schedule="cosine", eval_every_epochs=2, eval_batch_size=2,
        test_fraction=0.5)
    out = train_geometrics(cfg, dataset=tiny_dataset)
    m = out["metrics"]
    assert np.isfinite(m["total"]) and m["verts_in_use"] > 0
    assert out["eval"] and np.isfinite(out["eval"]["mean_chamfer"])


def test_validate_envelope_clamps_on_tpu_only():
    """Configs measured to crash the remote TPU worker are clamped on TPU
    backends and left alone on CPU (VERDICT r2 weak #3)."""
    import dataclasses
    import warnings

    from geometrics_tpu.train.config import (
        MeshBudget, TrainConfig, validate_envelope)

    risky = TrainConfig(mesh=MeshBudget(v_max=1152, f_max=2304),
                        batch_size=32, steps_per_call=50)
    # CPU: untouched (no remote worker to protect)
    assert validate_envelope(risky, "cpu") is risky
    # TPU: clamped to the proven envelope, with a warning
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        safe = validate_envelope(risky, "tpu")
    assert safe.batch_size == 16 and safe.steps_per_call == 20
    assert any("envelope" in str(x.message) for x in w)
    # explicit override is honored
    probe = dataclasses.replace(risky, ignore_envelope=True)
    assert validate_envelope(probe, "tpu") is probe
    # small budgets have never crashed: untouched at any batch/k
    small = TrainConfig(mesh=MeshBudget(v_max=384, f_max=960),
                        batch_size=32, steps_per_call=60)
    assert validate_envelope(small, "axon") is small


def test_validate_envelope_program_size(tmp_path, monkeypatch):
    """A program bigger than every surviving probe (paperres_xl: same v_max,
    wider hidden) gets steps_per_call capped at 10 until record_probe proves
    it (VERDICT r3 #5 — the old v_max-only rule passed xl untested)."""
    import dataclasses
    import warnings

    from geometrics_tpu.train import config as cfgmod
    from geometrics_tpu.train.config import (
        MeshBudget, ModelConfig, TrainConfig, record_probe, validate_envelope)

    monkeypatch.setattr(cfgmod, "_PROBE_FILE",
                        str(tmp_path / "probes.json"))
    xl = TrainConfig(model=ModelConfig(hidden=256, carried_dim=256),
                     mesh=MeshBudget(v_max=2560, f_max=6144),
                     batch_size=16, steps_per_call=20)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        capped = validate_envelope(xl, "axon")
    assert capped.steps_per_call == 10
    assert any("probe" in str(x.message) for x in w)
    # paperres itself (hidden 192) is a surviving probe: untouched
    pp_cfg = dataclasses.replace(
        xl, model=dataclasses.replace(xl.model, hidden=192, carried_dim=192))
    assert validate_envelope(pp_cfg, "axon") is pp_cfg
    # a recorded surviving probe at the xl score lifts the cap
    record_probe(dataclasses.replace(xl, ignore_envelope=True),
                 name="paperres_xl", steps_survived=120)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        assert validate_envelope(xl, "axon").steps_per_call == 20
    # ...but a 120-step probe admitting a 50-epoch run is a THIN proof and
    # must say so (round-4 verdict #5: the registry couldn't tell a 2-minute
    # smoke from a completed schedule)
    assert any("thin" in str(x.message) for x in w)
    # a production-length surviving span silences the thin-probe warning
    record_probe(dataclasses.replace(xl, ignore_envelope=True),
                 name="paperres_xl_long", steps_survived=10_000)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        assert validate_envelope(xl, "axon").steps_per_call == 20
    assert not any("thin" in str(x.message) for x in w)


def test_cached_eval_matches_host_fed(tiny_dataset, tmp_path):
    """evaluate_cached must reproduce evaluate() exactly: same per-batch
    math, same PRNG chain, same remainder coverage, same aggregation.

    Images are pre-quantized to the device cache's uint8 storage so both
    paths see bit-identical inputs."""
    from geometrics_tpu.train.config import EvalConfig
    from geometrics_tpu.train.trainer import (
        batch_camera, build_init_mesh, build_model, evaluate, evaluate_cached)

    class QuantizedImages:
        """Dataset adapter matching DeviceDataCache's uint8 image packing."""

        def __init__(self, ds):
            self.ds = ds

        def __len__(self):
            return len(self.ds)

        def class_of(self, i):
            return self.ds.class_of(i)

        def get(self, i):
            s = dict(self.ds.get(i))
            img = np.clip(np.rint(s["image"] * 255.0), 0, 255)
            s["image"] = (img / 255.0).astype(np.float32)
            return s

    ds = QuantizedImages(tiny_dataset)
    config = _tiny_train_config(tmp_path)
    model = build_model(config)
    init_mesh = build_init_mesh(config, 1)
    s0 = ds.get(0)
    b0 = {k: jnp.asarray(v)[None] for k, v in s0.items()}
    params = model.init(jax.random.PRNGKey(0), b0["image"], batch_camera(b0),
                        init_mesh)["params"]

    # 7 indices with batch 3 → two full batches + remainder of 1
    indices = np.arange(7)
    ecfg = EvalConfig(batch_size=3, eval_points=128)
    ref = evaluate(params, model, config, ds, indices, eval_config=ecfg)
    fast = evaluate_cached(params, model, config, ds, indices,
                           eval_config=ecfg, batches_per_dispatch=2)
    assert ref["num_samples"] == fast["num_samples"] == 7
    for k in ref:
        if k in ("per_class", "num_samples"):
            continue
        assert abs(ref[k] - fast[k]) < 1e-5, (k, ref[k], fast[k])
    assert set(ref["per_class"]) == set(fast["per_class"])
    for cls in ref["per_class"]:
        for k in ref["per_class"][cls]:
            assert abs(ref["per_class"][cls][k]
                       - fast["per_class"][cls][k]) < 1e-5, (cls, k)


def test_ema_epoch_mode_tracks_and_resumes(tiny_dataset, tmp_path):
    """EMA (TrainConfig.ema_decay>0): the Polyak average is carried through
    the epoch scan, snapshotted as an "ema" tree, preferred by eval tooling,
    and seeded from params when resuming a pre-EMA checkpoint."""
    from geometrics_tpu.utils.checkpoint import Checkpointer

    # leg 1: pre-EMA run writes a checkpoint without an "ema" tree
    cfg0 = _tiny_train_config(
        tmp_path, checkpoint_dir=str(tmp_path / "ema"),
        batch_size=2, epochs=1, steps_per_call=2, save_every_epochs=1,
        eval_every_epochs=100, test_fraction=0.5)
    train_geometrics(cfg0, dataset=tiny_dataset)
    raw0 = Checkpointer(cfg0.checkpoint_dir).restore_raw()
    assert "ema" not in raw0

    # leg 2: resume the same dir with EMA on — seeds from restored params
    cfg = TrainConfig(**{**cfg0.__dict__, "ema_decay": 0.9, "epochs": 2})
    out = train_geometrics(cfg, dataset=tiny_dataset)
    assert out["ema"] is not None
    p = jax.tree.leaves(jax.device_get(out["params"]))
    e = jax.tree.leaves(jax.device_get(out["ema"]))
    # the average lags the raw params but stays in the same neighborhood
    diffs = [float(np.max(np.abs(a - b))) for a, b in zip(p, e)]
    assert max(diffs) > 0.0
    assert all(np.isfinite(a).all() for a in e)
    raw = Checkpointer(cfg.checkpoint_dir).restore_raw()
    assert "ema" in raw

    # leg 3: resume an EMA checkpoint with EMA still on (full roundtrip)
    cfg3 = TrainConfig(**{**cfg.__dict__, "epochs": 3})
    out3 = train_geometrics(cfg3, dataset=tiny_dataset)
    assert out3["ema"] is not None

    # leg 4 (ADVICE r3): resume the EMA-trained dir with ema_decay=0 — the
    # surplus "ema" tree must be tolerated (dropped), NOT fall through to a
    # silent fresh start that discards the run's progress
    step_before = Checkpointer(cfg3.checkpoint_dir).latest_step()
    cfg4 = TrainConfig(**{**cfg3.__dict__, "ema_decay": 0.0, "epochs": 4})
    out4 = train_geometrics(cfg4, dataset=tiny_dataset)
    assert out4["ema"] is None
    # progress preserved: the new latest step strictly advances leg 3's
    assert Checkpointer(cfg4.checkpoint_dir).latest_step() > step_before
