"""Data layer: all 13 synthetic classes generate, prep/loader roundtrip,
device cache gather, render/camera consistency (SURVEY.md §2.1 #1)."""

import os

import numpy as np
import pytest

from geometrics_tpu.data import (
    BatchIterator,
    CLASS_NAMES,
    PreparedDataset,
    SyntheticConfig,
    SyntheticShapeDataset,
    generate_shape,
    train_test_split,
)
from geometrics_tpu.data.device_cache import DeviceDataCache
from geometrics_tpu.data.prep import prepare_dataset


def test_all_13_classes_generate():
    for c in range(13):
        verts, faces = generate_shape(c, 0, seed=0, subdivisions=1)
        assert verts.shape == (42, 3) and faces.shape == (80, 3)
        assert np.isfinite(verts).all()
        r = np.linalg.norm(verts, axis=1)
        # unit-diameter ShapeNet normalization (max radius 0.5)
        assert 0.45 < r.max() <= 0.51, CLASS_NAMES[c]
        # legacy round-1 scale still reproducible
        lv, _ = generate_shape(c, 0, seed=0, subdivisions=1, norm_radius=0.9)
        assert abs(np.linalg.norm(lv, axis=1).max() - 0.9) < 0.01


def test_render_camera_consistency():
    """Projected GT vertices must land on rendered (non-background) pixels."""
    import jax.numpy as jnp

    from geometrics_tpu.models import Camera, project_vertices

    ds = SyntheticShapeDataset(SyntheticConfig(
        num_classes=13, models_per_class=1, gt_points=64, subdivisions=2,
        voxels=False))
    s = ds.get(5)
    img = s["image"]
    cam = Camera(jnp.array([s["azimuth"]]), jnp.array([s["elevation"]]),
                 jnp.array([s["distance"]]))
    uv, depth = project_vertices(jnp.asarray(s["gt_verts"])[None], cam, 137)
    uv = np.asarray(uv[0])
    assert float(np.asarray(depth).min()) > 0
    inb = ((uv[:, 0] >= 0) & (uv[:, 0] < 137)
           & (uv[:, 1] >= 0) & (uv[:, 1] < 137))
    assert inb.mean() > 0.99
    px = img[np.clip(uv[inb, 1].astype(int), 0, 136),
             np.clip(uv[inb, 0].astype(int), 0, 136), 0]
    # most projected verts hit the rendered silhouette (not white background);
    # back-facing verts at the silhouette rim can miss by a pixel
    assert (px < 0.99).mean() > 0.85


def test_prep_and_prepared_roundtrip(tmp_path):
    cfg = SyntheticConfig(num_classes=2, models_per_class=4, gt_points=64,
                          image_size=32, voxel_res=16, subdivisions=1)
    stats = prepare_dataset(str(tmp_path), cfg, test_fraction=0.25,
                            verbose=False)
    assert stats["train"] == 6 and stats["test"] == 2
    ds = PreparedDataset(str(tmp_path), "train")
    assert len(ds) == 6
    s = ds.get(0)
    direct = SyntheticShapeDataset(cfg).get(0)
    np.testing.assert_allclose(s["gt_points"], direct["gt_points"])
    np.testing.assert_array_equal(s["gt_faces"], direct["gt_faces"])
    # idempotent re-run writes nothing
    stats2 = prepare_dataset(str(tmp_path), cfg, test_fraction=0.25,
                             verbose=False)
    assert stats2["written"] == 0


def test_device_cache_gather_matches_host():
    import jax
    import jax.numpy as jnp

    ds = SyntheticShapeDataset(SyntheticConfig(
        num_classes=1, models_per_class=4, gt_points=32, image_size=16,
        subdivisions=0, voxels=False, render=False))
    cache = DeviceDataCache(ds, [0, 1, 2, 3], ["gt_points", "azimuth"])
    idx = jnp.asarray(np.array([2, 0], np.int32))
    batch = jax.jit(lambda a, i: DeviceDataCache.gather(a, i))(
        cache.arrays, idx)
    np.testing.assert_allclose(np.asarray(batch["gt_points"][0]),
                               ds.get(2)["gt_points"])
    np.testing.assert_allclose(np.asarray(batch["gt_points"][1]),
                               ds.get(0)["gt_points"])
    assert cache.nbytes() > 0


def test_batch_iterator_prefetch_and_split():
    ds = SyntheticShapeDataset(SyntheticConfig(
        num_classes=2, models_per_class=4, gt_points=16, subdivisions=0,
        render=False, voxels=False))
    tr, te = train_test_split(ds, 0.25)
    assert len(tr) == 6 and len(te) == 2
    it = BatchIterator(ds, 3, indices=tr, prefetch=2, seed=1)
    batches = list(it)
    assert len(batches) == 2
    assert batches[0]["gt_points"].shape == (3, 16, 3)
    # shuffling differs between epochs
    b2 = list(it)
    assert not all((batches[i]["model_id"] == b2[i]["model_id"]).all()
                   for i in range(2))


def test_multiview_dataset_split():
    """views_per_model>1: index space, per-model cameras, leak-free split."""
    cfg = SyntheticConfig(num_classes=2, models_per_class=3,
                          views_per_model=4, gt_points=16, subdivisions=0,
                          render=False, voxels=False)
    ds = SyntheticShapeDataset(cfg)
    assert len(ds) == 2 * 3 * 4
    # same model, different views: identical shape, different cameras
    a, b = ds.get(0), ds.get(1)
    np.testing.assert_array_equal(a["gt_verts"], b["gt_verts"])
    assert a["azimuth"] != b["azimuth"]
    # different models differ
    c = ds.get(4)
    assert not np.allclose(a["gt_verts"], c["gt_verts"])
    tr, te = train_test_split(ds, test_fraction=0.34)
    assert len(tr) + len(te) == len(ds)
    # no model appears on both sides
    def model_key(i):
        w = i % (3 * 4)
        return (ds.class_of(i), w // 4)
    assert not ({model_key(i) for i in tr} & {model_key(i) for i in te})


def test_prepared_tree_drives_full_pipeline(tmp_path, monkeypatch):
    """Real-ShapeNet drop-in rehearsal (VERDICT round-1 Next #9): prep a
    multi-view tree, then run experiments/run_full.py's main() against it —
    the exact one-command path a real preprocessed ShapeNet tree would use."""
    import json
    import sys

    from geometrics_tpu.data.prep import prepare_dataset
    from geometrics_tpu.train.config import MeshBudget, ModelConfig, TrainConfig

    tree = str(tmp_path / "tree")
    prepare_dataset(tree, SyntheticConfig(
        num_classes=2, models_per_class=4, views_per_model=2, gt_points=256,
        image_size=32, subdivisions=1, voxels=False), test_fraction=0.25,
        verbose=False)

    def tiny_full(run_dir, ae_dir="unused"):
        return TrainConfig(
            model=ModelConfig(image_size=32, hidden=16, block_depth=1,
                              carried_dim=8, cnn_widths=(4, 8),
                              splits_per_round=4),
            mesh=MeshBudget(subdivisions=1, v_max=64, f_max=160),
            batch_size=4, surface_samples=128, gt_points=128, epochs=1,
            num_classes=2, models_per_class=4, use_fused_chamfer=False,
            log_every=1000, checkpoint_dir=run_dir)

    import geometrics_tpu.train.presets as presets

    monkeypatch.setattr(presets, "full_config", tiny_full)
    sys.path.insert(0, "experiments")
    import run_full

    run_dir = str(tmp_path / "run")
    monkeypatch.setattr(sys, "argv", [
        "run_full.py", "--run_dir", run_dir, "--data_root", tree,
        "--epochs", "1", "--eval_every", "1", "--with_latent", "false"])
    run_full.main()
    with open(tmp_path / "run" / "eval.json") as fh:
        ev = json.load(fh)
    assert ev["num_samples"] == 4  # 2 classes × 1 test model × 2 views
    assert np.isfinite(ev["mean_chamfer"])
