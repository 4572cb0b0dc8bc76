"""Inference API: checkpoint → Predictor → meshes → .obj export."""

import os

import numpy as np
import pytest

from geometrics_tpu.data.synthetic import SyntheticConfig, SyntheticShapeDataset
from geometrics_tpu.train import MeshBudget, ModelConfig, TrainConfig, train_geometrics


def test_predictor_roundtrip(tmp_path):
    ds = SyntheticShapeDataset(SyntheticConfig(
        num_classes=1, models_per_class=8, gt_points=64, image_size=32,
        subdivisions=1, voxels=False))
    cfg = TrainConfig(
        model=ModelConfig(image_size=32, hidden=8, block_depth=1,
                          carried_dim=4, cnn_widths=(4,), splits_per_round=2,
                          scan_layers=True),
        mesh=MeshBudget(subdivisions=1, v_max=48, f_max=96),
        batch_size=4, surface_samples=64, gt_points=64, epochs=1,
        num_classes=1, models_per_class=8, resume=False,
        checkpoint_dir=str(tmp_path / "run"), use_fused_chamfer=False,
        log_every=1000)
    train_geometrics(cfg, dataset=ds, max_steps=1)

    from geometrics_tpu.infer import Predictor

    p = Predictor.from_run_dir(str(tmp_path / "run"), batch_size=2)
    imgs = np.stack([ds.get(i)["image"] for i in range(2)])
    az = np.zeros(2, np.float32)
    el = np.full(2, 0.5, np.float32)
    dist = np.full(2, 2.2, np.float32)
    mesh = p.predict(imgs, az, el, dist)
    assert mesh.verts.shape == (2, 48, 3)
    assert int(mesh.num_verts[0]) >= 42  # splits may have fired

    paths = p.export_objs(mesh, str(tmp_path / "objs"))
    assert len(paths) == 2 and all(os.path.exists(q) for q in paths)
    from geometrics_tpu.core.mesh import load_obj_np

    v, f = load_obj_np(paths[0])
    assert v.shape[0] == int(mesh.num_verts[0])

    # ragged final batch: padded internally, sliced back to 1
    m1 = p.predict(imgs[:1], az[:1], el[:1], dist[:1])
    assert m1.verts.shape[0] == 1
    np.testing.assert_allclose(np.asarray(m1.verts[0]),
                               np.asarray(mesh.verts[0]), atol=1e-5)

    with pytest.raises(ValueError):
        p.predict(np.zeros((3, 32, 32, 3), np.float32), np.zeros(3),
                  np.zeros(3), np.zeros(3))
