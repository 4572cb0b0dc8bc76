"""Reference-equivalent torch-CPU baseline for throughput measurement.

The reference publishes NO throughput numbers (BASELINE.md), so the ">10x
meshes/sec/chip" target needs a measured reference-style baseline.  This is a
faithful re-creation of the reference's training step *shape* (SURVEY.md
§3.3, reconstructed): dense normalized-adjacency GCN blocks, Pixel2Mesh-style
perceptual pooling via grid_sample, a PER-SAMPLE PYTHON LOOP with host-side
adaptive face splitting and adjacency rebuild (the ★ bottleneck), full N×M
Chamfer matrices, Adam — in plain torch tensor ops on CPU, exactly the class
of implementation the reference is.

This module is NOT part of the framework (benchmarks/ only) and is the
"reference CPU/GPU" side of bench.py's vs_baseline ratio.
"""

from __future__ import annotations

import math
import time
from typing import List, Tuple

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


def icosphere(subdivisions: int = 2) -> Tuple[np.ndarray, np.ndarray]:
    from geometrics_tpu.core.mesh import icosphere_np

    return icosphere_np(subdivisions=subdivisions, radius=0.5)


def build_adjacency(faces: np.ndarray, n_verts: int) -> torch.Tensor:
    """Dense row-normalized adjacency (the reference's Â, SURVEY.md §2.1 #2)."""
    adj = np.zeros((n_verts, n_verts), np.float32)
    for a, b, c in faces:
        for i, j in ((a, b), (b, a), (b, c), (c, b), (c, a), (a, c)):
            adj[i, j] = 1.0
    deg = adj.sum(1, keepdims=True)
    return torch.from_numpy(adj / np.maximum(deg, 1.0))


class CNNEncoder(nn.Module):
    def __init__(self, widths=(32, 64, 128, 256)):
        super().__init__()
        stages, prev = [], 3
        for w in widths:
            stages.append(nn.Sequential(
                nn.Conv2d(prev, w, 3, 2, 1), nn.ReLU(),
                nn.Conv2d(w, w, 3, 1, 1), nn.ReLU(),
                nn.Conv2d(w, w, 3, 1, 1), nn.ReLU()))
            prev = w
        self.stages = nn.ModuleList(stages)

    def forward(self, x):
        maps = []
        for s in self.stages:
            x = s(x)
            maps.append(x)
        return maps


class GCNBlock(nn.Module):
    def __init__(self, in_dim, hidden=192, depth=6, out_dim=192):
        super().__init__()
        self.lift_s = nn.Linear(in_dim, hidden)
        self.lift_n = nn.Linear(in_dim, hidden, bias=False)
        self.convs_s = nn.ModuleList(nn.Linear(hidden, hidden) for _ in range(depth))
        self.convs_n = nn.ModuleList(nn.Linear(hidden, hidden, bias=False)
                                     for _ in range(depth))
        self.delta = nn.Linear(hidden, 3)
        nn.init.zeros_(self.delta.weight)
        nn.init.zeros_(self.delta.bias)
        self.feat_s = nn.Linear(hidden, out_dim)
        self.feat_n = nn.Linear(hidden, out_dim, bias=False)

    def forward(self, h, adj):
        h = F.relu(self.lift_s(h) + self.lift_n(adj @ h))
        for cs, cn in zip(self.convs_s, self.convs_n):
            h = F.relu(h + cs(h) + cn(adj @ h))
        return self.delta(h), F.relu(self.feat_s(h) + self.feat_n(adj @ h))


def perceptual_pool(maps: List[torch.Tensor], verts: torch.Tensor,
                    sample_idx: int, image_size: int) -> torch.Tensor:
    # simple fixed camera straight down z (throughput-equivalent work)
    focal = (image_size / 2.0) / math.tan(math.radians(49.134) / 2.0)
    z = verts[:, 2] + 2.2
    u = focal * verts[:, 0] / z
    v = focal * verts[:, 1] / z
    grid = torch.stack([u / (image_size / 2), v / (image_size / 2)], dim=-1)
    grid = grid.view(1, -1, 1, 2)
    feats = [F.grid_sample(m[sample_idx:sample_idx + 1], grid,
                           align_corners=False).squeeze(3).squeeze(0).t()
             for m in maps]
    return torch.cat(feats, dim=1)


def split_faces_host(verts: torch.Tensor, feats: torch.Tensor,
                     faces: np.ndarray, k: int):
    """Reference-style host splitting: score, split 1→3, rebuild adjacency."""
    with torch.no_grad():
        v = verts.detach().numpy()
        v1, v2, v3 = v[faces[:, 0]], v[faces[:, 1]], v[faces[:, 2]]
        n = np.cross(v2 - v1, v3 - v1)
        score = np.linalg.norm(n, axis=1)  # area proxy for curvature score
        top = np.argsort(-score)[:k]
    new_faces = [f for i, f in enumerate(faces) if i not in set(top)]
    nv = verts.shape[0]
    cents, cfeats = [], []
    for t in top:
        a, b, c = faces[t]
        m = nv + len(cents)
        cents.append((verts[a] + verts[b] + verts[c]) / 3.0)
        cfeats.append((feats[a] + feats[b] + feats[c]) / 3.0)
        new_faces += [[a, b, m], [b, c, m], [c, a, m]]
    verts = torch.cat([verts, torch.stack(cents)], dim=0)
    feats = torch.cat([feats, torch.stack(cfeats)], dim=0)
    faces = np.array(new_faces, np.int64)
    adj = build_adjacency(faces, verts.shape[0])
    return verts, feats, faces, adj


def sample_surface(verts: torch.Tensor, faces: np.ndarray, n: int):
    fi = torch.from_numpy(faces)
    v1, v2, v3 = verts[fi[:, 0]], verts[fi[:, 1]], verts[fi[:, 2]]
    area = 0.5 * torch.linalg.norm(torch.cross(v2 - v1, v3 - v1, dim=1), dim=1)
    idx = torch.multinomial(area / area.sum(), n, replacement=True)
    r = torch.rand(n, 2)
    s = torch.sqrt(r[:, :1])
    return ((1 - s) * v1[idx] + s * (1 - r[:, 1:]) * v2[idx]
            + s * r[:, 1:] * v3[idx])


def chamfer(x: torch.Tensor, y: torch.Tensor) -> torch.Tensor:
    d = torch.cdist(x, y) ** 2  # full N×M materialized, as the reference does
    return d.min(1).values.mean() + d.min(0).values.mean()


def run_baseline(batch_size: int = 4, steps: int = 2, warmup: int = 1,
                 n_points: int = 2048, splits_per_round: int = 48,
                 image_size: int = 137) -> float:
    """Returns measured meshes/sec for the reference-style CPU train step."""
    torch.manual_seed(0)
    torch.set_num_threads(torch.get_num_threads())
    verts0, faces0 = icosphere(2)
    adj0 = build_adjacency(faces0, len(verts0))
    v0 = torch.from_numpy(verts0)

    enc = CNNEncoder()
    pool_dim = 32 + 64 + 128 + 256
    blocks = nn.ModuleList([
        GCNBlock(3 + pool_dim, out_dim=192),
        GCNBlock(3 + pool_dim + 192, out_dim=192),
        GCNBlock(3 + pool_dim + 192, out_dim=192),
    ])
    params = list(enc.parameters()) + list(blocks.parameters())
    opt = torch.optim.Adam(params, lr=3e-4)

    images = torch.rand(batch_size, 3, image_size, image_size)
    gt = torch.randn(batch_size, n_points, 3) * 0.4

    times = []
    for step in range(warmup + steps):
        t0 = time.perf_counter()
        opt.zero_grad()
        maps = enc(images)
        total = 0.0
        for s in range(batch_size):          # ★ the per-sample loop
            verts, faces, adj = v0.clone(), faces0.copy(), adj0
            feats = None
            for bi, block in enumerate(blocks):
                pooled = perceptual_pool(maps, verts, s, image_size)
                h = torch.cat([verts, pooled] + ([feats] if feats is not None else []),
                              dim=1)
                delta, feats = block(h, adj)
                verts = verts + delta
                if bi < 2:
                    verts, feats, faces, adj = split_faces_host(
                        verts, feats, faces, splits_per_round)
            pts = sample_surface(verts, faces, n_points)
            lengths = verts[faces[:, 0]] - verts[faces[:, 1]]
            edge = (lengths ** 2).sum(1).mean()
            lap = ((verts - adj @ verts) ** 2).sum(1).mean()
            total = total + chamfer(pts, gt[s]) + 0.15 * edge + 0.1 * lap
        (total / batch_size).backward()
        opt.step()
        dt = time.perf_counter() - t0
        if step >= warmup:
            times.append(dt)
    return batch_size / float(np.mean(times))


if __name__ == "__main__":
    mps = run_baseline()
    print(f"torch-cpu baseline: {mps:.3f} meshes/sec")
