"""Golden-math parity vs independent torch-CPU oracles (SURVEY.md §4.1).

The reference implementation class is plain torch tensor ops; these tests
re-derive its math in torch and assert the JAX implementations match —
the substitute for output-matching against the unmountable reference repo.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from geometrics_tpu.core.chamfer import chamfer_distance
from geometrics_tpu.core.losses import edge_length_loss, laplacian_loss
from geometrics_tpu.core.mesh import icosphere_np, make_mesh_buffer
from geometrics_tpu.core.sampling import sample_surface


def test_chamfer_matches_torch_oracle():
    r = np.random.default_rng(0)
    x = r.normal(size=(128, 3)).astype(np.float32)
    y = r.normal(size=(200, 3)).astype(np.float32)
    got = float(chamfer_distance(jnp.asarray(x)[None], jnp.asarray(y)[None])[0])

    tx, ty = torch.from_numpy(x), torch.from_numpy(y)
    d = torch.cdist(tx.double(), ty.double()) ** 2  # reference-style full matrix
    want = float(d.min(1).values.mean() + d.min(0).values.mean())
    assert abs(got - want) < 1e-5


def test_chamfer_grad_matches_torch_oracle():
    r = np.random.default_rng(1)
    x = r.normal(size=(64, 3)).astype(np.float32)
    y = r.normal(size=(96, 3)).astype(np.float32)
    gx = jax.grad(lambda a: chamfer_distance(a[None], jnp.asarray(y)[None])[0])(
        jnp.asarray(x))

    tx = torch.from_numpy(x).requires_grad_(True)
    ty = torch.from_numpy(y)
    d = torch.cdist(tx, ty) ** 2
    loss = d.min(1).values.mean() + d.min(0).values.mean()
    loss.backward()
    np.testing.assert_allclose(np.asarray(gx), tx.grad.numpy(),
                               rtol=1e-4, atol=1e-5)


def test_regularizers_match_torch_oracle():
    verts_np, faces_np = icosphere_np(1)
    mesh = make_mesh_buffer(verts_np, faces_np, 48, 96, 1)
    # perturb so the losses are non-trivial
    r = np.random.default_rng(2)
    v = (verts_np + 0.1 * r.normal(size=verts_np.shape)).astype(np.float32)
    pv = np.zeros((48, 3), np.float32)
    pv[:42] = v
    mesh = mesh.replace(verts=jnp.asarray(pv)[None])

    got_edge = float(edge_length_loss(mesh.verts, mesh.faces, mesh.face_mask)[0])
    got_lap = float(laplacian_loss(mesh.verts, mesh.faces, mesh.face_mask,
                                   mesh.vert_mask)[0])

    tv = torch.from_numpy(v)
    tf = torch.from_numpy(faces_np.astype(np.int64))
    # reference-style: mean squared length over the directed-edge multiset
    edges = torch.cat([tf[:, [0, 1]], tf[:, [1, 0]], tf[:, [1, 2]],
                       tf[:, [2, 1]], tf[:, [2, 0]], tf[:, [0, 2]]])
    want_edge = ((tv[edges[:, 0]] - tv[edges[:, 1]]) ** 2).sum(1).mean().item()
    assert abs(got_edge - want_edge) < 1e-5

    # dense row-normalized adjacency Laplacian
    adj = torch.zeros(42, 42)
    adj[edges[:, 0], edges[:, 1]] = 1.0
    adj = adj / adj.sum(1, keepdim=True)
    want_lap = ((tv - adj @ tv) ** 2).sum(1).mean().item()
    assert abs(got_lap - want_lap) < 1e-5


def test_sampling_barycentric_matches_torch_formula():
    """Same RNG draws through the (1−√r₁, √r₁(1−r₂), √r₁r₂) combine."""
    verts_np, faces_np = icosphere_np(1)
    mesh = make_mesh_buffer(verts_np, faces_np, 48, 96, 1)
    pts = sample_surface(jax.random.PRNGKey(0), mesh.verts[0], mesh.faces[0],
                         mesh.face_mask[0], 512)
    pts = np.asarray(pts)
    # every sample lies inside its face's plane → on the unit-ish sphere hull:
    # barycentric combos of sphere verts have norm in [min cos, 1]
    n = np.linalg.norm(pts, axis=1)
    assert n.max() <= 1.0 + 1e-5 and n.min() > 0.8

    # torch oracle for the combine itself on fixed draws
    tv = torch.from_numpy(verts_np)
    tf = torch.from_numpy(faces_np.astype(np.int64))
    r1 = torch.rand(1000, 1, generator=torch.Generator().manual_seed(0))
    r2 = torch.rand(1000, 1, generator=torch.Generator().manual_seed(1))
    idx = torch.randint(0, len(tf), (1000,),
                        generator=torch.Generator().manual_seed(2))
    s = torch.sqrt(r1)
    p_t = ((1 - s) * tv[tf[idx, 0]] + s * (1 - r2) * tv[tf[idx, 1]]
           + s * r2 * tv[tf[idx, 2]])
    # same formula in numpy from the same draws
    s_np, r2_np = s.numpy(), r2.numpy()
    p_np = ((1 - s_np) * verts_np[faces_np[idx.numpy(), 0]]
            + s_np * (1 - r2_np) * verts_np[faces_np[idx.numpy(), 1]]
            + s_np * r2_np * verts_np[faces_np[idx.numpy(), 2]])
    np.testing.assert_allclose(p_t.numpy(), p_np, atol=1e-6)
