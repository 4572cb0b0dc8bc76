"""Pallas fused Chamfer vs lax oracle (SURVEY.md §4.2 kernel-equivalence).

Runs the kernel in interpreter mode on CPU.  On real hardware the dispatch
and compiled/interpret decision come from ops._backend.is_tpu(), which is
pinned by the backend-detection tests below (round-3 verdict: the relay's
platform name is "axon", not "tpu", so the old string compares left the
kernels undispatched on chip)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from geometrics_tpu.core.chamfer import chamfer_distance, nearest_sqdists
from geometrics_tpu.ops.chamfer_pallas import (
    chamfer_distance_fused,
    nearest_neighbor_pallas,
)


@pytest.fixture(scope="module")
def pts(rng=None):
    r = np.random.default_rng(7)
    x = jnp.asarray(r.normal(size=(300, 3)).astype(np.float32))
    y = jnp.asarray(r.normal(size=(530, 3)).astype(np.float32))
    ym = jnp.asarray((r.random(530) > 0.2).astype(np.float32))
    xm = jnp.asarray((r.random(300) > 0.2).astype(np.float32))
    return x, y, xm, ym


def test_nearest_matches_lax(pts):
    x, y, xm, ym = pts
    mins, args = nearest_neighbor_pallas(x, y, ym)
    d_lax, _ = nearest_sqdists(x[None], y[None], None, ym[None])
    np.testing.assert_allclose(np.asarray(mins), np.asarray(d_lax[0]),
                               rtol=1e-5, atol=1e-6)
    # argmins must actually achieve the min distance
    d = np.sum((np.asarray(x)[:, None] - np.asarray(y)[None]) ** 2, axis=-1)
    d = d + (1 - np.asarray(ym))[None] * 1e30
    np.testing.assert_allclose(
        d[np.arange(300), np.asarray(args)], np.asarray(mins),
        rtol=1e-5, atol=1e-6)


def test_fused_chamfer_matches_lax(pts):
    x, y, xm, ym = pts
    fused = chamfer_distance_fused(x[None], y[None], xm[None], ym[None])
    lax = chamfer_distance(x[None], y[None], xm[None], ym[None])
    np.testing.assert_allclose(np.asarray(fused), np.asarray(lax),
                               rtol=1e-5, atol=1e-6)


def test_fused_chamfer_grad_matches_lax(pts):
    x, y, xm, ym = pts

    def loss_fused(x_, y_):
        return jnp.sum(chamfer_distance_fused(x_[None], y_[None],
                                              xm[None], ym[None]))

    def loss_lax(x_, y_):
        return jnp.sum(chamfer_distance(x_[None], y_[None],
                                        xm[None], ym[None]))

    gx_f, gy_f = jax.grad(loss_fused, argnums=(0, 1))(x, y)
    gx_l, gy_l = jax.grad(loss_lax, argnums=(0, 1))(x, y)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_l),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gy_f), np.asarray(gy_l),
                               rtol=1e-4, atol=1e-5)


def test_is_tpu_accepts_axon_platform(monkeypatch):
    """Round-3 verdict pin: on the relay jax.default_backend() is "axon" and
    the device kind is opaque — the fused path must still be chosen."""
    import geometrics_tpu.ops as ops
    from geometrics_tpu.ops import _backend

    monkeypatch.setattr(_backend.jax, "default_backend", lambda: "axon")
    monkeypatch.setattr(_backend.jax, "devices",
                        lambda *a, **k: (_ for _ in ()).throw(RuntimeError()))
    assert _backend.is_tpu() is True
    assert ops._on_tpu() is True


def test_nearest_sqdists_uses_lax_even_on_tpu(monkeypatch):
    """Round-4 verdict #4 pin: the fwd-only eval path dispatches the lax
    matmul form on EVERY backend (measured ~2.6x faster than the fused
    kernel forward-only in the on-chip shoot-out); only the fwd+bwd loss
    path (chamfer) keeps the fused kernel on TPU."""
    import geometrics_tpu.ops as ops

    monkeypatch.setattr(ops, "_on_tpu", lambda: True)
    called = {}
    real_lax = ops._nearest_lax

    def fake_lax(*a, **k):
        called["lax"] = True
        return real_lax(*a, **k)

    def fake_fused(*a, **k):  # must never fire from nearest_sqdists
        called["fused"] = True
        raise AssertionError("fused kernel on the fwd-only eval path")

    monkeypatch.setattr(ops, "_nearest_lax", fake_lax)
    monkeypatch.setattr(ops, "nearest_sqdists_fused", fake_fused)
    x = jnp.zeros((1, 8, 3))
    ops.nearest_sqdists(x, x)
    assert called == {"lax": True}


def test_is_tpu_via_device_kind(monkeypatch):
    """Even with an unknown platform name, a TPU device kind wins."""
    from geometrics_tpu.ops import _backend

    class _Dev:
        device_kind = "TPU v5 lite"

    monkeypatch.setattr(_backend.jax, "default_backend", lambda: "weird")
    monkeypatch.setattr(_backend.jax, "devices", lambda *a, **k: [_Dev()])
    assert _backend.is_tpu() is True


def test_is_tpu_false_on_cpu():
    from geometrics_tpu.ops import _backend

    assert _backend.is_tpu() is False  # test env pins CPU (conftest)


def test_interpret_default_follows_is_tpu(monkeypatch):
    """interpret=None must resolve via is_tpu(), not a 'tpu' string compare:
    on the axon relay the kernel must COMPILE (interpret=False).  We assert
    the resolution without launching (a compiled pallas_call can't run on
    CPU) by capturing what pallas_call receives."""
    from geometrics_tpu.ops import _backend, chamfer_pallas

    monkeypatch.setattr(_backend.jax, "default_backend", lambda: "axon")
    monkeypatch.setattr(_backend.jax, "devices",
                        lambda *a, **k: (_ for _ in ()).throw(RuntimeError()))
    seen = {}

    def fake_pallas_call(*a, interpret=None, **k):
        seen["interpret"] = interpret

        def run(*operands):
            raise _Stop()

        return run

    class _Stop(Exception):
        pass

    monkeypatch.setattr(chamfer_pallas.pl, "pallas_call", fake_pallas_call)
    x = jnp.zeros((8, 3))
    with pytest.raises(_Stop):
        nearest_neighbor_pallas(x, x)
    assert seen["interpret"] is False


def test_fused_chamfer_batched_unmasked():
    r = np.random.default_rng(3)
    x = jnp.asarray(r.normal(size=(2, 64, 3)).astype(np.float32))
    y = jnp.asarray(r.normal(size=(2, 96, 3)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(chamfer_distance_fused(x, y)),
        np.asarray(chamfer_distance(x, y)), rtol=1e-5, atol=1e-6)
