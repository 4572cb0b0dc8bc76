"""On-chip proof that the Pallas kernels dispatch COMPILED on the relay TPU.

Round-3 verdict: `jax.default_backend()` on the driver's tunneled chip is
"axon", and the old `== "tpu"` string compares meant (a) the fused-Chamfer
dispatch always fell back to lax in production, and (b) `interpret=None`
resolved to True, so any direct Pallas call timed the interpreter.  This
script runs on the chip and proves the fix end to end:

  1. `is_tpu()` is True and the dispatch layer picks the fused kernels;
  2. the jitted dispatched Chamfer's compiled HLO contains the Mosaic
     custom-call (i.e. a COMPILED Pallas kernel, not interpret mode);
  3. the compiled kernels match the lax oracles numerically;
  4. fused vs lax timings at the flagship (B=32, 2048x2048) and paperres
     (B=16, 4096x4096) shapes, fwd and fwd+bwd;
  5. the same for the SpMM aggregation kernel vs the dense-A lax path at
     V=1152 and V=2560 (the shoot-out's "pallas" column, compiled this
     time).

Emits JSON lines; run:  python experiments/kernel_proof.py
Local smoke (interpret kernels, no HLO assert):  ... --cpu
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


def emit(**kw) -> None:
    print(json.dumps(kw), flush=True)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--small", action="store_true",
                   help="tiny shapes (CPU interpret-mode smoke)")
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--warmup", type=int, default=3)
    args = p.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from geometrics_tpu.core.chamfer import chamfer_distance as chamfer_lax
    from geometrics_tpu.ops import chamfer as chamfer_dispatched
    from geometrics_tpu.ops import is_tpu
    from geometrics_tpu.ops.chamfer_pallas import chamfer_distance_fused

    on_tpu = is_tpu()
    dev = jax.devices()[0]
    emit(check="backend", platform=jax.default_backend(),
         device_kind=str(getattr(dev, "device_kind", "?")), is_tpu=on_tpu)
    if not args.cpu:
        assert on_tpu, ("is_tpu() is False on the hardware path — the "
                        "dispatch fix regressed")

    # ---- 1+2: the dispatched op lowers to a compiled Mosaic custom-call --
    r = np.random.default_rng(0)
    b0, n0 = (2, 256) if args.small else (32, 2048)
    x32 = jnp.asarray(r.normal(size=(b0, n0, 3)).astype(np.float32) * 0.4)
    y32 = jnp.asarray(r.normal(size=(b0, n0, 3)).astype(np.float32) * 0.4)
    jitted = jax.jit(chamfer_dispatched)
    hlo = jitted.lower(x32, y32).compile().as_text()
    has_mosaic = ("tpu_custom_call" in hlo) or ("custom-call" in hlo and
                                               "osaic" in hlo)
    emit(check="hlo_custom_call", compiled_pallas=bool(has_mosaic),
         hlo_bytes=len(hlo))
    if not args.cpu:
        assert has_mosaic, ("dispatched chamfer compiled WITHOUT a Pallas "
                            "custom-call — still on the lax path")

    # ---- 3: numeric equivalence, compiled kernel vs lax oracle -----------
    fused_v = jax.device_get(jitted(x32, y32))
    lax_v = jax.device_get(jax.jit(chamfer_lax)(x32, y32))
    max_rel = float(np.max(np.abs(fused_v - lax_v) /
                           np.maximum(np.abs(lax_v), 1e-12)))
    emit(check="chamfer_equiv_flagship", max_rel_err=max_rel,
         fused_mean=float(fused_v.mean()), lax_mean=float(lax_v.mean()))
    assert max_rel < 1e-4, f"fused/lax mismatch: {max_rel}"

    # grads too (custom VJP vs autodiff-through-lax)
    gf = jax.jit(jax.grad(lambda a, b: chamfer_distance_fused(a, b).sum()))
    gl = jax.jit(jax.grad(lambda a, b: chamfer_lax(a, b).sum()))
    gfv = jax.device_get(gf(x32, y32))
    glv = jax.device_get(gl(x32, y32))
    gerr = float(np.max(np.abs(gfv - glv)))
    emit(check="chamfer_grad_equiv", max_abs_err=gerr)
    assert gerr < 1e-3, f"fused/lax grad mismatch: {gerr}"

    # ---- 4: fused vs lax timings -----------------------------------------
    shapes = ([("tiny_b2_256", 2, 256)] if args.small else
              [("flagship_b32_2048", 32, 2048), ("paperres_b16_4096", 16, 4096)])
    jl = jax.jit(chamfer_lax)
    jf = jax.jit(chamfer_distance_fused)
    for name, b, n in shapes:
        xs = jnp.asarray(r.normal(size=(b, n, 3)).astype(np.float32) * 0.4)
        ys = jnp.asarray(r.normal(size=(b, n, 3)).astype(np.float32) * 0.4)
        t_f = timed(jf, (xs, ys), args.steps, args.warmup)
        t_l = timed(jl, (xs, ys), args.steps, args.warmup)
        gfj = jax.jit(jax.grad(lambda a, b_: chamfer_distance_fused(a, b_).sum()))
        glj = jax.jit(jax.grad(lambda a, b_: chamfer_lax(a, b_).sum()))
        tg_f = timed(gfj, (xs, ys), args.steps, args.warmup)
        tg_l = timed(glj, (xs, ys), args.steps, args.warmup)
        emit(check="chamfer_time", shape=name, fused_fwd_ms=round(t_f, 3),
             lax_fwd_ms=round(t_l, 3), fused_grad_ms=round(tg_f, 3),
             lax_grad_ms=round(tg_l, 3))

    # ---- 5: SpMM kernel (compiled) vs dense-A lax path -------------------
    from geometrics_tpu.core.adjacency import (
        aggregate_neighbors_dense, normalized_adjacency_dense_batched)
    from geometrics_tpu.core.mesh import icosphere_np, make_mesh_buffer
    from geometrics_tpu.ops.spmm_pallas import (
        adjacency_counts_batched, spmm_mean_batched)

    spmm_cases = (((256, 512, 2),) if args.small else
                  ((1152, 2304, 3), (2560, 5120, 3)))
    bs = 2 if args.small else 16
    for v_max, f_max, sub in spmm_cases:
        v, f = icosphere_np(sub)
        mesh = make_mesh_buffer(v, f, v_max=v_max, f_max=f_max, batch_size=bs)
        feats = jnp.asarray(
            r.normal(size=(bs, v_max, 192)).astype(np.float32))
        # Both paths prebuild their adjacency once per deformation block and
        # reuse it across the block's GCN layers, so the fair PER-LAYER
        # comparison preloads both (counts for the kernel, normalized Â for
        # the lax matmul); the one-per-block build costs are timed separately.
        jc = jax.jit(adjacency_counts_batched, static_argnums=2)
        jb = jax.jit(normalized_adjacency_dense_batched, static_argnums=2)
        counts = jc(mesh.faces, mesh.face_mask, v_max)
        adj = jb(mesh.faces, mesh.face_mask, v_max)
        jp = jax.jit(spmm_mean_batched)
        jd = jax.jit(aggregate_neighbors_dense)
        out_p = jax.device_get(jp(counts, feats))
        out_d = jax.device_get(jd(feats, adj))

        # Accuracy vs an exact float64 oracle: the kernel matmuls exact 0/1
        # values and divides by exact degrees, while the dense path's 1/deg
        # is baked into Â before a (TPU default-precision) matmul — comparing
        # the two against EACH OTHER just measures the dense path's rounding
        # (round-4 finding: 3.9e-3 on chip, bf16-scale, both outputs valid).
        cnp = np.asarray(jax.device_get(counts), dtype=np.float64)
        a64 = np.minimum(cnp, 1.0)
        deg = np.maximum(a64.sum(axis=-1, keepdims=True), 1.0)
        f64 = np.asarray(jax.device_get(feats), dtype=np.float64)
        oracle = a64 @ f64 / deg
        err_p = float(np.max(np.abs(out_p - oracle)))
        err_d = float(np.max(np.abs(out_d - oracle)))

        t_p = timed(jp, (counts, feats), args.steps, args.warmup)
        t_d = timed(jd, (feats, adj), args.steps, args.warmup)
        gp = jax.jit(jax.grad(lambda f_, c: spmm_mean_batched(c, f_).sum()))
        gd = jax.jit(jax.grad(lambda f_, a: aggregate_neighbors_dense(f_, a).sum()))
        tg_p = timed(gp, (feats, counts), args.steps, args.warmup)
        tg_d = timed(gd, (feats, adj), args.steps, args.warmup)
        t_build_p = timed(lambda f_, m: jc(f_, m, v_max),
                          (mesh.faces, mesh.face_mask), args.steps, args.warmup)
        t_build_d = timed(lambda f_, m: jb(f_, m, v_max),
                          (mesh.faces, mesh.face_mask), args.steps, args.warmup)
        hlo_s = jp.lower(counts, feats).compile().as_text()
        spmm_compiled = ("tpu_custom_call" in hlo_s) or ("osaic" in hlo_s)
        emit(check="spmm", v_max=v_max,
             err_pallas_vs_f64=err_p, err_dense_vs_f64=err_d,
             pallas_ms=round(t_p, 3), dense_lax_ms=round(t_d, 3),
             pallas_grad_ms=round(tg_p, 3), dense_grad_ms=round(tg_d, 3),
             build_counts_ms=round(t_build_p, 3),
             build_dense_ms=round(t_build_d, 3),
             compiled_pallas=bool(spmm_compiled))
        assert err_p < 2e-2 and err_d < 2e-2, \
            f"spmm accuracy vs f64 oracle at v_max={v_max}: " \
            f"pallas {err_p}, dense {err_d}"

    emit(check="done", ok=True)


if __name__ == "__main__":
    main()
