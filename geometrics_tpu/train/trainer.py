"""Main GEOMetrics train/eval driver (GEOMetrics.py equivalent, SURVEY.md §3.3).

One jitted SPMD train step over the ('data',) mesh: CNN forward, three
pooling+GCN blocks with masked splits, differentiable sampling, the full
composite loss, backward, Adam — all one XLA program per step.  The
reference's per-sample Python loop (§3.3 ★) is gone by construction.
"""

from __future__ import annotations

import functools
import os
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..core.chamfer import chamfer_distance, f1_score
from ..core.mesh import MeshBuffer, icosphere_np, make_mesh_buffer, save_mesh_buffer_sample
from ..core.sampling import sample_surface_batched
from ..data.loader import BatchIterator, train_test_split
from ..data.synthetic import CLASS_NAMES, SyntheticConfig, SyntheticShapeDataset
from ..models.gcn import MeshEncoder
from ..models.geometrics import GEOMetricsModel
from ..models.perceptual_pooling import Camera
from ..parallel.sharding import make_mesh_for_batch, replicate_tree, shard_batch
from ..utils.checkpoint import Checkpointer
from ..utils.heartbeat import beat
from ..utils.logging import MetricsLogger, trace_annotation
from .config import EvalConfig, TrainConfig, validate_envelope
from .losses import geometrics_loss


def build_model(config: TrainConfig) -> GEOMetricsModel:
    m = config.model
    return GEOMetricsModel(
        image_size=m.image_size, num_blocks=m.num_blocks, hidden=m.hidden,
        block_depth=m.block_depth, carried_dim=m.carried_dim,
        cnn_widths=m.cnn_widths, splits_per_round=m.splits_per_round,
        split_threshold=m.split_threshold, adjacency_mode=m.adjacency_mode,
        scan_layers=m.scan_layers, remat=m.remat,
        dtype=jnp.bfloat16 if m.bfloat16 else None)


def build_init_mesh(config: TrainConfig, batch_size: int) -> MeshBuffer:
    """The init-sphere template (reference: bundled .obj asset, §2.1 #13).

    Generated icosphere by default; ``mesh.init_obj`` loads a bundled .obj
    (assets/init_sphere.obj ships the default sphere in the reference's
    asset form)."""
    if config.mesh.init_obj:
        from ..core.mesh import load_obj_np

        verts, faces = load_obj_np(config.mesh.init_obj)
    else:
        verts, faces = icosphere_np(
            subdivisions=config.mesh.subdivisions,
            radius=config.mesh.init_radius)
    return make_mesh_buffer(
        verts, faces, v_max=config.mesh.v_max, f_max=config.mesh.f_max,
        batch_size=batch_size)


def batch_camera(batch: Dict[str, jax.Array]) -> Camera:
    return Camera(azimuth=batch["azimuth"], elevation=batch["elevation"],
                  distance=batch["distance"])


def gt_mesh_buffer(batch: Dict[str, jax.Array]) -> MeshBuffer:
    """GT mesh graphs arrive dense (fixed topology) → full-mask MeshBuffer."""
    b, v = batch["gt_verts"].shape[:2]
    f = batch["gt_faces"].shape[1]
    return MeshBuffer(
        verts=batch["gt_verts"], faces=batch["gt_faces"],
        vert_mask=jnp.ones((b, v), jnp.float32),
        face_mask=jnp.ones((b, f), jnp.float32))


def make_encode_fn(config: TrainConfig, encoder_params) -> Callable:
    """Frozen MeshEncoder closure for the latent loss (stop-grad on params)."""
    enc = MeshEncoder(hidden=config.encoder_hidden, depth=config.encoder_depth,
                      latent_dim=config.encoder_latent_dim)
    frozen = jax.lax.stop_gradient(encoder_params)

    def encode(verts, faces, face_mask, vert_mask):
        return enc.apply({"params": frozen}, verts, faces, face_mask, vert_mask)

    return encode


def make_train_step(model: GEOMetricsModel, tx: optax.GradientTransformation,
                    config: TrainConfig, encoder_params=None,
                    from_cache: bool = False):
    chamfer_fn = chamfer_distance
    if config.use_fused_chamfer:
        from ..ops import chamfer as fused_chamfer  # lax fallback off-TPU
        chamfer_fn = fused_chamfer
    encode_fn = (make_encode_fn(config, encoder_params)
                 if encoder_params is not None else None)

    def loss_fn(params, batch, init_mesh, key):
        out = model.apply({"params": params}, batch["image"],
                          batch_camera(batch), init_mesh)
        gt_mesh = gt_mesh_buffer(batch) if encode_fn is not None else None
        total, aux = geometrics_loss(
            key, out, batch["gt_points"], config.loss, config.surface_samples,
            encode_fn=encode_fn, gt_mesh=gt_mesh, chamfer_fn=chamfer_fn,
            multi_stage_chamfer=config.multi_stage_chamfer)
        return total, aux

    def _update(params, opt_state, batch, init_mesh, key):
        with trace_annotation("geometrics/train_step"):
            (_, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, batch, init_mesh, key)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
        return params, opt_state, aux

    if from_cache:
        # device-resident data: batch assembled on-device from an index
        # vector (data/device_cache.py) — no per-step host transfer.
        # The cache is DONATED and returned unchanged: the relay terminal
        # charges a large per-dispatch cost for every non-donated GB-scale
        # argument buffer (measured ~10 s/dispatch for a 1.6 GiB cache vs
        # 0.25 s donated-through — aliased outputs reuse buf_ids).  Callers
        # must rebind the returned cache dict every call.
        from ..data.device_cache import DeviceDataCache

        def _cache_update(params, opt_state, data, idx, init_mesh, key):
            batch = DeviceDataCache.gather(data, idx)
            batch["gt_points"] = batch["gt_points"][:, :config.gt_points]
            params, opt_state, aux = _update(params, opt_state, batch,
                                             init_mesh, key)
            return params, opt_state, aux, data

        step = functools.partial(jax.jit, donate_argnums=(0, 1, 2))(
            _cache_update)
    else:
        step = functools.partial(jax.jit, donate_argnums=(0, 1))(_update)

    if config.debug_nan_checks:
        from ..utils.debug import checkify_step

        return checkify_step(step)
    return step


def make_epoch_step(model: GEOMetricsModel, tx: optax.GradientTransformation,
                    config: TrainConfig, n_samples: int,
                    encoder_params=None, steps_per_dispatch: int = 0):
    """One jitted dispatch = one full epoch over the device-resident cache.

    Remote-TPU relays charge a ~seconds round trip for EVERY host↔device
    interaction (uploads, per-buffer fetches).  This variant eliminates all
    per-step traffic: batch indices come from an on-device permutation, RNG
    keys are split on device (the running key is carried in device memory),
    and per-loss scalars come back as ONE stacked array the caller fetches
    only when it wants to log.

    Returns (epoch_fn, aux_keys, k): epoch_fn(params, opt_state, data,
    init_mesh, key) → (params, opt_state, next_key,
    aux_mat [steps, len(aux_keys)], data).  With ``config.ema_decay > 0``
    the signature gains an ``ema`` tree after ``params`` on both sides
    (updated once per inner step, carried through the scan on device).

    ``data`` (the device cache) is DONATED and aliased straight through to
    the last output: the relay terminal charges ~10 s/dispatch for a GB-scale
    non-donated argument, vs ~0.25 s when the buffers are donated and their
    ids reused for the outputs (measured round 2).  Callers must rebind their
    cache reference to the returned dict after every call.
    """
    chamfer_fn = chamfer_distance
    if config.use_fused_chamfer:
        from ..ops import chamfer as fused_chamfer
        chamfer_fn = fused_chamfer
    encode_fn = (make_encode_fn(config, encoder_params)
                 if encoder_params is not None else None)
    from ..data.device_cache import DeviceDataCache

    aux_keys = ["chamfer", "edge", "laplacian", "laplacian_move", "latent",
                "total", "verts_in_use"]
    steps_per_epoch = n_samples // config.batch_size
    # scan length per dispatch: long scans (80+ fwd+bwd steps in one
    # executable) have crashed the remote TPU worker; chunk to K steps and
    # draw each dispatch's batches from a fresh on-device permutation prefix
    k = min(steps_per_dispatch or steps_per_epoch, steps_per_epoch)
    # coverage guard: each dispatch draws k·batch samples from a FRESH
    # permutation, so a dispatch must never need more samples than exist
    # (that would silently truncate every batch group to a subset)
    assert k * config.batch_size <= n_samples, (
        f"steps_per_call ({k}) x batch ({config.batch_size}) exceeds the "
        f"train split ({n_samples} samples)")
    if steps_per_epoch % k:
        print(f"[trainer] note: steps_per_call={k} does not divide "
              f"steps_per_epoch={steps_per_epoch}; an 'epoch' runs "
              f"{-(-steps_per_epoch // k) * k} steps with each dispatch "
              f"drawing a fresh random {k * config.batch_size}-sample subset "
              f"(uniform coverage in expectation)", flush=True)

    def loss_fn(params, batch, init_mesh, key):
        out = model.apply({"params": params}, batch["image"],
                          batch_camera(batch), init_mesh)
        gt_mesh = gt_mesh_buffer(batch) if encode_fn is not None else None
        return geometrics_loss(
            key, out, batch["gt_points"], config.loss, config.surface_samples,
            encode_fn=encode_fn, gt_mesh=gt_mesh, chamfer_fn=chamfer_fn,
            multi_stage_chamfer=config.multi_stage_chamfer)

    ema_d = float(getattr(config, "ema_decay", 0.0))

    def _train_body(p, o, data, idx, init_mesh, sub):
        batch = DeviceDataCache.gather(data, idx)
        batch["gt_points"] = batch["gt_points"][:, :config.gt_points]
        (_, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            p, batch, init_mesh, sub)
        updates, o = tx.update(grads, o, p)
        p = optax.apply_updates(p, updates)
        return p, o, jnp.stack([aux[a] for a in aux_keys])

    if ema_d > 0.0:
        @functools.partial(jax.jit, donate_argnums=(0, 1, 2, 3, 5))
        def epoch_fn(params, ema, opt_state, data, init_mesh, key):
            key, perm_key = jax.random.split(key)
            order = jax.random.permutation(perm_key, n_samples)
            idxs = order[:k * config.batch_size].reshape(k, config.batch_size)

            def body(carry, idx):
                p, e, o, k = carry
                k, sub = jax.random.split(k)
                p, o, row = _train_body(p, o, data, idx, init_mesh, sub)
                e = jax.tree.map(lambda ev, pv: ema_d * ev + (1 - ema_d) * pv,
                                 e, p)
                return (p, e, o, k), row

            (params, ema, opt_state, key), aux_mat = jax.lax.scan(
                body, (params, ema, opt_state, key), idxs)
            return params, ema, opt_state, key, aux_mat, data

        return epoch_fn, aux_keys, k

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2, 4))
    def epoch_fn(params, opt_state, data, init_mesh, key):
        key, perm_key = jax.random.split(key)
        order = jax.random.permutation(perm_key, n_samples)
        idxs = order[:k * config.batch_size].reshape(k, config.batch_size)

        def body(carry, idx):
            p, o, k = carry
            k, sub = jax.random.split(k)
            p, o, row = _train_body(p, o, data, idx, init_mesh, sub)
            return (p, o, k), row

        (params, opt_state, key), aux_mat = jax.lax.scan(
            body, (params, opt_state, key), idxs)
        return params, opt_state, key, aux_mat, data

    return epoch_fn, aux_keys, k


def _eval_batch_metrics(model: GEOMetricsModel, eval_config: EvalConfig,
                        params, batch, init_mesh, key):
    """Shared per-batch eval math (SURVEY.md §3.4): forward (no grad),
    surface sample, Chamfer + F1@τ/2τ.  Used identically by the host-fed
    per-batch path (make_eval_step) and the device-cached scan path
    (evaluate_cached), so both report THE SAME protocol by construction.
    Returns (per-sample metric dict, predicted MeshBuffer)."""
    from ..ops import nearest_sqdists  # fused Pallas on TPU, lax on CPU

    out = model.apply({"params": params}, batch["image"],
                      batch_camera(batch), init_mesh)
    mesh = out.mesh
    pts = sample_surface_batched(
        key, mesh.verts, mesh.faces, mesh.face_mask,
        eval_config.eval_points)
    gt = batch["gt_points"][:, :eval_config.eval_points]
    d_pg, d_gp = nearest_sqdists(pts, gt)
    cham = jnp.mean(d_pg, axis=-1) + jnp.mean(d_gp, axis=-1)

    def f1_at(tau):
        precision = jnp.mean((d_pg < tau).astype(jnp.float32), axis=-1)
        recall = jnp.mean((d_gp < tau).astype(jnp.float32), axis=-1)
        denom = jnp.maximum(precision + recall, 1e-12)
        return jnp.where(denom > 1e-12,
                         2 * precision * recall / denom, 0.0)

    res = {"chamfer": cham,
           "f1_tau": f1_at(eval_config.tau),
           "f1_2tau": f1_at(2 * eval_config.tau),
           "class_id": batch["class_id"]}
    # scale-matched columns only when they differ (data_diameter != 1):
    # at unit diameter they duplicate f1_tau/f1_2tau exactly and would
    # just double the report's noise
    if eval_config.data_diameter != 1.0:
        res["f1_tau_scaled"] = f1_at(eval_config.scale_matched_tau)
        res["f1_2tau_scaled"] = f1_at(2 * eval_config.scale_matched_tau)
    return res, mesh


def make_eval_step(model: GEOMetricsModel, config: TrainConfig,
                   eval_config: EvalConfig):
    """Per-batch eval: forward (no grad), sample, Chamfer + F1@τ + F1@2τ.

    Returns per-sample arrays so the host can aggregate per class
    (SURVEY.md §3.4 protocol).
    """

    @jax.jit
    def step(params, batch, init_mesh, key):
        res, mesh = _eval_batch_metrics(model, eval_config, params, batch,
                                        init_mesh, key)
        return {**res, "mesh": mesh}

    return step


def evaluate(params, model, config: TrainConfig, dataset, indices,
             eval_config: EvalConfig = EvalConfig(), seed: int = 0,
             mesh_devices=None, dump_meshes_to: Optional[str] = None
             ) -> Dict[str, Any]:
    """Full eval pass → mean + per-class Chamfer / F1@τ / F1@2τ.

    ``dump_meshes_to``: directory for qualitative sample-mesh .obj dumps (the
    reference's eyeballing workflow, SURVEY.md §5 metrics/logging)."""
    devmesh = mesh_devices
    if devmesh is None or eval_config.batch_size % devmesh.devices.size:
        # the train mesh only carries over when the eval batch divides it;
        # otherwise params move onto an eval-compatible mesh
        devmesh = make_mesh_for_batch(eval_config.batch_size)
        params = replicate_tree(params, devmesh)
    step = make_eval_step(model, config, eval_config)
    init_mesh = replicate_tree(
        build_init_mesh(config, eval_config.batch_size), devmesh)
    idx_arr = np.asarray(indices)
    bs = eval_config.batch_size
    it = BatchIterator(dataset, bs, shuffle=False,
                       indices=idx_arr, drop_remainder=True)
    rows = {"chamfer": [], "f1_tau": [], "f1_2tau": [], "class_id": []}
    if eval_config.data_diameter != 1.0:
        rows.update({"f1_tau_scaled": [], "f1_2tau_scaled": []})
    key = jax.random.PRNGKey(seed)

    def run_batch(batch, keep: int, dump: bool):
        nonlocal key
        beat("eval")
        key, sub = jax.random.split(key)
        res = step(params, shard_batch(batch, devmesh), init_mesh, sub)
        pred_mesh = res.pop("mesh")
        res = jax.device_get(res)
        if dump and dump_meshes_to is not None:
            os.makedirs(dump_meshes_to, exist_ok=True)
            pred_host = jax.device_get(pred_mesh)
            for j in range(min(4, pred_mesh.batch_size)):
                save_mesh_buffer_sample(
                    os.path.join(dump_meshes_to, f"sample{j:02d}.obj"),
                    pred_host, j)
            try:  # input|pred|GT render grid (reference README-figure parity)
                from ..utils.figures import save_comparison_grid

                save_comparison_grid(
                    os.path.join(dump_meshes_to, "grid.png"),
                    {k: np.asarray(v) for k, v in batch.items()}, pred_host)
            except Exception as e:  # figures are best-effort, never fatal
                print(f"[eval] figure dump skipped: {e}", flush=True)
        for k in rows:
            rows[k].append(np.asarray(res[k])[:keep])

    for i, batch in enumerate(it):
        run_batch(batch, bs, dump=(i == 0))
    # remainder batch: pad to the compiled shape with repeats of the last
    # sample, keep only the valid rows — eval covers EVERY sample for any
    # batch size (the metric of record must not silently drop the tail)
    rem = len(idx_arr) % bs
    if rem:
        from ..data.loader import collate

        tail = idx_arr[len(idx_arr) - rem:]
        padded = np.concatenate([tail, np.repeat(tail[-1:], bs - rem)])
        run_batch(collate([dataset.get(int(j)) for j in padded]), rem,
                  dump=(len(idx_arr) < bs))
    if not rows["chamfer"]:
        return {}
    return _aggregate_eval_rows({k: np.concatenate(v) for k, v in rows.items()})


def _aggregate_eval_rows(cat: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Per-sample metric arrays → mean + per-class report (shared by the
    host-fed and device-cached eval paths)."""
    metric_keys = [k for k in cat if k != "class_id"]
    out: Dict[str, Any] = {
        f"mean_{k}": float(cat[k].mean()) for k in metric_keys}
    out["num_samples"] = int(len(cat["chamfer"]))
    per_class = {}
    for c in np.unique(cat["class_id"]):
        sel = cat["class_id"] == c
        name = CLASS_NAMES[int(c) % len(CLASS_NAMES)]
        per_class[name] = {k: float(cat[k][sel].mean()) for k in metric_keys}
    out["per_class"] = per_class
    return out


def evaluate_cached(params, model, config: TrainConfig, dataset, indices,
                    eval_config: EvalConfig = EvalConfig(), seed: int = 0,
                    mesh_devices=None, batches_per_dispatch: int = 26,
                    cache_holder: Optional[list] = None) -> Dict[str, Any]:
    """Device-cached eval: upload the eval split to HBM once, scan batches on
    device, fetch ONE stacked metric array per dispatch chunk.

    Through the remote relay every host-fed eval batch costs a full round
    trip (~4-5 s — a 234-batch eval ran ~18 min in round 3); this path cuts
    that to a handful of dispatches.  Protocol-identical to ``evaluate``:
    the same per-batch math (``_eval_batch_metrics``), the SAME PRNG chain
    (one split per batch from ``PRNGKey(seed)``), the same
    pad-remainder-with-repeats-then-trim coverage of every sample, and the
    same aggregation.  Equivalence is pinned by
    tests/test_train.py::test_cached_eval_matches_host_fed.

    One caveat (ADVICE r3): the device cache packs images uint8, so a
    FLOAT-image source (SyntheticShapeDataset) is rounded to 1/255 steps
    here while host-fed ``evaluate`` sees the raw floats — a ≤0.2%-of-range
    input perturbation.  For prepared trees (uint8 on disk: every
    production run) the packing is exactly lossless and the two paths are
    bit-identical in inputs.

    No qualitative dumps here — use ``evaluate(dump_meshes_to=...)`` (one
    batch) when grids/.obj samples are wanted.

    ``cache_holder``: optional 1-element list reusing the uploaded eval cache
    across calls (the arrays are donated through every dispatch and the
    returned alias is stored back).  Caller's contract: the same
    dataset+indices on every call with the same holder.
    """
    from jax.sharding import NamedSharding, PartitionSpec

    from ..data.device_cache import DeviceDataCache

    devmesh = mesh_devices
    if devmesh is None or eval_config.batch_size % devmesh.devices.size:
        devmesh = make_mesh_for_batch(eval_config.batch_size)
        params = replicate_tree(params, devmesh)
    init_mesh = replicate_tree(
        build_init_mesh(config, eval_config.batch_size), devmesh)
    idx_arr = np.asarray(indices)
    n, bs = len(idx_arr), eval_config.batch_size
    if n == 0:
        return {}
    # positions into the cache (cache rows follow idx_arr order); remainder
    # batch padded with repeats of the last sample, trimmed after fetch
    n_full, rem = n // bs, n % bs
    pos = np.arange(n, dtype=np.int32)
    batches = [pos[:n_full * bs].reshape(n_full, bs)] if n_full else []
    if rem:
        tail = np.concatenate([pos[n - rem:], np.repeat(pos[-1:], bs - rem)])
        batches.append(tail[None])
    pos_mat = np.concatenate(batches, axis=0)  # [n_batches, bs]

    if cache_holder and cache_holder[0] is not None:
        data = cache_holder[0]
    else:
        keys = [k for k in ("image", "azimuth", "elevation", "distance",
                            "gt_points", "class_id")
                if k in dataset.get(int(idx_arr[0]))]
        cache = DeviceDataCache(dataset, idx_arr, keys, devmesh)
        data = cache.arrays
        cache.arrays = None  # donated through each chunk — rebind below
    # [chunk, batch] index matrices shard along the BATCH axis (dim 1)
    idx_sharding = NamedSharding(devmesh, PartitionSpec(None, "data"))

    @functools.partial(jax.jit, donate_argnums=(1,))
    def eval_chunk(params, data, idxs, init_mesh, key):
        def body(k, idx):
            k, sub = jax.random.split(k)
            batch = DeviceDataCache.gather(data, idx)
            batch["gt_points"] = batch["gt_points"][:, :eval_config.eval_points]
            res, _ = _eval_batch_metrics(model, eval_config, params, batch,
                                         init_mesh, sub)
            return k, res
        key, mats = jax.lax.scan(body, key, idxs)
        return key, mats, data

    key = jax.random.PRNGKey(seed)
    chunks = []
    for c0 in range(0, len(pos_mat), batches_per_dispatch):
        idxs = jax.device_put(pos_mat[c0:c0 + batches_per_dispatch],
                              idx_sharding)
        beat("eval")
        key, mats, data = eval_chunk(params, data, idxs, init_mesh, key)
        chunks.append(jax.device_get(mats))
    if cache_holder is not None:
        cache_holder[0] = data
    cat = {k: np.concatenate([np.asarray(ch[k]).reshape(-1)
                              for ch in chunks])[:n + (bs - rem if rem else 0)]
           for k in chunks[0]}
    if rem:  # drop the pad rows of the final batch
        keep = np.ones(len(cat["chamfer"]), bool)
        keep[n_full * bs + rem:] = False
        cat = {k: v[keep] for k, v in cat.items()}
    return _aggregate_eval_rows(cat)


def train_geometrics(config: TrainConfig,
                     dataset: Optional[Any] = None,
                     encoder_params=None,
                     max_steps: Optional[int] = None,
                     test_dataset: Optional[Any] = None) -> Dict[str, Any]:
    """Full training run; returns {'params', 'metrics', 'eval', …}.

    ``encoder_params`` may be passed directly (tests) or loaded from
    ``config.encoder_checkpoint`` (the AE handoff).  ``dataset`` may be a
    SyntheticShapeDataset (split by ``config.test_fraction``) or a
    PreparedDataset train split with ``test_dataset`` its test split.
    """
    config = validate_envelope(config, jax.default_backend())
    if dataset is None:
        dataset = SyntheticShapeDataset(SyntheticConfig(
            num_classes=config.num_classes,
            models_per_class=config.models_per_class,
            gt_points=max(config.gt_points, 2048), seed=config.seed))
    if test_dataset is not None:
        train_idx = np.arange(len(dataset))
        eval_dataset, test_idx = test_dataset, np.arange(len(test_dataset))
    else:
        train_idx, test_idx = train_test_split(dataset, config.test_fraction)
        eval_dataset = dataset

    model = build_model(config)
    init_mesh_host = build_init_mesh(config, config.batch_size)

    sample = dataset.get(0)
    b0 = {k: jnp.asarray(v)[None].repeat(config.batch_size, axis=0)
          for k, v in sample.items()}
    params = model.init(
        jax.random.PRNGKey(config.seed), b0["image"], batch_camera(b0),
        init_mesh_host)["params"]

    if encoder_params is None and config.encoder_checkpoint:
        # the AE → main-trainer frozen-encoder handoff (SURVEY.md §5)
        from .autoencoder import MeshVoxelAE
        ae = MeshVoxelAE(latent_dim=config.encoder_latent_dim,
                         encoder_hidden=config.encoder_hidden,
                         encoder_depth=config.encoder_depth)
        gt_v = b0["gt_verts"][:1]
        gt_f = b0["gt_faces"][:1]
        abstract = ae.init(
            jax.random.PRNGKey(0), gt_v, gt_f,
            jnp.ones((1, gt_f.shape[1])), jnp.ones((1, gt_v.shape[1])))
        ae_ckpt = Checkpointer(config.encoder_checkpoint)
        restored = ae_ckpt.restore(
            {"params": jax.device_get(abstract["params"]), "step": 0})
        encoder_params = restored["params"]["encoder"]

    steps_per_epoch = max(1, len(train_idx) // config.batch_size)
    if config.lr_schedule == "cosine":
        total = config.epochs * steps_per_epoch
        sched = optax.warmup_cosine_decay_schedule(
            init_value=0.0, peak_value=config.learning_rate,
            warmup_steps=max(1, total // 20), decay_steps=total,
            end_value=config.learning_rate * 0.03)
        tx = optax.adam(sched)
    else:
        tx = optax.adam(config.learning_rate)
    opt_state = tx.init(params)
    devmesh = make_mesh_for_batch(config.batch_size)
    params = replicate_tree(params, devmesh)
    opt_state = replicate_tree(opt_state, devmesh)
    init_mesh = replicate_tree(init_mesh_host, devmesh)
    use_ema = config.ema_decay > 0.0
    # distinct buffers: params and ema are separately donated through the step
    ema = jax.tree.map(jnp.copy, params) if use_ema else None

    feed_keys = ("image", "azimuth", "elevation", "distance", "gt_points",
                 "gt_verts", "gt_faces")
    use_cache = config.device_data_cache
    epoch_mode = use_cache and config.steps_per_call > 1
    if epoch_mode:
        epoch_fn, aux_keys, k_disp = make_epoch_step(
            model, tx, config, len(train_idx), encoder_params,
            steps_per_dispatch=config.steps_per_call)
    else:
        step_fn = make_train_step(model, tx, config, encoder_params,
                                  from_cache=use_cache)
    logger = MetricsLogger(config.checkpoint_dir, "train_metrics")
    ckpt = Checkpointer(config.checkpoint_dir)
    # persist the config so eval tooling can rebuild the exact model
    import dataclasses as _dc
    import json as _json

    os.makedirs(config.checkpoint_dir, exist_ok=True)
    with open(os.path.join(config.checkpoint_dir, "config.json"), "w") as fh:
        _json.dump(_dc.asdict(config), fh, indent=2, default=str)

    def _snapshot(params_, opt_state_, step_, ema_=None):
        snap = {"params": jax.device_get(params_),
                "opt_state": jax.device_get(opt_state_), "step": step_}
        if ema_ is not None:
            snap["ema"] = jax.device_get(ema_)
        return snap

    start_step = 0
    if config.resume and ckpt.latest_step() is not None:
        try:
            # Probe the snapshot's actual structure first so the restore
            # template always matches: an EMA-trained run resumed with
            # ema_decay=0 (or vice versa) must NOT fall through to the
            # silent fresh-start path and discard the run (ADVICE r3).
            raw = ckpt.restore_raw()
            has_ema = isinstance(raw, dict) and "ema" in raw
            restored = ckpt.restore(_snapshot(params, opt_state, 0,
                                              params if has_ema else None))
            if use_ema:
                # pre-EMA checkpoint: seed the average from the params;
                # surplus ema tree with use_ema=False is simply dropped.
                ema_src = restored["ema"] if has_ema else restored["params"]
                ema = jax.tree.map(jnp.copy,
                                   replicate_tree(ema_src, devmesh))
            params = replicate_tree(restored["params"], devmesh)
            opt_state = replicate_tree(restored["opt_state"], devmesh)
            start_step = int(restored["step"])
            logger.log(start_step, {"resumed_from": start_step})
        except Exception as e:  # incompatible snapshot → fresh start
            print(f"[trainer] resume failed ({type(e).__name__}); "
                  f"starting fresh", flush=True)

    if use_cache:
        from ..data.device_cache import DeviceDataCache
        from ..parallel.sharding import data_sharding

        present = [k for k in feed_keys if k in dataset.get(int(train_idx[0]))]
        cache = DeviceDataCache(dataset, train_idx, present, devmesh)
        idx_sharding = data_sharding(devmesh)
        idx_rng = np.random.default_rng(config.seed + 2)
        logger.log(0, {"device_cache_mb": cache.nbytes() / 2**20})
    else:
        it = BatchIterator(dataset, config.batch_size, seed=config.seed,
                           indices=train_idx)

    key = jax.random.PRNGKey(config.seed + 1)
    step = start_step
    aux: Dict[str, Any] = {}
    eval_result: Dict[str, Any] = {}
    # evaluate() thresholds follow the dataset's normalization (ADVICE r2:
    # legacy diameter-1.8 trees need the scale-matched tau columns)
    eval_cfg = EvalConfig(batch_size=config.eval_batch_size,
                          data_diameter=float(
                              getattr(eval_dataset, "diameter", 1.0)))
    eval_cache_holder = [None]  # reused device-resident eval split

    # best-checkpoint retention: anneal endgames can wobble (hr3 epoch 30→40
    # dipped 0.173→0.165 while train loss fell), so the best-eval params are
    # snapshotted under <run>/best alongside the rolling latest-step
    # checkpoints.  The watermark persists in best/best.json across resumes.
    best_dir = os.path.join(config.checkpoint_dir, "best")
    best_f1 = -1.0
    try:
        with open(os.path.join(best_dir, "best.json")) as fh:
            best_f1 = float(_json.load(fh)["mean_f1_tau"])
    except (OSError, ValueError, KeyError):
        pass
    best_ckpt: Optional[Checkpointer] = None

    def run_eval(params_, dump_dir):
        """In-run eval: cached scan for the metrics (seconds), one host-fed
        batch for the qualitative grids/.obj dumps."""
        nonlocal best_f1, best_ckpt
        if not config.cached_eval:
            res = evaluate(params_, model, config, eval_dataset, test_idx,
                           eval_config=eval_cfg, mesh_devices=devmesh,
                           dump_meshes_to=dump_dir)
        else:
            res = evaluate_cached(params_, model, config, eval_dataset,
                                  test_idx, eval_config=eval_cfg,
                                  mesh_devices=devmesh,
                                  cache_holder=eval_cache_holder)
            if dump_dir is not None and len(test_idx) >= eval_cfg.batch_size:
                try:
                    evaluate(params_, model, config, eval_dataset,
                             np.asarray(test_idx)[:eval_cfg.batch_size],
                             eval_config=eval_cfg, mesh_devices=devmesh,
                             dump_meshes_to=dump_dir)
                except Exception as e:  # figures are best-effort, never fatal
                    print(f"[trainer] dump batch skipped: {e}", flush=True)
        if res and res.get("mean_f1_tau", -1.0) > best_f1:
            best_f1 = res["mean_f1_tau"]
            if best_ckpt is None:
                best_ckpt = Checkpointer(best_dir, max_to_keep=1)
            best_ckpt.save(step, {"params": jax.device_get(params_),
                                  "step": step}, wait=True)
            with open(os.path.join(best_dir, "best.json"), "w") as fh:
                _json.dump({"step": step, "mean_f1_tau": best_f1,
                            "mean_chamfer": res.get("mean_chamfer")}, fh)
        return res

    if epoch_mode:
        # Fully device-resident epochs: the running PRNG key lives on device,
        # indices are permuted on device, scalars come back as ONE array and
        # are fetched only when logging.  The host's only per-epoch action is
        # the (async) dispatch itself.
        dev_key = key
        disp_per_epoch = max(1, -(-steps_per_epoch // k_disp))
        log_every_disp = max(1, config.log_every // k_disp)
        aux = {}
        d = 0
        done = False
        eval_is_current = False  # does eval_result reflect current params?
        cache_arrays = cache.arrays  # donated through every dispatch — only
        cache.arrays = None          # the returned handle stays valid
        for epoch in range(config.epochs):
            for _ in range(disp_per_epoch):
                beat("dispatch")
                if use_ema:
                    (params, ema, opt_state, dev_key, aux_mat,
                     cache_arrays) = epoch_fn(params, ema, opt_state,
                                              cache_arrays, init_mesh, dev_key)
                else:
                    (params, opt_state, dev_key, aux_mat,
                     cache_arrays) = epoch_fn(params, opt_state, cache_arrays,
                                              init_mesh, dev_key)
                step += k_disp
                d += 1
                eval_is_current = False
                if d % log_every_disp == 0 or (epoch == config.epochs - 1):
                    last = np.asarray(jax.device_get(aux_mat[-1]))
                    aux = dict(zip(aux_keys, (float(v) for v in last)))
                    logger.log(step, aux, epoch=epoch)
                if max_steps is not None and step >= max_steps:
                    done = True
                    break
            if (epoch + 1) % config.save_every_epochs == 0 or done:
                ckpt.save(step, _snapshot(params, opt_state, step, ema),
                          wait=True)
            if (epoch + 1) % config.eval_every_epochs == 0 and not done:
                eval_result = run_eval(
                    ema if use_ema else params,
                    os.path.join(config.checkpoint_dir, "samples",
                                 f"epoch{epoch + 1:04d}"))
                eval_is_current = True
                logger.log(step, {f"eval_{k}": v for k, v in
                                  eval_result.items()
                                  if not isinstance(v, dict)})
            if done:
                break
        ckpt.save(step, _snapshot(params, opt_state, step, ema), wait=True)
        if config.eval_every_epochs > 0 and not eval_is_current and step > start_step:
            # final-params eval (a max_steps stop would otherwise return the
            # PREVIOUS eval window's numbers as the run's result)
            eval_result = run_eval(
                ema if use_ema else params,
                os.path.join(config.checkpoint_dir, "samples", "final"))
            logger.log(step, {f"eval_{k}": v for k, v in eval_result.items()
                              if not isinstance(v, dict)})
        logger.close()
        return {"params": params, "ema": ema, "model": model, "metrics": aux,
                "eval": eval_result,
                "checkpoint_dir": config.checkpoint_dir,
                "init_mesh": init_mesh_host}

    if use_cache:
        cache_arrays = cache.arrays  # donated through every step (see
        cache.arrays = None          # make_train_step) — rebind each call
    if use_ema:
        _d = config.ema_decay
        ema_update = jax.jit(lambda e, p: jax.tree.map(
            lambda ev, pv: _d * ev + (1 - _d) * pv, e, p))
    for epoch in range(config.epochs):
        groups = (cache.epoch_indices(config.batch_size, idx_rng)
                  if use_cache else it)
        for group in groups:
            beat("step")
            # profile a short post-warmup window when requested (§5 tracing)
            if config.profile_dir and step == 5:
                jax.profiler.start_trace(config.profile_dir)
            if use_cache:
                key, sub = jax.random.split(key)
                idx = jax.device_put(group, idx_sharding)
                params, opt_state, aux, cache_arrays = step_fn(
                    params, opt_state, cache_arrays, idx, init_mesh, sub)
            else:
                key, sub = jax.random.split(key)
                batch = {k: group[k] for k in feed_keys if k in group}
                batch["gt_points"] = batch["gt_points"][:, :config.gt_points]
                batch = shard_batch(batch, devmesh)
                params, opt_state, aux = step_fn(params, opt_state, batch,
                                                 init_mesh, sub)
            if use_ema:
                ema = ema_update(ema, params)
            if config.profile_dir and step == 10:
                jax.block_until_ready(aux["total"])
                jax.profiler.stop_trace()
            if step % config.log_every == 0:
                logger.log(step, aux, epoch=epoch)
            step += 1
            if max_steps is not None and step >= max_steps:
                break
        if (epoch + 1) % config.save_every_epochs == 0 or (
                max_steps is not None and step >= max_steps):
            ckpt.save(step, _snapshot(params, opt_state, step, ema), wait=True)
        if (epoch + 1) % config.eval_every_epochs == 0:
            eval_result = run_eval(
                ema if use_ema else params,
                os.path.join(config.checkpoint_dir, "samples",
                             f"epoch{epoch + 1:04d}"))
            logger.log(step, {f"eval_{k}": v for k, v in eval_result.items()
                              if not isinstance(v, dict)})
        if max_steps is not None and step >= max_steps:
            break
    ckpt.save(step, _snapshot(params, opt_state, step, ema), wait=True)
    logger.close()
    return {"params": params, "ema": ema, "model": model,
            "metrics": jax.device_get(aux), "eval": eval_result,
            "checkpoint_dir": config.checkpoint_dir,
            "init_mesh": init_mesh_host}


def main(argv=None) -> None:
    """CLI entry (GEOMetrics.py equivalent): dataclass flags, full run."""
    import json

    from ..utils.cli import parse_into

    config = parse_into(TrainConfig(), argv)
    result = train_geometrics(config)
    if result["eval"]:
        print(json.dumps(result["eval"], indent=2))


if __name__ == "__main__":
    main()
