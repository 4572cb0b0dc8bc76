"""Typed configs for every entry point (SURVEY.md §5 config/flag system).

The reference exposes argparse flags with inline defaults on each script
(GEOMetrics.py / auto_encoder.py / data_prep.py); here each entry point has
one frozen dataclass whose fields are CLI-overridable via
``geometrics_tpu.utils.cli.parse_into`` — same knobs (epochs, lr, batch size,
loss weights, latent dim, split budget/threshold), typed and centralized.
"""

from __future__ import annotations

import dataclasses
import os
from dataclasses import dataclass, field
from typing import Optional, Tuple

from .losses import LossWeights


@dataclass(frozen=True)
class MeshBudget:
    """Static buffer bounds — the compile-time contract for masked growth."""

    subdivisions: int = 2          # init icosphere level (162 verts / 320 faces)
    v_max: int = 640               # vertex slack for splitting
    f_max: int = 1536              # face slack (>= faces0 + 2*total_splits)
    init_radius: float = 0.3   # ~0.6× the unit-diameter data's max radius,
                               # same init/target proportion the reference's
                               # bundled sphere has to ShapeNet models
    init_obj: Optional[str] = None  # path to a bundled init-mesh .obj
                                    # (reference §2.1 #13); overrides the
                                    # generated icosphere when set


@dataclass(frozen=True)
class ModelConfig:
    image_size: int = 137
    hidden: int = 192
    block_depth: int = 6
    carried_dim: int = 192
    num_blocks: int = 3
    cnn_widths: Tuple[int, ...] = (32, 64, 128, 256)
    splits_per_round: int = 0      # 0 = fixed topology (config [B:8])
    split_threshold: float = 0.0
    adjacency_mode: str = "segment"  # "segment" | "dense" (MXU matmul path)
                                     # | "pallas" (fused SpMM kernel)
    scan_layers: bool = False       # lax.scan over GCN depth (fast compile)
    remat: bool = False             # rematerialize deformation blocks
    bfloat16: bool = False          # compute dtype for conv/matmul stacks


@dataclass(frozen=True)
class AutoEncoderConfig:
    """auto_encoder.py equivalent (SURVEY.md §3.2, config [B:9])."""

    latent_dim: int = 128
    encoder_hidden: int = 128
    encoder_depth: int = 4
    voxel_res: int = 32
    batch_size: int = 32
    learning_rate: float = 1e-3
    epochs: int = 40
    seed: int = 0
    checkpoint_dir: str = "runs/ae"
    log_every: int = 10
    # data
    num_classes: int = 13
    models_per_class: int = 32


@dataclass(frozen=True)
class TrainConfig:
    """GEOMetrics.py equivalent (SURVEY.md §3.3, configs [B:7..11])."""

    model: ModelConfig = field(default_factory=ModelConfig)
    mesh: MeshBudget = field(default_factory=MeshBudget)
    loss: LossWeights = field(default_factory=LossWeights)
    batch_size: int = 16
    learning_rate: float = 3e-4
    lr_schedule: str = "constant"   # "constant" | "cosine" (decay to 3% over
                                    # the run, 5% linear warmup)
    epochs: int = 50
    surface_samples: int = 2048    # points sampled from pred mesh per loss eval
    gt_points: int = 2048          # GT points used per step (subset of stored)
    seed: int = 0
    checkpoint_dir: str = "runs/geometrics"
    encoder_checkpoint: Optional[str] = None  # frozen MeshEncoder (AE handoff)
    # frozen-encoder architecture (must match the AE run that produced it)
    encoder_latent_dim: int = 128
    encoder_hidden: int = 128
    encoder_depth: int = 4
    log_every: int = 10
    eval_every_epochs: int = 5
    save_every_epochs: int = 5
    eval_batch_size: int = 16   # (must divide the eval set to cover it fully)
    use_fused_chamfer: bool = True  # Pallas kernel on TPU, lax fallback on CPU
    multi_stage_chamfer: bool = True
    debug_nan_checks: bool = False  # checkify float guards on the train step
    profile_dir: Optional[str] = None  # jax.profiler trace output directory
    device_data_cache: bool = True  # upload the train split to HBM once and
                                    # assemble batches on-device (zero per-step
                                    # host transfer); needs split to fit HBM
    resume: bool = True             # restore latest checkpoint in
                                    # checkpoint_dir (params+opt+step) if any
    steps_per_call: int = 1         # >1: lax.scan K train steps per dispatch
                                    # (cached-data path only) — amortizes
                                    # host→device round-trip latency
    ignore_envelope: bool = False   # skip validate_envelope's clamps (for
                                    # deliberately probing beyond the proven
                                    # remote-worker envelope)
    ema_decay: float = 0.0          # >0: maintain a Polyak/EMA average of
                                    # params (decay per optimizer step, e.g.
                                    # 0.999) updated inside the jitted
                                    # step/scan; evals + the returned/best
                                    # params use the average.  Checkpoints
                                    # gain an "ema" tree; resuming a pre-EMA
                                    # checkpoint seeds the average from the
                                    # restored params.  Default off.
    cached_eval: bool = True        # in-run evals via evaluate_cached (eval
                                    # split uploaded once, batches scanned on
                                    # device — seconds instead of one relay
                                    # round trip per batch); qualitative
                                    # dumps still come from one host-fed
                                    # batch.  Protocol-identical (tested).
    # data
    num_classes: int = 13
    models_per_class: int = 32
    test_fraction: float = 0.2


# Proven remote-TPU-worker envelope (CLAUDE.md / RESULTS.md, measured round 2):
# the shared worker CRASHES on oversized programs, and the scan-length limit
# scales inversely with program size.  Known kills at the highres budget
# (v_max=1152): steps_per_call=50 (batch 16) and batch=32 (any k).  Known
# good: batch 16 / k=20 at highres; batch 32 / k≈60 at the flagship budget
# (v_max=384).  Larger budgets (paperres v_max=2560) were probed in round 3 at
# batch 16 / k=20.  The rules below encode those measurements.
_ENVELOPE_VMAX_SMALL = 1024     # budgets below this have never crashed
_ENVELOPE_MAX_BATCH = 16        # at v_max >= _ENVELOPE_VMAX_SMALL
_ENVELOPE_MAX_K = 20            # at v_max >= _ENVELOPE_VMAX_SMALL
_ENVELOPE_UNPROVEN_K = 10       # cap until a probe proves a bigger program

# Probes that SURVIVED the worker, as (v_max*hidden) program-size scores —
# v_max sets the dominant live buffers (dense V×V adjacency, V×hidden
# activations through depth) and hidden scales every matmul, so their
# product tracks the observed kill boundary better than v_max alone
# (round-3 verdict: paperres_xl is ~1.7x the paperres program at the SAME
# v_max, and the old v_max-only rule couldn't tell them apart).
#
# The 5th field is steps_survived — how long the surviving run actually ran
# (round-4 verdict #5: a 120-step probe and a completed 130k-step schedule
# used to be indistinguishable here).  Code-table entries are completed
# schedules; their spans are the schedules' step counts (RESULTS.md).
_PROVEN_PROBES = (
    ("flagship", 384 * 192, 32, 60, 50_000),    # rounds 1-2, full runs
    ("highres", 1152 * 192, 16, 20, 40_000),    # round 2, full run
    ("paperres", 2560 * 192, 16, 20, 131_000),  # round 3, 130-epoch run
)
# a probe shorter than this is "thin": it proves the program compiles and
# dispatches, not that the worker tolerates it for epochs
_PROBE_STRONG_STEPS = 1000
_PROBE_FILE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), ".envelope_probes.json")


def _proven_probes() -> list:
    """Code table + any probes recorded at runtime (repo/.envelope_probes.json)."""
    probes = list(_PROVEN_PROBES)
    try:
        import json

        with open(_PROBE_FILE) as fh:
            for p in json.load(fh):
                probes.append((p["name"], int(p["score"]), int(p["batch"]),
                               int(p["steps_per_call"]),
                               int(p.get("steps_survived", 0))))
    except (OSError, ValueError, KeyError):
        pass
    return probes


def record_probe(config: "TrainConfig", name: str = "probe",
                 steps_survived: int = 0) -> None:
    """Append a SURVIVING config to the probe table the validator reads.

    Call after a deliberate ``ignore_envelope`` probe completes without
    killing the worker (experiments/probe_envelope.py does this).
    ``steps_survived`` records the probe's proven span so the validator can
    tell a 2-minute smoke from an epochs-long proof (round-4 verdict #5)."""
    import json

    entry = {"name": name, "score": config.mesh.v_max * config.model.hidden,
             "batch": config.batch_size,
             "steps_per_call": config.steps_per_call,
             "steps_survived": int(steps_survived)}
    try:
        with open(_PROBE_FILE) as fh:
            table = json.load(fh)
    except (OSError, ValueError):
        table = []
    table.append(entry)
    with open(_PROBE_FILE, "w") as fh:
        json.dump(table, fh, indent=2)


def validate_envelope(config: "TrainConfig", backend: str) -> "TrainConfig":
    """Clamp configs known to kill the remote TPU worker (warn + cap).

    Round 2 lost a full night's quality run to configurations outside the
    proven envelope; this makes the trainer refuse them by default.  Two
    rules: (1) at v_max >= 1024, batch/steps_per_call are capped at the
    proven 16/20; (2) a program-size score (v_max*hidden) larger than every
    surviving probe additionally caps steps_per_call at 10 until a probe
    proves it (record via ``record_probe``).  Set ``ignore_envelope=True``
    to probe beyond the envelope deliberately.  No-op off TPU (the CPU path
    has no remote worker to kill).
    """
    if backend not in ("tpu", "axon") or config.ignore_envelope:
        return config
    if config.mesh.v_max < _ENVELOPE_VMAX_SMALL:
        return config
    changes = {}
    if config.batch_size > _ENVELOPE_MAX_BATCH:
        changes["batch_size"] = _ENVELOPE_MAX_BATCH
    if config.steps_per_call > _ENVELOPE_MAX_K:
        changes["steps_per_call"] = _ENVELOPE_MAX_K
    score = config.mesh.v_max * config.model.hidden
    probes = _proven_probes()
    max_proven = max(p[1] for p in probes)
    if score > max_proven:
        k_now = changes.get("steps_per_call", config.steps_per_call)
        if k_now > _ENVELOPE_UNPROVEN_K:
            changes["steps_per_call"] = _ENVELOPE_UNPROVEN_K
        changes.setdefault("_unproven", None)  # sentinel for the warning
    else:
        # Admitted — but by how strong a proof?  A thin probe (a few relay
        # dispatches) proves dispatchability, not epochs of worker tolerance;
        # warn (never clamp: the envelope rules above already cap the
        # per-dispatch program) so long runs on thin proofs are a stated
        # risk, not a silent one (round-4 verdict #5).
        admitting = [p for p in probes if p[1] >= score]
        span = max(p[4] for p in admitting)
        if span < _PROBE_STRONG_STEPS and config.epochs > 1:
            import warnings

            names = ", ".join(f"{p[0]}({p[4]} steps)" for p in admitting)
            warnings.warn(
                f"program-size score {score} is admitted only by thin "
                f"probes [{names}] (<{_PROBE_STRONG_STEPS} proven steps) — "
                f"a {config.epochs}-epoch run extrapolates far beyond the "
                f"proof; record_probe a longer surviving span when one "
                f"completes", stacklevel=2)
    if changes:
        import warnings

        unproven = "_unproven" in changes
        changes.pop("_unproven", None)
        msg = (f"config exceeds the proven remote-worker envelope at "
               f"v_max={config.mesh.v_max} (batch<={_ENVELOPE_MAX_BATCH}, "
               f"steps_per_call<={_ENVELOPE_MAX_K})")
        if unproven:
            msg += (f"; program-size score {score} > largest surviving "
                    f"probe {max_proven} — capping steps_per_call at "
                    f"{_ENVELOPE_UNPROVEN_K} until a 1-epoch probe survives "
                    f"(then record_probe it)")
        if changes:
            msg += f"; clamping {changes}"
        warnings.warn(msg + " — pass ignore_envelope=true to override",
                      stacklevel=2)
        if changes:
            config = dataclasses.replace(config, **changes)
    return config


def config_from_json(d: dict) -> "TrainConfig":
    """Rebuild a TrainConfig from the ``config.json`` a trainer run writes.

    The inverse of ``dataclasses.asdict`` modulo JSON stringification
    (tuples→lists, None→"None"); used by eval/inference tooling to
    reconstruct the exact trained model from a run directory."""
    known = {f.name for f in dataclasses.fields(TrainConfig)}
    return TrainConfig(
        model=ModelConfig(**{**d["model"],
                             "cnn_widths": tuple(d["model"]["cnn_widths"])}),
        mesh=MeshBudget(**d["mesh"]),
        loss=LossWeights(**d["loss"]),
        **{k: (None if v == "None" else v) for k, v in d.items()
           if k in known and k not in ("model", "mesh", "loss")})


@dataclass(frozen=True)
class EvalConfig:
    """Evaluation protocol (SURVEY.md §3.4): Chamfer + F1@τ / F1@2τ.

    The paper's τ=1e-4 squared-distance threshold assumes ShapeNet's
    unit-diameter normalization, which the synthetic generator now follows
    (SyntheticConfig.norm_radius=0.5) — so ``f1_tau`` IS the paper protocol
    and ``f1_tau_scaled`` coincides with it at the default
    ``data_diameter=1.0``.  For legacy round-1 datasets (diameter 1.8) set
    ``data_diameter=1.8`` to recover the geometrically matched threshold
    τ·d² = 3.24e-4.
    """

    tau: float = 1e-4
    data_diameter: float = 1.0
    eval_points: int = 2048
    batch_size: int = 16

    @property
    def scale_matched_tau(self) -> float:
        return self.tau * self.data_diameter ** 2
