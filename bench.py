"""Round benchmark: flagship train-step throughput in meshes/sec/chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
``vs_baseline`` is measured against the reference-equivalent torch-CPU
implementation (benchmarks/torch_baseline.py) — the reference publishes no
throughput numbers (BASELINE.md), so the baseline is measured in-process on
this machine, per SURVEY.md §6.

Resilience (round-3 verdict #3): the relay chip claim can fail transiently
(BENCH_r03 died at backend init), and JAX caches a failed backend for the
life of the process — so the measurement runs in a CHILD process and the
parent retries with backoff on failure.  On final failure the parent still
prints a parseable JSON line with ``value: null`` and an ``error`` field.

MFU (round-4 verdict #2 — BENCH_r04 shipped a physically impossible 1.12):
the FLOPs basis is now the HAND-DERIVED analytic count (benchmarks/flops.py),
reconciled against XLA ``cost_analysis()`` — which undercounts this program
~36% because it counts a ``lax.scan`` body ONCE regardless of trip count
(verified: unrolling scan_layers makes XLA's count match the analytic one to
0.4%).  Each window's implied FLOP/s is checked against the nominal per-chip
peak for the REPORTED device kind; windows implying more than peak are
flagged ``mfu_suspect`` and excluded from the headline per-chip claim — the
shared pool provably serves moments that are faster than one v5e (a
serialized dependent-matmul probe with a closed-form FLOP count measures the
moment's ceiling and ships in the payload as ``peak_probe_tflops``).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

# Nominal per-chip dense bf16 peaks (public spec sheets), matched by
# substring against jax's reported device_kind.  The probe/plausibility
# logic treats these as the physical ceiling for a SINGLE chip of that kind.
_BF16_PEAKS = (
    ("v6e", 918e12), ("v6 lite", 918e12),
    ("v5e", 197e12), ("v5 lite", 197e12), ("v5lite", 197e12),
    ("v5p", 459e12),
    ("v4", 275e12),
)
_DEFAULT_PEAK = 197e12  # assume v5e when the kind is opaque (the axon relay)


def _peak_for_kind(kind: str) -> tuple:
    """(peak FLOP/s, assumed: bool) for a device_kind string."""
    k = (kind or "").lower()
    for sub, peak in _BF16_PEAKS:
        if sub in k:
            return peak, False
    return _DEFAULT_PEAK, True


def _enable_compile_cache() -> None:
    """Persistent XLA compile cache: first-compile through the TPU tunnel is
    minutes; later invocations (e.g. the driver's round-end run) reuse it."""
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def _step_flops(step_fn, *args) -> float:
    """XLA-estimated FLOPs of one compiled train-step dispatch (0.0 if the
    backend doesn't expose a cost analysis).  KNOWN UNDERCOUNT for this
    program: HloCostAnalysis counts a while/scan body once regardless of
    trip count, so the 6 scanned GCN layers per block are counted as one
    (~36% low vs the analytic count; reported for reconciliation only)."""
    try:
        cost = step_fn.lower(*args).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):  # older jax: one dict per module
            cost = cost[0] if cost else {}
        return float(cost.get("flops", 0.0) or 0.0)
    except Exception:
        return 0.0


def _peak_probe(n: int = 4096, iters: int = 50, reps: int = 3) -> float:
    """Measured FLOP/s ceiling of THIS pool moment via a serialized chain of
    dependent bf16 [n,n] matmuls (round-4 verdict #2d).

    The chain ``C <- C @ A`` has a closed-form cost (2*n^3 per link) and no
    inter-link parallelism, so its implied FLOP/s is a hard lower bound on
    what the serving hardware can do — if it exceeds the nominal single-chip
    peak, the moment is NOT a single nominal chip and per-chip headline
    claims from the same moment are invalid.  Returns the best of ``reps``
    timed repetitions (the capability answer), 0.0 on failure."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    try:
        a_host = (np.random.default_rng(0).standard_normal((n, n))
                  / np.sqrt(n)).astype(np.float32)
        a = jnp.asarray(a_host, jnp.bfloat16)

        @jax.jit
        def chain(c, a):
            def body(c, _):
                return jnp.dot(c, a).astype(jnp.bfloat16), None

            c, _ = lax.scan(body, c, None, length=iters)
            return c

        jax.block_until_ready(chain(a, a))  # compile + warm
        best = 0.0
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.block_until_ready(chain(a, a))
            dt = time.perf_counter() - t0
            best = max(best, 2.0 * n ** 3 * iters / dt)
        return best
    except Exception:
        return 0.0


def bench_jax(batch_size: int, steps: int, warmup: int, splits: int,
              surface_samples: int, windows: int = 3) -> tuple:
    """(window rates [meshes/sec], flops per step) — one rate per window.

    The TPU pool is SHARED and identical programs can vary several-fold in
    wall time between moments (CLAUDE.md); a single window is hostage to the
    pool moment, so the number of record is the MEDIAN of ``windows``
    independent blocked windows, with the spread reported alongside."""
    import jax
    import jax.numpy as jnp
    import optax

    _enable_compile_cache()

    from geometrics_tpu.models import Camera
    from geometrics_tpu.ops import is_tpu
    from geometrics_tpu.parallel import make_mesh_for_batch, replicate_tree, shard_batch
    from geometrics_tpu.train import (
        MeshBudget, ModelConfig, TrainConfig, build_init_mesh, build_model,
        make_train_step,
    )

    on_tpu = is_tpu()
    config = TrainConfig(
        model=ModelConfig(splits_per_round=splits, split_threshold=0.0,
                          bfloat16=on_tpu, scan_layers=True,
                          adjacency_mode="dense"),
        mesh=MeshBudget(subdivisions=2, v_max=384, f_max=960),
        batch_size=batch_size,
        surface_samples=surface_samples,
        gt_points=surface_samples,
        use_fused_chamfer=on_tpu,
        multi_stage_chamfer=True,
    )
    model = build_model(config)
    devmesh = make_mesh_for_batch(batch_size)
    b = config.batch_size

    rng = np.random.default_rng(0)
    batch = {
        "image": rng.random((b, 137, 137, 3), dtype=np.float32),
        "azimuth": rng.random(b).astype(np.float32) * 6.28,
        "elevation": np.full((b,), 0.5, np.float32),
        "distance": np.full((b,), 2.2, np.float32),
        "gt_points": (rng.normal(size=(b, surface_samples, 3)) * 0.4
                      ).astype(np.float32),
    }
    init_mesh_host = build_init_mesh(config, b)
    images = jnp.asarray(batch["image"])
    camera = Camera(jnp.asarray(batch["azimuth"]),
                    jnp.asarray(batch["elevation"]),
                    jnp.asarray(batch["distance"]))
    params = model.init(jax.random.PRNGKey(0), images, camera,
                        init_mesh_host)["params"]

    tx = optax.adam(3e-4)
    opt_state = tx.init(params)
    params = replicate_tree(params, devmesh)
    opt_state = replicate_tree(opt_state, devmesh)
    init_mesh = replicate_tree(init_mesh_host, devmesh)
    sharded = shard_batch(batch, devmesh)
    step_fn = make_train_step(model, tx, config)

    key = jax.random.PRNGKey(1)
    key, flop_key = jax.random.split(key)
    flops = _step_flops(step_fn, params, opt_state, sharded, init_mesh,
                        flop_key)
    for i in range(warmup):
        key, sub = jax.random.split(key)
        params, opt_state, aux = step_fn(params, opt_state, sharded,
                                         init_mesh, sub)
    if warmup:
        jax.block_until_ready(aux["total"])

    rates = []
    for w in range(windows):
        t0 = time.perf_counter()
        for i in range(steps):
            key, sub = jax.random.split(key)
            params, opt_state, aux = step_fn(params, opt_state, sharded,
                                             init_mesh, sub)
        jax.block_until_ready(aux["total"])
        dt = time.perf_counter() - t0
        rates.append(batch_size * steps / dt)
    assert np.isfinite(float(jax.device_get(aux["total"])))
    try:
        device_kind = jax.devices()[0].device_kind
    except Exception:
        device_kind = "unknown"
    return rates, flops, device_kind


def _build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser()
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--warmup", type=int, default=3)
    p.add_argument("--windows", type=int, default=3)
    p.add_argument("--splits", type=int, default=48)
    p.add_argument("--surface_samples", type=int, default=2048)
    p.add_argument("--baseline_steps", type=int, default=4)
    p.add_argument("--baseline_windows", type=int, default=3)
    p.add_argument("--baseline_batch", type=int, default=2)
    p.add_argument("--cpu", action="store_true", help="force CPU (local smoke)")
    p.add_argument("--skip_baseline", action="store_true")
    p.add_argument("--attempts", type=int, default=3,
                   help="child-process attempts before giving up")
    p.add_argument("--retry_wait", type=float, default=150.0,
                   help="seconds between attempts (relay/pool backoff)")
    p.add_argument("--attempt_timeout", type=float, default=1200.0,
                   help="per-attempt wall-clock cap (chip claim ~2 min + "
                        "cold compiles can take minutes)")
    p.add_argument("--_inner", action="store_true", help=argparse.SUPPRESS)
    return p


def _gate_windows(rates, flops: float, batch: int, peak: float):
    """Physical-plausibility gate (round-4 verdict #2c): a window whose
    implied FLOP/s exceeds the nominal single-chip peak cannot be one such
    chip; it is excluded from the per-chip headline.

    Returns (headline meshes/s, headline mfu or None, per-window mfu list,
    per-window suspect flags, plausible rates).  When NO window is
    plausible the headline falls back to the all-window median with
    ``mfu=None`` (the caller marks the payload ``mfu_suspect``)."""
    per_window_mfu = [flops * r / batch / peak for r in rates]
    suspect = [m > 1.0 for m in per_window_mfu]
    plausible = [r for r, s in zip(rates, suspect) if not s]
    mps = float(np.median(plausible if plausible else rates))
    step_time = batch / mps  # seconds per step at the headline rate
    mfu = flops / step_time / peak if plausible else None
    return mps, mfu, per_window_mfu, suspect, plausible


def _inner(args) -> None:
    """One measurement attempt — runs in a child so a wedged/cached-failed
    backend dies with the process instead of poisoning retries."""
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    rates, flops_xla, device_kind = bench_jax(
        args.batch_size, args.steps, args.warmup, args.splits,
        args.surface_samples, windows=args.windows)

    # FLOPs basis: the hand-derived analytic count (benchmarks/flops.py),
    # cross-checked against XLA's (which undercounts scan bodies ~36% here).
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "benchmarks"))
    from flops import analytic_train_step_flops

    flops = analytic_train_step_flops(
        batch=args.batch_size, surface_samples=args.surface_samples,
        gt_points=args.surface_samples)
    peak, peak_assumed = _peak_for_kind(device_kind)
    mps, mfu, per_window_mfu, suspect, plausible = _gate_windows(
        rates, flops, args.batch_size, peak)

    # Direct measurement of this pool moment's FLOP/s ceiling (closed-form
    # flop count, serialized dependency chain) — settles whether suspect
    # windows mean "not a single nominal chip" vs "flops/timing wrong".
    probe_n, probe_iters = (512, 10) if args.cpu else (4096, 50)
    probe_flops_per_s = _peak_probe(n=probe_n, iters=probe_iters)

    if args.skip_baseline:
        base = float("nan")
        base_rates = []
    else:
        sys.path.insert(0, os.path.join(os.path.dirname(
            os.path.abspath(__file__)), "benchmarks"))
        from torch_baseline import run_baseline

        # same median-of-windows treatment for the denominator: the 1-core
        # host is shared too, and the headline ratio divides by this number.
        # warmup=1 for EVERY window — run_baseline rebuilds the model per
        # call, so warmup=0 would put cold-start inside the timed window and
        # bias the baseline slow (ADVICE r3).
        base_rates = [
            run_baseline(batch_size=args.baseline_batch,
                         steps=args.baseline_steps, warmup=1,
                         n_points=args.surface_samples,
                         splits_per_round=args.splits)
            for w in range(args.baseline_windows)]
        base = float(np.median(base_rates))

    payload = {
        "metric": "train_meshes_per_sec_per_chip",
        "value": round(mps, 3),
        "unit": "meshes/sec/chip",
        "vs_baseline": round(mps / base, 3) if base == base else None,
        "windows": [round(r, 3) for r in rates],
        "spread": {"min": round(min(rates), 3), "max": round(max(rates), 3)},
        "baseline_windows": [round(r, 3) for r in base_rates],
        "step_flops_analytic": flops,
        "step_flops_xla": flops_xla or None,
        "flops_basis": "analytic (benchmarks/flops.py; XLA cost_analysis "
                       "undercounts lax.scan bodies ~36% on this program)",
        "device_kind": device_kind,
        "peak_flops": peak,
        "peak_assumed": peak_assumed,
        "per_window_mfu": [round(m, 4) for m in per_window_mfu],
        "mfu_suspect_windows": suspect,
        "mfu": round(mfu, 5) if mfu is not None else None,
        # True when NO window is consistent with a single nominal chip: the
        # value above is then a pool-moment number, not a per-chip number.
        "mfu_suspect": not plausible,
        "peak_probe_tflops": (round(probe_flops_per_s / 1e12, 2)
                              if probe_flops_per_s else None),
        "peak_probe_vs_nominal": (round(probe_flops_per_s / peak, 3)
                                  if probe_flops_per_s else None),
    }
    # The shared pool swings 2-3x BETWEEN moments while windows within a
    # moment agree to ~1% (RESULTS.md) — so the round's honest capability
    # number is the best PLAUSIBLE window observed across the round's logged
    # runs (bench_history.jsonl) on the same hardware.  History entries
    # predating per-window MFU records can't be plausibility-checked and are
    # skipped (round-4's 33k jackpot window implied ~1.9x a v5e's peak and
    # must not ride in as "per-chip").
    import jax

    platform = jax.default_backend()
    payload["platform"] = platform
    best = max(plausible) if plausible else None
    try:
        hist = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "bench_history.jsonl")
        cutoff = time.time() - 24 * 3600
        with open(hist) as fh:
            for line in fh:
                rec = json.loads(line)
                ts = time.mktime(time.strptime(rec["ts"],
                                               "%Y-%m-%dT%H:%M:%S"))
                same_hw = rec.get("platform", "tpu") == platform
                wmfu = rec.get("per_window_mfu")
                if ts >= cutoff and same_hw and rec.get("windows") and wmfu:
                    ok = [r for r, m in zip(rec["windows"], wmfu) if m <= 1.0]
                    if ok:
                        best = max(best or 0.0, max(ok))
    except (OSError, ValueError, KeyError):
        pass
    payload["best_plausible_window_24h"] = (round(best, 3)
                                            if best is not None else None)
    print(json.dumps(payload))
    # The shared pool swings 2-3x between moments (CLAUDE.md), so single-run
    # medians under-represent the program.  Every run is appended here so a
    # round can also report its best-of-windows across pool moments.
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "bench_history.jsonl"), "a") as fh:
            fh.write(json.dumps({"ts": time.strftime("%Y-%m-%dT%H:%M:%S"),
                                 **payload}) + "\n")
    except OSError:
        pass


def _pid_is_supervisor(pid: int, pidfile: str) -> bool:
    """Identity check before signaling (round-4 ADVICE): after a host reboot
    the OS can recycle a stale pidfile's pid onto an unrelated process — the
    live process must be a supervise.py run for THIS pidfile's run_dir."""
    run_dir = os.path.basename(os.path.dirname(os.path.abspath(pidfile)))
    try:
        with open("/proc/%d/cmdline" % pid, "rb") as fh:
            cmdline = fh.read().decode("utf-8", "replace").replace("\0", " ")
    except OSError:
        return False
    return "supervise.py" in cmdline and run_dir in cmdline


def _preempt_supervised_runs(root: str = "") -> list:
    """The chip admits ONE process at a time (CLAUDE.md), so the driver's
    round-end bench would block forever behind a long supervised training
    run.  Live supervisors advertise themselves via runs/*/supervisor.pid
    (pid + argv + cwd + child_pid — experiments/supervise.py); SIGTERM makes
    them tear down the trainer's whole process group and remove the pidfile.
    Returns the relaunch specs so the run continues after the bench: the
    trainer resumes from its latest checkpoint, so a preemption costs at
    most one save_every interval of training.

    If a supervisor ignores SIGTERM past the deadline it is escalated:
    SIGKILL the supervisor, then killpg the recorded trainer process group
    (a SIGKILL'd supervisor can't tear it down itself).  A run whose trainer
    group survives escalation is NOT appended for relaunch — starting a
    second supervisor against a still-held chip is the two-claimant failure
    the round-4 ADVICE flagged."""
    import glob
    import signal

    specs = []
    root = root or os.path.dirname(os.path.abspath(__file__))
    for pf in sorted(glob.glob(os.path.join(root, "runs", "*",
                                            "supervisor.pid"))):
        try:
            with open(pf) as fh:
                spec = json.load(fh)
            pid = int(spec["pid"])
            os.kill(pid, 0)  # raises if dead → stale pidfile, skip
        except (OSError, ValueError, KeyError, TypeError):
            continue
        if not _pid_is_supervisor(pid, pf):
            print(f"# bench: pid {pid} in {pf} is not a supervisor for that "
                  f"run (recycled pid?); treating as stale", file=sys.stderr)
            continue
        print(f"# bench: preempting supervised run (pid {pid}, {pf})",
              file=sys.stderr)
        try:
            os.kill(pid, signal.SIGTERM)
        except OSError:
            continue
        dead = False
        deadline = time.time() + 180.0
        while time.time() < deadline:
            try:
                os.kill(pid, 0)
            except OSError:
                dead = True  # supervisor (and its child group) gone
                break
            time.sleep(2.0)
        if not dead:
            print(f"# bench: supervisor {pid} ignored SIGTERM for 180s; "
                  f"escalating", file=sys.stderr)
            try:
                os.kill(pid, signal.SIGKILL)
            except OSError:
                pass
            child = spec.get("child_pid")
            child_dead = child is None
            if child is not None:
                try:
                    os.killpg(os.getpgid(int(child)), signal.SIGKILL)
                except (OSError, ValueError):
                    pass
                time.sleep(3.0)
                try:
                    os.kill(int(child), 0)
                except (OSError, ValueError):
                    child_dead = True
            if not child_dead:
                print(f"# bench: trainer group {child} survived escalation; "
                      f"NOT relaunching {pf} (chip may still be held)",
                      file=sys.stderr)
                continue
            try:  # the SIGKILL'd supervisor never removed its pidfile
                os.remove(pf)
            except OSError:
                pass
        specs.append(spec)
        # give the relay a moment to notice the released claim
        time.sleep(5.0)
    return specs


def _relaunch_runs(specs) -> None:
    for spec in specs:
        try:
            cmd = [sys.executable] + list(spec["argv"])
            log = "/tmp/relaunch_%d.log" % int(spec["pid"])
            with open(log, "a") as fh:
                subprocess.Popen(cmd, cwd=spec.get("cwd") or None,
                                 stdout=fh, stderr=subprocess.STDOUT,
                                 start_new_session=True)
            print(f"# bench: relaunched supervised run ({' '.join(cmd[:4])}"
                  f" ...; log {log})", file=sys.stderr)
        except Exception as e:
            print(f"# bench: relaunch failed: {e!r}", file=sys.stderr)


def main() -> None:
    args = _build_parser().parse_args()
    if args._inner:
        _inner(args)
        return

    # Advertise the bench itself (launch tooling waits on this before
    # claiming the chip — round-4 ADVICE: the guard read a pidfile nobody
    # wrote).  Best-effort; removed in the finally block.
    bench_pidfile = "/tmp/bench.pid"
    try:
        with open(bench_pidfile, "w") as fh:
            fh.write(str(os.getpid()))
    except OSError:
        bench_pidfile = None

    # Preempt (and afterwards restore) any live training run: the chip is
    # single-claimant, and BENCH_r03 taught us what an unparseable bench
    # artifact costs a round.  --cpu smoke runs never touch the chip.
    specs = [] if args.cpu else _preempt_supervised_runs()

    child_cmd = [sys.executable, os.path.abspath(__file__), "--_inner"]
    child_cmd += sys.argv[1:]
    last_err = ""
    try:
        for attempt in range(1, args.attempts + 1):
            try:
                r = subprocess.run(child_cmd, capture_output=True, text=True,
                                   timeout=args.attempt_timeout)
                out_lines = [l for l in (r.stdout or "").splitlines()
                             if l.startswith("{")]
                if r.returncode == 0 and out_lines:
                    payload = json.loads(out_lines[-1])  # validates
                    print(json.dumps(payload))
                    return
                last_err = ((r.stderr or "").strip().splitlines() or ["rc=%d"
                            % r.returncode])[-1]
            except subprocess.TimeoutExpired:
                last_err = (f"attempt timed out after "
                            f"{args.attempt_timeout:.0f}s")
            except Exception as e:  # json parse, spawn failure
                last_err = repr(e)
            print(f"# bench attempt {attempt}/{args.attempts} failed: "
                  f"{last_err}", file=sys.stderr)
            if attempt < args.attempts:
                time.sleep(args.retry_wait)

        # Final failure: STILL print a parseable line so the driver records
        # the failure mode instead of rc=1/parsed=null (BENCH_r03
        # post-mortem).
        print(json.dumps({
            "metric": "train_meshes_per_sec_per_chip",
            "value": None,
            "unit": "meshes/sec/chip",
            "vs_baseline": None,
            "error": last_err[:500],
            "attempts": args.attempts,
        }))
    finally:
        _relaunch_runs(specs)
        if bench_pidfile:
            try:
                os.remove(bench_pidfile)
            except OSError:
                pass


if __name__ == "__main__":
    main()
