"""Stall watchdog: run a training command, kill + relaunch it on hung relay calls.

The shared remote-TPU worker stalls a few times per night (round 2: four
incidents, one of which ended the flagship quality run at epoch 47/200 —
RESULTS.md).  The trainer already resumes from its latest checkpoint; what was
missing is the automatic re-launch.  This supervisor provides it:

  python experiments/supervise.py --run_dir runs/hr4 --max_hours 9 -- \
      python experiments/run_full.py --run_dir runs/hr4 --preset paperres ...

Mechanism:
  - sets ``GEOMETRICS_HEARTBEAT_FILE`` in the child env; the trainer touches
    that file before every dispatch / eval batch (utils/heartbeat.py);
  - the child runs in its OWN process group (``start_new_session``), and a
    stall is answered by ``os.killpg`` on that group's pgid — never by any
    name/pattern match, so no other process can be hit;
  - a quiet heartbeat for ``--stall_secs`` (default 25 min: normal gaps are
    seconds; fresh remote compiles can run minutes, so prewarm .jax_cache
    before long runs) ⇒ SIGTERM, then SIGKILL, wait, relaunch;
  - nonzero child exit (worker crash) ⇒ relaunch after a short backoff
    (the chip claim itself takes ~2 min);
  - clean exit (rc 0) ⇒ done.  ``--max_restarts`` / ``--max_hours`` bound the
    whole session; every event is appended to ``<run_dir>/supervisor.jsonl``.

Reference parity note: SURVEY.md §5 scoped elastic recovery out for the
reference (a single-GPU research script); in THIS environment worker stalls
are the binding constraint on long runs, so the framework carries its own.
"""

from __future__ import annotations

import argparse
import json
import os
import signal
import subprocess
import sys
import time


def _log(path: str, event: str, **extra) -> None:
    rec = {"ts": round(time.time(), 3),
           "iso": time.strftime("%Y-%m-%dT%H:%M:%S"), "event": event, **extra}
    with open(path, "a") as fh:
        fh.write(json.dumps(rec) + "\n")
    print(f"[supervise] {event} {extra}", flush=True)


def _kill_group(proc: subprocess.Popen, log_path: str) -> None:
    """SIGTERM then SIGKILL the child's own process group (by pgid, never by
    pattern), and reap it."""
    try:
        pgid = os.getpgid(proc.pid)
    except ProcessLookupError:
        proc.wait()
        return
    for sig, grace in ((signal.SIGTERM, 20.0), (signal.SIGKILL, 30.0)):
        try:
            os.killpg(pgid, sig)
        except ProcessLookupError:
            break
        deadline = time.monotonic() + grace
        while time.monotonic() < deadline:
            if proc.poll() is not None:
                break
            time.sleep(0.5)
        if proc.poll() is not None:
            break
    if proc.poll() is None:
        _log(log_path, "kill_failed", pid=proc.pid)
    proc.wait()


def _spawn_committer(run_dir: str, interval_s: int, log_path: str):
    """Reboot insurance (round-4 post-mortem): two host reboots erased
    uncommitted run dirs, and the standalone committer launch was forgotten /
    misconfigured more than once.  When ``--commit_every`` is set the
    supervisor OWNS the committer: no supervised run can start uninsured, and
    the committer dies with the supervisor (reaped in _done/_on_term)."""
    script = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "commit_run_checkpoints.sh")
    logf = open(os.path.join(run_dir, "committer.log"), "a")
    proc = subprocess.Popen(["sh", script, run_dir, str(int(interval_s))],
                            stdout=logf, stderr=subprocess.STDOUT,
                            start_new_session=True)
    _log(log_path, "committer_start", pid=proc.pid, interval_s=interval_s)
    return proc


def supervise(cmd, run_dir: str, stall_secs: float, max_restarts: int,
              max_hours: float, backoff_secs: float,
              startup_grace_secs: float, poll_secs: float = 10.0,
              commit_every: int = 0) -> int:
    os.makedirs(run_dir, exist_ok=True)
    log_path = os.path.join(run_dir, "supervisor.jsonl")
    hb_path = os.path.join(run_dir, "heartbeat")
    env = dict(os.environ)
    env["GEOMETRICS_HEARTBEAT_FILE"] = hb_path

    # Preemption contract: the chip admits ONE process at a time, and the
    # round-end `bench.py` must be able to claim it even while a supervised
    # run holds it.  The pidfile advertises this supervisor (pid + exact
    # argv + cwd, so a preemptor can relaunch it verbatim afterwards); the
    # SIGTERM handler tears down the CHILD's process group too — without it
    # a terminated supervisor would orphan the trainer and the chip would
    # never free.  The trainer resumes from its latest checkpoint on
    # relaunch, so a preemption costs at most one save_every interval.
    pid_path = os.path.join(run_dir, "supervisor.pid")

    def _write_pidfile(child_pid=None):
        # child_pid lets a preemptor (bench.py) escalate to killpg on the
        # trainer's own process group if this supervisor won't die in time —
        # without it a SIGKILL'd supervisor orphans a trainer that still
        # holds the chip (round-4 ADVICE).
        with open(pid_path, "w") as fh:
            json.dump({"pid": os.getpid(), "argv": sys.argv,
                       "cwd": os.getcwd(), "child_pid": child_pid}, fh)

    _write_pidfile()
    holder = {"proc": None}
    committer = _spawn_committer(run_dir, commit_every, log_path) \
        if commit_every > 0 else None

    def _reap_committer():
        if committer is not None and committer.poll() is None:
            committer.terminate()
            try:
                committer.wait(timeout=10)
            except subprocess.TimeoutExpired:
                committer.kill()
                committer.wait()

    def _on_term(signum, frame):
        _log(log_path, "preempted", signum=signum)
        proc = holder["proc"]
        if proc is not None and proc.poll() is None:
            _kill_group(proc, log_path)
        _reap_committer()
        try:
            os.remove(pid_path)
        except OSError:
            pass
        os._exit(0)

    signal.signal(signal.SIGTERM, _on_term)
    signal.signal(signal.SIGINT, _on_term)

    def _done(rc: int) -> int:
        _reap_committer()
        try:
            os.remove(pid_path)
        except OSError:
            pass
        return rc

    t_session = time.monotonic()
    restarts = 0
    while True:
        if os.path.exists(hb_path):
            os.remove(hb_path)
        _log(log_path, "start", attempt=restarts, cmd=" ".join(cmd))
        t_start = time.monotonic()
        proc = subprocess.Popen(cmd, env=env, start_new_session=True)
        holder["proc"] = proc
        _write_pidfile(child_pid=proc.pid)
        stalled = False
        while proc.poll() is None:
            time.sleep(poll_secs)
            if proc.poll() is not None:  # exited during the sleep — a stale
                break                    # heartbeat then is not a stall
            now = time.monotonic()
            try:
                age = time.time() - os.path.getmtime(hb_path)
                grace = stall_secs
            except OSError:  # no heartbeat yet: startup/compile grace
                age = now - t_start
                grace = max(stall_secs, startup_grace_secs)
            if age > grace:
                stalled = True
                _log(log_path, "stall_kill", attempt=restarts,
                     heartbeat_age_s=round(age, 1), pid=proc.pid)
                _kill_group(proc, log_path)
                break
            if now - t_session > max_hours * 3600:
                _log(log_path, "budget_stop", attempt=restarts,
                     hours=round((now - t_session) / 3600, 2))
                _kill_group(proc, log_path)
                return _done(0)
        rc = proc.returncode
        if not stalled and rc == 0:
            _log(log_path, "done", attempt=restarts,
                 hours=round((time.monotonic() - t_session) / 3600, 2))
            return _done(0)
        if not stalled:
            _log(log_path, "crash", attempt=restarts, rc=rc)
        restarts += 1
        if restarts > max_restarts:
            _log(log_path, "max_restarts", restarts=restarts)
            return _done(1)
        if time.monotonic() - t_session > max_hours * 3600:
            _log(log_path, "budget_stop", attempt=restarts)
            return _done(0)
        time.sleep(backoff_secs)


def main() -> int:
    p = argparse.ArgumentParser(
        description="stall watchdog for training runs (see module docstring)",
        usage="supervise.py [options] -- <training command...>")
    p.add_argument("--run_dir", required=True,
                   help="directory for heartbeat + supervisor.jsonl "
                        "(normally the training run_dir)")
    p.add_argument("--stall_secs", type=float, default=1500.0,
                   help="quiet-heartbeat threshold before kill+relaunch")
    p.add_argument("--startup_grace_secs", type=float, default=3600.0,
                   help="allowance for first heartbeat (chip claim + compile)")
    p.add_argument("--max_restarts", type=int, default=40)
    p.add_argument("--max_hours", type=float, default=10.0)
    p.add_argument("--backoff_secs", type=float, default=30.0)
    p.add_argument("--commit_every", type=int, default=0,
                   help="if >0, spawn commit_run_checkpoints.sh on run_dir "
                        "at this interval (reboot insurance owned by the "
                        "supervisor; reaped on exit)")
    argv = sys.argv[1:]
    if "--" not in argv:
        p.error("separate the training command with `--`")
    split = argv.index("--")
    args = p.parse_args(argv[:split])
    cmd = argv[split + 1:]
    if not cmd:
        p.error("empty training command after `--`")
    return supervise(cmd, args.run_dir, args.stall_secs, args.max_restarts,
                     args.max_hours, args.backoff_secs,
                     args.startup_grace_secs, commit_every=args.commit_every)


if __name__ == "__main__":
    raise SystemExit(main())
