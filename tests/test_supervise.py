"""Stall-watchdog tests (experiments/supervise.py).

The watchdog is the framework's elastic-recovery layer for the operative
failure mode in this environment — the remote TPU worker hanging mid-dispatch
(SURVEY.md §5 scoped this out for the single-GPU reference; here it is the
binding constraint on long runs, RESULTS.md round 2).  No JAX involved: the
children are plain Python subprocesses driven through the real heartbeat
protocol.  NB interpreter startup in this environment is ~4-5 s
(sitecustomize imports), so stall/grace windows must exceed that.
"""

import json
import os
import subprocess
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "experiments"))

from supervise import supervise  # noqa: E402


def _write_child(tmp_path, body: str) -> str:
    path = tmp_path / "child.py"
    path.write_text(body)
    return str(path)


def _events(run_dir) -> list:
    with open(os.path.join(run_dir, "supervisor.jsonl")) as fh:
        return [json.loads(l)["event"] for l in fh]


def test_clean_exit_passes_through(tmp_path):
    child = _write_child(tmp_path, (
        "import os\n"
        "open(os.environ['GEOMETRICS_HEARTBEAT_FILE'], 'w').write('1')\n"))
    rc = supervise([sys.executable, child], str(tmp_path), stall_secs=12,
                   max_restarts=2, max_hours=0.05, backoff_secs=0.1,
                   startup_grace_secs=25, poll_secs=0.5)
    assert rc == 0
    ev = _events(tmp_path)
    assert ev == ["start", "done"]


def test_stalled_child_is_killed_and_relaunched(tmp_path):
    # first launch hangs without ever beating; second beats and exits 0
    marker = tmp_path / "count"
    marker.write_text("0")
    child = _write_child(tmp_path, (
        "import os, time, sys\n"
        f"m = {str(marker)!r}\n"
        "n = int(open(m).read()); open(m, 'w').write(str(n + 1))\n"
        "if n == 0:\n"
        "    time.sleep(9999)\n"
        "open(os.environ['GEOMETRICS_HEARTBEAT_FILE'], 'w').write('1')\n"))
    rc = supervise([sys.executable, child], str(tmp_path), stall_secs=12,
                   max_restarts=3, max_hours=0.05, backoff_secs=0.1,
                   startup_grace_secs=25, poll_secs=0.5)
    assert rc == 0
    assert marker.read_text() == "2"
    ev = _events(tmp_path)
    assert "stall_kill" in ev and ev[-1] == "done"


def test_crashing_child_is_relaunched(tmp_path):
    marker = tmp_path / "count"
    marker.write_text("0")
    child = _write_child(tmp_path, (
        "import os, sys\n"
        f"m = {str(marker)!r}\n"
        "n = int(open(m).read()); open(m, 'w').write(str(n + 1))\n"
        "open(os.environ['GEOMETRICS_HEARTBEAT_FILE'], 'w').write('1')\n"
        "sys.exit(0 if n >= 1 else 3)\n"))
    rc = supervise([sys.executable, child], str(tmp_path), stall_secs=30,
                   max_restarts=3, max_hours=0.05, backoff_secs=0.1,
                   startup_grace_secs=60, poll_secs=0.5)
    assert rc == 0
    assert marker.read_text() == "2"
    ev = _events(tmp_path)
    assert "crash" in ev and ev[-1] == "done"


def test_budget_stop_kills_healthy_child(tmp_path):
    # a healthy (heartbeating) child is still stopped — cleanly, rc 0 — when
    # the wall-clock budget runs out; this is the path a long quality run
    # takes at the end of its supervisor window
    child = _write_child(tmp_path, (
        "import os, time\n"
        "while True:\n"
        "    open(os.environ['GEOMETRICS_HEARTBEAT_FILE'], 'w').write('1')\n"
        "    time.sleep(0.2)\n"))
    rc = supervise([sys.executable, child], str(tmp_path), stall_secs=30,
                   max_restarts=3, max_hours=8.0 / 3600, backoff_secs=0.1,
                   startup_grace_secs=60, poll_secs=0.5)
    assert rc == 0
    assert _events(tmp_path)[-1] == "budget_stop"


def test_commit_every_spawns_and_reaps_committer(tmp_path):
    """--commit_every makes the SUPERVISOR own the reboot-insurance loop
    (round-4 verdict #6: the standalone committer launch was forgotten /
    misconfigured; now no supervised run can start uninsured).  End-to-end
    on a throwaway git repo: the child trainer writes a numeric step dir, a
    'Checkpoint' commit appears, and the committer dies with the
    supervisor."""
    import shutil
    import time

    repo = tmp_path / "repo"
    (repo / "experiments").mkdir(parents=True)
    for script in ("supervise.py", "commit_run_checkpoints.sh"):
        shutil.copy(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "experiments", script),
            repo / "experiments" / script)

    def _git(*args):
        return subprocess.run(["git", "-C", str(repo), *args], check=True,
                              capture_output=True, text=True).stdout

    _git("init", "-q")
    _git("config", "user.email", "t@t")
    _git("config", "user.name", "t")
    (repo / "README").write_text("x")
    _git("add", "-A")
    _git("commit", "-qm", "init")

    run_dir = repo / "runs" / "r"
    child = repo / "child.py"
    child.write_text(
        "import os, time\n"
        f"os.makedirs({str(run_dir / '100')!r}, exist_ok=True)\n"
        f"open({str(run_dir / '100' / 'c.bin')!r}, 'wb').write(b'x')\n"
        "for _ in range(40):\n"
        "    open(os.environ['GEOMETRICS_HEARTBEAT_FILE'], 'w').write('1')\n"
        "    time.sleep(0.5)\n")
    sup = subprocess.Popen(
        [sys.executable, "experiments/supervise.py", "--run_dir", "runs/r",
         "--max_hours", str(12.0 / 3600), "--commit_every", "1", "--",
         sys.executable, "child.py"], cwd=str(repo))
    try:
        t0 = time.time()
        committed = False
        while time.time() - t0 < 30:
            if "Checkpoint" in _git("log", "--oneline"):
                committed = True
                break
            time.sleep(0.5)
        assert committed, _git("log", "--oneline")
    finally:
        sup.terminate()
        sup.wait(timeout=20)
    events = [json.loads(l) for l in
              (run_dir / "supervisor.jsonl").read_text().splitlines()]
    starts = [e for e in events if e["event"] == "committer_start"]
    assert starts
    # the committer was reaped with the supervisor
    cpid = starts[0]["pid"]
    for _ in range(20):
        try:
            os.kill(cpid, 0)
        except OSError:
            break
        time.sleep(0.5)
    else:
        raise AssertionError(f"committer {cpid} still alive")


def test_max_restarts_bounds_the_session(tmp_path):
    child = _write_child(tmp_path, "import sys\nsys.exit(3)\n")
    rc = supervise([sys.executable, child], str(tmp_path), stall_secs=30,
                   max_restarts=1, max_hours=0.05, backoff_secs=0.05,
                   startup_grace_secs=60, poll_secs=0.5)
    assert rc == 1
    assert _events(tmp_path)[-1] == "max_restarts"
