"""Bench-vs-training chip arbitration (bench.py + experiments/supervise.py).

The chip admits ONE process at a time, so the driver's round-end bench.py
must be able to claim it while a supervised long run holds it.  Protocol:
the supervisor advertises itself via <run_dir>/supervisor.pid (pid + argv +
cwd), SIGTERM makes it tear down the trainer's process group and remove the
pidfile, and bench relaunches the recorded argv afterwards.  No JAX — plain
subprocesses through the real pidfile/signal protocol (interpreter startup
here is ~4-5 s, hence the generous waits)."""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (repo-root bench.py)

SUPERVISE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "experiments", "supervise.py")


def _wait_for(fn, timeout=40.0):
    t0 = time.time()
    while time.time() - t0 < timeout:
        if fn():
            return True
        time.sleep(0.25)
    return False


def test_preempt_kills_supervisor_and_child_then_relaunch(tmp_path):
    run_dir = tmp_path / "runs" / "xl1"
    run_dir.mkdir(parents=True)
    child = tmp_path / "child.py"
    child_alive = tmp_path / "child_alive"
    child.write_text(
        "import os, time\n"
        f"open({str(child_alive)!r}, 'w').write(str(os.getpid()))\n"
        "while True:\n"
        "    open(os.environ['GEOMETRICS_HEARTBEAT_FILE'], 'w').write('1')\n"
        "    time.sleep(0.5)\n")

    sup = subprocess.Popen(
        [sys.executable, SUPERVISE, "--run_dir", str(run_dir),
         "--max_hours", "0.2", "--", sys.executable, str(child)],
        cwd=str(tmp_path))
    try:
        pid_path = run_dir / "supervisor.pid"
        assert _wait_for(lambda: pid_path.exists() and child_alive.exists())
        spec = json.loads(pid_path.read_text())
        assert spec["pid"] == sup.pid
        assert spec["argv"][0].endswith("supervise.py")
        child_pid = int(child_alive.read_text())

        specs = bench._preempt_supervised_runs(root=str(tmp_path))
        assert [s["pid"] for s in specs] == [sup.pid]
        # supervisor exited, pidfile removed, child's process group dead
        assert _wait_for(lambda: sup.poll() is not None)
        assert not pid_path.exists()

        def child_gone():
            try:
                os.kill(child_pid, 0)
                return False
            except OSError:
                return True
        assert _wait_for(child_gone)
        events = [json.loads(l)["event"]
                  for l in (run_dir / "supervisor.jsonl").read_text()
                  .splitlines()]
        assert "preempted" in events
    finally:
        if sup.poll() is None:
            sup.kill()
            sup.wait()

    # relaunch: the recorded argv is spawned again from the recorded cwd
    marker = tmp_path / "relaunched"
    relaunch_script = tmp_path / "relaunch.py"
    relaunch_script.write_text(
        f"open({str(marker)!r}, 'w').write('ok')\n")
    bench._relaunch_runs([{"pid": 12345,
                           "argv": [str(relaunch_script)],
                           "cwd": str(tmp_path)}])
    assert _wait_for(lambda: marker.exists())


def test_preempt_skips_stale_pidfile(tmp_path):
    run_dir = tmp_path / "runs" / "dead"
    run_dir.mkdir(parents=True)
    # a pid that is certainly not alive: spawn+reap a throwaway process
    p = subprocess.Popen([sys.executable, "-c", "pass"])
    p.wait()
    (run_dir / "supervisor.pid").write_text(
        json.dumps({"pid": p.pid, "argv": ["x"], "cwd": str(tmp_path)}))
    assert bench._preempt_supervised_runs(root=str(tmp_path)) == []


def test_preempt_skips_recycled_pid(tmp_path):
    """Round-4 ADVICE: after a reboot the OS can recycle a stale pidfile's
    pid onto an UNRELATED live process — the preemptor must identity-check
    /proc/<pid>/cmdline before signaling, not just liveness."""
    run_dir = tmp_path / "runs" / "recycled"
    run_dir.mkdir(parents=True)
    # a live process that is definitely not a supervisor
    p = subprocess.Popen([sys.executable, "-c",
                          "import time; time.sleep(60)"])
    try:
        (run_dir / "supervisor.pid").write_text(
            json.dumps({"pid": p.pid, "argv": ["x"], "cwd": str(tmp_path)}))
        assert bench._preempt_supervised_runs(root=str(tmp_path)) == []
        assert p.poll() is None  # the innocent bystander was NOT signaled
    finally:
        p.kill()
        p.wait()
