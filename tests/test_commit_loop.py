"""The checkpoint-commit loop (experiments/commit_run_checkpoints.sh) is the
reboot-insurance mechanism for long runs: two round-4 host reboots erased
runs/xl1 because checkpoints lived only on disk.  Prove on a throwaway git
repo that the loop (a) commits when a new orbax-style numeric step dir
appears, (b) skips when nothing new appeared, and (c) picks the NUMERICALLY
latest step (ls | sort -n), not the lexicographic one.

Round-4 advisor post-mortem additions: (d) the loop must defeat a .gitignore
that ignores runs/* (the real repo's does; the original loop was a silent
no-op against it for a whole night), and (e) a Checkpoint commit must not
sweep in files a concurrent session has staged, nor disturb their staging."""

import os
import shutil
import subprocess
import time

import pytest

SCRIPT = os.path.join(os.path.dirname(__file__), os.pardir,
                      "experiments", "commit_run_checkpoints.sh")


def _git(repo, *args):
    return subprocess.run(["git", "-C", repo, *args], check=True,
                          capture_output=True, text=True).stdout


@pytest.fixture
def repo(tmp_path):
    r = tmp_path / "repo"
    r.mkdir()
    _git(str(r), "init", "-q")
    _git(str(r), "config", "user.email", "t@t")
    _git(str(r), "config", "user.name", "t")
    # the script cd's to its own parent's parent: mirror the layout
    (r / "experiments").mkdir()
    shutil.copy(SCRIPT, r / "experiments" / "commit_run_checkpoints.sh")
    (r / "README").write_text("x")
    _git(str(r), "add", "-A")
    _git(str(r), "commit", "-qm", "init")
    return str(r)


def _wait_for(fn, timeout=20.0):
    t0 = time.time()
    while time.time() - t0 < timeout:
        if fn():
            return True
        time.sleep(0.25)
    return False


def test_commits_new_steps_and_skips_stale(repo):
    run = os.path.join(repo, "runs", "xl1")
    os.makedirs(os.path.join(run, "100"))
    with open(os.path.join(run, "100", "ckpt.bin"), "wb") as fh:
        fh.write(b"\x00" * 64)
    # also a NON-numeric dir that must never be chosen as "latest"
    os.makedirs(os.path.join(run, "samples"))
    with open(os.path.join(run, "samples", "grid.png"), "wb") as fh:
        fh.write(b"p")

    proc = subprocess.Popen(
        ["sh", "experiments/commit_run_checkpoints.sh", "runs/xl1", "1"],
        cwd=repo, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
    try:
        ok = _wait_for(lambda: "step 100" in _git(repo, "log", "--oneline"))
        assert ok, _git(repo, "log", "--oneline")
        # staged content includes the checkpoint file and the samples dir
        names = _git(repo, "ls-tree", "-r", "--name-only", "HEAD")
        assert "runs/xl1/100/ckpt.bin" in names
        assert "runs/xl1/samples/grid.png" in names

        n_before = _git(repo, "rev-list", "--count", "HEAD").strip()
        time.sleep(2.5)  # several intervals with no new step
        assert _git(repo, "rev-list", "--count", "HEAD").strip() == n_before

        # numeric sort: step 1000 > step 999 even though "999" > "1000" lexically
        for s in ("999", "1000"):
            os.makedirs(os.path.join(run, s))
            with open(os.path.join(run, s, "ckpt.bin"), "wb") as fh:
                fh.write(b"\x01")
        ok = _wait_for(lambda: "step 1000" in _git(repo, "log", "--oneline"))
        assert ok, _git(repo, "log", "--oneline")
    finally:
        proc.terminate()
        proc.wait(timeout=10)


def test_defeats_gitignore_and_respects_concurrent_staging(repo):
    # The REAL repo ignores runs/*; reproduce that hostile config here.
    with open(os.path.join(repo, ".gitignore"), "w") as fh:
        fh.write("runs/*\n")
    _git(repo, "add", ".gitignore")
    _git(repo, "commit", "-qm", "ignore runs")

    run = os.path.join(repo, "runs", "xl1")
    os.makedirs(os.path.join(run, "200"))
    with open(os.path.join(run, "200", "ckpt.bin"), "wb") as fh:
        fh.write(b"\x02" * 64)

    # A concurrent session has staged (not committed) an unrelated file.
    with open(os.path.join(repo, "wip.py"), "w") as fh:
        fh.write("work in progress\n")
    _git(repo, "add", "wip.py")

    proc = subprocess.Popen(
        ["sh", "experiments/commit_run_checkpoints.sh", "runs/xl1", "1"],
        cwd=repo, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
    try:
        ok = _wait_for(lambda: "step 200" in _git(repo, "log", "--oneline"))
        assert ok, _git(repo, "log", "--oneline")
        names = _git(repo, "ls-tree", "-r", "--name-only", "HEAD")
        assert "runs/xl1/200/ckpt.bin" in names   # gitignore defeated
        assert "wip.py" not in names              # staged file NOT swept in
        # ...and wip.py is still staged for the concurrent session's commit.
        staged = _git(repo, "diff", "--cached", "--name-only")
        assert "wip.py" in staged
    finally:
        proc.terminate()
        proc.wait(timeout=10)
