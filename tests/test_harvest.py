"""harvest_anneal.py dry-run: the shortened-schedule arithmetic and the
supervised command it would exec (the endgame tool must be right the one
time it runs — at a round deadline)."""

import json
import os
import subprocess
import sys


def test_harvest_dry_run(tmp_path):
    # minimal prepared-tree stub: len(train) = 64 samples -> spe 64//16 = 4
    (tmp_path / "manifest.json").write_text(json.dumps(
        {"models_per_class": 1, "norm_radius": 0.5}))
    (tmp_path / "train_list.txt").write_text(
        "".join(f"0_s{i:03d}.npz\n" for i in range(64)))

    run_dir = tmp_path / "run"
    # latest checkpoint step 9 -> 9//4 + 3 extra = 5 epochs, max_steps 20
    for step in (4, 9):
        (run_dir / str(step)).mkdir(parents=True)
    (run_dir / "config.json").write_text(json.dumps(
        {"batch_size": 16, "steps_per_call": 2, "learning_rate": 1e-3,
         "lr_schedule": "cosine"}))

    res = subprocess.run(
        [sys.executable, os.path.join("/root/repo", "experiments",
                                      "harvest_anneal.py"),
         "--run_dir", str(run_dir), "--data_root", str(tmp_path),
         "--preset", "paperres_xl", "--extra_epochs", "3",
         "--dry_run", "true"],
        capture_output=True, text=True, timeout=300, cwd="/root/repo")
    assert res.returncode == 0, res.stderr[-2000:]
    plan_line, cmd_line = [l for l in res.stdout.splitlines() if l.strip()][-2:]
    plan = json.loads(plan_line)
    assert plan == {"checkpoint_step": 9, "steps_per_epoch": 4,
                    "epochs_short": 5, "max_steps": 20}
    # the exec'd command resumes the SAME run dir with the shortened schedule
    assert "--epochs 5" in cmd_line and "--max_steps 20" in cmd_line
    assert f"--run_dir {run_dir}" in cmd_line
    assert "--steps_per_call 2" in cmd_line and "--lr 0.001" in cmd_line
    assert "supervise.py" in cmd_line and "--max_hours 0.7" in cmd_line
    # the harvest run must carry its own reboot insurance (r5)
    assert "--commit_every 1200" in cmd_line
