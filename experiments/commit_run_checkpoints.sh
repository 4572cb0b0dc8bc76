#!/bin/sh
# Periodically commit a training run's checkpoints/metrics to git.
#
# The host can REBOOT between sessions (it did twice in round 4) and every
# uncommitted byte is lost -- runs/xl1 died twice because the CLAUDE.md
# "commit your checkpoints" rule had no mechanism.  This is the mechanism:
#
#   nohup sh experiments/commit_run_checkpoints.sh runs/xl1 900 \
#       > /tmp/ckpt_commit.log 2>&1 &
#
# Every INTERVAL seconds (default 900) it stages the run dir and commits iff
# a NEW latest checkpoint step appeared since the previous commit.  Orbax
# finalizes step dirs atomically (tmp dir + rename), so whatever is staged is
# a complete snapshot; max_to_keep=3 bounds the staged size.
#
# Round-4 advisor post-mortem: the original loop was a silent no-op against
# this repo's own .gitignore (runs/* is ignored; `git add` exited 1, stderr
# was discarded, and the "retry" spun forever).  Hence the three hard rules
# below: `add -f` (gitignore must never veto insurance), commit with an
# explicit pathspec (a concurrent session's staged files must never be swept
# into -- or polluted by -- a Checkpoint commit), and NEVER discard git
# stderr (failures must be visible in the log).
set -u
RUN_DIR="${1:?usage: commit_run_checkpoints.sh <run_dir> [interval_s]}"
INTERVAL="${2:-900}"
cd "$(dirname "$0")/.." || exit 1
last=""
while :; do
    # newest fully-written orbax step dir (numeric names only)
    step=$(ls "$RUN_DIR" 2>/dev/null | grep -E '^[0-9]+$' | sort -n | tail -1)
    if [ -n "$step" ] && [ "$step" != "$last" ]; then
        for i in 1 2 3; do
            if git add -f -A -- "$RUN_DIR" \
               && git commit -q -m "Checkpoint $RUN_DIR @ step $step (reboot insurance)" \
                    -m "No-Verification-Needed: training checkpoint artifact only" \
                    -- "$RUN_DIR"; then
                echo "$(date -u +%FT%TZ) committed $RUN_DIR step $step"
                last="$step"
                break
            fi
            echo "$(date -u +%FT%TZ) attempt $i for step $step failed; retrying"
            sleep 20   # index.lock contention -- retry
        done
    fi
    sleep "$INTERVAL"
done
