#!/bin/sh
# Endgame relaunch for runs/xl1: if the harvest supervisor's wall-clock
# budget stop (or a reboot) lands before max_steps 100386, this covers the
# remaining steps of the 99-epoch shortened anneal + the automatic final
# eval.  Bounded so nothing holds the TPU chip at round end; carries the
# supervisor-owned reboot-insurance committer.  Safe to re-run: the trainer
# resumes from the latest checkpoint and exits rc 0 at max_steps.
cd "$(dirname "$0")/.." || exit 1
exec python experiments/supervise.py --run_dir runs/xl1 \
  --stall_secs 1500 --startup_grace_secs 1800 --max_restarts 4 \
  --max_hours 1.2 --commit_every 1200 -- \
  python experiments/run_full.py --run_dir runs/xl1 --data_root data/mv24 \
  --preset paperres_xl --epochs 99 --max_steps 100386 --with_latent true \
  --reuse_ae runs/hr1/ae --steps_per_call 20 --lr 3e-4 --lr_schedule cosine \
  --eval_every 1 --save_every 1 --eval_batch_size 48 --log_every 1000
