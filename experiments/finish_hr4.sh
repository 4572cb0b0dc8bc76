#!/bin/sh
# Endgame relaunch for runs/hr4: after the main supervisor's wall-clock
# budget stop, cover the last ~2k steps to max_steps 131820 (the shortened
# cosine anneal's end) + the automatic final eval.  Bounded so nothing holds
# the TPU chip at round end.
cd "$(dirname "$0")/.." || exit 1
exec python experiments/supervise.py --run_dir runs/hr4 \
  --stall_secs 1500 --startup_grace_secs 1800 --max_restarts 4 \
  --max_hours 0.9 -- \
  python experiments/run_full.py --run_dir runs/hr4 --data_root data/mv24 \
  --preset paperres --epochs 130 --max_steps 131820 --with_latent true \
  --reuse_ae runs/hr1/ae --steps_per_call 20 --lr 3e-4 --lr_schedule cosine \
  --eval_every 5 --save_every 2 --eval_batch_size 48 --log_every 1000
