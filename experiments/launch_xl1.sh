#!/bin/sh
# Autonomous xl1 (third) launch: waits for the dataset regen and any running
# bench to finish (ONE TPU process at a time -- CLAUDE.md), then starts the
# paperres_xl capacity run under the stall watchdog with the checkpoint
# committer alongside.  Designed to be nohup'd so it survives the session:
#
#   nohup sh experiments/launch_xl1.sh > /tmp/launch_xl1.log 2>&1 &
#
# Round-3 verdict #1: fresh 200-epoch cosine at hidden 256 + EMA 0.999,
# batch 16 / k=20 (the proven worker envelope, .envelope_probes.json).
set -u
cd "$(dirname "$0")/.." || exit 1

# prep.py writes manifest.json LAST, so its existence == tree complete
echo "$(date -u +%FT%TZ) waiting for data/mv24/manifest.json"
while [ ! -f data/mv24/manifest.json ]; do sleep 60; done
echo "$(date -u +%FT%TZ) dataset ready ($(ls data/mv24/train | wc -l) train files)"

if [ -f /tmp/bench.pid ]; then
    bp=$(cat /tmp/bench.pid)
    while kill -0 "$bp" 2>/dev/null; do
        echo "$(date -u +%FT%TZ) waiting for bench (pid $bp) to release the chip"
        sleep 30
    done
fi
echo "$(date -u +%FT%TZ) chip free; launching xl1"

# reboot insurance is OWNED by the supervisor (--commit_every): no launch
# path can forget it, and the committer is reaped with the supervisor
exec python experiments/supervise.py --run_dir runs/xl1 --max_hours 9 \
    --commit_every 1200 -- \
    python experiments/run_full.py --run_dir runs/xl1 --preset paperres_xl \
    --data_root data/mv24 --epochs 200 --with_latent true \
    --reuse_ae runs/hr1/ae --steps_per_call 20 --lr_schedule cosine \
    --eval_every 5 --save_every 1 --eval_batch_size 48 --log_every 1000
