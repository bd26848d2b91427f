#!/bin/bash
# Supervised quality-run trainer (VERDICT r4 item 1).
#
# Wraps tools/train.py with:
#   - elastic resume (--retrain auto picks the newest epoch checkpoint)
#   - restart-on-crash (the long fade-in run must survive host OOM /
#     tunnel hiccups; per-epoch checkpoints make restarts cheap)
#   - a wall-clock deadline so the TPU is always freed for benchmarking
#
# Usage: tools/run_quality_train.sh [deadline_seconds] [max_epoch]
set -u
DEADLINE=${1:-9000}
MAX_EPOCH=${2:-60}
RUN=logs/quality
cd /root/repo
START=$(date +%s)
TRIES=0
while :; do
  NOW=$(date +%s); LEFT=$((DEADLINE - (NOW - START)))
  if [ "$LEFT" -le 120 ]; then echo "[supervisor] deadline reached"; break; fi
  if [ "$TRIES" -ge 12 ]; then echo "[supervisor] too many restarts"; break; fi
  TRIES=$((TRIES + 1))
  echo "[supervisor] attempt $TRIES, ${LEFT}s left"
  timeout "$LEFT" python tools/train.py \
    --data_path data/synth/chunks \
    --train_file_list data/synth/chunks_train.txt \
    --val_file_list data/synth/chunks_val.txt \
    --save "$RUN" --retrain auto \
    --max_epoch "$MAX_EPOCH" --save_epoch 1 \
    --batch_size 8 --lr 0.001 --decay_lr 10 \
    --num_hierarchy_levels 4 --num_iters_per_level 1000 \
    --fuse_train_bn "${FUSE_TRAIN_BN:-1}" \
    --execution folded --compute_dtype bfloat16 \
    --transfer_dtype bfloat16 \
    --rss_restart_gb 80 \
    --autotune_capacity 48
  RC=$?
  if [ "$RC" -eq 0 ]; then echo "[supervisor] training completed"; break; fi
  if [ "$RC" -eq 75 ]; then
    # planned RSS rotation (train/loop.py rss_restart_gb): a clean
    # checkpoint was written; the restart is not a failure
    echo "[supervisor] planned RSS rotation; restarting from its ckpt"
    TRIES=$((TRIES - 1))
    sleep 2
    continue
  fi
  echo "[supervisor] train.py exited rc=$RC; restarting from latest ckpt"
  sleep 5
done
echo "[supervisor] done"
