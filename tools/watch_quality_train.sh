#!/bin/bash
# Watchdog for an already-running quality trainer (VERDICT r4 item 1).
#
# Differs from run_quality_train.sh: it ADOPTS an existing trainer via a
# PID file instead of spawning inside a `timeout` (whose fixed deadline
# cannot be extended and whose SIGKILL wastes an in-flight cold compile).
# On trainer death before the deadline it restarts from the newest
# checkpoint (--retrain auto); at the deadline it SIGTERMs the trainer by
# PID (never by pattern) so the TPU is freed for evaluation/benchmarks.
#
# Usage: tools/watch_quality_train.sh <deadline_epoch_seconds> [max_epoch]
set -u
DEADLINE_TS=${1:?absolute unix deadline}
MAX_EPOCH=${2:-36}
PIDFILE=/tmp/quality_train.pid
RUN=logs/quality
cd /root/repo

launch() {
  nohup python tools/train.py \
    --data_path data/synth/chunks \
    --train_file_list data/synth/chunks_train.txt \
    --val_file_list data/synth/chunks_val.txt \
    --save "$RUN" --retrain auto \
    --max_epoch "$MAX_EPOCH" --save_epoch 1 \
    --batch_size 8 --lr 0.001 --decay_lr 10 \
    --num_hierarchy_levels 4 --num_iters_per_level 2000 \
    --execution folded --compute_dtype bfloat16 \
    --autotune_capacity 48 >> /tmp/quality_train.log 2>&1 &
  echo $! > "$PIDFILE"
  echo "[watchdog] launched trainer pid $(cat $PIDFILE)"
}

TRIES=0
while :; do
  NOW=$(date +%s)
  if [ "$NOW" -ge "$DEADLINE_TS" ]; then
    if [ -f "$PIDFILE" ] && kill -0 "$(cat $PIDFILE)" 2>/dev/null; then
      echo "[watchdog] deadline: stopping trainer $(cat $PIDFILE)"
      kill "$(cat $PIDFILE)" 2>/dev/null
      sleep 30
      kill -9 "$(cat $PIDFILE)" 2>/dev/null
    fi
    echo "[watchdog] done"
    break
  fi
  if [ -f "$PIDFILE" ] && kill -0 "$(cat $PIDFILE)" 2>/dev/null; then
    sleep 60
    continue
  fi
  # trainer is gone: finished (max_epoch) or crashed (OOM). A finished
  # run leaves model-epoch-$((MAX_EPOCH-1)).ckpt — do not relaunch then.
  if [ -f "$RUN/model-epoch-$((MAX_EPOCH - 1)).ckpt" ]; then
    echo "[watchdog] training completed (epoch $((MAX_EPOCH - 1)) ckpt)"
    break
  fi
  TRIES=$((TRIES + 1))
  if [ "$TRIES" -gt 8 ]; then
    echo "[watchdog] too many restarts"; break
  fi
  echo "[watchdog] trainer dead; restart #$TRIES"
  launch
  sleep 60
done
echo "[watchdog] exit"
