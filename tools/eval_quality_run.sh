#!/bin/bash
# Post-training evaluation of the quality run (VERDICT r4 item 1):
#   1. convergence table from the CSV logs
#   2. whole-scene inference + meshes on held-out val scenes
#   3. scene-level metrics (evaluate.py) with the trained checkpoint
#   4. converter involution on the trained checkpoint
# Run AFTER tools/train.py has written checkpoints to logs/quality
# (the TPU must be free — one TPU process at a time on this tunnel).
set -e
RUN=${1:-logs/quality}
DATA=${2:-data/synth}
# prefer the final per-epoch checkpoint (numerically last), not the
# newest by mtime (which can be a mid-epoch iter snapshot)
_default_ckpt() {
  local best
  best=$(ls "$RUN"/model-epoch-*.ckpt 2>/dev/null | sort -t- -k3 -n | tail -1)
  [ -n "$best" ] && { echo "$best"; return; }
  ls -t "$RUN"/*.ckpt | head -1
}
CKPT=${3:-$(_default_ckpt)}
OUT=${4:-$RUN/eval}
cd /root/repo

echo "== checkpoint: $CKPT"
python tools/summarize_train.py $RUN

echo "== scene inference + meshes (held-out val scenes)"
python tools/test_scene.py \
  --input_data_path $DATA/incomplete --target_data_path $DATA/complete \
  --test_file_list $DATA/scenes_val.txt --model_path "$CKPT" \
  --output $OUT/scenes --max_to_vis 6 --dim_round 32 128 128 \
  --execution folded --compute_dtype bfloat16

echo "== scene-level metrics"
python tools/evaluate.py \
  --input_data_path $DATA/incomplete --target_data_path $DATA/complete \
  --test_file_list $DATA/scenes_val.txt --model_path "$CKPT" \
  --max_scenes 6 --execution folded --compute_dtype bfloat16 \
  --dim_round 32 128 128 \
  --output $OUT/metrics.json
cat $OUT/metrics.json

echo "== converter involution on trained weights"
env JAX_PLATFORMS=cpu SGNN_TRAINED_CKPT="$CKPT" \
  python -m pytest tests/test_ckpt_convert.py::test_export_involution_trained_ckpt -q
