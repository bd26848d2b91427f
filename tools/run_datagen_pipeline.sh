#!/bin/bash
# Full synthetic-dataset pipeline for the training-quality run
# (VERDICT r3 item 1). Stages resume if interrupted.
set -e
OUT=${1:-/root/repo/data/synth}
N=${2:-160}
cd /root/repo
python tools/make_synthetic_scenes.py --out $OUT --num_scenes $N --frames 40
python tools/generate_scans.py \
  --scan_path $OUT/scans --scan_mesh_path $OUT/meshes \
  --scene_file_list $OUT/scenes.txt \
  --output_complete $OUT/complete --output_incomplete $OUT/incomplete \
  --incomplete_frame_path $OUT/frames
python tools/make_chunks.py \
  --input_data_path $OUT/incomplete --target_data_path $OUT/complete \
  --scene_file_list $OUT/scenes_train.txt \
  --output $OUT/chunks --list_out $OUT/chunks_train.txt
python tools/make_chunks.py \
  --input_data_path $OUT/incomplete --target_data_path $OUT/complete \
  --scene_file_list $OUT/scenes_val.txt \
  --output $OUT/chunks --list_out $OUT/chunks_val.txt
echo "PIPELINE DONE: $(wc -l < $OUT/chunks_train.txt) train / $(wc -l < $OUT/chunks_val.txt) val chunks"
