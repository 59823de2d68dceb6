#!/bin/bash
# exp13: INSERTION-only gating on ICP-invalid frames (--insert-gate), the
# corrected granularity after exp12's whole-update freeze death spiral.
# Baseline fr3_head_v3: w126 0.1215, full 0.5737, icp 71.5%.
cd /root/repo
timeout 1800 python tools/ate_exp.py \
  --dataset /root/reference/rgbd_benchmark/rgbd_dataset_freiburg3_walking_halfsphere \
  --cam fr3 --frames 1018 --yolo --insert-gate --window 126 \
  --save artifacts/fr3_insgate.txt --tag exp13_insgate
