#!/bin/bash
# exp12: freeze model update on ICP-invalid frames (flag --freeze-loss)
# vs committed baseline fr3_head_v3 (w126 0.1215, full 0.5737).
cd /root/repo
timeout 1800 python tools/ate_exp.py \
  --dataset /root/reference/rgbd_benchmark/rgbd_dataset_freiburg3_walking_halfsphere \
  --cam fr3 --frames 1018 --yolo --freeze-loss --window 126 \
  --save artifacts/fr3_freeze.txt --tag exp12_freeze
