#!/bin/bash
cd /root/repo
FR3=/root/reference/rgbd_benchmark/rgbd_dataset_freiburg3_walking_halfsphere
L=artifacts/exp3_cues.log
# inlier-gate experiments on full fr3
for args in \
  "--tag fr3_min60 --min-inliers 60" \
  "--tag fr3_min60_huber --min-inliers 60 --huber 0.05" \
  ; do
  timeout 1500 python tools/ate_exp.py --dataset $FR3 --frames 1018 --window 126 --yolo $args 2>&1 | grep -E "RESULT|Error" >> $L
done
# true bench-protocol fr1 fps at HEAD
BENCH_FRAMES=790 timeout 900 python bench.py --seq fr1 >> $L 2>&1
# per-stage timing (harris on)
timeout 900 python tools/stage_bench.py --warm-frames 40 --reps 10 >> artifacts/stage_bench_head.log 2>&1
echo DONE-4 >> $L
