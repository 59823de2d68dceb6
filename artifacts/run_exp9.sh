#!/bin/bash
cd /root/repo
FR3=/root/reference/rgbd_benchmark/rgbd_dataset_freiburg3_walking_halfsphere
L=artifacts/exp9_gate.log
: > $L
for mi in 60 50 75; do
  timeout 1500 python tools/ate_exp.py --dataset $FR3 --frames 1018 --window 126 --yolo --min-inliers $mi --tag fr3_mi$mi 2>&1 | grep -E "RESULT|Error" >> $L
done
echo DONE-9 >> $L
