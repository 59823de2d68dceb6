#!/bin/bash
cd /root/repo
FR3=/root/reference/rgbd_benchmark/rgbd_dataset_freiburg3_walking_halfsphere
L=artifacts/exp10_heat.log
: > $L
# wait for any ate_exp still on the chip
while pgrep -f "min-inliers" > /dev/null; do sleep 10; done
# heat A/B: full fr3 with the temporal-heat persistence at two decays vs HEAD
for args in \
  "--tag fr3_heat85 --heat 0.85" \
  "--tag fr3_head_v3" \
  "--tag fr3_heat92 --heat 0.92" \
  ; do
  timeout 1500 python tools/ate_exp.py --dataset $FR3 --frames 1018 --window 126 --yolo $args 2>&1 | grep -E "RESULT|Error|error" >> $L
done
echo DONE-10 >> $L
