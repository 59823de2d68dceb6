#!/bin/bash
# Round-5 experiment 1: feature-detector A/B (cell x pattern) on fr1 + fr3
cd /root/repo
FR3=/root/reference/rgbd_benchmark/rgbd_dataset_freiburg3_walking_halfsphere
L=artifacts/exp1_features.log
: > $L
for args in \
  "--tag fr1_c32_gauss --frames 300 --cell 32 --pattern gaussian" \
  "--tag fr1_c32_learn --frames 300 --cell 32 --pattern learned" \
  "--tag fr1_c16_gauss --frames 300 --cell 16 --pattern gaussian" \
  ; do
  timeout 600 python tools/ate_exp.py $args 2>&1 | grep -E "RESULT|Error" >> $L
done
for args in \
  "--tag fr3_c32_gauss --frames 300 --window 126 --yolo" \
  "--tag fr3_c32_learn --frames 300 --window 126 --yolo --pattern learned" \
  "--tag fr3_c16_gauss --frames 300 --window 126 --yolo --cell 16" \
  "--tag fr3_c16_learn --frames 300 --window 126 --yolo --cell 16 --pattern learned" \
  ; do
  timeout 600 python tools/ate_exp.py --dataset $FR3 $args 2>&1 | grep -E "RESULT|Error" >> $L
done
echo DONE >> $L
