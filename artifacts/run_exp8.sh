#!/bin/bash
cd /root/repo
FR3=/root/reference/rgbd_benchmark/rgbd_dataset_freiburg3_walking_halfsphere
L=artifacts/exp8.log
: > $L
for args in \
  "--tag fr3_v2 --weights artifacts/person_detector_v2.npz" \
  "--tag fr3_v3 --weights artifacts/person_detector_v3.npz" \
  ; do
  timeout 900 python tools/ate_exp.py --dataset $FR3 --frames 300 --window 126 --yolo $args 2>&1 | grep -E "RESULT|Error" >> $L
done
echo DONE-8 >> $L
