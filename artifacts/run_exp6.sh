#!/bin/bash
cd /root/repo
FR3=/root/reference/rgbd_benchmark/rgbd_dataset_freiburg3_walking_halfsphere
L=artifacts/exp6.log
: > $L
# does the detector actually contribute? simple-MOD vs combined on the window
timeout 900 python tools/ate_exp.py --dataset $FR3 --frames 300 --window 126 --mod \
  --tag fr3_simple_mod 2>&1 | grep -E "RESULT|Error" >> $L
# retrain with filtered labels, more epochs
timeout 3000 python tools/train_person_detector.py --train \
  --data artifacts/mod_boxes_train.npz --eval-data artifacts/mod_boxes_eval.npz \
  --min-area 0.015 --max-area 0.35 --epochs 60 --lr 5e-4 \
  --out artifacts/person_detector_v2.npz 2>&1 | tail -10 >> $L
echo DONE-6 >> $L
