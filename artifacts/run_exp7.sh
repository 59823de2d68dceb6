#!/bin/bash
cd /root/repo
FR3=/root/reference/rgbd_benchmark/rgbd_dataset_freiburg3_walking_halfsphere
L=artifacts/exp7.log
: > $L
# does v2 hold the fr3 window? (bench metric, not pseudo-label metric)
cp artifacts/person_detector_v2.npz /tmp/pd_v2.npz
python - <<'PY'
import numpy as np, shutil
shutil.copy('weights/person_detector.npz', '/tmp/pd_v1_backup.npz')
shutil.copy('/tmp/pd_v2.npz', 'weights/person_detector.npz')
PY
timeout 900 python tools/ate_exp.py --dataset $FR3 --frames 300 --window 126 --yolo \
  --tag fr3_v2_weights 2>&1 | grep -E "RESULT|Error" >> $L
cp /tmp/pd_v1_backup.npz weights/person_detector.npz
# augmented retrain
timeout 3600 python tools/train_person_detector.py --train \
  --data artifacts/mod_boxes_train.npz --eval-data artifacts/mod_boxes_eval.npz \
  --min-area 0.015 --max-area 0.35 --epochs 80 --lr 5e-4 --augment \
  --out artifacts/person_detector_v3.npz 2>&1 | tail -6 >> $L
echo DONE-7 >> $L
