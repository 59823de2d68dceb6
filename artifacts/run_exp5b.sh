#!/bin/bash
cd /root/repo
L=artifacts/exp5.log
timeout 1800 python tools/train_person_detector.py --collect --start 300 \
  --out artifacts/mod_boxes_train.npz 2>&1 | tail -3 >> $L
timeout 900 python tools/train_person_detector.py --collect --start 0 --max-frames 130 \
  --out artifacts/mod_boxes_eval.npz 2>&1 | tail -3 >> $L
timeout 2400 python tools/train_person_detector.py --train \
  --data artifacts/mod_boxes_train.npz --eval-data artifacts/mod_boxes_eval.npz \
  --out weights/person_detector.npz 2>&1 | tail -8 >> $L
echo DONE-5B >> $L
