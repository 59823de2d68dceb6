#!/bin/bash
cd /root/repo
FR3=/root/reference/rgbd_benchmark/rgbd_dataset_freiburg3_walking_halfsphere
L=artifacts/exp3_cues.log
: > $L
# harris A/B on fr1 (quality + fps)
timeout 900 python tools/ate_exp.py --tag fr1_noharris --frames 790 --no-harris 2>&1 | grep -E "RESULT|Error" >> $L
# fr3 full-sequence cue A/Bs
for args in \
  "--tag fr3_noresid --no-resid-direct" \
  "--tag fr3_huber05 --huber 0.05" \
  "--tag fr3_noharris --no-harris" \
  ; do
  timeout 1500 python tools/ate_exp.py --dataset $FR3 --frames 1018 --window 126 --yolo $args 2>&1 | grep -E "RESULT|Error" >> $L
done
echo DONE-3 >> $L
