#!/bin/bash
cd /root/repo
FR3=/root/reference/rgbd_benchmark/rgbd_dataset_freiburg3_walking_halfsphere
L=artifacts/exp11_heat2.log
: > $L
while pgrep -f "fr3_head_v3" > /dev/null; do sleep 10; done
timeout 1500 python tools/ate_exp.py --dataset $FR3 --frames 1018 --window 126 --yolo --heat 0.85 --tag fr3_heatB85 2>&1 | grep -E "RESULT|Error" >> $L
echo DONE-11 >> $L
