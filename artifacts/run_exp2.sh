#!/bin/bash
cd /root/repo
FR3=/root/reference/rgbd_benchmark/rgbd_dataset_freiburg3_walking_halfsphere
L=artifacts/exp1_features.log
timeout 900 python tools/ate_exp.py --tag fr1_c32_gauss --frames 790 --cell 32 --pattern gaussian \
  --save artifacts/fr1_c32.txt 2>&1 | grep -E "RESULT|Error" >> $L
timeout 1500 python tools/ate_exp.py --dataset $FR3 --tag fr3_full_c32_gauss --frames 1018 \
  --window 126 --yolo --save artifacts/fr3_c32.txt --dump-tele artifacts/fr3_c32_tele.npz \
  2>&1 | grep -E "RESULT|Error" >> $L
echo DONE-2 >> $L
