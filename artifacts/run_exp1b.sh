#!/bin/bash
cd /root/repo
L=artifacts/exp1_features.log
for args in \
  "--tag fr1_c32_gauss --frames 300 --cell 32 --pattern gaussian" \
  "--tag fr1_c32_learn --frames 300 --cell 32 --pattern learned" \
  ; do
  timeout 900 python tools/ate_exp.py $args 2>&1 | grep -E "RESULT|Error" >> $L
done
echo DONE-1B >> $L
