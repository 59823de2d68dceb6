#!/bin/bash
cd /root/repo
while pgrep -f "fr3_heatB85" > /dev/null; do sleep 10; done
timeout 2000 python tools/regression_gate.py > artifacts/regression_gate.log 2>&1
echo GATE-DONE >> artifacts/regression_gate.log
