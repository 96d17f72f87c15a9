#!/bin/bash
# Round-5 queue B (VERDICT r4 task 2): re-power the floor and the plain
# control at 500 cases — matched denominators for the floor/plain/fused
# table with binomial CIs. Protocol: hallway bottleneck, 3 ORCA-plus
# humans, 30 s limit; plain = SICNav-p privileged RA-L capsule at the
# 15-iter frontier (the 100-case control rows' config); floor = pure
# reciprocal ORCA robot (eval_suite --policy orca_plus).
cd /root/repo
LOG=.progress/queue_r5b.log
echo "=== floor orca_plus 500 $(date -u +%H:%M:%S) ===" >> $LOG
timeout 7200 python scripts/eval_suite.py --policy orca_plus \
  --scenario hallway_bottleneck --time_limit 30 --num_cases 500 \
  --batch 50 --progress_file .progress/floor500.jsonl \
  > .progress/floor500.json 2>> $LOG
echo "=== done floor rc=$? $(date -u +%H:%M:%S) ===" >> $LOG
echo "=== plain campc 500 $(date -u +%H:%M:%S) ===" >> $LOG
timeout 14400 python scripts/eval_suite.py --policy campc --privileged \
  --scenario hallway_bottleneck --time_limit 30 --num_cases 500 \
  --batch 25 --ipm_iters 15 --progress_file .progress/plain500.jsonl \
  > .progress/plain500.json 2>> $LOG
echo "=== done plain rc=$? $(date -u +%H:%M:%S) ===" >> $LOG
echo "QUEUE B COMPLETE" >> $LOG
