#!/bin/bash
# Round-5 queue A: adaptive_effort sweep on the 100-case plain protocol
# (VERDICT r4 task 1). Protocol matches the round-4 probe rows exactly:
# plain SICNav-p (privileged RA-L capsule), hallway bottleneck, 30 s,
# 15 IPM iters, 100 cases. Control (ae=0) is the round-4 row 78/4/19/61
# (identical program when adaptive_effort=0 — the flag only changes
# codegen when >0).
cd /root/repo
for AE in 8 15 30; do
  echo "=== adaptive_effort=$AE $(date -u +%H:%M:%S) ===" >> .progress/queue_r5a.log
  timeout 5400 python scripts/eval_suite.py --policy campc --privileged \
    --scenario hallway_bottleneck --time_limit 30 --num_cases 100 \
    --batch 25 --ipm_iters 15 --adaptive_effort $AE \
    --progress_file .progress/ae${AE}.jsonl \
    > .progress/ae${AE}.json 2>> .progress/queue_r5a.log
  echo "=== done ae=$AE rc=$? $(date -u +%H:%M:%S) ===" >> .progress/queue_r5a.log
done
echo "QUEUE A COMPLETE" >> .progress/queue_r5a.log
