#!/bin/bash
# Round-5 queue D (VERDICT r4 task 4): the robustness standing table at
# 100 cases with and without the Kalman mitigation — both controllers,
# sigma in {0.05, 0.10}. 100-case denominators so the ±7-pt noise of the
# round-4 50-case table cannot hide the filter's effect.
cd /root/repo
LOG=.progress/queue_r5d.log
run_plain () {  # $1 sigma  $2 kf-flag  $3 tag
  echo "=== plain $3 $(date -u +%H:%M:%S) ===" >> $LOG
  timeout 7200 python scripts/eval_suite.py --policy campc --privileged \
    --scenario hallway_bottleneck --time_limit 30 --num_cases 100 \
    --batch 25 --ipm_iters 15 --noise_std $1 $2 \
    --progress_file .progress/rob_plain_$3.jsonl \
    > .progress/rob_plain_$3.json 2>> $LOG
  echo "=== done plain $3 rc=$? $(date -u +%H:%M:%S) ===" >> $LOG
}
run_fused () {
  echo "=== fused $3 $(date -u +%H:%M:%S) ===" >> $LOG
  timeout 10800 python scripts/eval_suite.py --policy sicnav_diffusion \
    --checkpoint checkpoints/jmid_hallway --scenario hallway_bottleneck \
    --time_limit 30 --num_cases 100 --batch 10 --ipm_iters 30 \
    --noise_std $1 $2 \
    --progress_file .progress/rob_fused_$3.jsonl \
    > .progress/rob_fused_$3.json 2>> $LOG
  echo "=== done fused $3 rc=$? $(date -u +%H:%M:%S) ===" >> $LOG
}
# value-ordered: the fused sigma=0.05 pair is the headline mitigation
# A/B; plain pairs are cheap; fused sigma=0.10 runs last so a round-end
# cut costs the least-informative rows
run_fused 0.05 ""              s05_raw
run_fused 0.05 --kalman_filter s05_kf
run_plain 0.05 ""              s05_raw
run_plain 0.05 --kalman_filter s05_kf
run_plain 0.10 ""              s10_raw
run_plain 0.10 --kalman_filter s10_kf
run_fused 0.10 ""              s10_raw
run_fused 0.10 --kalman_filter s10_kf
echo "QUEUE D COMPLETE $(date -u +%H:%M:%S)" >> $LOG
