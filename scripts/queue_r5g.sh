#!/bin/bash
# Round-5 queue G: replacement tail for queue F after its wrapper was
# retired mid-round. Rationale: the original tail ran the two 500-case
# noisy-fused rows (VERDICT r4 task 8) sequentially raw-then-filtered,
# which the round deadline would cut to "raw complete, filtered absent".
# This tail runs the SAME two rows in resumable 250-case chunks,
# FILTER-FIRST (the mitigation-at-scale number is the one the round
# needs; raw sigma=0.05 is already measured at 100 cases), then grows
# both to 500 with the per-batch resume machinery — so a deadline cut at
# any point leaves BALANCED denominators instead of a lopsided pair.
# Waits for the in-flight fused ms4 probe (task 7) to release the chip.
cd /root/repo
LOG=.progress/queue_r5g.log
MS4PID="$1"

if [ -n "$MS4PID" ]; then
  echo "waiting for ms4 eval pid $MS4PID $(date -u +%H:%M:%S)" >> $LOG
  while kill -0 "$MS4PID" 2>/dev/null; do sleep 20; done
fi
echo "chip free $(date -u +%H:%M:%S)" >> $LOG

run_chunk () {  # $1 kf-flag  $2 tag  $3 num_cases
  echo "=== noisy $2 n=$3 $(date -u +%H:%M:%S) ===" >> $LOG
  timeout 4500 python scripts/eval_suite.py --policy sicnav_diffusion \
    --checkpoint checkpoints/jmid_hallway --scenario hallway_bottleneck \
    --time_limit 30 --num_cases $3 --batch 10 --ipm_iters 30 \
    --noise_std 0.05 $1 \
    --progress_file .progress/noisy500_$2.jsonl \
    > .progress/noisy500_$2.json 2>> $LOG
  echo "=== done noisy $2 n=$3 rc=$? $(date -u +%H:%M:%S) ===" >> $LOG
}

run_chunk "--kalman_filter" kf  250
run_chunk ""                raw 250
run_chunk "--kalman_filter" kf  500
run_chunk ""                raw 500
echo "QUEUE G COMPLETE $(date -u +%H:%M:%S)" >> $LOG
