#!/bin/bash
# Round-5 queue H (closing block, chip freed early because the noisy
# rows ran ~4x faster than planned on the warm cache):
#   1. sigma=0.10 fused + Kalman at accel_std 0.5 (100 cases): the
#      round-5 robustness table found the shipped accel_std=2.0 filter
#      recovers nav quality but NOT collisions at 10 cm noise and
#      attributed that to the CV process model under-smoothing; this
#      probe either buys collisions back (ship a tuned recommendation)
#      or confirms the lag-vs-smoothing tradeoff as a measured limit.
#   2. the optional FINAL 500-case traced fused definitive at shipped
#      defaults (headline + collision + timeout taxonomies in one
#      traced run), resumable.
cd /root/repo
LOG=.progress/queue_r5h.log
GPID="$1"

if [ -n "$GPID" ]; then
  echo "waiting for queue G pid $GPID $(date -u +%H:%M:%S)" >> $LOG
  while kill -0 "$GPID" 2>/dev/null; do sleep 20; done
fi
echo "chip free $(date -u +%H:%M:%S)" >> $LOG

echo "=== fused s10 kf accel 0.5 $(date -u +%H:%M:%S) ===" >> $LOG
timeout 5400 python scripts/eval_suite.py --policy sicnav_diffusion \
  --checkpoint checkpoints/jmid_hallway --scenario hallway_bottleneck \
  --time_limit 30 --num_cases 100 --batch 10 --ipm_iters 30 \
  --noise_std 0.10 --kalman_filter --kf_accel_std 0.5 \
  --progress_file .progress/rob_fused_s10_kf05.jsonl \
  > .progress/rob_fused_s10_kf05.json 2>> $LOG
echo "=== done accel probe rc=$? $(date -u +%H:%M:%S) ===" >> $LOG

echo "=== FINAL 500-case fused definitive (traced) $(date -u +%H:%M:%S) ===" >> $LOG
timeout 14400 python scripts/suite_audit.py --policy sicnav_diffusion \
  --checkpoint checkpoints/jmid_hallway --scenario hallway_bottleneck \
  --time_limit 30 --num_cases 500 --batch 10 --ipm_iters 30 \
  --resume_dir .progress/fused500_audit_ckpt \
  --out .progress/fused500_audit.json >> $LOG 2>&1
echo "=== done definitive rc=$? $(date -u +%H:%M:%S) ===" >> $LOG
echo "QUEUE H COMPLETE $(date -u +%H:%M:%S)" >> $LOG
