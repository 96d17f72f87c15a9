#!/bin/bash
# Round-5 queue F (final block):
#   1. multi-class maneuver-mode training: dispatch vs --no_dispatch
#      (VERDICT r4 task 6)
#   2. the FINAL 500-case fused definitive as ONE traced suite_audit at
#      the shipped defaults (headline + collision + timeout taxonomies,
#      VERDICT tasks 1/3) — resumable per-batch
#   3. Kalman robustness rows (queue_r5d, VERDICT task 4)
#   4. 500-case noisy-fused rows with/without the filter (task 8),
#      resumable — run last so a round-end cut still leaves a prefix
# EXTRA_DEFAULTS is filled at launch with whatever the latch/ms4 probes
# selected (empty = r4 shipped defaults).
cd /root/repo
LOG=.progress/queue_r5f.log
EXTRA_DEFAULTS="$1"

echo "=== train mc maneuver dispatch $(date -u +%H:%M:%S) ===" >> $LOG
timeout 7200 python scripts/train_jmid.py --dataset sim --multi_class \
  --class_mode maneuver --n_scenes 320 --epochs 40 \
  --out checkpoints/jmid_mc_man \
  > .progress/train_mc_man.json 2>> $LOG
echo "=== done rc=$? ===" >> $LOG
echo "=== train mc maneuver no_dispatch $(date -u +%H:%M:%S) ===" >> $LOG
timeout 7200 python scripts/train_jmid.py --dataset sim --multi_class \
  --class_mode maneuver --no_dispatch --n_scenes 320 --epochs 40 \
  --out checkpoints/jmid_mc_man_nod \
  > .progress/train_mc_man_nod.json 2>> $LOG
echo "=== done rc=$? ===" >> $LOG

echo "=== FINAL 500-case fused definitive (traced) $(date -u +%H:%M:%S) ===" >> $LOG
timeout 28800 python scripts/suite_audit.py --policy sicnav_diffusion \
  --checkpoint checkpoints/jmid_hallway --scenario hallway_bottleneck \
  --time_limit 30 --num_cases 500 --batch 10 --ipm_iters 30 \
  $EXTRA_DEFAULTS \
  --resume_dir .progress/fused500_audit_ckpt \
  --out .progress/fused500_audit.json >> $LOG 2>&1
echo "=== done definitive rc=$? $(date -u +%H:%M:%S) ===" >> $LOG

bash scripts/queue_r5d.sh
echo "=== queue D done $(date -u +%H:%M:%S) ===" >> $LOG

# task 8: 500-case noisy fused, raw then filtered (resumable)
for KF in "" "--kalman_filter"; do
  TAG=$([ -z "$KF" ] && echo raw || echo kf)
  echo "=== noisy fused 500 $TAG $(date -u +%H:%M:%S) ===" >> $LOG
  timeout 28800 python scripts/eval_suite.py --policy sicnav_diffusion \
    --checkpoint checkpoints/jmid_hallway --scenario hallway_bottleneck \
    --time_limit 30 --num_cases 500 --batch 10 --ipm_iters 30 \
    --noise_std 0.05 $KF $EXTRA_DEFAULTS \
    --progress_file .progress/noisy500_$TAG.jsonl \
    > .progress/noisy500_$TAG.json 2>> $LOG
  echo "=== done noisy500 $TAG rc=$? $(date -u +%H:%M:%S) ===" >> $LOG
done
echo "QUEUE F COMPLETE $(date -u +%H:%M:%S)" >> $LOG
