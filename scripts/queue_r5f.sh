#!/bin/bash
# Round-5 queue F (final block), value-ordered for the remaining round
# wall clock (relaunched after a session drop killed the first attempt
# 13 min into the first training; everything here is either short or
# per-batch resumable, so a hard cut at the round deadline loses at
# most one batch):
#   1. multi-class maneuver-mode training: dispatch vs --no_dispatch
#      (VERDICT r4 task 6) — ~10-20 min each on the chip (r4 speed-mode
#      precedent: 368 s)
#   2. queue D = the full Kalman robustness table (VERDICT task 4),
#      fused sigma=0.05 A/B first
#   3. fused multi-start retry at batch 5 (task 7; the batch-10 attempt
#      tripped the ~13-min single-execution TPU worker kill)
#   4. 500-case noisy-fused rows raw then filtered (task 8), resumable
#   5. optional tail: 500-case traced fused definitive (the r4 500-case
#      definitive + the r5 100-case traced audit already cover it)
# EXTRA_DEFAULTS is filled at launch with whatever the latch/ms4 probes
# selected (empty = r4 shipped defaults; the r5 latch probes were all
# within noise, so the shipped defaults stand).
cd /root/repo
LOG=.progress/queue_r5f.log
EXTRA_DEFAULTS="$1"

echo "=== train mc maneuver dispatch $(date -u +%H:%M:%S) ===" >> $LOG
timeout 5400 python scripts/train_jmid.py --dataset sim --multi_class \
  --class_mode maneuver --n_scenes 320 --epochs 40 \
  --out checkpoints/jmid_mc_man \
  > .progress/train_mc_man.json 2>> $LOG
echo "=== done rc=$? ===" >> $LOG
echo "=== train mc maneuver no_dispatch $(date -u +%H:%M:%S) ===" >> $LOG
timeout 5400 python scripts/train_jmid.py --dataset sim --multi_class \
  --class_mode maneuver --no_dispatch --n_scenes 320 --epochs 40 \
  --out checkpoints/jmid_mc_man_nod \
  > .progress/train_mc_man_nod.json 2>> $LOG
echo "=== done rc=$? ===" >> $LOG

bash scripts/queue_r5d.sh
echo "=== queue D done $(date -u +%H:%M:%S) ===" >> $LOG

# fused multi-start probe retry (task 7): the batch-10 attempt killed
# the TPU worker (4 vmapped IPM solves per step x 10 lanes exceeds the
# ~13-min single-execution limit); batch 5 halves the per-execution time
echo "=== fused ms4resc retry (batch 5) $(date -u +%H:%M:%S) ===" >> $LOG
timeout 10800 python scripts/eval_suite.py --policy sicnav_diffusion \
  --checkpoint checkpoints/jmid_hallway --scenario hallway_bottleneck \
  --time_limit 30 --num_cases 100 --batch 5 --ipm_iters 30 \
  --multi_start 4 --rescue_best_margin \
  --progress_file .progress/fused_ms4resc.jsonl \
  > .progress/fused_ms4resc.json 2>> $LOG
echo "=== done ms4resc rc=$? $(date -u +%H:%M:%S) ===" >> $LOG

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

# optional tail: FINAL 500-case fused definitive as ONE traced
# suite_audit at the shipped defaults (headline + collision + timeout
# taxonomies in one run) — only reached if everything above fit
echo "=== FINAL 500-case fused definitive (traced) $(date -u +%H:%M:%S) ===" >> $LOG
timeout 28800 python scripts/suite_audit.py --policy sicnav_diffusion \
  --checkpoint checkpoints/jmid_hallway --scenario hallway_bottleneck \
  --time_limit 30 --num_cases 500 --batch 10 --ipm_iters 30 \
  $EXTRA_DEFAULTS \
  --resume_dir .progress/fused500_audit_ckpt \
  --out .progress/fused500_audit.json >> $LOG 2>&1
echo "=== done definitive rc=$? $(date -u +%H:%M:%S) ===" >> $LOG
echo "QUEUE F COMPLETE $(date -u +%H:%M:%S)" >> $LOG
