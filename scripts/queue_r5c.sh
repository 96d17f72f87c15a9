#!/bin/bash
# Round-5 queue C: (1) adaptive_effort MECHANISM check — traced plain
# audits at ae=0 vs ae=30 to compare the consecutive-failure-window
# histogram (guess_streak_hist) the round-4 taxonomy blamed; (2) the
# fused 100-case traced audit at the SHIPPED defaults — the timeout
# taxonomy that guides the round-5 yield-latch tuning (VERDICT task 3).
cd /root/repo
LOG=.progress/queue_r5c.log
echo "=== tax ae0 $(date -u +%H:%M:%S) ===" >> $LOG
timeout 7200 python scripts/collision_taxonomy.py --policy campc --privileged \
  --scenario hallway_bottleneck --time_limit 30 --num_cases 100 --batch 25 \
  --ipm_iters 15 --resume_dir .progress/tax_ae0_ckpt \
  --out .progress/tax_ae0.json >> $LOG 2>&1
echo "=== tax ae30 $(date -u +%H:%M:%S) ===" >> $LOG
timeout 7200 python scripts/collision_taxonomy.py --policy campc --privileged \
  --scenario hallway_bottleneck --time_limit 30 --num_cases 100 --batch 25 \
  --ipm_iters 15 --mpc_kw adaptive_effort=30 \
  --resume_dir .progress/tax_ae30_ckpt \
  --out .progress/tax_ae30.json >> $LOG 2>&1
echo "=== fused 100-case audit at shipped defaults $(date -u +%H:%M:%S) ===" >> $LOG
timeout 10800 python scripts/suite_audit.py --policy sicnav_diffusion \
  --checkpoint checkpoints/jmid_hallway --scenario hallway_bottleneck \
  --time_limit 30 --num_cases 100 --batch 10 --ipm_iters 30 \
  --resume_dir .progress/fused100_audit_ckpt \
  --out .progress/fused100_audit.json >> $LOG 2>&1
echo "QUEUE C COMPLETE $(date -u +%H:%M:%S)" >> $LOG
