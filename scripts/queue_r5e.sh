#!/bin/bash
# Round-5 queue E: (1) adaptive_effort escalated-step latency row;
# (2) yield-latch economy probes guided by the fused 100-case audit
# (robots spend 40-60% of timeout episodes latched across 4-6
# yield/assert cycles at hold 16 + cooldown 12 — probe a faster
# alternation and a longer assert); (3) fused multi-start+rescue probe
# (VERDICT task 7).
cd /root/repo
LOG=.progress/queue_r5e.log
echo "=== latency adaptive_effort $(date -u +%H:%M:%S) ===" >> $LOG
timeout 3600 python scripts/bench_control_step.py --ipm_iters 15 \
  --adaptive_effort 30 > .progress/lat_ae30.json 2>> $LOG
echo "=== done latency rc=$? ===" >> $LOG
fused () {  # $1 extra-args  $2 tag
  echo "=== fused $2 $(date -u +%H:%M:%S) ===" >> $LOG
  timeout 10800 python scripts/eval_suite.py --policy sicnav_diffusion \
    --checkpoint checkpoints/jmid_hallway --scenario hallway_bottleneck \
    --time_limit 30 --num_cases 100 --batch 10 --ipm_iters 30 $1 \
    --progress_file .progress/$2.jsonl \
    > .progress/$2.json 2>> $LOG
  echo "=== done $2 rc=$? $(date -u +%H:%M:%S) ===" >> $LOG
}
fused "--mpc_kw door_yield_hold_max=8,door_yield_cooldown=8" fused_h8c8
fused "--mpc_kw door_yield_hold_max=12,door_yield_cooldown=20" fused_h12c20
fused "--multi_start 4 --rescue_best_margin" fused_ms4resc
echo "QUEUE E COMPLETE $(date -u +%H:%M:%S)" >> $LOG
