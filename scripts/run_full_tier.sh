#!/bin/bash
# Full-tier test run, per-module (TESTING.md: XLA:CPU LLVM-JIT arena limit
# makes one-process `-m slow` runs segfault-prone; each module in a fresh
# process stays under it). Records per-module wall-clock + result.
cd /root/repo
LOG=.progress/full_tier_r5.log
: > $LOG
overall=0
t0=$(date +%s)
for f in tests/test_*.py; do
  s=$(date +%s)
  out=$(timeout 3600 python -m pytest "$f" -q -m slow 2>&1 | tail -1)
  rc=$?
  e=$(date +%s)
  echo "$f: $((e-s))s rc=$rc :: $out" >> $LOG
  [ $rc -ne 0 ] && [ $rc -ne 5 ] && overall=1   # rc 5 = no tests collected
done
t1=$(date +%s)
echo "TOTAL slow tier: $((t1-t0))s overall_rc=$overall" >> $LOG
# fast gate timing (warm cache), recorded in the same log
s=$(date +%s)
out=$(timeout 1800 python -m pytest tests/ -q -m "not slow" 2>&1 | tail -1)
rc=$?
e=$(date +%s)
echo "FAST gate: $((e-s))s rc=$rc :: $out" >> $LOG
echo "FULL TIER COMPLETE" >> $LOG
