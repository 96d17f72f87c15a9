#!/usr/bin/env python
"""Combined episode audit: ONE traced seeded suite -> summary metrics +
collision taxonomy + timeout taxonomy in a single JSON report.

The collision and timeout taxonomies both consume the same traced rollout
(audit_common.run_traced_suite); running them separately doubles the chip
time of a 500-case fused audit (~2 h each on the tunneled v5e). This
driver runs the suite once and feeds both classifiers. The reference
analog is watching rendered mp4s + reading the debug pickle per episode
(simple_test.py:336, campc.py:861-979) — here the whole 500-case
definitive protocol is audited in one batched program.
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import audit_common
from collision_taxonomy import collision_report
from timeout_taxonomy import timeout_report


def main():
    from sicnav_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    p = argparse.ArgumentParser()
    audit_common.add_policy_args(p)
    p.add_argument("--out", default=None, help="write full JSON here")
    p.add_argument("--dump_traces", default=None,
                   help="npz path: dump full per-step traces (all episodes) "
                        "for offline inspection")
    args = p.parse_args()

    env_cfg, step_fn, init_carry, max_steps = audit_common.build(args)
    stats, tr = audit_common.run_traced_suite(
        args, env_cfg, step_fn, init_carry, max_steps)

    from sicnav_tpu import harness
    report = {"summary": harness.summarize(stats, env_cfg),
              "config": {"policy": args.policy, "scenario": args.scenario,
                         "num_cases": args.num_cases, "ral": args.ral,
                         "ipm_iters": args.ipm_iters,
                         "mpc_kw": args.mpc_kw}}
    report.update(collision_report(stats, tr, args, env_cfg))
    report.update(timeout_report(stats, tr, args, env_cfg))
    # per-case headline stats so A/B probes can compare case-matched
    # subsets (e.g. cases 0-99 of a 500-case definitive vs a 100-case
    # probe) without re-running anything
    report["per_case"] = {
        "success": np.asarray(stats.success).astype(int).tolist(),
        "timeout": np.asarray(stats.timeout).astype(int).tolist(),
        "collision": (np.asarray(stats.collision_steps) > 0)
        .astype(int).tolist(),
        "wall_collision": (np.asarray(stats.wall_collision_steps) > 0)
        .astype(int).tolist(),
        "nav_time": np.round(np.asarray(stats.nav_time, float), 2).tolist(),
    }

    if args.dump_traces:
        np.savez(args.dump_traces,
                 **{k: v for k, v in tr.items() if k != "aux"},
                 **{f"aux_{k}": v for k, v in tr["aux"].items()},
                 steps=np.asarray(stats.steps))

    out = json.dumps(report, indent=2)
    if args.out:
        with open(args.out, "w") as f:
            f.write(out)
        print(json.dumps({k: report[k] for k in
                          ("summary", "collision_classes", "wall_classes",
                           "timeout_classes", "n_timeouts", "frozen_audit")},
                         indent=2))
    else:
        print(out)


if __name__ == "__main__":
    main()
