#!/usr/bin/env python
"""Per-episode collision / freezing taxonomy for the MPC controllers.

Round-3 safety audit (VERDICT r2 #1/#2): run the seeded suite with per-step
solver telemetry (campc.CAMPCAux via rollout_episode_traced), locate every
collision / wall-collision / frozen episode and classify its mechanism:

  ebrake               — emergency-brake action still led to a collision
  cascade_infeasible   — cascade adopted the guess because the solve was
                         infeasible (solver-infeasible class)
  cascade_unrealistic  — solve rejected by the exact-rollout reality check
  cascade_cost_reject  — solve rejected as worse-than-warmstart
  adopted_plan_unsafe  — adopted plan's own exact rollout was in collision
  model_mismatch       — adopted plan predicted clearance (exact margin > 0)
                         but the sim collided: lower-level-model vs sim
                         divergence or intra-step sweep

The reference analog is the manual debug-pickle workflow
(sicnav/policy/campc.py:861-979); here the whole suite is audited in one
batched program. Prints a JSON report.
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import audit_common


def classify_episode(tr, b, kind_steps):
    """tr: numpy StepTrace dict for the batch; b: episode index;
    kind_steps: bool (T,) event mask. Returns (cls, detail)."""
    steps = np.nonzero(kind_steps)[0]
    t = int(steps[0])
    lo = max(0, t - 2)
    w = slice(lo, t + 1)
    aux = tr["aux"]
    braked = aux["braked"][b, w]
    use_guess = aux["use_guess"][b, w]
    detail = {
        "first_step": t,
        "margin_at_t": float(aux["exact_margin"][b, t]),
        "slack_max_at_t": float(aux["slack_max"][b, t]),
        "dmin_at_t": float(tr["dmin"][b, t]),
        "guess_steps_in_window": int(use_guess.sum()),
    }
    if braked.any():
        return "ebrake", detail
    if "rescued" in aux and aux["rescued"][b, w].any():
        # best-exact-margin start executed in place of a failed guess
        # (cfg.rescue_best_margin) during the window
        return "rescued", detail
    if use_guess.any():
        k = lo + int(np.nonzero(use_guess)[0][-1])
        if not aux["sol_feasible"][b, k]:
            return "cascade_infeasible", detail
        if not aux["sol_realistic"][b, k]:
            return "cascade_unrealistic", detail
        if aux["cost_worse"][b, k]:
            return "cascade_cost_reject", detail
        return "cascade_other", detail
    if aux["exact_margin"][b, t] < 0.0:
        return "adopted_plan_unsafe", detail
    return "model_mismatch", detail


def collision_report(stats, tr, args, env_cfg) -> dict:
    """Classify every collision / wall-collision episode of a traced suite
    and run the frozen-phase audit. Importable so a single traced run can
    feed both this and timeout_taxonomy's report (scripts/suite_audit.py)."""
    report = {}
    coll_rows, wall_rows = [], []
    coll_counts, wall_counts = {}, {}
    for b in range(args.num_cases):
        if tr["collision"][b].any():
            cls, det = classify_episode(tr, b, tr["collision"][b])
            det["case"] = b
            det["class"] = cls
            coll_counts[cls] = coll_counts.get(cls, 0) + 1
            coll_rows.append(det)
        if tr["wall_collision"][b].any():
            cls, det = classify_episode(tr, b, tr["wall_collision"][b])
            det["case"] = b
            det["class"] = cls
            wall_counts[cls] = wall_counts.get(cls, 0) + 1
            wall_rows.append(det)
    report["collision_classes"] = coll_counts
    report["wall_classes"] = wall_counts
    report["collision_episodes"] = coll_rows
    report["wall_episodes"] = wall_rows

    # frozen-phase audit: distribution of frozen steps over episode thirds,
    # and co-occurrence with cascade activity (solver-stall vs yielding)
    ep_len = np.maximum(np.asarray(stats.steps), 1)
    fro = tr["frozen"]
    thirds = np.zeros(3)
    frozen_with_guess = 0
    frozen_total = 0
    frozen_dmins = []
    for b in range(args.num_cases):
        idx = np.nonzero(fro[b])[0]
        if idx.size == 0:
            continue
        phase_idx = np.minimum((idx * 3) // ep_len[b], 2)
        for ph in phase_idx:
            thirds[ph] += 1
        frozen_with_guess += int(tr["aux"]["use_guess"][b, idx].sum())
        frozen_total += idx.size
        frozen_dmins.append(tr["dmin"][b, idx])
    fd = np.concatenate(frozen_dmins) if frozen_dmins else np.zeros(0)
    fd = fd[np.isfinite(fd)]
    report["frozen_audit"] = {
        "frozen_steps_total": int(frozen_total),
        "by_episode_third": [int(x) for x in thirds],
        "frozen_steps_with_cascade_guess": int(frozen_with_guess),
        "cascade_guess_step_freq": float(
            tr["aux"]["use_guess"][tr["live"]].mean()),
        "ebrake_step_freq": float(tr["aux"]["braked"][tr["live"]].mean()),
        # yielding evidence: distance to the closest human at frozen steps
        # (a robot waiting a door queue freezes with someone close by; a
        # solver stall freezes in open space)
        "frozen_dmin_p50": float(np.median(fd)) if fd.size else None,
        "frozen_dmin_p90": float(np.percentile(fd, 90)) if fd.size else None,
        "frozen_steps_with_human_within_1m": (
            float(np.mean(fd < 1.0)) if fd.size else None),
    }

    # consecutive-failure-window histogram (round-5 adaptive_effort
    # criterion): length distribution of maximal use_guess runs across all
    # live steps — the round-4 taxonomy blamed every residual collision on
    # 2-3-step stale-guess windows, so an effort escalation that works
    # must shift this histogram toward 1
    streaks = {}
    live = np.asarray(tr["live"])
    ug = np.asarray(tr["aux"]["use_guess"]) & live
    for b in range(args.num_cases):
        run = 0
        for v in ug[b]:
            if v:
                run += 1
            elif run:
                streaks[run] = streaks.get(run, 0) + 1
                run = 0
        if run:
            streaks[run] = streaks.get(run, 0) + 1
    report["guess_streak_hist"] = {str(k): streaks[k]
                                   for k in sorted(streaks)}
    report["guess_streaks_ge3"] = int(sum(v for k, v in streaks.items()
                                          if k >= 3))
    return report


def main():
    from sicnav_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    p = argparse.ArgumentParser()
    audit_common.add_policy_args(p)
    p.add_argument("--out", default=None, help="write full JSON here")
    args = p.parse_args()
    if args.wall_margin is None and args.policy != "sicnav_diffusion":
        # plain-CAMPC diagnostic: 0.05 in both robot models (the capsule
        # 0.10 benefit is fused-only; see eval_suite.py)
        args.wall_margin = 0.05

    env_cfg, step_fn, init_carry, max_steps = audit_common.build(args)
    stats, tr = audit_common.run_traced_suite(
        args, env_cfg, step_fn, init_carry, max_steps)

    from sicnav_tpu import harness
    report = {"summary": harness.summarize(stats, env_cfg),
              "config": {"policy": args.policy, "scenario": args.scenario,
                         "num_cases": args.num_cases, "ral": args.ral,
                         "stage_margin": args.stage_margin,
                         "ipm_iters": args.ipm_iters}}
    report.update(collision_report(stats, tr, args, env_cfg))

    out = json.dumps(report, indent=2)
    if args.out:
        with open(args.out, "w") as f:
            f.write(out)
        print(json.dumps({k: report[k] for k in
                          ("summary", "collision_classes", "wall_classes",
                           "frozen_audit")}, indent=2))
    else:
        print(out)


if __name__ == "__main__":
    main()
