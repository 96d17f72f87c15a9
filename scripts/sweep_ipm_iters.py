#!/usr/bin/env python
"""IPM iteration-budget frontier (VERDICT r2 #9).

Sweeps the interior-point iteration cap over the seeded bottleneck suite
and reports the success/collision/latency frontier used to justify (or
shrink) ipm.realtime_settings — the analog of the reference's hand-tuned
per-crowd-size Acados caps ("To run at 10 Hz", campc_acados_opt.py:411-439).

Latency per cap is measured separately with a timed single-step loop (the
batched suite amortizes solves, so suite wall-clock is not control-step
latency).
"""
import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def run_suite(iters, args, extra=(), early_exit=0.0):
    cmd = [sys.executable, os.path.join(os.path.dirname(__file__),
                                        "eval_suite.py"),
           "--policy", args.policy, "--scenario", args.scenario,
           "--num_cases", str(args.num_cases), "--batch", str(args.batch),
           "--num_humans", str(args.num_humans),
           "--ipm_iters", str(iters),
           "--ipm_early_exit", str(early_exit), *extra]
    if args.privileged:
        cmd.append("--privileged")
    if args.policy == "sicnav_diffusion":
        cmd += ["--allow_random_params"] if not args.checkpoint else \
            ["--checkpoint", args.checkpoint]
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=7200)
    if out.returncode != 0:
        raise RuntimeError(out.stderr[-2000:])
    return json.loads(out.stdout[out.stdout.index("{"):])


def measure_latency(iters, args, n_steps=30, early_exit=0.0):
    """Single-episode stepped latency (p50) at this iteration cap."""
    import jax
    import numpy as np
    from sicnav_tpu.env.types import EnvConfig
    from sicnav_tpu.env import crowd_sim as CS
    from sicnav_tpu.mpc.ocp import MPCConfig
    from sicnav_tpu.mpc import campc as C, ipm

    env_cfg = EnvConfig(scenario=args.scenario, human_policy="orca_plus",
                        human_num=args.num_humans,
                        max_humans=args.num_humans, starts_moving=0,
                        robot_kinematics="unicycle")
    mpc_cfg = MPCConfig(num_hums=args.num_humans,
                        num_walls=env_cfg.wall_slots, dt=env_cfg.dt,
                        priviledged_info=args.privileged,
                        robot_nx=8, robot_capsule=True, term_q_coeff=75.0,
                        slack_mode="acados")
    ocp, policy = C.make_policy(env_cfg, mpc_cfg,
                                settings=ipm.IPMSettings(
                                    n_iter=iters, early_exit_tol=early_exit))
    state = CS.reset_host(env_cfg, case=0)
    carry = C.init_carry(ocp)
    action, carry = policy(state, carry)       # compile
    jax.block_until_ready(action)
    ts = []
    for _ in range(n_steps):
        t0 = time.perf_counter()
        action, carry = policy(state, carry)
        # force the solve to actually execute: on the axon platform
        # block_until_ready can return before remote completion, while a
        # host fetch cannot (see bench.py)
        a_host = np.asarray(action)
        ts.append(time.perf_counter() - t0)
        state, _, _ = CS.step(state, a_host, env_cfg)
    return float(np.percentile(ts, 50) * 1000)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", nargs="*", type=int,
                   default=[10, 15, 20, 30, 40])
    p.add_argument("--policy", default="campc")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--scenario", default="hallway_bottleneck")
    p.add_argument("--num_cases", type=int, default=100)
    p.add_argument("--num_humans", type=int, default=3)
    p.add_argument("--batch", type=int, default=25)
    p.add_argument("--privileged", action="store_true")
    p.add_argument("--skip_latency", action="store_true")
    p.add_argument("--early_exit", nargs="*", type=float, default=[],
                   help="extra frontier rows: KKT early-exit tolerances "
                        "swept at the LARGEST --iters cap (adaptive "
                        "per-instance iteration counts)")
    p.add_argument("--out", default=None)
    args = p.parse_args()

    rows = []
    for it in args.iters:
        print(f"== {it} iters", file=sys.stderr)
        res = run_suite(it, args)
        row = {"iters": it,
               "success": res["success_rate"],
               "coll_ep": res["collision_episode_rate"],
               "wall_ep": res["wall_collision_episode_rate"],
               "frozen_ep": res["frozen_episode_rate"],
               "nav_time": res["mean_nav_time"],
               "reward": res["mean_total_reward"]}
        if not args.skip_latency and args.policy == "campc":
            row["latency_p50_ms"] = measure_latency(it, args)
        rows.append(row)
        print(json.dumps(row), file=sys.stderr)
    for tol in args.early_exit:
        cap = max(args.iters)
        print(f"== early-exit {tol} (cap {cap})", file=sys.stderr)
        res = run_suite(cap, args, early_exit=tol)
        row = {"iters": cap, "early_exit_tol": tol,
               "success": res["success_rate"],
               "coll_ep": res["collision_episode_rate"],
               "wall_ep": res["wall_collision_episode_rate"],
               "frozen_ep": res["frozen_episode_rate"],
               "nav_time": res["mean_nav_time"],
               "reward": res["mean_total_reward"]}
        if not args.skip_latency and args.policy == "campc":
            row["latency_p50_ms"] = measure_latency(cap, args,
                                                    early_exit=tol)
        rows.append(row)
        print(json.dumps(row), file=sys.stderr)
    out = json.dumps({"frontier": rows,
                      "config": vars(args)}, indent=2)
    print(out)
    if args.out:
        with open(args.out, "w") as f:
            f.write(out)


if __name__ == "__main__":
    main()
