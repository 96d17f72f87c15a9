#!/usr/bin/env python
"""Closed-loop SICNav-Diffusion evaluation: JMID forecaster + bilevel MPC.

Runs seeded episodes with the fused controller (reference:
simple_test.py with policy sicnav_acados), reporting success/collision
metrics and per-control-step latency against the 100 ms budget.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from sicnav_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", default=None,
                   help="orbax JMID checkpoint (random init if omitted)")
    p.add_argument("--num_cases", type=int, default=5)
    p.add_argument("--num_humans", type=int, default=3)
    p.add_argument("--scenario", default="hallway_bottleneck")
    p.add_argument("--num_samples", type=int, default=48)
    p.add_argument("--num_ret_samples", type=int, default=10)
    p.add_argument("--ddim_stride", type=int, default=2,
                   help="DDIM stride (NFE = 100/stride)")
    p.add_argument("--encoder_dim", type=int, default=128)
    p.add_argument("--tf_layer", type=int, default=2)
    p.add_argument("--ipm_iters", type=int, default=30)
    p.add_argument("--goal_dynamics", action="store_true")
    p.add_argument("--no_close_to_preds", action="store_true")
    p.add_argument("--ral", action=argparse.BooleanOptionalAction,
                   default=True)
    args = p.parse_args()

    from sicnav_tpu.env.types import EnvConfig
    from sicnav_tpu.env import crowd_sim as CS
    from sicnav_tpu.diffusion.models import ModelConfig
    from sicnav_tpu.diffusion.mid import JMIDModel, load_checkpoint
    from sicnav_tpu.diffusion import forecaster as FC
    from sicnav_tpu.mpc import ipm, sicnav_diffusion as SD

    env_cfg = EnvConfig(scenario=args.scenario, human_policy="orca_plus"
                        if args.scenario != "circle_crossing" else "orca",
                        human_num=args.num_humans,
                        max_humans=args.num_humans, starts_moving=0,
                        robot_kinematics="unicycle")
    mcfg = ModelConfig(context_dim=args.encoder_dim, tf_layer=args.tf_layer)
    model = JMIDModel(mcfg, joint=True)
    fcfg = FC.ForecasterConfig(num_samples=args.num_samples,
                               num_ret_samples=args.num_ret_samples,
                               ddim_stride=args.ddim_stride,
                               dt=env_cfg.dt)

    # init / load model params
    state0 = CS.reset_host(env_cfg, case=0)
    fstate = FC.init_state(env_cfg.max_humans, fcfg)
    batch = FC._scene_batch_from_hist(fstate, state0, fcfg)
    key = jax.random.PRNGKey(0)
    params = model.init({"params": key, "dropout": key}, batch, key)
    if args.checkpoint:
        params = load_checkpoint(os.path.abspath(args.checkpoint), params)

    ocp, policy = SD.make_policy(env_cfg, model, params, fcfg=fcfg,
                                 settings=ipm.IPMSettings(n_iter=args.ipm_iters),
                                 goal_dynamics=args.goal_dynamics,
                                 close_to_preds=not args.no_close_to_preds,
                                 ral=args.ral)

    results = []
    step_times = []
    max_steps = int(env_cfg.time_limit / env_cfg.dt) + 2
    for case in range(args.num_cases):
        state = CS.reset_host(env_cfg, case=case)
        carry = SD.init_carry(ocp, env_cfg.max_humans, fcfg, seed=case)
        colls = 0
        for i in range(max_steps):
            t0 = time.perf_counter()
            action, carry = policy(state, carry)
            jax.block_until_ready(action)
            if case > 0 or i > 0:  # skip compile step
                step_times.append(time.perf_counter() - t0)
            state, rew, info = CS.step(state, action, env_cfg)
            colls += int(info.collision)
            if bool(state.done):
                break
        results.append(dict(case=case, success=bool(info.reach_goal),
                            nav_time=float(state.t), collisions=colls))
        print(results[-1])

    summary = dict(
        num_cases=len(results),
        success_rate=float(np.mean([r["success"] for r in results])),
        mean_nav_time=float(np.mean([r["nav_time"] for r in results])),
        collision_steps=int(np.sum([r["collisions"] for r in results])),
        control_step_ms_p50=float(1e3 * np.median(step_times)) if step_times else None,
        control_step_ms_p95=float(1e3 * np.percentile(step_times, 95)) if step_times else None,
    )
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
