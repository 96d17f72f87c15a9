#!/usr/bin/env python
"""Run one seeded test case end-to-end with a chosen robot policy.

Equivalent of the reference's simple_test.py:67-346: scenario flags, one
episode, per-step event log, summary dict (pickled), optional video render.
"""
import argparse
import os
import pickle
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
    p.add_argument("--policy", default="campc",
                   choices=["campc", "campc_cvmm", "dwa", "orca_plus",
                            "sicnav_diffusion"])
    p.add_argument("--test_case", type=int, default=0)
    p.add_argument("--num_humans", type=int, default=3)
    p.add_argument("--circle", action="store_true")
    p.add_argument("--hallway", action="store_true")
    p.add_argument("--hallway_static", action="store_true")
    p.add_argument("--hallway_bottleneck", action="store_true")
    p.add_argument("--hallway_squeeze", action="store_true")
    p.add_argument("--env_config", default=None)
    p.add_argument("--policy_config", default=None)
    p.add_argument("--video", default=None, help="output mp4/gif path")
    p.add_argument("--ipm_iters", type=int, default=None,
                   help="IPM iterations (default: per-crowd realtime caps)")
    p.add_argument("--output_pickle", default=None)
    p.add_argument("--debug_pickle", default=None,
                   help="persist per-step solver introspection: IPM "
                        "iteration tables + named constraint violations "
                        "(reference debug_material.pkl, campc.py:861-979)")
    p.add_argument("--checkpoint", default=None,
                   help="JMID checkpoint for --policy sicnav_diffusion")
    p.add_argument("--privileged", action="store_true",
                   help="SICNav-p (true human goals) vs SICNav-np")
    args = p.parse_args()

    from sicnav_tpu.env.types import EnvConfig
    from sicnav_tpu.env import crowd_sim as CS

    scenario = "hallway_bottleneck"
    human_policy = "orca_plus"
    if args.circle:
        scenario, human_policy = "circle_crossing", "orca"
    elif args.hallway:
        scenario = "hallway"
    elif args.hallway_static:
        scenario = "hallway_static"
    elif args.hallway_squeeze:
        scenario = "hallway_squeeze"

    if args.env_config:
        from sicnav_tpu.config import load_env_config
        cfg = load_env_config(args.env_config, scenario_override=scenario,
                              human_num_override=args.num_humans)
    else:
        cfg = EnvConfig(scenario=scenario, human_policy=human_policy,
                        human_num=args.num_humans,
                        max_humans=args.num_humans,
                        robot_kinematics="holonomic"
                        if args.policy == "orca_plus" else "unicycle")

    state = CS.reset_host(cfg, case=args.test_case)
    max_steps = int(cfg.time_limit / cfg.dt) + 2

    # --- policy ----------------------------------------------------------
    carry = None
    if args.policy in ("campc", "campc_cvmm"):
        from sicnav_tpu.mpc.ocp import MPCConfig
        from sicnav_tpu.mpc import campc as C
        mpc_cfg = MPCConfig(
            num_hums=cfg.max_humans, num_walls=cfg.wall_slots, dt=cfg.dt,
            hum_model="cvmm" if args.policy == "campc_cvmm" else "orca_casadi_kkt",
            priviledged_info=args.privileged)
        if args.policy_config:
            from sicnav_tpu.config import load_mpc_config
            mpc_cfg = load_mpc_config(args.policy_config, cfg)
        from sicnav_tpu.mpc import ipm
        settings = (ipm.IPMSettings(n_iter=args.ipm_iters)
                    if args.ipm_iters else ipm.realtime_settings(cfg.max_humans))
        ocp, policy = C.make_policy(cfg, mpc_cfg, settings=settings)
        carry = C.init_carry(ocp)
        if args.debug_pickle or args.video:
            policy = lambda s, c: C.campc_action(ocp, s, c, cfg, settings,
                                                 debug=True)
    elif args.policy == "dwa":
        from sicnav_tpu.policies.dwa import dwa_policy
        policy = lambda s: (dwa_policy(s, cfg), None)
    elif args.policy == "orca_plus":
        from sicnav_tpu.policies.orca_robot import orca_robot_action
        policy = lambda s: (orca_robot_action(s, cfg), None)
    else:
        from sicnav_tpu.diffusion.models import ModelConfig
        from sicnav_tpu.diffusion.mid import JMIDModel, load_checkpoint
        from sicnav_tpu.diffusion import forecaster as FC
        from sicnav_tpu.mpc import ipm, sicnav_diffusion as SD
        model = JMIDModel(ModelConfig(context_dim=128, tf_layer=2), joint=True)
        fcfg = FC.ForecasterConfig(num_samples=48, num_ret_samples=10,
                                   dt=cfg.dt)
        fstate0 = FC.init_state(cfg.max_humans, fcfg)
        batch0 = FC._scene_batch_from_hist(fstate0, state, fcfg)
        key = jax.random.PRNGKey(0)
        params = model.init({"params": key, "dropout": key}, batch0, key)
        if args.checkpoint:
            params = load_checkpoint(os.path.abspath(args.checkpoint), params)
        settings = (ipm.IPMSettings(n_iter=args.ipm_iters) if args.ipm_iters
                    else ipm.realtime_settings(cfg.max_humans, with_mid=True))
        ocp, policy = SD.make_policy(cfg, model, params, fcfg=fcfg,
                                     settings=settings)
        carry = SD.init_carry(ocp, cfg.max_humans, fcfg, seed=args.test_case)
        if args.debug_pickle or args.video:
            policy = lambda s, c: SD.sicnav_diffusion_action(
                ocp, model, params, s, c, cfg, fcfg, settings, debug=True)

    # --- episode loop (simple_test.py:216-279) ---------------------------
    log = []
    states = [state]
    debug_steps = []
    overlays = dict(plans=[], guesses=[], hplans=[], fc=[], fw=[])
    is_mpc = args.policy in ("campc", "campc_cvmm", "sicnav_diffusion")
    want_overlays = bool(args.video) and is_mpc
    t0 = time.time()
    for step_i in range(max_steps):
        if want_overlays and args.policy == "sicnav_diffusion":
            # reproduce the step's forecast for the fan overlay (same key
            # split as inside the fused action)
            _, k_fc = jax.random.split(carry.key)
            fst = FC.update_state_hists(carry.forecaster, state, fcfg)
            fc, lw = FC.predict_ret_best(model, params, fst, state, k_fc,
                                         fcfg)
            overlays["fc"].append(np.asarray(fc))
            overlays["fw"].append(np.asarray(lw))
        if (args.debug_pickle or want_overlays) and is_mpc:
            from sicnav_tpu.mpc import introspection as IN
            action, carry, dbg = policy(state, carry)
            dbg_np = jax.tree.map(np.asarray, dbg)
            if want_overlays:
                overlays["plans"].append(dbg_np.plan)
                overlays["guesses"].append(dbg_np.guess_plan)
                overlays["hplans"].append(dbg_np.human_plans)
            name, val, flat = IN.argmax_violated(dbg_np.viol_used)
            debug_steps.append(dict(
                step=step_i,
                trace={k: np.asarray(v) for k, v in
                       dbg_np.trace._asdict().items()},
                info={k: float(v) for k, v in dbg_np.info._asdict().items()},
                viol_sol={k: float(v.max_viol) for k, v in
                          dbg_np.viol_sol.items()},
                viol_used={k: float(v.max_viol) for k, v in
                           dbg_np.viol_used.items()},
                used_guess=bool(dbg_np.used_guess),
                sol_cost=float(dbg_np.sol_cost),
                guess_cost=float(dbg_np.guess_cost),
                slack_max=float(dbg_np.slack_max),
                worst=dict(name=name, value=val,
                           row=IN.describe_row(ocp, name, flat))))
            if bool(dbg_np.used_guess) or val > 1e-2:
                print(f"  [solve] used_guess={bool(dbg_np.used_guess)} "
                      f"worst={debug_steps[-1]['worst']['row']} "
                      f"viol={val:.2e}")
        elif carry is not None:
            action, carry = policy(state, carry)
        else:
            action, _ = policy(state)
        state, rew, info = CS.step(state, action, cfg)
        states.append(state)
        ev = dict(step=step_i, t=float(state.t), reward=float(rew),
                  collision=bool(info.collision), danger=bool(info.danger),
                  frozen=bool(info.frozen),
                  wall_collision=bool(info.wall_collision),
                  dmin=float(info.dmin))
        log.append(ev)
        flags = "".join(k[0].upper() for k in
                        ("collision", "danger", "frozen", "wall_collision")
                        if ev[k])
        print(f"t={ev['t']:5.2f} pos=({float(state.r_pos[0]):+.2f},"
              f"{float(state.r_pos[1]):+.2f}) r={ev['reward']:+.3f} "
              f"dmin={ev['dmin']:.2f} {flags}")
        if bool(state.done):
            break

    success = bool(info.reach_goal)
    summary = dict(policy=args.policy, test_case=args.test_case,
                   success=success, timeout=bool(info.timeout),
                   nav_time=float(state.t), steps=len(log),
                   collisions=sum(e["collision"] for e in log),
                   wall_collisions=sum(e["wall_collision"] for e in log),
                   frozen=sum(e["frozen"] for e in log),
                   danger=sum(e["danger"] for e in log),
                   wall_time=time.time() - t0, log=log)
    print(f"\n{'SUCCESS' if success else 'TIMEOUT' if summary['timeout'] else 'UNFINISHED'}"
          f" nav_time={summary['nav_time']:.2f}s "
          f"collisions={summary['collisions']} wall_time={summary['wall_time']:.1f}s")

    if args.output_pickle:
        with open(args.output_pickle, "wb") as f:
            pickle.dump(summary, f)
    if args.debug_pickle and debug_steps:
        with open(args.debug_pickle, "wb") as f:
            pickle.dump(dict(summary=summary, solves=debug_steps), f)
        print("wrote", args.debug_pickle,
              f"({len(debug_steps)} instrumented solves)")
    if args.video:
        from sicnav_tpu.utils.render import render_episode
        traj = jax.tree.map(lambda *xs: jnp.stack(xs), *states)
        ov = {}
        n = len(states)
        pad_t = lambda xs: np.stack(xs + [xs[-1]] * (n - len(xs))) \
            if xs else None
        if overlays["plans"]:
            ov = dict(plans=pad_t(overlays["plans"]),
                      guesses=pad_t(overlays["guesses"]),
                      human_plans=pad_t(overlays["hplans"]))
        if overlays["fc"]:
            ov["forecasts"] = pad_t(overlays["fc"])
            ov["forecast_weights"] = pad_t(overlays["fw"])
        render_episode(traj, cfg, args.video, **ov)
        print("wrote", args.video)


if __name__ == "__main__":
    main()
