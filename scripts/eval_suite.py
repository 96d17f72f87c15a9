#!/usr/bin/env python
"""Run the seeded 500-case evaluation suite for a policy (reference:
RL_nav/RL_test.py). Prints the summary metrics table as JSON."""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    from sicnav_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    p = argparse.ArgumentParser()
    p.add_argument("--policy", default="dwa",
                   choices=["dwa", "orca_plus", "campc", "campc_cvmm",
                            "sarl", "rgl", "sicnav_diffusion"])
    p.add_argument("--checkpoint", default=None,
                   help="value-net checkpoint for sarl/rgl, or JMID "
                        "checkpoint for sicnav_diffusion")
    p.add_argument("--noise_std", type=float, default=0.0,
                   help="robustness eval: Gaussian observation noise std "
                        "(sicnav_acados.py:1184-1237)")
    # sicnav_diffusion model/ablation knobs
    p.add_argument("--encoder_dim", type=int, default=128)
    p.add_argument("--tf_layer", type=int, default=2)
    p.add_argument("--num_samples", type=int, default=48)
    p.add_argument("--num_ret_samples", type=int, default=10)
    p.add_argument("--ddim_stride", type=int, default=2,
                   help="DDIM stride (NFE = 100/stride)")
    p.add_argument("--goal_dynamics", action="store_true",
                   help="reference's stateful MID-sample weight dynamics "
                        "(measured-best default is static weighted goals)")
    p.add_argument("--door_yield", action=argparse.BooleanOptionalAction,
                   default=None,
                   help="door-yield protocol (campc.door_yield_update). "
                        "Default: on for sicnav_diffusion (make_policy "
                        "default), off for plain campc (preserves the "
                        "published plain baselines)")
    p.add_argument("--no_close_to_preds", action="store_true",
                   help="ablation: drop the sample-spread constraint")
    p.add_argument("--ral", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="full RA-L robot config (default): 8-state "
                        "sin/cos+accel model + capsule collision + Acados "
                        "slack penalties (mpc_env_new.py:620-660,971); "
                        "--no-ral selects the T-RO 4-state circle model")
    p.add_argument("--num_cases", type=int, default=500)
    p.add_argument("--time_limit", type=float, default=15.0,
                   help="episode time limit in seconds. The T-RO protocol "
                        "is 15 s (sicnav/configs/env.config:2); the RA-L "
                        "protocol is 30 s (sicnav_diffusion/configs/"
                        "env.config:2) — use 30 for --ral rows")
    p.add_argument("--num_humans", type=int, default=3)
    p.add_argument("--scenario", default="circle_crossing")
    p.add_argument("--phase", default="test", choices=["test", "val"])
    p.add_argument("--batch", type=int, default=50)
    p.add_argument("--progress_file", default=None,
                   help="JSONL per-batch checkpoint: completed case "
                        "ranges are skipped on rerun, so long suites "
                        "on the tunneled chip resume instead of "
                        "restarting (harness.evaluate_policy)")
    p.add_argument("--privileged", action="store_true")
    p.add_argument("--ipm_iters", type=int, default=30)
    p.add_argument("--soc", action="store_true",
                   help="IPM second-order correction steps")
    p.add_argument("--ipm_early_exit", type=float, default=0.0,
                   help="KKT-residual early-exit tolerance (>= 1e-4 in "
                        "f32); 0 keeps the fixed-trip iteration scan")
    p.add_argument("--ref_type", default="point_stab",
                   choices=["point_stab", "goal_tile"])
    # round-3 safety knobs (collision_taxonomy-guided hardening; defaults
    # match MPCConfig — brake + wall margin ON)
    p.add_argument("--stage_margin", type=float, default=0.0,
                   help="per-stage human-collision margin growth (m/stage)")
    p.add_argument("--wall_margin", type=float, default=None,
                   help="flat extra wall clearance (m); 0 restores the r2 "
                        "behavior. Default: the model-conditional value "
                        "(0.10 capsule/RA-L, 0.05 circle)")
    p.add_argument("--brake_horizon", type=int, default=0,
                   help="brake_on_unreal_guess margin window: leading "
                        "stages checked (0 = full horizon)")
    p.add_argument("--brake_on_unreal_guess",
                   action=argparse.BooleanOptionalAction, default=True,
                   help="cascade tightening: e-brake when the adopted "
                        "guess's exact rollout predicts a collision")
    p.add_argument("--hard_wall_stages", type=int, default=0,
                   help="leading horizon stages (1..n) whose robot-wall "
                        "rows are HARD (not slack-shifted) — the "
                        "SLACKED/HARD sorting lever for wall-episode "
                        "reduction (campc_acados_opt.py:264-374)")
    p.add_argument("--evasive_brake", action=argparse.BooleanOptionalAction,
                   default=False,
                   help="max-clearance 5-candidate brake fan instead of the "
                        "stop-in-place decel (MPCConfig.evasive_brake)")
    p.add_argument("--wall_aware_realism",
                   action=argparse.BooleanOptionalAction, default=False,
                   help="exact-rollout realism check includes wall "
                        "clearance (MPCConfig.wall_aware_realism)")
    p.add_argument("--accept_margin", type=float, default=0.0,
                   help="minimum exact-rollout clearance (m) for a plan "
                        "to count as realistic (MPCConfig.accept_margin)")
    p.add_argument("--brake_margin", type=float, default=0.0,
                   help="minimum exact-rollout clearance (m) of the "
                        "adopted guess before the e-brake fires "
                        "(MPCConfig.brake_margin)")
    p.add_argument("--rescue_best_margin",
                   action=argparse.BooleanOptionalAction, default=False,
                   help="multi-start only: when the guess fails its brake "
                        "gate, execute the best exact-margin start instead "
                        "of braking (MPCConfig.rescue_best_margin)")
    p.add_argument("--multi_start", type=int, default=1,
                   help="batched multi-start NLP solves per control step "
                        "(campc._build_starts): 1 = single-start cascade, "
                        "4 = selected + fresh + brake + side-step starts "
                        "solved as one vmapped IPM program")
    p.add_argument("--adaptive_effort", type=int, default=0,
                   help="extra IPM iterations granted to a control step "
                        "whose previous solve was cascade-rejected "
                        "(MPCConfig.adaptive_effort, a traced runtime "
                        "budget — no recompile, no happy-path cost)")
    p.add_argument("--kalman_filter", action="store_true",
                   help="apply the observation-path constant-velocity "
                        "Kalman filter (utils/state_filter.py) to the "
                        "human observations before the policy sees them — "
                        "the robustness-table mitigation; composes inside "
                        "--noise_std")
    p.add_argument("--kf_accel_std", type=float, default=2.0,
                   help="KFConfig.accel_std process-noise scale: lower = "
                        "stronger smoothing (trusts the CV model more), "
                        "higher = tracks maneuvers faster (trusts the "
                        "measurements more); the round-5 sigma=0.10 "
                        "residual-collision probe knob")
    p.add_argument("--dwa_nv", type=int, default=8,
                   help="DWA static-window v samples (reference fixed-"
                        "resolution equivalent: ~3-4)")
    p.add_argument("--dwa_nw", type=int, default=64,
                   help="DWA static-window yaw-rate samples (reference "
                        "~60 at 0.5 deg/s)")
    p.add_argument("--mpc_kw", default=None,
                   help="extra MPCConfig fields as k=v,k=v (floats/ints/"
                        "bools) — generic override hook for config sweeps "
                        "(e.g. door_yield_hold_max=8,door_yield_cooldown=8); "
                        "applied after the named flags")
    p.add_argument("--allow_random_params", action="store_true",
                   help="evaluate a learned policy WITHOUT a checkpoint "
                        "(randomly initialized params — ablation only)")
    args = p.parse_args()

    if (args.policy in ("sarl", "rgl", "sicnav_diffusion")
            and not args.checkpoint and not args.allow_random_params):
        p.error(f"--policy {args.policy} requires --checkpoint (pass "
                "--allow_random_params to knowingly evaluate random "
                "weights); refusing to silently benchmark garbage")

    from sicnav_tpu.env.types import EnvConfig
    from sicnav_tpu import harness

    extra_kw = {}
    if args.mpc_kw:
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from audit_common import _parse_kv
        extra_kw = _parse_kv(args.mpc_kw)

    env_cfg = EnvConfig(
        scenario=args.scenario,
        human_policy="orca" if args.scenario == "circle_crossing" else "orca_plus",
        human_num=args.num_humans, max_humans=args.num_humans,
        starts_moving=0, time_limit=args.time_limit,
        robot_kinematics="holonomic" if args.policy == "orca_plus" else "unicycle")

    if args.policy == "dwa":
        from sicnav_tpu.policies.dwa import DWAConfig, dwa_policy
        dcfg = DWAConfig(max_speed=env_cfg.robot_v_pref,
                         min_speed=-env_cfg.robot_v_pref,
                         robot_radius=env_cfg.robot_radius, dt=env_cfg.dt,
                         n_v=args.dwa_nv, n_w=args.dwa_nw)
        res = harness.evaluate_policy(lambda s: dwa_policy(s, env_cfg, dcfg),
                                      env_cfg, args.num_cases, args.phase,
                                      args.batch,
                                      progress_file=args.progress_file)
    elif args.policy == "orca_plus":
        from sicnav_tpu.policies.orca_robot import orca_robot_action
        res = harness.evaluate_policy(lambda s: orca_robot_action(s, env_cfg),
                                      env_cfg, args.num_cases, args.phase,
                                      args.batch,
                                      progress_file=args.progress_file)
    elif args.policy in ("sarl", "rgl"):
        import jax
        import jax.numpy as jnp
        from sicnav_tpu.rl.networks import SARLNetwork, RGLNetwork
        from sicnav_tpu.rl import dqn as D
        from sicnav_tpu.diffusion.mid import load_checkpoint
        net = SARLNetwork() if args.policy == "sarl" else RGLNetwork()
        H = env_cfg.max_humans
        params = net.init(jax.random.PRNGKey(0), jnp.zeros(9),
                          jnp.zeros((H, 5)), jnp.ones(H, bool))
        if args.checkpoint:
            params = load_checkpoint(os.path.abspath(args.checkpoint), params)
        actions = D.build_action_space(env_cfg, D.DQNConfig())
        q_fn = D.make_q_fn(net, env_cfg, D.DQNConfig(), actions)

        def greedy(s):
            return actions[jnp.argmax(q_fn(params, s))]

        res = harness.evaluate_policy(greedy, env_cfg, args.num_cases,
                                      args.phase, args.batch,
                                      progress_file=args.progress_file)
    elif args.policy == "sicnav_diffusion":
        import jax
        from sicnav_tpu.env import crowd_sim as CS
        from sicnav_tpu.diffusion.models import ModelConfig
        from sicnav_tpu.diffusion.mid import JMIDModel, load_checkpoint
        from sicnav_tpu.diffusion import forecaster as FC
        from sicnav_tpu.mpc import ipm, sicnav_diffusion as SD
        model = JMIDModel(ModelConfig(context_dim=args.encoder_dim,
                                      tf_layer=args.tf_layer), joint=True)
        fcfg = FC.ForecasterConfig(num_samples=args.num_samples,
                                   num_ret_samples=args.num_ret_samples,
                                   ddim_stride=args.ddim_stride,
                                   dt=env_cfg.dt)
        state0 = CS.reset_host(env_cfg, case=0)
        fstate = FC.init_state(env_cfg.max_humans, fcfg)
        batch = FC._scene_batch_from_hist(fstate, state0, fcfg)
        key = jax.random.PRNGKey(0)
        params = model.init({"params": key, "dropout": key}, batch, key)
        if args.checkpoint:
            params = load_checkpoint(os.path.abspath(args.checkpoint), params)
        ocp, policy = SD.make_policy(
            env_cfg, model, params, fcfg=fcfg,
            settings=ipm.IPMSettings(n_iter=args.ipm_iters, soc=args.soc,
                                     early_exit_tol=args.ipm_early_exit),
            goal_dynamics=args.goal_dynamics,
            close_to_preds=not args.no_close_to_preds, ral=args.ral,
            door_yield=(args.door_yield if args.door_yield is not None
                        else True),
            mpc_overrides={
                "stage_margin": args.stage_margin,
                "brake_on_unreal_guess": args.brake_on_unreal_guess,
                "brake_horizon": args.brake_horizon,
                "multi_start": args.multi_start,
                "adaptive_effort": args.adaptive_effort,
                "hard_wall_stages": args.hard_wall_stages,
                "evasive_brake": args.evasive_brake,
                "wall_aware_realism": args.wall_aware_realism,
                "accept_margin": args.accept_margin,
                "brake_margin": args.brake_margin,
                "rescue_best_margin": args.rescue_best_margin,
                **({"wall_margin": args.wall_margin}
                   if args.wall_margin is not None else {}),
                **extra_kw})
        init_carry_fn = lambda: SD.init_carry(ocp, env_cfg.max_humans, fcfg)
        if args.kalman_filter:
            from sicnav_tpu.utils.state_filter import (
                KFConfig, filtered_policy_stateful, init_filter)
            policy = filtered_policy_stateful(
                policy, KFConfig(dt=env_cfg.dt,
                                 pos_std=max(args.noise_std, 0.05),
                                 vel_std=max(args.noise_std, 0.05),
                                 accel_std=args.kf_accel_std))
            inner_init = init_carry_fn
            init_carry_fn = lambda: (init_filter(env_cfg.max_humans),
                                     inner_init())
        if args.noise_std > 0:
            from sicnav_tpu.utils.robustness import (NoiseConfig,
                                                     noisy_policy_stateful)
            policy = noisy_policy_stateful(
                policy, NoiseConfig(args.noise_std, args.noise_std))
        res = harness.evaluate_policy(
            None, env_cfg, args.num_cases, args.phase, args.batch,
            stateful_policy=(init_carry_fn, policy),
            progress_file=args.progress_file)
    else:
        from sicnav_tpu.mpc.ocp import MPCConfig
        from sicnav_tpu.mpc import campc as C
        mpc_cfg = MPCConfig(
            num_hums=env_cfg.max_humans, num_walls=env_cfg.wall_slots,
            dt=env_cfg.dt,
            hum_model="cvmm" if args.policy == "campc_cvmm" else "orca_casadi_kkt",
            priviledged_info=args.privileged, ref_type=args.ref_type,
            # mirror SD.make_policy's ral switch exactly: the RA-L config
            # is 8-state + capsule + Acados slacks + term_q 75, not a
            # hybrid with T-RO penalties (ADVICE r2)
            robot_nx=8 if args.ral else 4, robot_capsule=args.ral,
            term_q_coeff=75.0 if args.ral else 100.0,
            slack_mode="acados" if args.ral else "tro",
            stage_margin=args.stage_margin,
            # plain CAMPC keeps 0.05 in both robot models: the margin grid
            # measured the capsule benefit only for the FUSED controller
            # (plain RA-L 100-case A/B is a wash: wm05 60/10/17 vs wm10
            # 61/9/21), and the published plain rows were produced at 0.05
            wall_margin=(args.wall_margin if args.wall_margin is not None
                         else 0.05),
            brake_on_unreal_guess=args.brake_on_unreal_guess,
            brake_horizon=args.brake_horizon,
            multi_start=args.multi_start,
            adaptive_effort=args.adaptive_effort,
            hard_wall_stages=args.hard_wall_stages,
            evasive_brake=args.evasive_brake,
            wall_aware_realism=args.wall_aware_realism,
            accept_margin=args.accept_margin,
            brake_margin=args.brake_margin,
            rescue_best_margin=args.rescue_best_margin,
            # plain default OFF (published baselines); opt in with
            # --door_yield
            door_yield=bool(args.door_yield))
        if extra_kw:
            import dataclasses
            mpc_cfg = dataclasses.replace(mpc_cfg, **extra_kw)
        from sicnav_tpu.mpc import ipm
        ocp, policy = C.make_policy(env_cfg, mpc_cfg,
                                    settings=ipm.IPMSettings(n_iter=args.ipm_iters, soc=args.soc,
                                     early_exit_tol=args.ipm_early_exit))
        init_carry_fn = lambda: C.init_carry(ocp)
        if args.kalman_filter:
            from sicnav_tpu.utils.state_filter import (
                KFConfig, filtered_policy_stateful, init_filter)
            policy = filtered_policy_stateful(
                policy, KFConfig(dt=env_cfg.dt,
                                 pos_std=max(args.noise_std, 0.05),
                                 vel_std=max(args.noise_std, 0.05),
                                 accel_std=args.kf_accel_std))
            inner_init = init_carry_fn
            init_carry_fn = lambda: (init_filter(env_cfg.max_humans),
                                     inner_init())
        if args.noise_std > 0:
            from sicnav_tpu.utils.robustness import (NoiseConfig,
                                                     noisy_policy_stateful)
            policy = noisy_policy_stateful(
                policy, NoiseConfig(args.noise_std, args.noise_std))
        res = harness.evaluate_policy(
            None, env_cfg, args.num_cases, args.phase, args.batch,
            stateful_policy=(init_carry_fn, policy),
            progress_file=args.progress_file)

    if (args.policy in ("sarl", "rgl", "sicnav_diffusion")
            and not args.checkpoint):
        res["WARNING"] = "RANDOM PARAMS — no --checkpoint was given"
    print(json.dumps(res, indent=2))


if __name__ == "__main__":
    main()
