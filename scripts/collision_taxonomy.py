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

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


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


def main():
    from sicnav_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    p = argparse.ArgumentParser()
    p.add_argument("--policy", default="campc",
                   choices=["campc", "campc_cvmm", "sicnav_diffusion"])
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--scenario", default="hallway_bottleneck")
    p.add_argument("--num_cases", type=int, default=100)
    p.add_argument("--num_humans", type=int, default=3)
    p.add_argument("--batch", type=int, default=25)
    p.add_argument("--phase", default="test")
    p.add_argument("--ipm_iters", type=int, default=30)
    p.add_argument("--soc", action="store_true",
                   help="IPM second-order correction steps")
    p.add_argument("--privileged", action="store_true")
    p.add_argument("--ral", action=argparse.BooleanOptionalAction,
                   default=True)
    p.add_argument("--stage_margin", type=float, default=0.0)
    p.add_argument("--wall_margin", type=float, default=None,
                   help="default: model-conditional (0.10 capsule/RA-L, 0.05 circle)")
    p.add_argument("--brake_on_unreal_guess",
                   action=argparse.BooleanOptionalAction, default=None,
                   help="override MPCConfig.brake_on_unreal_guess")
    p.add_argument("--out", default=None, help="write full JSON here")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from sicnav_tpu.env.types import EnvConfig
    from sicnav_tpu.env import crowd_sim, rollout
    from sicnav_tpu.mpc.ocp import MPCConfig
    from sicnav_tpu.mpc import campc as C, ipm

    env_cfg = EnvConfig(
        scenario=args.scenario,
        human_policy="orca" if args.scenario == "circle_crossing" else "orca_plus",
        human_num=args.num_humans, max_humans=args.num_humans,
        starts_moving=0, robot_kinematics="unicycle")

    mpc_kw = dict(
        num_hums=env_cfg.max_humans, num_walls=env_cfg.wall_slots,
        dt=env_cfg.dt,
        hum_model="cvmm" if args.policy == "campc_cvmm" else "orca_casadi_kkt",
        priviledged_info=args.privileged,
        robot_nx=8 if args.ral else 4, robot_capsule=args.ral,
        term_q_coeff=75.0 if args.ral else 100.0,
        slack_mode="acados" if args.ral else "tro",
        stage_margin=args.stage_margin,
        # plain-CAMPC diagnostic: 0.05 in both robot models (the capsule
        # 0.10 benefit is fused-only; see eval_suite.py)
        wall_margin=(args.wall_margin if args.wall_margin is not None
                     else 0.05))
    if args.brake_on_unreal_guess is not None:
        mpc_kw["brake_on_unreal_guess"] = args.brake_on_unreal_guess
    settings = ipm.IPMSettings(n_iter=args.ipm_iters, soc=args.soc)

    if args.policy == "sicnav_diffusion":
        from sicnav_tpu.diffusion.models import ModelConfig
        from sicnav_tpu.diffusion.mid import JMIDModel, load_checkpoint
        from sicnav_tpu.diffusion import forecaster as FC
        from sicnav_tpu.mpc import sicnav_diffusion as SD
        model = JMIDModel(ModelConfig(context_dim=128, tf_layer=2),
                          joint=True)
        fcfg = FC.ForecasterConfig(num_samples=48, num_ret_samples=10,
                                   dt=env_cfg.dt)
        state0 = crowd_sim.reset_host(env_cfg, case=0)
        fstate = FC.init_state(env_cfg.max_humans, fcfg)
        batch0 = FC._scene_batch_from_hist(fstate, state0, fcfg)
        key = jax.random.PRNGKey(0)
        params = model.init({"params": key, "dropout": key}, batch0, key)
        if args.checkpoint:
            params = load_checkpoint(os.path.abspath(args.checkpoint), params)
        mpc_kw.update(priviledged_info=True,
                      close_to_preds=True,
                      num_mid_samples=fcfg.num_ret_samples)
        mpc_cfg = MPCConfig(**mpc_kw)
        from sicnav_tpu.mpc.ocp import OCP
        ocp = OCP(mpc_cfg)

        def step_fn(s, c):
            return SD.sicnav_diffusion_action(
                ocp, model, params, s, c, env_cfg, fcfg, settings, aux=True)

        def init_carry():
            return SD.init_carry(ocp, env_cfg.max_humans, fcfg)
    else:
        mpc_cfg = MPCConfig(**mpc_kw)
        from sicnav_tpu.mpc.ocp import OCP
        ocp = OCP(mpc_cfg)

        def step_fn(s, c):
            return C.campc_action(ocp, s, c, env_cfg, settings, aux=True)

        def init_carry():
            return C.init_carry(ocp)

    max_steps = int(env_cfg.time_limit / env_cfg.dt) + 2
    all_stats, all_traces = [], []
    for start in range(0, args.num_cases, args.batch):
        cases = list(range(start, min(start + args.batch, args.num_cases)))
        states = [crowd_sim.reset_host(env_cfg, c, args.phase) for c in cases]
        bs = jax.tree.map(lambda *xs: jnp.stack(xs), *states)
        carries = jax.tree.map(lambda *xs: jnp.stack(xs),
                               *[init_carry() for _ in cases])
        _, stats, trace = jax.vmap(lambda s, c: rollout.rollout_episode_traced(
            s, c, step_fn, env_cfg, max_steps))(bs, carries)
        to_np = lambda t: jax.tree.map(np.asarray, t)
        all_stats.append(to_np(stats))
        # vmap puts the episode batch axis first: leaves are (B, T, ...)
        all_traces.append(to_np(trace))

    stats = jax.tree.map(lambda *xs: np.concatenate(xs), *all_stats)
    trace = jax.tree.map(lambda *xs: np.concatenate(xs), *all_traces)
    tr = {"dmin": trace.dmin, "collision": trace.collision,
          "wall_collision": trace.wall_collision, "frozen": trace.frozen,
          "live": trace.live,
          "aux": {f: getattr(trace.aux, f) for f in trace.aux._fields}}

    from sicnav_tpu import harness
    report = {"summary": harness.summarize(stats, env_cfg),
              "config": {"policy": args.policy, "scenario": args.scenario,
                         "num_cases": args.num_cases, "ral": args.ral,
                         "stage_margin": args.stage_margin,
                         "ipm_iters": args.ipm_iters}}

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
