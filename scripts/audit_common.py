"""Shared setup for the episode-audit scripts (collision / timeout
taxonomies): argparse flags for the controller configuration and the
traced-rollout runner.

The reference analog is the manual debug-pickle workflow around
sicnav/policy/campc.py:861-979 — here whole seeded suites are audited in
batched traced rollouts (rollout.rollout_episode_traced).
"""
import argparse
import os


def add_policy_args(p: argparse.ArgumentParser):
    p.add_argument("--policy", default="campc",
                   choices=["campc", "campc_cvmm", "sicnav_diffusion"])
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--scenario", default="hallway_bottleneck")
    p.add_argument("--num_cases", type=int, default=100)
    p.add_argument("--num_humans", type=int, default=3)
    p.add_argument("--batch", type=int, default=25)
    p.add_argument("--phase", default="test")
    p.add_argument("--time_limit", type=float, default=None,
                   help="episode time limit in s (default: env default 15; "
                        "the RA-L definitive-suite protocol uses 30)")
    p.add_argument("--ipm_iters", type=int, default=30)
    p.add_argument("--soc", action="store_true",
                   help="IPM second-order correction steps")
    p.add_argument("--privileged", action="store_true")
    p.add_argument("--ral", action=argparse.BooleanOptionalAction,
                   default=True)
    p.add_argument("--stage_margin", type=float, default=0.0)
    p.add_argument("--wall_margin", type=float, default=None,
                   help="default: fused-conditional (see eval_suite.py)")
    p.add_argument("--brake_on_unreal_guess",
                   action=argparse.BooleanOptionalAction, default=None,
                   help="override MPCConfig.brake_on_unreal_guess")
    p.add_argument("--mpc_kw", default=None,
                   help="extra MPCConfig fields as k=v,k=v (floats/ints/bools)")
    p.add_argument("--resume_dir", default=None,
                   help="directory for per-batch traced-run .npz checkpoints "
                        "(completed batches are loaded, not re-run)")
    return p


def _parse_kv(spec: str) -> dict:
    out = {}
    for item in spec.split(","):
        k, v = item.split("=", 1)
        if v in ("True", "False"):
            out[k] = v == "True"
        elif "." in v or "e" in v or "inf" in v:
            out[k] = float(v)
        else:
            try:
                out[k] = int(v)
            except ValueError:
                out[k] = v
    return out


def build(args):
    """Returns (env_cfg, step_fn, init_carry, max_steps). step_fn is the
    traced (aux=True) controller step for the requested policy."""
    import jax
    from sicnav_tpu.env.types import EnvConfig
    from sicnav_tpu.env import crowd_sim
    from sicnav_tpu.mpc.ocp import MPCConfig, OCP
    from sicnav_tpu.mpc import campc as C, ipm

    env_kw = {}
    if getattr(args, "time_limit", None):
        env_kw["time_limit"] = args.time_limit
    env_cfg = EnvConfig(
        scenario=args.scenario,
        human_policy="orca" if args.scenario == "circle_crossing" else "orca_plus",
        human_num=args.num_humans, max_humans=args.num_humans,
        starts_moving=0, robot_kinematics="unicycle", **env_kw)

    fused = args.policy == "sicnav_diffusion"
    if args.wall_margin is not None:
        wall_margin = args.wall_margin
    elif fused and args.ral:
        wall_margin = 0.10   # capsule-conditional fused default (BENCH_EXTRA)
    else:
        wall_margin = 0.05

    mpc_kw = dict(
        num_hums=env_cfg.max_humans, num_walls=env_cfg.wall_slots,
        dt=env_cfg.dt,
        hum_model="cvmm" if args.policy == "campc_cvmm" else "orca_casadi_kkt",
        priviledged_info=args.privileged,
        robot_nx=8 if args.ral else 4, robot_capsule=args.ral,
        term_q_coeff=75.0 if args.ral else 100.0,
        slack_mode="acados" if args.ral else "tro",
        stage_margin=args.stage_margin,
        wall_margin=wall_margin)
    if args.brake_on_unreal_guess is not None:
        mpc_kw["brake_on_unreal_guess"] = args.brake_on_unreal_guess
    if getattr(args, "mpc_kw", None):
        mpc_kw.update(_parse_kv(args.mpc_kw))
    settings = ipm.IPMSettings(n_iter=args.ipm_iters, soc=args.soc)

    if fused:
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
        # match the production fused default (SD.make_policy): door-yield
        # on; --mpc_kw door_yield=False restores the pre-yield baseline
        mpc_kw.setdefault("door_yield", True)
        ocp = OCP(MPCConfig(**mpc_kw))

        def step_fn(s, c):
            return SD.sicnav_diffusion_action(
                ocp, model, params, s, c, env_cfg, fcfg, settings, aux=True)

        def init_carry():
            return SD.init_carry(ocp, env_cfg.max_humans, fcfg)
    else:
        ocp = OCP(MPCConfig(**mpc_kw))

        def step_fn(s, c):
            return C.campc_action(ocp, s, c, env_cfg, settings, aux=True)

        def init_carry():
            return C.init_carry(ocp)

    max_steps = int(env_cfg.time_limit / env_cfg.dt) + 2
    return env_cfg, step_fn, init_carry, max_steps


# StepTrace fields surfaced to the taxonomy classifiers (rollout.StepTrace
# minus the policy-specific aux pytree, which is keyed separately)
_TR_FIELDS = ("dmin", "collision", "wall_collision", "frozen", "live",
              "r_pos", "h_pos", "action", "latch", "door_stall")


def _aux_fields_from_npz(path):
    import numpy as np
    return [k[2:] for k in np.load(path).files if k.startswith("a_")]


def run_traced_suite(args, env_cfg, step_fn, init_carry, max_steps):
    """Run the seeded suite in batched traced rollouts; returns
    (stats numpy pytree, trace dict of numpy arrays (B, T, ...)).

    ``args.resume_dir`` (optional): directory of per-batch .npz
    checkpoints. Completed batches are loaded instead of re-run, so a
    multi-hour 500-case traced audit on the tunneled chip survives worker
    kills — re-run the same command to resume (the eval_suite
    progress_file pattern, applied to traced runs)."""
    import sys
    import jax
    import jax.numpy as jnp
    import numpy as np
    from sicnav_tpu.env import crowd_sim, rollout

    resume_dir = getattr(args, "resume_dir", None)
    if resume_dir:
        os.makedirs(resume_dir, exist_ok=True)

    def _save(path, stats, trace_np):
        flat = {f"s_{k}": np.asarray(getattr(stats, k))
                for k in stats._fields}
        flat.update({f"t_{k}": v for k, v in trace_np.items()
                     if k != "aux"})
        flat.update({f"a_{k}": v for k, v in trace_np["aux"].items()})
        tmp = path + ".tmp.npz"
        np.savez(tmp, **flat)
        os.replace(tmp, path)

    def _load(path, stats_cls, aux_fields, tr_fields):
        z = np.load(path)
        stats = stats_cls(**{k: z[f"s_{k}"] for k in stats_cls._fields})
        tr = {k: z[f"t_{k}"] for k in tr_fields}
        tr["aux"] = {k: z[f"a_{k}"] for k in aux_fields}
        return stats, tr

    all_stats, all_traces = [], []
    for start in range(0, args.num_cases, args.batch):
        cases = list(range(start, min(start + args.batch, args.num_cases)))
        ckpt = (os.path.join(resume_dir, f"batch_{start:05d}.npz")
                if resume_dir else None)
        if ckpt and os.path.exists(ckpt):
            from sicnav_tpu.env.rollout import EpisodeStats
            stats, trace_np = _load(ckpt, EpisodeStats,
                                    aux_fields=_aux_fields_from_npz(ckpt),
                                    tr_fields=_TR_FIELDS)
            all_stats.append(stats)
            all_traces.append(trace_np)
            print(f"[audit] cases {start}-{cases[-1]}: resumed from {ckpt}",
                  file=sys.stderr, flush=True)
            continue
        states = [crowd_sim.reset_host(env_cfg, c, args.phase) for c in cases]
        bs = jax.tree.map(lambda *xs: jnp.stack(xs), *states)
        carries = jax.tree.map(lambda *xs: jnp.stack(xs),
                               *[init_carry() for _ in cases])
        _, stats, trace = jax.vmap(lambda s, c: rollout.rollout_episode_traced(
            s, c, step_fn, env_cfg, max_steps))(bs, carries)
        to_np = lambda t: jax.tree.map(np.asarray, t)
        stats = to_np(stats)
        trace = to_np(trace)
        trace_np = {k: getattr(trace, k) for k in _TR_FIELDS}
        trace_np["aux"] = {f: getattr(trace.aux, f)
                           for f in trace.aux._fields}
        if ckpt:
            _save(ckpt, stats, trace_np)
        print(f"[audit] cases {start}-{cases[-1]}: success "
              f"{float(np.mean(np.atleast_1d(stats.success))):.2f}",
              file=sys.stderr, flush=True)
        all_stats.append(stats)
        all_traces.append(trace_np)

    stats = jax.tree.map(lambda *xs: np.concatenate(xs), *all_stats)
    # per-batch episode lengths differ only by padding; max_steps is fixed
    # across batches so time axes always align
    tr = {k: np.concatenate([t[k] for t in all_traces])
          for k in _TR_FIELDS}
    tr["aux"] = {k: np.concatenate([t["aux"][k] for t in all_traces])
                 for k in all_traces[0]["aux"]}
    return stats, tr
