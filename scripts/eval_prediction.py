#!/usr/bin/env python
"""Evaluate trajectory predictors — JMID/iMID checkpoints and the CV /
CV-collision-fixed / standing baselines — with ADE/FDE/SADE/SFDE.

Covers the reference's baseline evaluators
(sicnav_diffusion/JMID/MID/{constant_velocity_baseline,baseline,
standing_baseline}.py) and its MID evaluator on the same scene format, so
predictor quality is comparable across methods on identical data.
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def baseline_forecast(batch, method, dt, horizon):
    """SceneBatch -> (A, T, 2) positions from one of the baselines."""
    from sicnav_tpu.diffusion import baselines as BL
    pos = jnp.asarray(batch.hist[:, -1, 0:2])
    vel = jnp.asarray(batch.hist[:, -1, 2:4])
    if method == "standing":
        return BL.standing_forecast(pos, horizon)
    if method == "cv":
        return BL.constant_velocity_forecast(pos, vel, dt, horizon)
    radius = jnp.full((pos.shape[0],), 0.3)
    return BL.cv_collision_fixed_forecast(
        pos, vel, radius, jnp.asarray(batch.agent_mask), dt, horizon)


def main():
    from sicnav_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    p = argparse.ArgumentParser()
    p.add_argument("--method", default="cv",
                   choices=["mid", "mid_jp", "cv", "cv_fix", "standing"])
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--data_files", nargs="*", default=[],
                   help="ETH/UCY txt or JRDB csv files; default: sim scenes")
    p.add_argument("--n_scenes", type=int, default=32)
    p.add_argument("--scenario", default="circle_crossing")
    p.add_argument("--num_samples", type=int, default=20)
    p.add_argument("--encoder_dim", type=int, default=256)
    p.add_argument("--num_node_types", type=int, default=1,
                   help="class-conditioned checkpoints (per-node-type "
                        "dispatch); adds a per_class ADE/FDE breakdown")
    p.add_argument("--tf_layer", type=int, default=3)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--full", action="store_true",
                   help="full metric sweep (eval_not_sicnav parity): "
                        "most-likely ADE/FDE, KDE-NLL, per-horizon-fraction "
                        "ADE, obstacle violations, NFE count")
    p.add_argument("--time", action="store_true",
                   help="benchmark single-scene inference latency "
                        "(reference mid.py time config, :94-102)")
    args = p.parse_args()

    from sicnav_tpu.env.types import EnvConfig
    from sicnav_tpu.diffusion import data as D, evaluation as EV
    from sicnav_tpu.diffusion.models import (ModelConfig,
                                             integrate_velocity_samples)
    sys.path.insert(0, os.path.dirname(__file__))
    from train_jmid import generate_sim_scenes

    dt = 0.25
    if args.data_files:
        examples = []
        dt = 0.4
        for f in args.data_files:
            if f.endswith(".txt"):
                pos, valid = D.load_ethucy_txt(f)
            else:
                pos, valid = D.load_trajectory_file(f, dt=dt)
            examples += D.build_examples(pos, valid, dt, history_len=6,
                                         horizon=8, max_agents=16)
    else:
        env_cfg = EnvConfig(
            scenario=args.scenario,
            human_policy="orca" if args.scenario in
            ("circle_crossing", "square_crossing") else "orca_plus",
            human_num=5, max_humans=5, starts_moving=0,
            robot_kinematics="holonomic")
        examples = generate_sim_scenes(args.n_scenes, env_cfg,
                                       args.seed + 10_000)

    model = params = None
    if args.method in ("mid", "mid_jp"):
        from sicnav_tpu.diffusion.mid import JMIDModel, load_checkpoint
        model = JMIDModel(ModelConfig(context_dim=args.encoder_dim,
                                      tf_layer=args.tf_layer,
                                      num_node_types=args.num_node_types),
                          joint=args.method == "mid_jp")
        k0 = jax.random.PRNGKey(0)
        one = jax.tree.map(jnp.asarray, examples[0])
        params = model.init({"params": k0, "dropout": k0}, one, k0)
        params = load_checkpoint(os.path.abspath(args.checkpoint), params)

    key = jax.random.PRNGKey(args.seed)

    if args.time and model is not None:
        # single-scene inference latency benchmark (mid.py:94-102 analog)
        import time as _time
        from sicnav_tpu.diffusion.mid import eval_scene
        from sicnav_tpu.diffusion.diffusion import nfe_count
        b0 = jax.tree.map(jnp.asarray, examples[0])
        run = lambda k: model.apply(params, b0, k, args.num_samples,
                                    method=type(model).sample)
        out = run(key)  # compile
        jax.block_until_ready(out)
        times = []
        for i in range(20):
            k = jax.random.fold_in(key, i)
            t0 = _time.perf_counter()
            jax.block_until_ready(run(k))
            times.append(_time.perf_counter() - t0)
        print(json.dumps({
            "method": args.method,
            "inference_ms_p50": float(1e3 * np.median(times)),
            "inference_ms_p95": float(1e3 * np.percentile(times, 95)),
            "num_samples": args.num_samples,
            "nfe": nfe_count(),
        }, indent=2))
        return

    ades, fdes, sades, sfdes = [], [], [], []
    extra = {k: [] for k in ("ml_ade", "ml_fde", "kde_nll", "ade_one_fourth",
                             "ade_two_fourth", "ade_three_fourth",
                             "obs_violation_rate")}
    for batch in examples:
        horizon = batch.fut_vel.shape[1]
        gt_valid = batch.agent_mask & batch.fut_mask.all(axis=-1)
        if not gt_valid.any():
            continue
        p0 = jnp.asarray(batch.hist[:, -1, 0:2])
        gt = integrate_velocity_samples(
            jnp.asarray(batch.fut_vel)[None], p0[None], dt)[0]
        if model is not None and args.full:
            from sicnav_tpu.diffusion.mid import eval_scene_full
            key, k = jax.random.split(key)
            m = eval_scene_full(model, params, jax.tree.map(
                jnp.asarray, batch), k, args.num_samples)
            a, f, sa, sf = m["ade"], m["fde"], m["sade"], m["sfde"]
            for kk in ("ml_ade", "ml_fde", "kde_nll", "ade_one_fourth",
                       "ade_two_fourth", "ade_three_fourth"):
                extra[kk].append(float(m[kk]))
            if not args.data_files and args.scenario.startswith("hallway"):
                # obstacle violations against the scenario's walls
                from sicnav_tpu.env.walls import build_walls
                walls, wmask, _ = build_walls(env_cfg)
                key, k2 = jax.random.split(key)
                pred = model.apply(params, jax.tree.map(jnp.asarray, batch),
                                   k2, args.num_samples,
                                   method=type(model).sample)
                viol = jax.vmap(lambda a_i: EV.obstacle_violations(
                    pred[:, a_i], jnp.asarray(walls), jnp.asarray(wmask),
                    0.3))(jnp.arange(pred.shape[1]))
                w_v = gt_valid.astype(np.float32)
                extra["obs_violation_rate"].append(
                    float(jnp.sum(viol * w_v) / w_v.sum()))
        elif model is not None:
            from sicnav_tpu.diffusion.mid import eval_scene
            key, k = jax.random.split(key)
            a, f, sa, sf = eval_scene(model, params, jax.tree.map(
                jnp.asarray, batch), k, args.num_samples)
        else:
            pred = baseline_forecast(batch, args.method, dt, horizon)
            w = gt_valid.astype(np.float32)
            pa = jax.vmap(lambda i: EV.ade(pred[i][None], gt[i]))(
                jnp.arange(gt.shape[0]))[:, 0]
            pf = jax.vmap(lambda i: EV.fde(pred[i][None], gt[i]))(
                jnp.arange(gt.shape[0]))[:, 0]
            a = jnp.sum(pa * w) / w.sum()
            f = jnp.sum(pf * w) / w.sum()
            sa, sf = EV.scene_ade_fde(pred[None], gt,
                                      jnp.asarray(gt_valid))
        ades.append(float(a)); fdes.append(float(f))
        sades.append(float(sa)); sfdes.append(float(sf))

    if model is not None and args.num_node_types > 1:
        # per-node-type breakdown (reference: JRDB multi-class eval)
        from sicnav_tpu.diffusion.mid import eval_scene_per_agent
        per = {t: {"ade": [], "fde": []} for t in D.NODE_TYPES}
        key2 = jax.random.PRNGKey(args.seed + 99)
        for batch in examples:
            key2, k = jax.random.split(key2)
            a, f, ok = eval_scene_per_agent(
                model, params, jax.tree.map(jnp.asarray, batch), k,
                args.num_samples)
            a, f, ok = np.asarray(a), np.asarray(f), np.asarray(ok)
            ty = np.asarray(batch.types())
            for ti, tn in enumerate(D.NODE_TYPES):
                m = ok & (ty == ti)
                per[tn]["ade"] += a[m].tolist()
                per[tn]["fde"] += f[m].tolist()
        per_class = {tn: {"n": len(v["ade"]),
                          "ade": float(np.mean(v["ade"])) if v["ade"] else None,
                          "fde": float(np.mean(v["fde"])) if v["fde"] else None}
                     for tn, v in per.items()}
    else:
        per_class = None

    out = {
        "method": args.method, "num_scenes": len(ades),
        "ade": float(np.mean(ades)), "fde": float(np.mean(fdes)),
        "sade": float(np.mean(sades)), "sfde": float(np.mean(sfdes)),
    }
    if per_class is not None:
        out["per_class"] = per_class
    if args.full:
        for k, v in extra.items():
            if v:
                out[k] = float(np.mean(v))
        from sicnav_tpu.diffusion.diffusion import nfe_count
        out["nfe"] = nfe_count()
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
