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
    p.add_argument("--tf_layer", type=int, default=3)
    p.add_argument("--seed", type=int, default=0)
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
                                      tf_layer=args.tf_layer),
                          joint=args.method == "mid_jp")
        k0 = jax.random.PRNGKey(0)
        one = jax.tree.map(jnp.asarray, examples[0])
        params = model.init({"params": k0, "dropout": k0}, one, k0)
        params = load_checkpoint(os.path.abspath(args.checkpoint), params)

    key = jax.random.PRNGKey(args.seed)
    ades, fdes, sades, sfdes = [], [], [], []
    for batch in examples:
        horizon = batch.fut_vel.shape[1]
        gt_valid = batch.agent_mask & batch.fut_mask.all(axis=-1)
        if not gt_valid.any():
            continue
        p0 = jnp.asarray(batch.hist[:, -1, 0:2])
        gt = integrate_velocity_samples(
            jnp.asarray(batch.fut_vel)[None], p0[None], dt)[0]
        if model is not None:
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

    print(json.dumps({
        "method": args.method, "num_scenes": len(ades),
        "ade": float(np.mean(ades)), "fde": float(np.mean(fdes)),
        "sade": float(np.mean(sades)), "sfde": float(np.mean(sfdes)),
    }, indent=2))


if __name__ == "__main__":
    main()
