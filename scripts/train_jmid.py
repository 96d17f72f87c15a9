#!/usr/bin/env python
"""Train a JMID/iMID trajectory predictor (reference: JMID/MID/main.py).

Data comes from batched sim rollouts (generated on the fly, the equivalent
of the reference's SICNav_TRO_MID_data source) or ETH/UCY-format txt files.
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np


def generate_sim_scenes(n_scenes, cfg, seed=0, steps=60,
                        multi_class=False, history_len=6, horizon=8,
                        class_mode="speed"):
    """Roll batched envs with ORCA humans + ORCA robot to produce scenes.

    ``multi_class`` produces all three NODE_TYPES, the sim's equivalent of
    the reference's JRDB multi-class sources (process_data.py:413-421),
    driving the per-node-type encoder dispatch. Two class regimes:

    - ``class_mode='speed'`` (round-4): a random ~30% of humans get 1.7x
      preferred speed and are typed BICYCLE — class labels correlate with
      dynamics, but a 6-frame history identifies the class trivially
      (the measured dispatch-ablation null, BENCH_EXTRA round 4).
    - ``class_mode='maneuver'`` (round-5, VERDICT r4 #6): every class
      moves at the SAME preferred speed; BICYCLE-class agents are
      zig-zag maneuverers — each rollout segment their goal is re-aimed
      to a laterally rotated waypoint (alternating side), so mid-segment
      their history is indistinguishable from a straight PEDESTRIAN
      track. The only way to predict the upcoming turn is the class
      label — the mechanism the reference's per-node-type MGCVAE dispatch
      exists for (encoders/trajectron.py:318: JRDB classes share speed
      regimes but differ in maneuvering style)."""
    import jax.numpy as jnp
    from sicnav_tpu.env import crowd_sim as CS, rollout as R
    from sicnav_tpu.policies.orca_robot import orca_robot_action
    from sicnav_tpu.diffusion import data as D

    keys = jax.random.split(jax.random.PRNGKey(seed), n_scenes)
    states = jax.vmap(lambda k: CS.reset_device(k, cfg))(keys)
    bike = np.zeros((n_scenes, states.h_v_pref.shape[1]), bool)
    if multi_class:
        bike = np.asarray(jax.random.bernoulli(
            jax.random.PRNGKey(seed + 1),
            0.3 if class_mode == "speed" else 0.4,
            states.h_v_pref.shape))
        if class_mode == "speed":
            states = states._replace(
                h_v_pref=states.h_v_pref * jnp.where(bike, 1.7, 1.0))
    pol = lambda s: orca_robot_action(s, cfg)

    if multi_class and class_mode == "maneuver":
        # segmented rollout with mid-flight goal re-aiming for the
        # BICYCLE class: rotate (goal - pos) by an alternating-side
        # 40-75 degree turn every `seg` steps. t/done are reset between
        # segments (data generation only — no episode semantics needed).
        seg = 8
        bike_j = jnp.asarray(bike)
        key = jax.random.PRNGKey(seed + 2)
        st, trajs = states, []
        for si in range(max(steps // seg, 1)):
            fst, _, traj = R.batch_rollout(st, pol, cfg, max_steps=seg)
            trajs.append(traj)
            key, k = jax.random.split(key)
            ang = jax.random.uniform(
                k, bike_j.shape, minval=jnp.deg2rad(70.0),
                maxval=jnp.deg2rad(120.0)) * (1.0 if si % 2 == 0 else -1.0)
            to_g = fst.h_goal - fst.h_pos
            c, s = jnp.cos(ang), jnp.sin(ang)
            rot = jnp.stack([c * to_g[..., 0] - s * to_g[..., 1],
                             s * to_g[..., 0] + c * to_g[..., 1]], -1)
            # re-aim a fixed 4 m ahead so a near goal cannot park the agent
            dirv = rot / jnp.maximum(
                jnp.linalg.norm(rot, axis=-1, keepdims=True), 1e-6)
            new_goal = jnp.where(bike_j[..., None],
                                 fst.h_pos + 4.0 * dirv, fst.h_goal)
            # keep the scene alive: a robot that reached its goal sets the
            # env `done`, which freezes EVERY agent's stepping
            # (step_masked) — re-aim the robot 4 m along its heading and
            # clear done/t so later segments still carry motion
            r_head = jnp.where(
                jnp.linalg.norm(fst.r_vel, axis=-1, keepdims=True) > 0.05,
                fst.r_vel, fst.r_goal - fst.r_pos)
            r_dir = r_head / jnp.maximum(
                jnp.linalg.norm(r_head, axis=-1, keepdims=True), 1e-6)
            st = fst._replace(h_goal=new_goal,
                              r_goal=fst.r_pos + 4.0 * r_dir,
                              done=jnp.zeros_like(fst.done),
                              t=jnp.zeros_like(fst.t))
        traj = jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=1), *trajs)
    else:
        _, _, traj = R.batch_rollout(states, pol, cfg, max_steps=steps)

    examples = []
    for b in range(n_scenes):
        scene = jax.tree.map(lambda x: np.asarray(x[b]), traj)
        pos, valid = D.scenes_from_env_rollout(
            scene, human_only=not multi_class)
        types = None
        if multi_class:
            types = np.zeros((pos.shape[0],), np.int32)
            types[:-1][bike[b][:pos.shape[0] - 1]] = \
                D.NODE_TYPES.index("BICYCLE")
            types[-1] = D.NODE_TYPES.index("ROBOT")   # robot is last track
        examples += D.build_examples(pos, valid, cfg.dt,
                                     history_len=history_len,
                                     horizon=horizon, stride=4, types=types)
    return examples


def main():
    from sicnav_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    p = argparse.ArgumentParser()
    p.add_argument("--method", default="mid_jp", choices=["mid", "mid_jp"])
    p.add_argument("--recipe", default=None,
                   help="named training recipe from the reference's 14-yaml "
                        "matrix (sicnav_tpu.diffusion.recipes), e.g. "
                        "ddim_p3_bs256_lr001_eth")
    p.add_argument("--dataset", default="sim")
    p.add_argument("--data_files", nargs="*", default=[],
                   help="ETH/UCY-format txt files (overrides sim generation)")
    p.add_argument("--val_data_files", nargs="*", default=[],
                   help="held-out files for validation (otherwise a 10% "
                        "split of --data_files)")
    p.add_argument("--max_val_batches", type=int, default=0,
                   help="cap validation batches per epoch (0 = all); the "
                        "full-budget runs cap this so per-epoch DDIM "
                        "sampling stays a bounded fraction of train time")
    p.add_argument("--log_dir", default=None,
                   help="JSONL + optional TB training curves")
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--val_full", action="store_true",
                   help="full metric sweep on the val split after training")
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--n_scenes", type=int, default=64)
    p.add_argument("--scenario", default="circle_crossing")
    p.add_argument("--multi_class", action="store_true",
                   help="multi-class sim scenes (robot track typed ROBOT) "
                        "+ per-node-type encoder dispatch "
                        "(num_node_types=3); reports per-class val ADE/FDE")
    p.add_argument("--class_mode", default="speed",
                   choices=["speed", "maneuver"],
                   help="multi-class synthesis regime: 'speed' = round-4 "
                        "1.7x BICYCLE speed separation; 'maneuver' = "
                        "round-5 overlapping-speed zig-zag maneuverers "
                        "(class is invisible from a 6-frame history — the "
                        "regime per-node-type dispatch exists for)")
    p.add_argument("--no_dispatch", action="store_true",
                   help="ablation: keep --multi_class data + per-class eval "
                        "but build the encoder with num_node_types=1 (no "
                        "class/edge-class embeddings) to quantify what the "
                        "per-node-type dispatch contributes")
    p.add_argument("--encoder_dim", type=int, default=256)
    p.add_argument("--tf_layer", type=int, default=3)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default="checkpoints/jmid")
    args = p.parse_args()

    from sicnav_tpu.env.types import EnvConfig
    from sicnav_tpu.diffusion import data as D
    from sicnav_tpu.diffusion.models import ModelConfig
    from sicnav_tpu.diffusion.mid import JMIDModel, TrainConfig, fit

    recipe = None
    if args.recipe:
        from sicnav_tpu.diffusion.recipes import get_recipe
        recipe = get_recipe(args.recipe)

    hist_len = recipe.history_len if recipe else 6
    horizon = recipe.horizon if recipe else 8
    dt = recipe.dt if recipe else 0.4

    def load_files(files):
        out = []
        for f in files:
            if f.endswith(".txt"):
                pos, valid = D.load_ethucy_txt(f)
            else:
                pos, valid = D.load_trajectory_file(f, dt=dt)
            out += D.build_examples(pos, valid, dt, history_len=hist_len,
                                    horizon=horizon, max_agents=16)
        return out

    val_examples = None
    if args.data_files:
        examples = load_files(args.data_files)
        if args.val_data_files:
            val_examples = load_files(args.val_data_files)
    else:
        env_cfg = EnvConfig(
            scenario=args.scenario,
            human_policy="orca" if args.scenario in
            ("circle_crossing", "square_crossing") else "orca_plus",
            human_num=5, max_humans=5, starts_moving=0,
            robot_kinematics="holonomic")
        examples = generate_sim_scenes(args.n_scenes, env_cfg, args.seed,
                                       multi_class=args.multi_class,
                                       class_mode=args.class_mode)

    rng = np.random.default_rng(args.seed)
    rng.shuffle(examples)
    if val_examples is not None:
        rng.shuffle(val_examples)
        val, train = val_examples, examples
    else:
        n_val = max(len(examples) // 10, 1)
        val, train = examples[:n_val], examples[n_val:]

    if recipe is not None:
        import dataclasses as _dc
        rmodel = recipe.model
        if args.multi_class and not args.no_dispatch:
            import dataclasses as _dc2
            rmodel = _dc2.replace(rmodel, num_node_types=3)
        model = JMIDModel(rmodel, joint=recipe.joint)
        tc = _dc.replace(recipe.train, seed=args.seed,
                         epochs=args.epochs or recipe.train.epochs,
                         batch_size=min(recipe.train.batch_size,
                                        max(len(train), 1)))
    else:
        model = JMIDModel(ModelConfig(context_dim=args.encoder_dim,
                                      tf_layer=args.tf_layer,
                                      num_node_types=(
                                          3 if args.multi_class
                                          and not args.no_dispatch else 1)),
                          joint=args.method == "mid_jp")
        tc = TrainConfig(joint=args.method == "mid_jp", lr=args.lr,
                         epochs=args.epochs or 90,
                         batch_size=args.batch_size, seed=args.seed)

    def batches(ex):
        # batch at the RECIPE's batch size, not the CLI default
        bs = tc.batch_size
        out = []
        for i in range(0, len(ex) - bs + 1, bs):
            out.append(D.stack_batches(ex[i:i + bs]))
        return out
    import time
    val_batches = batches(val)
    if args.max_val_batches:
        val_batches = val_batches[:args.max_val_batches]
    train_batches = batches(train)
    print(json.dumps({"train_examples": len(train), "val_examples": len(val),
                      "train_batches": len(train_batches),
                      "val_batches": len(val_batches),
                      "epochs": tc.epochs}), file=sys.stderr)
    t0 = time.perf_counter()
    params, history = fit(model, train_batches, val_batches, tc,
                          checkpoint_dir=os.path.abspath(args.out),
                          log_dir=args.log_dir)
    wall = time.perf_counter() - t0
    print(json.dumps({"wall_clock_s": wall,
                      "epochs_run": len(history),
                      "early_stopped": len(history) < tc.epochs,
                      "best_val_ade": min(h["val_ade"] for h in history)}))
    print(json.dumps(history[-3:], indent=2))
    if args.multi_class:
        # per-node-type val ADE/FDE (the reference evaluates JRDB
        # multi-class models per class)
        import jax.numpy as jnp
        from sicnav_tpu.diffusion.mid import eval_scene_per_agent
        key = jax.random.PRNGKey(tc.seed + 13)
        per = {t: {"ade": [], "fde": []} for t in D.NODE_TYPES}
        for ex in val:
            key, k = jax.random.split(key)
            a, f, ok = eval_scene_per_agent(
                model, params, jax.tree.map(jnp.asarray, ex), k,
                tc.eval_samples)
            a, f, ok = np.asarray(a), np.asarray(f), np.asarray(ok)
            ty = np.asarray(ex.types())
            for ti, tn in enumerate(D.NODE_TYPES):
                m = ok & (ty == ti)
                per[tn]["ade"] += a[m].tolist()
                per[tn]["fde"] += f[m].tolist()
        print(json.dumps({
            "per_class": {tn: {"n": len(v["ade"]),
                               "ade": float(np.mean(v["ade"])) if v["ade"]
                               else None,
                               "fde": float(np.mean(v["fde"])) if v["fde"]
                               else None}
                          for tn, v in per.items()}}, indent=2))
    if args.val_full:
        # full metric sweep on the val scenes (eval_not_sicnav parity)
        import jax.numpy as jnp
        from sicnav_tpu.diffusion.mid import eval_scene_full
        key = jax.random.PRNGKey(tc.seed + 7)
        accum = {}
        for ex in val:
            key, k = jax.random.split(key)
            m = eval_scene_full(model, params,
                                jax.tree.map(jnp.asarray, ex), k,
                                tc.eval_samples)
            for kk, v in m.items():
                accum.setdefault(kk, []).append(float(v))
        print(json.dumps({k: float(np.mean(v)) for k, v in accum.items()},
                         indent=2))
    print("checkpoint:", args.out)


if __name__ == "__main__":
    main()
