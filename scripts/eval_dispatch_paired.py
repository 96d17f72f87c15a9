#!/usr/bin/env python
"""Paired per-agent comparison of the per-node-type dispatch encoder vs
its --no_dispatch ablation on the SAME val scenes with the SAME sampling
keys (the statistics the mean-only train_jmid printout cannot give).

Both checkpoints come from scripts/train_jmid.py --multi_class runs (the
dispatch one trained with num_node_types=3, the ablation with 1). The val
split is rebuilt exactly as train_jmid builds it (same synthesis seed,
same shuffle, same 10% cut), and every example is evaluated by both
models under one shared PRNG key, so per-agent ADE/FDE differences are
paired samples: we report the mean paired difference, its standard
error, a normal-approx 95% CI, and the win fraction per node type
(reference protocol: JRDB multi-class per-node-type eval,
sicnav_diffusion/JMID/MID/eval_not_sicnav.py per-class loops).
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from sicnav_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt_dispatch", default="checkpoints/jmid_mc_man")
    p.add_argument("--ckpt_no_dispatch",
                   default="checkpoints/jmid_mc_man_nod")
    p.add_argument("--class_mode", default="maneuver",
                   choices=["speed", "maneuver"])
    p.add_argument("--n_scenes", type=int, default=320,
                   help="must match the training run for an identical "
                        "val split")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--num_samples", type=int, default=20)
    p.add_argument("--max_examples", type=int, default=0,
                   help="cap val examples (0 = all)")
    p.add_argument("--scenario", default="circle_crossing")
    args = p.parse_args()

    from sicnav_tpu.env.types import EnvConfig
    from sicnav_tpu.diffusion import data as D
    from sicnav_tpu.diffusion.models import ModelConfig
    from sicnav_tpu.diffusion.mid import (JMIDModel, load_checkpoint,
                                          eval_scene_per_agent)
    sys.path.insert(0, os.path.dirname(__file__))
    from train_jmid import generate_sim_scenes

    env_cfg = EnvConfig(scenario=args.scenario, human_policy="orca",
                        human_num=5, max_humans=5, starts_moving=0,
                        robot_kinematics="holonomic")
    examples = generate_sim_scenes(args.n_scenes, env_cfg, args.seed,
                                   multi_class=True,
                                   class_mode=args.class_mode)
    rng = np.random.default_rng(args.seed)
    rng.shuffle(examples)
    val = examples[:max(len(examples) // 10, 1)]
    if args.max_examples:
        val = val[:args.max_examples]
    print(json.dumps({"val_examples": len(val)}), file=sys.stderr)

    def build(nnt, ckpt):
        model = JMIDModel(ModelConfig(context_dim=256, tf_layer=3,
                                      num_node_types=nnt), joint=True)
        k0 = jax.random.PRNGKey(0)
        one = jax.tree.map(jnp.asarray, val[0])
        params = model.init({"params": k0, "dropout": k0}, one, k0)
        return model, load_checkpoint(os.path.abspath(ckpt), params)

    m_d, p_d = build(3, args.ckpt_dispatch)
    m_n, p_n = build(1, args.ckpt_no_dispatch)

    key = jax.random.PRNGKey(args.seed + 13)
    diffs = {t: {"ade": [], "fde": []} for t in D.NODE_TYPES}
    # per-scene mean diffs: scenes are independent draws, agents within a
    # scene are not — the clustered stats below are the defensible ones
    scene_diffs = {t: {"ade": [], "fde": []} for t in D.NODE_TYPES}
    for i, ex in enumerate(val):
        key, k = jax.random.split(key)
        exj = jax.tree.map(jnp.asarray, ex)
        a_d, f_d, ok = eval_scene_per_agent(m_d, p_d, exj, k,
                                            args.num_samples)
        a_n, f_n, _ = eval_scene_per_agent(m_n, p_n, exj, k,
                                           args.num_samples)
        ok = np.asarray(ok)
        ty = np.asarray(ex.types())
        da = np.asarray(a_n - a_d)   # >0 => dispatch better
        df = np.asarray(f_n - f_d)
        for ti, tn in enumerate(D.NODE_TYPES):
            m = ok & (ty == ti)
            diffs[tn]["ade"] += da[m].tolist()
            diffs[tn]["fde"] += df[m].tolist()
            if m.any():
                scene_diffs[tn]["ade"].append(float(da[m].mean()))
                scene_diffs[tn]["fde"].append(float(df[m].mean()))
        if (i + 1) % 50 == 0:
            print(f"{i + 1}/{len(val)}", file=sys.stderr)

    out = {}
    for tn, v in diffs.items():
        row = {}
        for metric, d in v.items():
            d = np.asarray(d)
            if not len(d):
                row[metric] = None
                continue
            se = float(d.std(ddof=1) / np.sqrt(len(d)))
            mu = float(d.mean())
            sd = np.asarray(scene_diffs[tn][metric])
            sse = float(sd.std(ddof=1) / np.sqrt(len(sd)))
            smu = float(sd.mean())
            row[metric] = {"n": int(len(d)),
                           "mean_paired_diff": mu, "se": se,
                           "ci95": [mu - 1.96 * se, mu + 1.96 * se],
                           "win_frac": float((d > 0).mean()),
                           "scene_clustered": {
                               "n_scenes": int(len(sd)),
                               "mean": smu, "se": sse,
                               "ci95": [smu - 1.96 * sse,
                                        smu + 1.96 * sse],
                               "scene_win_frac": float((sd > 0).mean())}}
        out[tn] = row
    alla = np.asarray(sum((v["ade"] for v in diffs.values()), []))
    out["ALL"] = {"ade_mean_paired_diff": float(alla.mean()),
                  "ade_se": float(alla.std(ddof=1) / np.sqrt(len(alla))),
                  "n": int(len(alla))}
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
