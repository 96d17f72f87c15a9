#!/usr/bin/env python
"""Convert raw trajectory data into training-ready scene arrays.

Equivalent of JMID/MID/process_data.py: reads ETH/UCY txt or JRDB-style csv
files (or generates sim rollouts), slices them into fixed-shape SceneBatch
examples with optional rotation augmentation, and writes one .npz per split.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("files", nargs="*", help="raw trajectory files")
    p.add_argument("--source", default="ethucy",
                   choices=["ethucy", "jrdb", "sim"])
    p.add_argument("--dt", type=float, default=0.4)
    p.add_argument("--history_len", type=int, default=6)
    p.add_argument("--horizon", type=int, default=8)
    p.add_argument("--max_agents", type=int, default=16)
    p.add_argument("--augment_rotations", type=int, default=0,
                   help="number of extra rotated copies per scene "
                        "(reference: 15-degree steps over 360)")
    p.add_argument("--n_sim_scenes", type=int, default=64)
    p.add_argument("--out", default="processed_data/train.npz")
    p.add_argument("--pkl_out", default=None,
                   help="ALSO write a reference-format dill Environment "
                        "pkl (env_pkl interchange; loadable by the "
                        "reference's dataset/dataset.py)")
    p.add_argument("--classes", default="PEDESTRIAN",
                   help="comma-separated NODE_TYPES to keep; more than one "
                        "enables multi-class examples whose node_type "
                        "codes drive the per-class encoder dispatch "
                        "(process_data.py:413-421 multi-class parity)")
    args = p.parse_args()
    keep_classes = tuple(args.classes.split(","))

    from sicnav_tpu.diffusion import data as D

    raw_scenes = []   # (name, dt, pos, valid) for the pkl interchange
    examples = []
    if args.source == "sim":
        from scripts.train_jmid import generate_sim_scenes
        from sicnav_tpu.env.types import EnvConfig
        cfg = EnvConfig(scenario="circle_crossing", human_policy="orca",
                        human_num=5, max_humans=5, starts_moving=0,
                        robot_kinematics="holonomic", dt=0.25)
        examples = generate_sim_scenes(args.n_sim_scenes, cfg)
    else:
        frame_div = 10 if args.source == "jrdb" else 1
        for f in args.files:
            pos, valid, types = D.load_trajectory_file(
                f, dt=args.dt, frame_divisor=frame_div,
                center=args.source == "jrdb", keep_classes=keep_classes,
                return_types=True)
            raw_scenes.append((os.path.basename(f).split(".")[0],
                               args.dt, pos, valid))
            examples += D.build_examples(pos, valid, args.dt,
                                         history_len=args.history_len,
                                         horizon=args.horizon,
                                         max_agents=args.max_agents,
                                         types=types)

    if args.augment_rotations > 0:
        rng = np.random.default_rng(0)
        extra = []
        for e in examples:
            for _ in range(args.augment_rotations):
                theta = rng.choice(np.arange(0, 360, 15)) * np.pi / 180.0
                extra.append(D.rotate_scene(e, theta))
        examples += extra

    if not examples:
        raise SystemExit("no examples produced")
    stacked = D.stack_batches(examples)
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    np.savez_compressed(args.out, **stacked._asdict())
    print(f"wrote {len(examples)} scene examples -> {args.out}")
    if args.pkl_out:
        from sicnav_tpu.diffusion import env_pkl as EP
        if not raw_scenes:
            raise SystemExit("--pkl_out requires file sources (not sim)")
        EP.save_environment(args.pkl_out,
                            EP.arrays_to_environment(raw_scenes))
        print(f"wrote reference-format Environment pkl -> {args.pkl_out}")


def load_processed(path):
    """Load a processed .npz back into a stacked SceneBatch."""
    from sicnav_tpu.diffusion.data import SceneBatch
    z = np.load(path)
    # node_type is absent in pre-round-4 npz files (single-class era)
    return SceneBatch(**{k: (z[k] if k in z.files else None)
                          for k in SceneBatch._fields})


if __name__ == "__main__":
    main()
