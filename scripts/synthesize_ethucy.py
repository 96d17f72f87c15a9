#!/usr/bin/env python
"""Synthesize ETH/UCY-format trajectory data at reference scale from sim
crowds (no raw ETH/UCY in this container — VERDICT r2 #1 fallback: generate
from the sim's ORCA/SFM crowds at dt 0.4 and run the full-budget recipe on
the result).

Output mimics the reference's raw layout (process_data.py:300-330):
tab-separated ``frame_id  track_id  x  y`` with frame ids in steps of 10,
one file per scene sequence, split into train/ and val/ directories. Scenes
concatenate several crowd rollouts with disjoint frame ranges and unique
track ids so files show ETH-like agent entry/exit.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="data/eth_synth")
    p.add_argument("--n_scenes", type=int, default=200,
                   help="crowd rollouts total (~ETH/UCY train scale)")
    p.add_argument("--rollouts_per_file", type=int, default=10)
    p.add_argument("--humans", type=int, default=6)
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--dt", type=float, default=0.4)
    p.add_argument("--val_fraction", type=float, default=0.15)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    import jax
    from sicnav_tpu.env.types import EnvConfig
    from sicnav_tpu.env import crowd_sim as CS, rollout as R
    from sicnav_tpu.policies.orca_robot import orca_robot_action

    scen_cycle = ["circle_crossing", "square_crossing"]
    pol_cycle = ["orca", "sfm"]
    all_tracks = []   # list of (T, A, 2) with mask (T, A)
    done = 0
    bi = 0
    while done < args.n_scenes:
        scen = scen_cycle[bi % len(scen_cycle)]
        hpol = pol_cycle[(bi // len(scen_cycle)) % len(pol_cycle)]
        n = min(32, args.n_scenes - done)
        cfg = EnvConfig(scenario=scen, human_policy=hpol, dt=args.dt,
                        human_num=args.humans, max_humans=args.humans,
                        starts_moving=0, robot_kinematics="holonomic",
                        time_limit=args.steps * args.dt + 1)
        keys = jax.random.split(jax.random.PRNGKey(args.seed + bi), n)
        states = jax.vmap(lambda k: CS.reset_device(k, cfg))(keys)
        _, _, traj = R.batch_rollout(
            states, lambda s: orca_robot_action(s, cfg), cfg,
            max_steps=args.steps)
        h_pos = np.asarray(traj.h_pos)        # (B, T, H, 2) batch-major?
        r_pos = np.asarray(traj.r_pos)
        h_mask = np.asarray(traj.h_mask)
        # batch_rollout vmaps episodes: axes are (B, T, ...)
        for b in range(n):
            pos = np.concatenate([h_pos[b], r_pos[b][:, None, :]], axis=1)
            mask = np.concatenate(
                [h_mask[b], np.ones_like(h_mask[b][:, :1])], axis=1)
            all_tracks.append((pos, mask))
        done += n
        bi += 1
        print(f"  rolled {done}/{args.n_scenes} ({scen}/{hpol})",
              file=sys.stderr)

    rng = np.random.default_rng(args.seed)
    rng.shuffle(all_tracks)
    n_val = max(int(len(all_tracks) * args.val_fraction), 1)
    splits = {"val": all_tracks[:n_val], "train": all_tracks[n_val:]}
    for split, tracks in splits.items():
        d = os.path.join(args.out, split)
        os.makedirs(d, exist_ok=True)
        per = args.rollouts_per_file
        for fi in range(0, len(tracks), per):
            rows = []
            frame0 = 0
            tid0 = 0
            for pos, mask in tracks[fi:fi + per]:
                T, A, _ = pos.shape
                for t in range(T):
                    for a in range(A):
                        if mask[t, a]:
                            rows.append((10 * (frame0 + t), tid0 + a,
                                         pos[t, a, 0], pos[t, a, 1]))
                frame0 += T + 5   # gap between concatenated rollouts
                tid0 += A
            path = os.path.join(d, f"synth_{fi // per:03d}.txt")
            with open(path, "w") as f:
                for fr, tid, x, y in rows:
                    f.write(f"{fr}\t{tid}\t{x:.4f}\t{y:.4f}\n")
        print(f"{split}: {len(tracks)} rollouts -> "
              f"{(len(tracks) + per - 1) // per} files in {d}")


if __name__ == "__main__":
    main()
