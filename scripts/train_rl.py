#!/usr/bin/env python
"""Train SARL/RGL DQN over vectorized envs (reference: RL_nav/RL_train.py +
train_SARL.py / train_RGL.py), with the imitation-learning bootstrap."""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    from sicnav_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="sarl", choices=["sarl", "rgl"])
    p.add_argument("--total_timesteps", type=int, default=200_000)
    p.add_argument("--n_envs", type=int, default=32)
    p.add_argument("--il_episodes", type=int, default=300)
    p.add_argument("--skip_il", action="store_true")
    p.add_argument("--num_humans", type=int, default=3)
    p.add_argument("--scenario", default="circle_crossing")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default="checkpoints/rl")
    p.add_argument("--mesh", type=int, default=0,
                   help="data-parallel training over an N-device mesh "
                        "(env batch + replay batches sharded, grads "
                        "all-reduced over ICI)")
    args = p.parse_args()

    from sicnav_tpu.env.types import EnvConfig
    from sicnav_tpu.rl.networks import SARLNetwork, RGLNetwork
    from sicnav_tpu.rl import dqn as D
    from sicnav_tpu.rl import imitation as IL

    env_cfg = EnvConfig(
        scenario=args.scenario,
        human_policy="orca" if args.scenario == "circle_crossing" else "orca_plus",
        human_num=args.num_humans, max_humans=args.num_humans,
        starts_moving=0, robot_kinematics="unicycle")
    net = SARLNetwork() if args.model == "sarl" else RGLNetwork()

    init_params = None
    if not args.skip_il:
        il_cfg = IL.ILConfig(il_episodes=args.il_episodes)
        print("collecting ORCA demonstrations ...")
        data = IL.collect_demonstrations(env_cfg, il_cfg, seed=args.seed)
        print(f"{data[0].shape[0]} states; fitting value net ...")
        init_params, losses = IL.fit_value_net(net, data, il_cfg,
                                               seed=args.seed)
        print(f"IL loss {losses[0]:.4f} -> {losses[-1]:.4f}")

    mesh = None
    if args.mesh:
        from sicnav_tpu.parallel.mesh import make_mesh
        mesh = make_mesh(args.mesh)
    params, history = D.train(net, env_cfg, D.DQNConfig(
        total_timesteps=args.total_timesteps), n_envs=args.n_envs,
        seed=args.seed, init_params=init_params, mesh=mesh)
    print(json.dumps(history[-3:], indent=2))

    os.makedirs(os.path.dirname(os.path.abspath(args.out)) or ".", exist_ok=True)
    from sicnav_tpu.diffusion.mid import save_checkpoint
    save_checkpoint(os.path.abspath(args.out), params)
    print("checkpoint:", args.out)


if __name__ == "__main__":
    main()
