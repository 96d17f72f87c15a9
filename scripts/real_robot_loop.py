#!/usr/bin/env python
"""Real-robot streaming control-loop replay at wall-clock 10 Hz.

Drives sicnav_tpu.realtime.StreamingController — the equivalent of the
reference's real-robot ``SICNavAcados.select_action`` entry
(sicnav_diffusion/policy/sicnav_acados.py:1309, README.md:116) — from a
recorded observation stream: a sim episode is upsampled to a 30 Hz
"sensor" feed with jittered timestamps, observations are pushed
asynchronously as wall-clock time advances, and the controller runs at a
10 Hz deadline. Reports latency percentiles + deadline misses as JSON.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def record_stream(env_cfg, case, sensor_hz, jitter_s, seed=0):
    """Roll out one sim episode (DWA robot) and upsample to a sensor feed:
    [(t, (x, y, th), (H, 2)), ...]."""
    import jax
    from sicnav_tpu.env import crowd_sim, rollout
    from sicnav_tpu.policies.dwa import dwa_policy

    state = crowd_sim.reset_host(env_cfg, case)
    max_steps = int(env_cfg.time_limit / env_cfg.dt) + 2
    _, _, traj = rollout.rollout_episode(
        state, lambda s: dwa_policy(s, env_cfg), env_cfg, max_steps)
    traj = jax.tree.map(np.asarray, traj)
    T = traj.r_pos.shape[0]
    t_sim = np.arange(T) * env_cfg.dt
    rng = np.random.default_rng(seed)
    t_feed = np.arange(0.0, t_sim[-1], 1.0 / sensor_hz)
    t_feed = np.clip(t_feed + rng.normal(0, jitter_s, t_feed.shape),
                     0.0, t_sim[-1])
    t_feed.sort()
    th = np.unwrap(traj.r_theta)
    H = traj.h_pos.shape[1]
    stream = []
    for t in t_feed:
        rx = np.interp(t, t_sim, traj.r_pos[:, 0])
        ry = np.interp(t, t_sim, traj.r_pos[:, 1])
        rt = np.interp(t, t_sim, th)
        hp = np.stack([[np.interp(t, t_sim, traj.h_pos[:, h, d])
                        for d in range(2)] for h in range(H)])
        stream.append((float(t), (rx, ry, rt), hp))
    goal = traj.r_goal[0]
    walls = traj.walls[0][np.asarray(traj.wall_mask[0])]
    return stream, goal, walls


def main():
    from sicnav_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--scenario", default="hallway_bottleneck")
    p.add_argument("--num_humans", type=int, default=3)
    p.add_argument("--case", type=int, default=3)
    p.add_argument("--control_hz", type=float, default=10.0)
    p.add_argument("--sensor_hz", type=float, default=30.0)
    p.add_argument("--jitter_ms", type=float, default=5.0)
    p.add_argument("--duration_s", type=float, default=10.0)
    p.add_argument("--encoder_dim", type=int, default=128)
    p.add_argument("--tf_layer", type=int, default=2)
    args = p.parse_args()

    import jax
    from sicnav_tpu.env.types import EnvConfig
    from sicnav_tpu.env import crowd_sim
    from sicnav_tpu.diffusion.models import ModelConfig
    from sicnav_tpu.diffusion.mid import JMIDModel, load_checkpoint
    from sicnav_tpu.diffusion import forecaster as FC
    from sicnav_tpu.realtime import StreamingController

    env_cfg = EnvConfig(scenario=args.scenario, human_policy="orca_plus",
                        human_num=args.num_humans,
                        max_humans=args.num_humans, starts_moving=0,
                        robot_kinematics="unicycle")
    model = JMIDModel(ModelConfig(context_dim=args.encoder_dim,
                                  tf_layer=args.tf_layer), joint=True)
    fcfg = FC.ForecasterConfig(num_samples=48, num_ret_samples=10,
                               dt=env_cfg.dt)
    state0 = crowd_sim.reset_host(env_cfg, case=0)
    fstate = FC.init_state(env_cfg.max_humans, fcfg)
    batch0 = FC._scene_batch_from_hist(fstate, state0, fcfg)
    key = jax.random.PRNGKey(0)
    params = model.init({"params": key, "dropout": key}, batch0, key)
    if args.checkpoint:
        params = load_checkpoint(os.path.abspath(args.checkpoint), params)

    print("recording sensor stream...", file=sys.stderr)
    stream, goal, walls = record_stream(env_cfg, args.case, args.sensor_hz,
                                        args.jitter_ms / 1000.0)

    ctl = StreamingController(env_cfg, model, params, fcfg=fcfg)
    ctl.set_goal(goal)
    ctl.set_static_obstacles(walls)

    # warm-up: compile the fused step off the clock (the reference warms
    # its Acados cache the same way, mpc_env_new.py:295-301)
    for t, pose, hums in stream[: max(3, int(args.sensor_hz))]:
        ctl.observe(t, pose, hums)
    ctl.select_action()
    print("compiled; starting wall-clock loop", file=sys.stderr)

    deadline = 1.0 / args.control_hz
    lat, misses, ticks = [], 0, 0
    feed_i = 0
    t_wall0 = time.perf_counter()
    n_ticks = int(args.duration_s * args.control_hz)
    for k in range(n_ticks):
        tick_t = k * deadline
        # push every sensor sample whose (sim) timestamp has "arrived"
        while feed_i < len(stream) and stream[feed_i][0] <= tick_t:
            t, pose, hums = stream[feed_i]
            ctl.observe(t, pose, hums)
            feed_i += 1
        if feed_i == 0:
            continue
        v, om, diag = ctl.select_action()
        lat.append(diag["latency_s"])
        ticks += 1
        if diag["latency_s"] > deadline:
            misses += 1
        # sleep to the next tick boundary (wall clock)
        t_next = t_wall0 + (k + 1) * deadline
        dt_sleep = t_next - time.perf_counter()
        if dt_sleep > 0:
            time.sleep(dt_sleep)
        if feed_i >= len(stream):
            break
    lat = np.asarray(lat)
    print(json.dumps({
        "control_hz": args.control_hz,
        "ticks": ticks,
        "latency_p50_ms": float(np.percentile(lat, 50) * 1000),
        "latency_p95_ms": float(np.percentile(lat, 95) * 1000),
        "latency_max_ms": float(lat.max() * 1000),
        "deadline_ms": deadline * 1000,
        "deadline_misses": misses,
        "deadline_miss_rate": misses / max(ticks, 1),
    }))


if __name__ == "__main__":
    main()
