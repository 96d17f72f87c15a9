#!/usr/bin/env python
"""Amortized CAMPC fleet-solve throughput vs mesh size.

Shards a fixed batch of bilevel CAMPC control steps over 1/2/4/8 devices
(parallel/fleet.py, the same code path as the harness mesh option and the
driver dryrun stage 4) and reports solves/s. On the CI host this uses the
virtual CPU mesh (--xla_force_host_platform_device_count); on a real pod
slice the same program shards over ICI.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--num_humans", type=int, default=3)
    p.add_argument("--iters", type=int, default=20, help="IPM iterations")
    p.add_argument("--reps", type=int, default=5)
    p.add_argument("--devices", type=int, nargs="*", default=[1, 2, 4, 8])
    p.add_argument("--cpu_mesh", action="store_true",
                   help="force the virtual CPU mesh (default if the "
                        "backend has < max(devices) devices)")
    args = p.parse_args()

    if args.cpu_mesh:
        os.environ["JAX_PLATFORMS"] = "cpu"
        flags = " ".join(
            f for f in os.environ.get("XLA_FLAGS", "").split()
            if "xla_force_host_platform_device_count" not in f)
        os.environ["XLA_FLAGS"] = (
            flags +
            f" --xla_force_host_platform_device_count={max(args.devices)}"
        ).strip()

    import jax
    if args.cpu_mesh:
        jax.config.update("jax_platforms", "cpu")
    from sicnav_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax.numpy as jnp
    from sicnav_tpu.env import crowd_sim as CS
    from sicnav_tpu.env.types import EnvConfig
    from sicnav_tpu.mpc import campc, ipm
    from sicnav_tpu.mpc.ocp import MPCConfig
    from sicnav_tpu.parallel.fleet import make_fleet_policy
    from sicnav_tpu.parallel.mesh import make_mesh, shard_batch

    env_cfg = EnvConfig(scenario="circle_crossing", human_policy="orca",
                        human_num=args.num_humans,
                        max_humans=args.num_humans, starts_moving=0,
                        robot_kinematics="unicycle")
    mpc_cfg = MPCConfig(num_hums=args.num_humans,
                        num_walls=env_cfg.wall_slots, dt=env_cfg.dt)
    ocp, fleet_fn = make_fleet_policy(env_cfg, mpc_cfg,
                                      ipm.IPMSettings(n_iter=args.iters))

    keys = jax.random.split(jax.random.PRNGKey(0), args.batch)
    states0 = jax.vmap(lambda k: CS.reset_device(k, env_cfg))(keys)
    carries0 = jax.vmap(lambda _: campc.init_carry(ocp))(
        jnp.arange(args.batch))

    avail = len(jax.devices())
    rows = []
    for n in args.devices:
        if n > avail:
            print(f"# skip {n} devices (have {avail})", file=sys.stderr)
            continue
        mesh = make_mesh(n)
        states = shard_batch(states0, mesh)
        carries = shard_batch(carries0, mesh)
        a, c = fleet_fn(states, carries)      # compile + warm
        jax.block_until_ready(a)
        times = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            a, _ = fleet_fn(states, carries)
            jax.block_until_ready(a)
            times.append(time.perf_counter() - t0)
        dt = min(times)
        rows.append(dict(devices=n, batch=args.batch,
                         step_ms=1e3 * dt,
                         solves_per_s=args.batch / dt))
        print(json.dumps(rows[-1]))
    if rows:
        base = rows[0]["solves_per_s"]
        for r in rows:
            r["speedup"] = r["solves_per_s"] / base
        print(json.dumps({"table": rows}, indent=2))


if __name__ == "__main__":
    main()
