#!/usr/bin/env python
"""Decompose the SICNav-Diffusion control-step latency on real hardware:
(1) JMID forecast (encoder + DDIM scan + KDE top-k), (2) bilevel CAMPC
solve, (3) the fused jitted step — plus the raw batched KKT linear-solve
microbenchmark that bounds the IPM's per-iteration cost. Guides kernel
work: whatever dominates here is the Pallas target.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def _force(out):
    """Fetch one leaf to host: on the axon platform block_until_ready can
    return before remote execution completes; a D2H transfer cannot (see
    bench.py). Identical-input repeat calls can also be deduped
    server-side, so callers should vary inputs when that matters."""
    leaf = jax.tree.leaves(out)[0]
    return np.asarray(leaf)


def timeit(fn, *args, reps=20):
    _force(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _force(fn(*args))
        ts.append(time.perf_counter() - t0)
    return 1e3 * float(np.median(ts))


def main():
    from sicnav_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    p = argparse.ArgumentParser()
    p.add_argument("--num_humans", type=int, default=3)
    p.add_argument("--num_samples", type=int, default=48)
    p.add_argument("--num_ret_samples", type=int, default=10)
    p.add_argument("--encoder_dim", type=int, default=128)
    p.add_argument("--tf_layer", type=int, default=2)
    p.add_argument("--ipm_iters", type=int, default=30)
    p.add_argument("--multi_start", type=int, default=1,
                   help="starts per solve for the plain-CAMPC row "
                        "(campc._build_starts vmapped IPM)")
    p.add_argument("--adaptive_effort", type=int, default=0,
                   help="MPCConfig.adaptive_effort: also times the "
                        "ESCALATED step (previous solve rejected -> "
                        "n_iter + adaptive_effort traced iterations) vs "
                        "the happy-path step of the same compiled program")
    args = p.parse_args()

    from sicnav_tpu.env.types import EnvConfig
    from sicnav_tpu.env import crowd_sim as CS
    from sicnav_tpu.diffusion.models import ModelConfig
    from sicnav_tpu.diffusion.mid import JMIDModel
    from sicnav_tpu.diffusion import forecaster as FC
    from sicnav_tpu.mpc import campc as C, ipm, sicnav_diffusion as SD

    cfg = EnvConfig(scenario="hallway_bottleneck", human_policy="orca_plus",
                    human_num=args.num_humans, max_humans=args.num_humans,
                    robot_kinematics="unicycle")
    model = JMIDModel(ModelConfig(context_dim=args.encoder_dim,
                                  tf_layer=args.tf_layer), joint=True)
    fcfg = FC.ForecasterConfig(num_samples=args.num_samples,
                               num_ret_samples=args.num_ret_samples,
                               dt=cfg.dt)
    state = CS.reset_host(cfg, case=1)
    fstate = FC.init_state(cfg.max_humans, fcfg)
    batch = FC._scene_batch_from_hist(fstate, state, fcfg)
    key = jax.random.PRNGKey(0)
    params = model.init({"params": key, "dropout": key}, batch, key)

    out = {}

    # 1. forecast alone
    @jax.jit
    def forecast(fstate, state, k):
        fs = FC.update_state_hists(fstate, state, fcfg)
        return FC.predict_ret_best(model, params, fs, state, k, fcfg)

    out["forecast_ms"] = timeit(forecast, fstate, state, key)

    # 2. plain CAMPC solve (same settings as the fused step)
    settings = ipm.IPMSettings(n_iter=args.ipm_iters)
    mpc_cfg = None
    if args.multi_start > 1 or args.adaptive_effort > 0:
        from sicnav_tpu.mpc.ocp import MPCConfig
        mpc_cfg = MPCConfig(num_hums=cfg.max_humans,
                            num_walls=cfg.wall_slots, dt=cfg.dt,
                            multi_start=args.multi_start,
                            adaptive_effort=args.adaptive_effort)
        out["multi_start"] = args.multi_start
    ocp, policy = C.make_policy(cfg, mpc_cfg, settings=settings)
    carry = C.init_carry(ocp)
    out["campc_solve_ms"] = timeit(lambda s, c: policy(s, c)[0], state, carry)
    if args.adaptive_effort > 0:
        # escalated step: the carry says the previous solve was rejected,
        # so ipm.solve runs n_iter + adaptive_effort traced iterations in
        # the SAME compiled program (n_iter_dyn). The happy-path row above
        # is the while_loop codegen at the base budget; the delta between
        # the two rows is the price of one escalation (VERDICT r4 #1's
        # "escalated-step p50 < 100 ms" sub-criterion).
        import jax.numpy as jnp
        act0, carry1 = policy(state, carry)
        _force(act0)
        esc = carry1._replace(has_prev=jnp.array(True),
                              prev_ok=jnp.array(False))
        out["adaptive_effort"] = args.adaptive_effort
        out["campc_escalated_ms"] = timeit(
            lambda s, c: policy(s, c)[0], state, esc)

    # 3. fused step
    ocp2, fused = SD.make_policy(cfg, model, params, fcfg=fcfg,
                                 settings=settings)
    fcarry = SD.init_carry(ocp2, cfg.max_humans, fcfg)
    out["fused_step_ms"] = timeit(lambda s, c: fused(s, c)[0], state, fcarry)

    # 4. raw batched KKT-size linear solve (the IPM inner primitive):
    # single (n+m) system and a B=16 batch of them
    n_m = ocp2.cfg.n_z + ocp2.n_eq
    rng = np.random.default_rng(0)
    A1 = jnp.asarray(rng.normal(size=(n_m, n_m)).astype(np.float32)) + \
        n_m * jnp.eye(n_m)
    b1 = jnp.asarray(rng.normal(size=(n_m,)).astype(np.float32))
    solve1 = jax.jit(jnp.linalg.solve)
    out["kkt_solve_1x_ms"] = timeit(solve1, A1, b1)
    AB = jnp.broadcast_to(A1, (16, n_m, n_m))
    bB = jnp.broadcast_to(b1, (16, n_m))[..., None]
    out["kkt_solve_16x_ms"] = timeit(solve1, AB, bB)
    out["kkt_dim"] = int(n_m)
    out["ipm_iters"] = args.ipm_iters
    out["per_iter_solve_share_ms"] = out["kkt_solve_1x_ms"] * args.ipm_iters

    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
