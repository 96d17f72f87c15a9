"""Evaluation harness: the seeded 500-case protocol.

Replaces RL_nav/RL_test.py:23-204 and simple_test.py: deterministic
case-indexed scenarios (case == RNG seed via reset_host), batched rollouts,
and the reference metric set (success / collision / wall-collision /
frozen / discomfort rates, mean nav time).
"""

from __future__ import annotations

from typing import Callable, Dict

import jax
import jax.numpy as jnp
import numpy as np

from sicnav_tpu.env import crowd_sim, rollout
from sicnav_tpu.env.types import EnvConfig


def evaluate_policy(policy_fn: Callable, cfg: EnvConfig, num_cases: int = 500,
                    phase: str = "test", batch: int = 50,
                    stateful_policy=None) -> Dict:
    """Run ``num_cases`` seeded episodes; returns the reference summary
    metrics (RL_test.py:86-100).

    policy_fn: SimState -> (2,) action (stateless policies), or pass
    ``stateful_policy=(init_carry_fn, step_fn)`` for carry-state policies
    (e.g. CAMPC) which are run per-episode with lax.scan.
    """
    max_steps = int(cfg.time_limit / cfg.dt) + 2
    all_stats = []

    run_one = None
    if stateful_policy is not None:
        init_carry_fn, step_fn = stateful_policy

        @jax.jit
        def run_one(s0):
            carry0 = init_carry_fn()

            def body(c, _):
                s, pc = c
                action, pc = step_fn(s, pc)
                s2, rew, info = crowd_sim.step_masked(s, action, cfg)
                return (s2, pc), (rew, info)

            (sf, _), (rews, infos) = jax.lax.scan(
                body, (s0, carry0), None, length=max_steps)
            return sf, rews, infos

    for start in range(0, num_cases, batch):
        cases = list(range(start, min(start + batch, num_cases)))
        states = [crowd_sim.reset_host(cfg, c, phase) for c in cases]
        if stateful_policy is None:
            batch_states = jax.tree.map(lambda *xs: jnp.stack(xs), *states)
            _, stats, _ = rollout.batch_rollout(batch_states, policy_fn, cfg,
                                                max_steps)
        else:
            outs = [run_one(s) for s in states]
            stats = _stats_from_infos(outs, cfg, max_steps)
            all_stats.append(stats)
            continue
        all_stats.append(jax.tree.map(np.asarray, stats))

    stats = jax.tree.map(lambda *xs: np.concatenate([np.atleast_1d(x) for x in xs]),
                         *all_stats)
    return summarize(stats, cfg)


def _stats_from_infos(outs, cfg, max_steps):
    import numpy as np
    succ, timeo, navt, coll, wallc, froz, dang, mind, totr, steps = \
        [], [], [], [], [], [], [], [], [], []
    for sf, rews, infos in outs:
        done_idx = np.argmax(np.asarray(infos.done))
        any_done = bool(np.asarray(infos.done).any())
        n = done_idx + 1 if any_done else max_steps
        succ.append(bool(np.asarray(infos.reach_goal).any()))
        timeo.append(bool(np.asarray(infos.timeout).any()))
        navt.append(float(np.asarray(sf.t)) if any_done else cfg.time_limit)
        coll.append(int(np.asarray(infos.collision)[:n].sum()))
        wallc.append(int(np.asarray(infos.wall_collision)[:n].sum()))
        froz.append(int(np.asarray(infos.frozen)[:n].sum()))
        dang.append(int(np.asarray(infos.danger)[:n].sum()))
        mind.append(float(np.asarray(infos.dmin)[:n].min()))
        totr.append(float(np.asarray(rews)[:n].sum()))
        steps.append(n)
    from sicnav_tpu.env.rollout import EpisodeStats
    return EpisodeStats(
        success=np.array(succ), timeout=np.array(timeo),
        nav_time=np.array(navt), collision_steps=np.array(coll),
        wall_collision_steps=np.array(wallc), frozen_steps=np.array(froz),
        danger_steps=np.array(dang), min_dist=np.array(mind),
        total_reward=np.array(totr), steps=np.array(steps))


def summarize(stats, cfg: EnvConfig) -> Dict:
    steps = np.maximum(np.asarray(stats.steps, np.float64), 1.0)
    out = {
        "num_cases": int(len(np.atleast_1d(stats.success))),
        "success_rate": float(np.mean(stats.success)),
        "timeout_rate": float(np.mean(stats.timeout)),
        "collision_episode_rate": float(np.mean(stats.collision_steps > 0)),
        "wall_collision_episode_rate": float(np.mean(stats.wall_collision_steps > 0)),
        "frozen_episode_rate": float(np.mean(stats.frozen_steps > 0)),
        "mean_nav_time": float(np.mean(np.where(stats.success, stats.nav_time,
                                                cfg.time_limit))),
        "collision_step_freq": float(np.mean(stats.collision_steps / steps)),
        "danger_step_freq": float(np.mean(stats.danger_steps / steps)),
        "frozen_step_freq": float(np.mean(stats.frozen_steps / steps)),
        "mean_total_reward": float(np.mean(stats.total_reward)),
    }
    return out
