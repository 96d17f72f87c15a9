"""Evaluation harness: the seeded 500-case protocol.

Replaces RL_nav/RL_test.py:23-204 and simple_test.py: deterministic
case-indexed scenarios (case == RNG seed via reset_host), batched rollouts,
and the reference metric set (success / collision / wall-collision /
frozen / discomfort rates, mean nav time).
"""

from __future__ import annotations

import json
import os
import sys
from typing import Callable, Dict

import jax
import jax.numpy as jnp
import numpy as np

from sicnav_tpu.env import crowd_sim, rollout
from sicnav_tpu.env.types import EnvConfig


def _load_progress(path: str) -> Dict[int, "rollout.EpisodeStats"]:
    """Read a per-batch progress JSONL (written by evaluate_policy) into
    {start_case: EpisodeStats}. Corrupt/partial trailing lines (a worker
    killed mid-write) are skipped."""
    done = {}
    if not path or not os.path.exists(path):
        return done
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            try:
                rec = json.loads(line)
                stats = rollout.EpisodeStats(
                    **{k: np.asarray(v) for k, v in rec["stats"].items()})
            except (json.JSONDecodeError, KeyError, TypeError):
                continue
            done[int(rec["start"])] = stats
    return done


def _append_progress(path: str, start: int, stats) -> None:
    rec = {"start": start,
           "stats": {k: np.asarray(v).tolist()
                     for k, v in stats._asdict().items()}}
    with open(path, "a") as f:
        f.write(json.dumps(rec) + "\n")
        f.flush()
        os.fsync(f.fileno())


def evaluate_policy(policy_fn: Callable, cfg: EnvConfig, num_cases: int = 500,
                    phase: str = "test", batch: int = 50,
                    stateful_policy=None, mesh=None,
                    progress_file: str = None) -> Dict:
    """Run ``num_cases`` seeded episodes; returns the reference summary
    metrics (RL_test.py:86-100).

    policy_fn: SimState -> (2,) action (stateless policies), or pass
    ``stateful_policy=(init_carry_fn, step_fn)`` for carry-state policies
    (e.g. CAMPC). Both paths vmap the whole episode batch so per-step
    policy cost amortizes across cases. Pass ``mesh`` (jax.sharding.Mesh)
    to shard the case batch over it: XLA partitions the fleet of episodes
    (and their MPC solves) across chips over ICI (SURVEY.md §2.9).

    ``progress_file``: path to a JSONL checkpoint. Each completed batch is
    appended (fsync'd) and already-completed batches are skipped on rerun,
    so a 500-case suite on the tunneled chip survives worker kills — resume
    by re-running the same command instead of reconstructing from logs.
    """
    max_steps = int(cfg.time_limit / cfg.dt) + 2
    completed = _load_progress(progress_file)
    running = None

    for start in range(0, num_cases, batch):
        cases = list(range(start, min(start + batch, num_cases)))
        n_valid = len(cases)
        if start in completed:
            prev = completed[start]
            if len(np.atleast_1d(prev.success)) == n_valid:
                running = (prev if running is None else jax.tree.map(
                    lambda a, b: np.concatenate(
                        [np.atleast_1d(a), np.atleast_1d(b)]), running, prev))
                print(f"[harness] cases {start}-{start + n_valid - 1}: "
                      f"resumed from {progress_file}",
                      file=sys.stderr, flush=True)
                continue
        # pad the case batch up to a multiple of the mesh size so every
        # batch shards (50 % 8 != 0 previously made the mesh a silent
        # no-op on the standard 500-case suite); pad episodes replay the
        # last case and are sliced out of the stats below.
        if mesh is not None:
            pad = (-n_valid) % mesh.devices.size
            cases = cases + [cases[-1]] * pad
        states = [crowd_sim.reset_host(cfg, c, phase) for c in cases]
        batch_states = jax.tree.map(lambda *xs: jnp.stack(xs), *states)
        if mesh is not None:
            from sicnav_tpu.parallel.mesh import shard_batch
            batch_states = shard_batch(batch_states, mesh)
        if stateful_policy is None:
            _, stats, _ = rollout.batch_rollout(batch_states, policy_fn, cfg,
                                                max_steps)
        else:
            init_carry_fn, step_fn = stateful_policy
            carries = jax.tree.map(
                lambda *xs: jnp.stack(xs),
                *[init_carry_fn() for _ in cases])
            if mesh is not None:
                from sicnav_tpu.parallel.mesh import shard_batch
                carries = shard_batch(carries, mesh)
            _, stats = rollout.batch_rollout_stateful(
                batch_states, carries, step_fn, cfg, max_steps)
        batch_stats = jax.tree.map(
            lambda x: np.atleast_1d(np.asarray(x))[:n_valid], stats)
        if progress_file:
            _append_progress(progress_file, start, batch_stats)
        # running summary per batch, tracked incrementally and reused for
        # the final summarize (ADVICE r3): long suites on the tunneled chip
        # can lose the worker mid-run — a prefix of batches must remain
        # reconstructable from the log even without a progress_file
        running = (batch_stats if running is None else jax.tree.map(
            lambda a, b: np.concatenate([np.atleast_1d(a),
                                         np.atleast_1d(b)]),
            running, batch_stats))
        print(f"[harness] cases {start}-{start + n_valid - 1}: "
              f"success {float(np.mean(batch_stats.success)):.2f} "
              f"running {summarize(running, cfg)}",
              file=sys.stderr, flush=True)

    return summarize(running, cfg)


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
        # audit split: fraction of frozen steps occurring within 1 m of the
        # goal (terminal braking) vs mid-episode freezing
        "frozen_near_goal_fraction": float(
            np.sum(stats.frozen_near_goal_steps) /
            max(np.sum(stats.frozen_steps), 1)),
        "frozen_far_episode_rate": float(np.mean(
            (stats.frozen_steps - stats.frozen_near_goal_steps) > 0)),
        # door-yield audit: fraction of frozen steps spent under the
        # policy's yield latch (intentional pocket waiting, not a stall),
        # and overall latch occupancy — 0 for policies without the protocol
        "frozen_yield_fraction": float(
            np.sum(stats.frozen_yield_steps) /
            max(np.sum(stats.frozen_steps), 1)),
        "yield_step_freq": float(np.mean(stats.yield_steps / steps)),
        "mean_total_reward": float(np.mean(stats.total_reward)),
    }
    return out
