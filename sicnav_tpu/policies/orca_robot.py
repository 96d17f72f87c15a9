"""ORCA(-plus) as a robot policy (baseline + imitation-learning teacher).

The reference drives the same Python-RVO2 code path for the robot as for
humans (crowd_sim_plus/envs/policy/orca_plus.py via robot.set_policy);
here it is the same batched JAX kernel acting on the robot slot.
"""

from __future__ import annotations

import jax.numpy as jnp

from sicnav_tpu.env.types import EnvConfig, SimState
from sicnav_tpu.ops import orca as orca_ops
from sicnav_tpu.ops.geometry import norm2


def orca_robot_action(state: SimState, cfg: EnvConfig, plus: bool = True,
                      safety_space: float = 0.01) -> jnp.ndarray:
    """Holonomic (vx, vy) action for the robot via ORCA(-plus)."""
    params = orca_ops.OrcaParams(
        neighbor_dist=cfg.orca_neighbor_dist,
        time_horizon=cfg.orca_time_horizon,
        time_horizon_obst=cfg.orca_time_horizon_obst,
        dt=cfg.dt)
    inflation = 0.01 + safety_space

    if plus:
        ep1, ep2, emask = orca_ops.walls_to_edges(state.walls, state.wall_mask)
    else:
        ep1, ep2, emask = orca_ops.walls_to_edges(
            state.walls, jnp.zeros_like(state.wall_mask))

    goal_vec = state.r_goal - state.r_pos
    speed = norm2(goal_vec)
    if plus:
        cap = state.r_v_pref - 1e-3
        pref_vel = jnp.where(speed > cap,
                             goal_vec / jnp.maximum(speed, 1e-9) * cap, goal_vec)
    else:
        pref_vel = jnp.where(speed > 1.0,
                             goal_vec / jnp.maximum(speed, 1e-9), goal_vec)

    return orca_ops.orca_velocity(
        state.r_pos, state.r_vel, state.r_radius + inflation, pref_vel,
        state.r_v_pref,
        state.h_pos, state.h_vel, state.h_radius + inflation, state.h_mask,
        ep1, ep2, emask, params, max_neighbors=cfg.orca_max_neighbors)
