"""In-graph human policies: ORCA / ORCA-plus / Social Forces / Linear.

Each function maps the full sim state to a (H, 2) array of holonomic
velocity actions for every human slot at once — the TPU-native equivalent
of the reference's per-human ``human.act(ob, static_obs)`` loop
(crowd_sim_plus.py:1044-1055) driving Python-RVO2 / scalar numpy.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sicnav_tpu.env.types import EnvConfig, SimState
from sicnav_tpu.ops import orca as orca_ops
from sicnav_tpu.ops.geometry import closest_point_on_segment, norm2


def _orca_actions(state: SimState, cfg: EnvConfig, plus: bool) -> jnp.ndarray:
    """Batched ORCA(-plus) for all humans (reference orca.py:82-133 /
    orca_plus.py:29-90). Each human is RVO2 "agent 0" of its own one-step
    sim; neighbors = other humans + robot (if visible)."""
    H = cfg.max_humans
    params = orca_ops.OrcaParams(
        neighbor_dist=cfg.orca_neighbor_dist,
        time_horizon=cfg.orca_time_horizon,
        time_horizon_obst=cfg.orca_time_horizon_obst,
        dt=cfg.dt)
    inflation = 0.01 + cfg.safety_space

    # neighbor slot layout per acting human i: all humans (self masked) + robot
    npos_all = jnp.concatenate([state.h_pos, state.r_pos[None, :]], axis=0)
    nvel_all = jnp.concatenate([state.h_vel, state.r_vel[None, :]], axis=0)
    nrad_all = jnp.concatenate([state.h_radius, state.r_radius[None]], axis=0) + inflation
    base_mask = jnp.concatenate(
        [state.h_mask,
         jnp.array([cfg.robot_visible], dtype=bool)], axis=0)

    if plus:
        ep1, ep2, emask = orca_ops.walls_to_edges(state.walls, state.wall_mask)
    else:
        # plain ORCA ignores static obstacles
        ep1, ep2, emask = orca_ops.walls_to_edges(
            state.walls, jnp.zeros_like(state.wall_mask))

    def act_one(i):
        pos = state.h_pos[i]
        vel = state.h_vel[i]
        rad = state.h_radius[i] + inflation
        v_pref = state.h_v_pref[i]
        goal_vec = state.h_goal[i] - pos
        speed = norm2(goal_vec)
        if plus:
            # cap at v_pref - eps (orca_plus.py:73-75)
            eps = 1e-3
            cap = v_pref - eps
            pref_vel = jnp.where(speed > cap,
                                 goal_vec / jnp.maximum(speed, 1e-9) * cap,
                                 goal_vec)
        else:
            # unit cap (orca.py:113-116)
            pref_vel = jnp.where(speed > 1.0,
                                 goal_vec / jnp.maximum(speed, 1e-9), goal_vec)
        nmask = base_mask.at[i].set(False)
        return orca_ops.orca_velocity(
            pos, vel, rad, pref_vel, v_pref,
            npos_all, nvel_all, nrad_all, nmask,
            ep1, ep2, emask, params,
            max_neighbors=cfg.orca_max_neighbors)

    return jax.vmap(act_one)(jnp.arange(H))


def _sfm_actions(state: SimState, cfg: EnvConfig) -> jnp.ndarray:
    """Batched Social Forces Model (reference social_force.py:38-95)."""
    H = cfg.max_humans
    dt = cfg.dt

    pos = state.h_pos
    vel = state.h_vel
    rad = state.h_radius
    v_pref = state.h_v_pref

    # goal pull
    goal_vec = state.h_goal - pos
    dist_goal = norm2(goal_vec)
    dist_goal = jnp.where(dist_goal < 1e-6, 1.0, dist_goal)
    desired_v = goal_vec / dist_goal[:, None] * v_pref[:, None]
    pull = cfg.sfm_KI * (desired_v - vel)

    # push from other agents (humans + robot)
    opos = jnp.concatenate([pos, state.r_pos[None, :]], axis=0)     # (H+1, 2)
    orad = jnp.concatenate([rad, state.r_radius[None]], axis=0)
    omask = jnp.concatenate(
        [state.h_mask, jnp.array([cfg.robot_visible], dtype=bool)], axis=0)
    self_mask = jnp.concatenate(
        [jnp.eye(H, dtype=bool), jnp.zeros((H, 1), bool)], axis=1)  # (H, H+1)
    pair_mask = omask[None, :] & ~self_mask

    delta = pos[:, None, :] - opos[None, :, :]                       # (H, H+1, 2)
    d = jnp.maximum(norm2(delta), 1e-9)
    # the policy's configured radius is used for the asymmetric adjustment
    adjustment = jnp.abs(cfg.human_radius - orad)[None, :] + 0.01
    mag = cfg.sfm_A * jnp.exp((rad[:, None] + orad[None, :] + adjustment - d)
                              / cfg.sfm_B)
    push_agents = jnp.sum(jnp.where(pair_mask[..., None],
                                    mag[..., None] * delta / d[..., None], 0.0),
                          axis=1)

    # push from walls (closest point per wall; bottleneck walls idx>=2 use
    # the bottleneck gains when the scenario is hallway_bottleneck)
    W = state.walls.shape[0]
    cp = jax.vmap(lambda w: closest_point_on_segment(w[0], w[1], pos))(
        state.walls)                                                  # (W, H, 2)
    delta_w = pos[None, :, :] - cp                                    # (W, H, 2)
    d_w = jnp.maximum(norm2(delta_w), 1e-9)
    is_bneck = jnp.arange(W)[:, None] >= 2 if cfg.scenario == "hallway_bottleneck" \
        else jnp.zeros((W, 1), bool)
    A_w = jnp.where(is_bneck, cfg.sfm_A_bottleneck, cfg.sfm_A_static)
    B_w = jnp.where(is_bneck, cfg.sfm_B_bottleneck, cfg.sfm_B_static)
    mag_w = A_w * jnp.exp((rad[None, :] + 0.01 - d_w) / B_w)
    push_walls = jnp.sum(jnp.where(state.wall_mask[:, None, None],
                                   mag_w[..., None] * delta_w / d_w[..., None],
                                   0.0), axis=0)

    new_v = vel + (pull + push_agents + push_walls) * dt
    speed = norm2(new_v)
    over = speed > v_pref
    new_v = jnp.where(over[:, None],
                      new_v / jnp.maximum(speed, 1e-9)[:, None] * v_pref[:, None],
                      new_v)
    return new_v


def _linear_actions(state: SimState, cfg: EnvConfig) -> jnp.ndarray:
    """Straight to goal at v_pref (reference linear.py:16-23)."""
    goal_vec = state.h_goal - state.h_pos
    theta = jnp.arctan2(goal_vec[:, 1], goal_vec[:, 0])
    return state.h_v_pref[:, None] * jnp.stack(
        [jnp.cos(theta), jnp.sin(theta)], axis=-1)


def human_actions(state: SimState, cfg: EnvConfig) -> jnp.ndarray:
    """Dispatch on the configured human policy; returns (H, 2) ActionXY."""
    if cfg.human_policy == "orca":
        return _orca_actions(state, cfg, plus=False)
    if cfg.human_policy == "orca_plus":
        return _orca_actions(state, cfg, plus=True)
    if cfg.human_policy == "sfm":
        return _sfm_actions(state, cfg)
    if cfg.human_policy == "linear":
        return _linear_actions(state, cfg)
    raise ValueError(cfg.human_policy)
