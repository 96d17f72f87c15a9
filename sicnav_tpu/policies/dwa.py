"""Dynamic Window Approach robot policy, fully vectorized.

Re-design of the reference's scalar double-loop DWA
(sicnav/policy/dwa.py + sicnav/utils/PythonRobotics/dynamic_window_approach.py:
``calc_dynamic_window``:106, ``calc_control_and_trajectory``:153,
``calc_obstacle_cost``:235) as a single fixed-shape evaluation: the whole
(v, w) window is a static grid, every candidate trajectory is rolled out
with ``lax.scan``, and the scoring/argmax is one reduction — so one robot
step is one XLA program, and batches of robots/envs vmap over it.

Deviation from the reference (documented): the reference steps the window
at a fixed resolution (variable sample count per call); here the window is
sampled with a *static* number of points (``n_v`` x ``n_w`` linspace), which
is the jit-compatible equivalent at comparable resolution.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from sicnav_tpu.env.types import EnvConfig, SimState
from sicnav_tpu.ops.geometry import norm2, point_to_segment_dist


@dataclasses.dataclass(frozen=True)
class DWAConfig:
    """Defaults = DynamicWindowApproach.configure_dwa (sicnav/policy/dwa.py:34-59)
    with sicnav/configs/policy.config [dwa]."""
    max_speed: float = 1.0          # robot v_pref
    min_speed: float = -1.0
    max_accel: float = 0.5
    max_delta_yaw_rate: float = 1.04
    max_d: float = 2.0
    dt: float = 0.25
    predict_time: float = 2.5
    to_goal_cost_gain: float = 0.5
    speed_cost_gain: float = 1.0
    obstacle_cost_gain: float = 2.0
    robot_stuck_flag_cons: float = 0.01
    robot_radius: float = 0.25
    max_yaw_rate: float = 40.0 * jnp.pi / 180.0
    n_v: int = 8                    # static window sample counts
    n_w: int = 64

    @property
    def horizon(self) -> int:
        return int(self.predict_time / self.dt) + 1


def _motion_step(state, v, w, dt):
    """Exact arc motion model (dynamic_window_approach.py:85-103)."""
    x, y, th = state[0], state[1], state[2]
    straight = jnp.abs(w) < 0.01
    th2 = th + w * dt
    x_s = x + v * jnp.cos(th2) * dt
    y_s = y + v * jnp.sin(th2) * dt
    safe_w = jnp.where(straight, 1.0, w)
    x_a = x + (v / safe_w) * (jnp.sin(th2) - jnp.sin(th))
    y_a = y + (v / safe_w) * (jnp.cos(th) - jnp.cos(th2))
    return jnp.stack([jnp.where(straight, x_s, x_a),
                      jnp.where(straight, y_s, y_a), th2])


def _eval_candidate(x0, v, w, goal, obs_pos, obs_rad, obs_mask,
                    walls, wall_mask, cfg: DWAConfig):
    """Roll out one (v, w) candidate; returns (head, dist, admissible)."""
    T = cfg.horizon

    def body(carry, _):
        state, active, dist = carry
        nxt = _motion_step(state, v, w, cfg.dt)
        # stop rolling once within half a radius of goal (predict_trajectory:142)
        reached = norm2(nxt[:2] - goal) <= cfg.robot_radius * 0.5
        state = jnp.where(active, nxt, state)

        # obstacle collision at this trajectory point -> distance from start
        d_agents = norm2(state[:2][None, :] - obs_pos)
        hit_a = obs_mask & (d_agents < cfg.robot_radius + obs_rad + 0.01)
        d0_agents = norm2(x0[:2][None, :] - obs_pos)
        da = jnp.min(jnp.where(hit_a & active, d0_agents, jnp.inf))

        d_walls = point_to_segment_dist(walls[:, 0], walls[:, 1],
                                        state[:2][None, :])
        hit_w = wall_mask & (d_walls < cfg.robot_radius + 0.02)
        d0_walls = point_to_segment_dist(walls[:, 0], walls[:, 1],
                                         x0[:2][None, :])
        dw = jnp.min(jnp.where(hit_w & active, d0_walls, jnp.inf))

        dist = jnp.minimum(dist, jnp.minimum(da, dw))
        active = active & ~reached
        return (state, active, dist), None

    # unroll: the horizon is short (~11) and the body is tiny elementwise
    # math — unrolling lets XLA fuse across trajectory steps instead of
    # emitting a serial while-loop per candidate
    (final, _, dist), _ = jax.lax.scan(
        body, (x0[:3], jnp.array(True), jnp.float32(cfg.max_d)), None,
        length=T, unroll=True)

    dist = jnp.minimum(dist, cfg.max_d)
    # admissibility: enough room to stop (calc_control_and_trajectory:183)
    inadmissible = (v > jnp.sqrt(2.0 * dist * cfg.max_accel)) | \
                   (w > jnp.sqrt(2.0 * dist * cfg.max_delta_yaw_rate))

    # heading score at trajectory end (calc_to_goal_cost:266-277)
    err = jnp.arctan2(goal[1] - final[1], goal[0] - final[0]) - final[2]
    cost_angle = jnp.abs(jnp.arctan2(jnp.sin(err), jnp.cos(err)))
    head = jnp.pi - cost_angle
    return head, dist, ~inadmissible


@functools.partial(jax.jit, static_argnames=("cfg",))
def dwa_action(x, goal, obs_pos, obs_rad, obs_mask, walls, wall_mask,
               cfg: DWAConfig):
    """DWA control: x = [px, py, theta, v, w]; returns (v, w) maximizing the
    normalized objective over the dynamic window."""
    v0, w0 = x[3], x[4]
    v_max = jnp.minimum(cfg.max_speed, v0 + cfg.max_accel * cfg.dt)
    v_min = jnp.maximum(cfg.min_speed, v0 - cfg.max_accel * cfg.dt)
    v_min = jnp.minimum(v_min, v_max - cfg.max_accel * cfg.dt)
    w_max = jnp.minimum(cfg.max_yaw_rate, w0 + cfg.max_delta_yaw_rate * cfg.dt)
    w_min = jnp.maximum(-cfg.max_yaw_rate, w0 - cfg.max_delta_yaw_rate * cfg.dt)
    w_min = jnp.minimum(w_min, w_max - cfg.max_delta_yaw_rate * cfg.dt)

    vs = jnp.linspace(v_min, v_max, cfg.n_v)
    ws = jnp.linspace(w_min, w_max, cfg.n_w)
    vv, ww = jnp.meshgrid(vs, ws, indexing="ij")
    vv, ww = vv.ravel(), ww.ravel()

    head, dist, admissible = jax.vmap(
        lambda v, w: _eval_candidate(x, v, w, goal, obs_pos, obs_rad, obs_mask,
                                     walls, wall_mask, cfg))(vv, ww)

    score = (cfg.to_goal_cost_gain * head / jnp.pi +
             cfg.obstacle_cost_gain * dist / cfg.max_d +
             cfg.speed_cost_gain * vv / cfg.max_speed)
    score = jnp.where(admissible, score, 0.0)
    best = jnp.argmax(score)
    ok = admissible[best]
    v_sel = jnp.where(ok, vv[best], 0.0)
    w_sel = jnp.where(ok, ww[best], 0.0)
    # anti-stuck spin (calc_control_and_trajectory:203-205)
    stuck = (jnp.abs(v_sel) < cfg.robot_stuck_flag_cons) & \
            (jnp.abs(v0) < cfg.robot_stuck_flag_cons) & ok
    w_sel = jnp.where(stuck, -cfg.max_delta_yaw_rate, w_sel)
    return jnp.stack([v_sel, w_sel])


def dwa_policy(state: SimState, env_cfg: EnvConfig, cfg: DWAConfig = None):
    """SimState -> unicycle action (v, r) with r = w * dt (dwa.py:103)."""
    if cfg is None:
        cfg = DWAConfig(max_speed=env_cfg.robot_v_pref,
                        min_speed=-env_cfg.robot_v_pref,
                        robot_radius=env_cfg.robot_radius, dt=env_cfg.dt)
    x = jnp.concatenate([state.r_pos, state.r_theta[None],
                         norm2(state.r_vel)[None], state.r_omega[None]])
    u = dwa_action(x, state.r_goal, state.h_pos, state.h_radius, state.h_mask,
                   state.walls, state.wall_mask, cfg)
    return jnp.stack([u[0], u[1] * env_cfg.dt])
