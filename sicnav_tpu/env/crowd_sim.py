"""CrowdSimPlus-equivalent functional environment.

The reference's ``CrowdSimPlus.step`` (crowd_sim_plus.py:1025-1257) — human
policy evaluation, exact wall clamping, collision / reward / termination
semantics and state integration — as one pure, jittable, vmappable function
over the ``SimState`` pytree. ``reset_host`` reproduces the reference's
seeded deterministic scenario protocol; ``reset_device`` generates scenarios
on-device for vectorized training.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sicnav_tpu.env import scenarios, walls as walls_mod
from sicnav_tpu.env.human_policies import human_actions
from sicnav_tpu.env.types import DoorParams, EnvConfig, SimState, StepInfo
from sicnav_tpu.env.wall_clamp import clamp_holonomic_action, clamp_unicycle_action
from sicnav_tpu.ops.geometry import norm2, wrap_angle


# ---------------------------------------------------------------------------
# hallway-door intermediate goals (human_plus.get_g_xy)
# ---------------------------------------------------------------------------

def intermediate_goals(pos, final_goal, door: DoorParams):
    """Vectorized ``Human.get_g_xy`` (human_plus.py:18-52): when the path to
    the final goal crosses the hallway door band, aim for the door middle
    until within door_width/2 of it."""
    ys_min = jnp.minimum(pos[..., 1], final_goal[..., 1])
    ys_max = jnp.maximum(pos[..., 1], final_goal[..., 1])
    crosses = (ys_min < door.y_mid_min) & (ys_max > door.y_mid_max)
    int_goal = jnp.stack(
        [jnp.broadcast_to(door.x_mid, pos[..., 0].shape),
         jnp.broadcast_to(0.5 * (door.y_min + door.y_max), pos[..., 0].shape)],
        axis=-1)
    near_door = norm2(int_goal - pos) <= door.width / 2.0
    use_int = door.has_door & crosses & ~near_door
    return jnp.where(use_int[..., None], int_goal, final_goal)


# ---------------------------------------------------------------------------
# step
# ---------------------------------------------------------------------------

def _robot_next(state: SimState, action, cfg: EnvConfig):
    """Robot next position under the (already clamped) action."""
    if cfg.robot_kinematics == "holonomic":
        return state.r_pos + action * cfg.dt
    heading = state.r_theta + action[1]
    return state.r_pos + action[0] * cfg.dt * jnp.stack(
        [jnp.cos(heading), jnp.sin(heading)])


def _term(enabled, detailed):
    return (enabled is not None) or detailed


@functools.partial(jax.jit, static_argnames=("cfg",))
def step(state: SimState, action: jnp.ndarray, cfg: EnvConfig
         ) -> Tuple[SimState, jnp.ndarray, StepInfo]:
    """One environment step. ``action`` is (2,): (vx, vy) for a holonomic
    robot or (v, r) for a unicycle robot. Returns (next_state, reward, info).

    Parity: CrowdSimPlus.step with update=True (crowd_sim_plus.py:1025-1257).
    """
    h_act = human_actions(state, cfg)                      # (H, 2)
    return step_with_human_actions(state, action, h_act, cfg)


def step_with_human_actions(state: SimState, action: jnp.ndarray,
                            h_act: jnp.ndarray, cfg: EnvConfig
                            ) -> Tuple[SimState, jnp.ndarray, StepInfo]:
    """Step with precomputed (unclamped) human actions — lets the RL
    lookahead evaluate all discrete robot actions against ONE human-policy
    evaluation (the humans don't react to the robot within a step;
    crowd_sim_plus.py step(update=False) recomputes them identically)."""
    rc = cfg.rewards
    dt = cfg.dt
    H = cfg.max_humans

    # --- 2. clamp every human action against the walls --------------------
    def clamp_h(pos, act, rad):
        out, _ = clamp_holonomic_action(pos, act, rad, dt, state.walls,
                                        state.wall_mask)
        return out
    h_act = jax.vmap(clamp_h)(state.h_pos, h_act, state.h_radius)

    # --- 3. clamp robot action; wall-collision flag -----------------------
    if cfg.robot_kinematics == "holonomic":
        r_act, stat_collision = clamp_holonomic_action(
            state.r_pos, action, state.r_radius, dt, state.walls,
            state.wall_mask)
    else:
        v_c, stat_collision = clamp_unicycle_action(
            state.r_pos, state.r_theta, action[0], action[1], state.r_radius,
            dt, state.walls, state.wall_mask)
        r_act = jnp.stack([v_c, action[1]])

    # --- 4. robot-human collision + dmin (sequential-break parity) --------
    r_next = _robot_next(state, r_act, cfg)
    h_next = state.h_pos + h_act * dt
    dists = norm2(r_next[None, :] - h_next)                # (H,)
    r_sum = state.r_radius + state.h_radius
    colliding = state.h_mask & (dists < r_sum)
    collision = jnp.any(colliding)
    first_coll = jnp.argmax(colliding)                     # first colliding slot
    before_first = jnp.arange(H) < jnp.where(collision, first_coll, H)
    dmin = jnp.min(jnp.where(state.h_mask & before_first, dists, jnp.inf))

    # --- 5. events --------------------------------------------------------
    if cfg.robot_kinematics == "holonomic":
        speed = norm2(r_act)
        frozen = speed * dt < 0.01
        curr_ang = jnp.arctan2(r_act[1], r_act[0])
        curr_lin = speed
    else:
        frozen = jnp.abs(r_act[0] * dt) < 0.01
        curr_ang = r_act[1]
        curr_lin = r_act[0]

    reached_goal = norm2(r_next - state.r_goal) < state.r_radius
    curr_dist_to_goal = norm2(state.r_goal - r_next)

    # --- 6. rewards -------------------------------------------------------
    det = cfg.detailed_reward
    reward = jnp.float32(0.0)
    zero = jnp.float32(0.0)

    r_success = jnp.where(reached_goal, rc.success_reward or 0.0, 0.0) \
        if _term(rc.success_reward, det) else zero
    done = reached_goal if rc.success_reward is not None or det else jnp.array(False)

    timed_out = (~done) & (state.t >= cfg.time_limit)
    r_timeout = jnp.where(timed_out, rc.timeout or 0.0, 0.0) \
        if _term(rc.timeout, det) else zero
    done = done | (~done & (state.t >= cfg.time_limit))

    if rc.success_reward is not None:
        reward = reward + r_success
    if rc.timeout is not None:
        reward = reward + jnp.where(timed_out, rc.timeout, 0.0)

    r_collision = jnp.where(collision, rc.collision_penalty or 0.0, 0.0) \
        if _term(rc.collision_penalty, det) else zero
    if rc.collision_penalty is not None:
        reward = reward + r_collision

    r_wall = jnp.where(stat_collision, rc.wall_collision_penalty or 0.0, 0.0) \
        if _term(rc.wall_collision_penalty, det) else zero
    if rc.wall_collision_penalty is not None:
        reward = reward + r_wall

    danger = dmin < rc.discomfort_dist
    r_danger = jnp.where(danger,
                         (dmin - rc.discomfort_dist) *
                         (rc.discomfort_penalty_factor or 0.0) * dt, 0.0) \
        if (rc.discomfort or det) else zero
    if rc.discomfort:
        reward = reward + r_danger

    r_progress = ((state.prev_dist_to_goal - curr_dist_to_goal) *
                  (rc.progress_factor or 0.0)) \
        if _term(rc.progress_factor, det) else zero
    if rc.progress_factor is not None:
        reward = reward + r_progress

    r_freezing = jnp.where(frozen, rc.freezing_penalty or 0.0, 0.0) \
        if _term(rc.freezing_penalty, det) else zero
    if rc.freezing_penalty is not None:
        reward = reward + r_freezing

    # angular smoothness: |diff| * factor; unicycle "diff" is r*dt (:1150)
    if cfg.robot_kinematics == "holonomic":
        ang_diff = jnp.abs(curr_ang - state.prev_ang)
    else:
        ang_diff = curr_ang * dt
    r_angular = jnp.where(state.has_prev_ang,
                          jnp.abs(ang_diff) * (rc.angular_smoothness_factor or 0.0),
                          0.0) if _term(rc.angular_smoothness_factor, det) else zero
    if rc.angular_smoothness_factor is not None:
        reward = reward + r_angular

    r_linear = jnp.where(state.has_prev_lin,
                         jnp.abs(state.prev_lin - curr_lin) *
                         (rc.linear_smoothness_factor or 0.0), 0.0) \
        if _term(rc.linear_smoothness_factor, det) else zero
    if rc.linear_smoothness_factor is not None:
        reward = reward + r_linear

    info = StepInfo(
        reach_goal=reached_goal, timeout=timed_out, collision=collision,
        wall_collision=stat_collision, frozen=frozen, danger=danger, dmin=dmin,
        r_success=r_success, r_timeout=r_timeout, r_collision=r_collision,
        r_wall=r_wall, r_danger=r_danger, r_progress=r_progress,
        r_freezing=r_freezing, r_angular=r_angular, r_linear=r_linear,
        total_reward=reward, done=done)

    # --- 7. integrate -----------------------------------------------------
    if cfg.robot_kinematics == "holonomic":
        new_theta = jnp.arctan2(r_act[1], r_act[0])
        new_vel = r_act
        new_omega = jnp.float32(0.0)
    else:
        new_theta = wrap_angle(state.r_theta + r_act[1])
        new_vel = r_act[0] * jnp.stack([jnp.cos(new_theta), jnp.sin(new_theta)])
        new_omega = r_act[1] / dt

    h_theta = jnp.arctan2(h_act[:, 1], h_act[:, 0])
    new_h_goal = intermediate_goals(h_next, state.h_final_goal, state.door)

    # human arrival times (first arrival only; crowd_sim_plus.py:1203-1206)
    h_arrived = norm2(h_next - new_h_goal) < state.h_radius
    new_human_times = jnp.where(
        (state.human_times == 0.0) & h_arrived & state.h_mask,
        state.t + dt, state.human_times)

    new_state = state._replace(
        r_pos=r_next, r_vel=new_vel, r_theta=new_theta, r_omega=new_omega,
        h_pos=h_next, h_vel=h_act, h_theta=h_theta, h_goal=new_h_goal,
        t=state.t + dt, step_idx=state.step_idx + 1,
        prev_dist_to_goal=jnp.where(
            jnp.array(rc.progress_factor is not None or det),
            curr_dist_to_goal, state.prev_dist_to_goal),
        prev_ang=curr_ang, has_prev_ang=jnp.array(True),
        prev_lin=curr_lin, has_prev_lin=jnp.array(True),
        human_times=new_human_times,
        done=state.done | done)

    return new_state, reward, info


def step_masked(state: SimState, action, cfg: EnvConfig):
    """Step that freezes terminated environments (for batched scans)."""
    new_state, reward, info = step(state, action, cfg)
    keep = state.done
    sel = lambda old, new: jnp.where(keep, old, new)
    frozen_state = jax.tree.map(sel, state, new_state)
    reward = jnp.where(keep, 0.0, reward)
    info = jax.tree.map(lambda x: jnp.where(keep, jnp.zeros_like(x), x), info)
    return frozen_state, reward, info


# ---------------------------------------------------------------------------
# reset
# ---------------------------------------------------------------------------

def _base_state(cfg: EnvConfig, walls, wall_mask, door, h_arrays) -> SimState:
    h_pos, h_goal, h_theta, h_radius, h_v_pref, h_mask = h_arrays
    door_j = DoorParams(*[jnp.asarray(x) for x in door])
    h_goal_init = intermediate_goals(jnp.asarray(h_pos),
                                     jnp.asarray(h_goal), door_j)
    robot_pos = jnp.array([0.0, -cfg.circle_radius], jnp.float32)
    robot_goal = jnp.array([0.0, cfg.circle_radius], jnp.float32)
    return SimState(
        r_pos=robot_pos, r_vel=jnp.zeros(2, jnp.float32),
        r_theta=jnp.float32(np.pi / 2), r_omega=jnp.float32(0.0),
        r_goal=robot_goal, r_radius=jnp.float32(cfg.robot_radius),
        r_v_pref=jnp.float32(cfg.robot_v_pref),
        h_pos=jnp.asarray(h_pos), h_vel=jnp.zeros((cfg.max_humans, 2), jnp.float32),
        h_theta=jnp.asarray(h_theta), h_goal=h_goal_init,
        h_final_goal=jnp.asarray(h_goal), h_radius=jnp.asarray(h_radius),
        h_v_pref=jnp.asarray(h_v_pref), h_mask=jnp.asarray(h_mask),
        walls=jnp.asarray(walls), wall_mask=jnp.asarray(wall_mask),
        door=door_j,
        t=jnp.float32(0.0), step_idx=jnp.int32(0),
        prev_dist_to_goal=jnp.float32(2.0 * cfg.circle_radius),
        prev_ang=jnp.float32(0.0), has_prev_ang=jnp.array(False),
        prev_lin=jnp.float32(0.0), has_prev_lin=jnp.array(False),
        human_times=jnp.zeros((cfg.max_humans,), jnp.float32),
        done=jnp.array(False))


def _dummy_prestep(state: SimState, cfg: EnvConfig) -> SimState:
    """``starts_moving`` pre-roll: step humans with a zero robot action
    (crowd_sim_plus.py:708-726), then reset the reward trackers."""
    n = cfg.starts_moving
    if n <= 0:
        return state
    state = state._replace(t=jnp.float32(-n * cfg.dt),
                           step_idx=jnp.int32(-n))
    zero_action = jnp.zeros(2, jnp.float32)

    def body(s, _):
        s2, _, _ = step(s, zero_action, cfg)
        return s2, None

    state, _ = jax.lax.scan(body, state, None, length=n)
    # reset smoothness/progress trackers (reference :725-726, :734-736)
    return state._replace(
        has_prev_ang=jnp.array(False), has_prev_lin=jnp.array(False),
        prev_dist_to_goal=norm2(state.r_goal - state.r_pos),
        done=jnp.array(False))


def reset_host(cfg: EnvConfig, case: int, phase: str = "test") -> SimState:
    """Deterministic seeded reset matching the reference evaluation protocol
    (case index == RNG seed, crowd_sim_plus.py:654-673)."""
    walls, wall_mask, door = walls_mod.build_walls(cfg)
    h_arrays = scenarios.generate_host(cfg, case, phase, walls, wall_mask)
    state = _base_state(cfg, walls, wall_mask, door, h_arrays)
    return _dummy_prestep(state, cfg)


@functools.partial(jax.jit, static_argnames=("cfg",))
def reset_device(key, cfg: EnvConfig) -> SimState:
    """On-device reset (vmappable over keys)."""
    walls, wall_mask, door = walls_mod.build_walls(cfg)
    walls = jnp.asarray(walls)
    wall_mask = jnp.asarray(wall_mask)
    h_arrays = scenarios.generate_device(key, cfg, walls, wall_mask)
    state = _base_state(cfg, walls, wall_mask, door, h_arrays)
    return _dummy_prestep(state, cfg)


# ---------------------------------------------------------------------------
# observation helpers
# ---------------------------------------------------------------------------

def observable_human_states(state: SimState):
    """(H, 5) [px, py, vx, vy, radius] + mask — the reference's
    ObservableState list observation."""
    return jnp.concatenate(
        [state.h_pos, state.h_vel, state.h_radius[:, None]], axis=-1), state.h_mask


def full_human_states(state: SimState):
    """(H, 9) [px, py, vx, vy, radius, gx, gy, v_pref, theta] + mask."""
    return jnp.concatenate(
        [state.h_pos, state.h_vel, state.h_radius[:, None], state.h_goal,
         state.h_v_pref[:, None], state.h_theta[:, None]], axis=-1), state.h_mask


def robot_full_state(state: SimState):
    """(9,) [px, py, vx, vy, radius, gx, gy, v_pref, theta]."""
    return jnp.concatenate(
        [state.r_pos, state.r_vel, state.r_radius[None], state.r_goal,
         state.r_v_pref[None], state.r_theta[None]])
