"""Robocentric transforms + FOV occlusion.

TPU-native port of crowd_sim_plus/envs/utils/robot_plus.py:73-332:
``get_robocentric_state`` (heading-aligned frame), ``get_robocentric_state_
x_goal_aligned`` (goal-aligned frame producing SB3-form arrays), and
``map_occlusion`` (closer humans hide farther ones).

Occlusion redesign: the reference clips each human's angular interval
[L, R] against a growing Python list of nearer intervals (with wraparound
"duplication" entries) and keeps the human if the clipped span is >= 75% of
the original. Here visibility is measured on a fixed angular grid — each
human's subtended arc is rasterized into bins, a distance-ordered scan marks
bins occluded by nearer humans, and a human stays visible while >= 75% of
its own bins are unoccluded. Fixed shapes, no data-dependent lists, same
0.75 threshold and nearest-first semantics; the tangent-line half-width of
the reference's construction is the exact half-angle arctan(r/d).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sicnav_tpu.env.types import SimState
from sicnav_tpu.ops.geometry import wrap_angle

VISIBLE_THRESHOLD = 0.75     # robot_plus.py:202


def _rot(theta, v):
    c, s = jnp.cos(theta), jnp.sin(theta)
    return jnp.stack([c * v[..., 0] + s * v[..., 1],
                      -s * v[..., 0] + c * v[..., 1]], axis=-1)


def robocentric_state(state: SimState) -> SimState:
    """World -> robot heading frame (get_robocentric_state:73-109): the
    robot sits at the origin with theta = 0; positions translate+rotate,
    velocities rotate, walls transform endpoint-wise."""
    t = state.r_pos
    th = state.r_theta
    tsf = lambda p: _rot(th, p - t)
    rot = lambda v: _rot(th, v)
    return state._replace(
        r_pos=jnp.zeros(2, state.r_pos.dtype),
        r_goal=tsf(state.r_goal),
        r_vel=rot(state.r_vel),
        r_theta=jnp.zeros((), state.r_theta.dtype),
        h_pos=tsf(state.h_pos),
        h_vel=rot(state.h_vel),
        h_goal=tsf(state.h_goal),
        h_theta=wrap_angle(state.h_theta - th),
        walls=tsf(state.walls))


def robocentric_goal_aligned(state: SimState):
    """World -> goal-aligned robot frame (get_robocentric_state_x_goal_
    aligned:111-166): +x points at the goal, robot at origin. Returns
    (robot (9,), humans (H, 5)) in the reference's SB3 array form
    [px, py, vx, vy, r, gx, gy, v_pref, theta] / [px, py, vx, vy, r]."""
    t = state.r_pos
    rot_amount = jnp.arctan2(state.r_goal[1] - t[1], state.r_goal[0] - t[0])
    tsf = lambda p: _rot(rot_amount, p - t)
    rot = lambda v: _rot(rot_amount, v)
    g = tsf(state.r_goal)
    v = rot(state.r_vel)
    robot = jnp.concatenate([
        jnp.zeros(2, t.dtype), v,
        state.r_radius[None], g,
        state.r_v_pref[None],
        wrap_angle(state.r_theta - rot_amount)[None]])
    humans = jnp.concatenate(
        [tsf(state.h_pos), rot(state.h_vel), state.h_radius[:, None]],
        axis=-1)
    return robot, humans


def occlusion_mask(h_pos_rc, h_radius, h_mask, n_bins: int = 720):
    """Visibility of each human from the (robocentric) origin
    (map_occlusion:166-253). h_pos_rc: (H, 2) robot-frame positions.
    Returns (H,) bool — True = visible (not occluded by a nearer human).
    Invalid (masked-out) humans neither occlude nor count as visible."""
    H = h_pos_rc.shape[0]
    d = jnp.linalg.norm(h_pos_rc, axis=-1)
    ang = jnp.arctan2(h_pos_rc[:, 1], h_pos_rc[:, 0])
    half = jnp.arctan2(h_radius, jnp.maximum(d, 1e-6))

    # rasterize each human's subtended arc into angular bins (wraparound-safe)
    centers = (jnp.arange(n_bins) + 0.5) / n_bins * 2 * jnp.pi - jnp.pi
    delta = wrap_angle(centers[None, :] - ang[:, None])      # (H, n_bins)
    occupied = (jnp.abs(delta) <= half[:, None]) & h_mask[:, None]

    order = jnp.argsort(jnp.where(h_mask, d, jnp.inf))

    def body(occluded_bins, i):
        occ_i = occupied[i]
        own = jnp.maximum(jnp.sum(occ_i), 1)
        free = jnp.sum(occ_i & ~occluded_bins)
        # a human so distant its arc rasterizes to zero bins is visible
        # (the reference's interval clipping never hides an empty interval)
        visible = (jnp.sum(occ_i) == 0) | ((free / own) >= VISIBLE_THRESHOLD)
        return occluded_bins | occ_i, visible

    _, vis_sorted = jax.lax.scan(body, jnp.zeros(n_bins, bool), order)
    visible = jnp.zeros(H, bool).at[order].set(vis_sorted)
    return visible & h_mask


def observable_humans(state: SimState, n_bins: int = 720):
    """Convenience: occlusion mask computed in the robot's frame on the raw
    world state (the reference applies map_occlusion after the robocentric
    transform; the mask is frame-invariant up to the origin shift)."""
    rel = state.h_pos - state.r_pos[None]
    return occlusion_mask(rel, state.h_radius, state.h_mask, n_bins)
