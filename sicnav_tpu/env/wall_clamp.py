"""Exact static-obstacle action clamping.

Branchless JAX port of the reference's corner/infinite-line case analysis
(``CrowdSimPlus.constrain_agent_action_exact``, crowd_sim_plus.py:869-989):
an agent's action is shortened so the swept disk cannot penetrate any wall
segment. Candidates are computed for every wall in parallel and reduced by
minimum resulting speed — which reproduces the reference's sequential
"keep the slower candidate" loop exactly, since each candidate depends only
on the original action.
"""

from __future__ import annotations

import jax.numpy as jnp

from sicnav_tpu.ops.geometry import (
    closest_point_on_line, dot2, line_intersection, norm2, seg_seg_closest,
)

_EPS_TOUCH = 1e-4
_EPS_DIR = 1e-8


def _final_position_vs_wall(cur, fut, radius, w0, w1):
    """Candidate constrained final position of one agent against one wall.

    Returns (final_pos (2,), collides ()). Mirrors the two reference cases:
    collision against a segment end-point (law-of-sines triangle solve) and
    collision against the segment interior (treated as an infinite line).
    """
    movement = fut - cur
    movement_mag = norm2(movement)

    pA, pB, closest_distance = seg_seg_closest(w0, w1, cur, fut)
    collides = closest_distance - radius < 0.0

    # ---- case split: end-point vs interior --------------------------------
    at_endpoint = (jnp.minimum(norm2(pA - w0), norm2(pA - w1)) < _EPS_DIR) & \
                  (norm2(pA - pB) > _EPS_DIR)

    # ---- end-point (corner) case -----------------------------------------
    direction_vec = pB - cur
    dir_mag = norm2(direction_vec)
    safe_dir_mag = jnp.maximum(dir_mag, _EPS_DIR)
    unit_dir = direction_vec / safe_dir_mag

    touching = (norm2(pA - cur) - radius < _EPS_TOUCH) & \
               (dot2(movement, pA - cur) > -_EPS_DIR)

    cd = jnp.maximum(closest_distance, _EPS_DIR)
    arccos_val = -dot2(direction_vec, pA - pB) / (safe_dir_mag * cd)
    head_on = arccos_val <= -1.0          # alpha == pi after clipping
    alpha = jnp.arccos(jnp.clip(arccos_val, -1.0, 1.0))
    sin_alpha = jnp.maximum(jnp.sin(alpha), _EPS_DIR)
    gamma = jnp.arcsin(jnp.clip(cd * jnp.sin(alpha) / jnp.maximum(radius, _EPS_DIR),
                                -1.0, 1.0))
    beta = jnp.pi - alpha - gamma
    redux_triangle = radius * jnp.sin(beta) / sin_alpha + 1e-7
    redux_head_on = radius - closest_distance

    redux = jnp.where(touching, dir_mag,
                      jnp.where(head_on, redux_head_on, redux_triangle))
    redux = jnp.where(dir_mag > 0.0, redux, 0.0)
    final_corner = cur + unit_dir * jnp.maximum(dir_mag - redux, 0.0)

    # ---- interior (infinite line) case -----------------------------------
    cl = closest_point_on_line(w0, w1, cur)
    touching_line = (norm2(cl - cur) - radius < _EPS_TOUCH) & \
                    (dot2(movement, cl - cur) > -_EPS_DIR)
    inter = line_intersection(cur, movement, w0, w1)
    d_vec = inter - cur
    dc0 = jnp.maximum(norm2(cur - cl), _EPS_DIR)
    scaling = jnp.maximum(0.0, (dc0 - (radius + 1e-7)) / dc0)
    final_line = jnp.where(movement_mag > 0.0,
                           jnp.where(touching_line, cur, cur + d_vec * scaling),
                           cur)

    final = jnp.where(at_endpoint, final_corner, final_line)
    return final, collides


def clamp_action_positions(cur, fut, radius, walls, wall_mask):
    """Clamp the motion ``cur -> fut`` of an agent of ``radius`` against all
    walls. Returns the constrained final position (the candidate with the
    smallest displacement, reference crowd_sim_plus.py:970-987).

    Shapes: cur/fut (2,), walls (W,2,2), wall_mask (W,).
    """
    radius = jnp.asarray(radius)
    finals, collides = jnp.vectorize(
        _final_position_vs_wall, signature="(2),(2),(),(2),(2)->(2),()")(
        cur[None, :], fut[None, :], radius[None], walls[:, 0], walls[:, 1])
    active = collides & wall_mask
    disp = norm2(finals - cur[None, :])
    disp = jnp.where(active, disp, jnp.inf)
    best = jnp.argmin(disp)
    any_active = jnp.any(active)
    return jnp.where(any_active, finals[best], fut), any_active


def clamp_holonomic_action(pos, vel_action, radius, dt, walls, wall_mask):
    """ActionXY clamping: returns (vx, vy) of the constrained action."""
    fut = pos + vel_action * dt
    final, clamped = clamp_action_positions(pos, fut, radius, walls, wall_mask)
    new_vel = (final - pos) / dt
    # keep whichever action is slower (reference :974-975)
    keep_new = dot2(new_vel, new_vel) < dot2(vel_action, vel_action)
    out = jnp.where(clamped & keep_new, new_vel, vel_action)
    # reference detects a wall collision by comparing vx only (:1060)
    changed = out[0] != vel_action[0]
    return out, changed


def clamp_unicycle_action(pos, theta, v, r, radius, dt, walls, wall_mask):
    """ActionRot clamping: returns (v', r) with the same rotation but the
    speed shortened (sign-aware, reference :977-987)."""
    heading = theta + r
    fut = pos + v * dt * jnp.stack([jnp.cos(heading), jnp.sin(heading)])
    final, clamped = clamp_action_positions(pos, fut, radius, walls, wall_mask)
    mag = norm2(final - pos) / dt
    v_new = jnp.where(v > 0.0, mag, -mag)
    keep_new = jnp.where(v > 0.0, v_new < v, v_new > v)
    v_out = jnp.where(clamped & keep_new, v_new, v)
    return v_out, v_out != v
