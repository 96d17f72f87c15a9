"""Differentiable ORCA half-plane constructors for the MPC's internal
human model.

The reference builds these as CasADi symbolic graphs
(sicnav/utils/mpc_utils/orca_casadi.py:200-531): pairwise VO lines with a
smoothed already-in-collision case, per-wall static VO lines, preferred
velocities, and the "checked" invalidation that pushes geometrically
irrelevant constraints onto a harmless dummy line so the constraint count
stays fixed. Here each is a pure-JAX ``jnp.where`` chain — differentiable
(a.e.) through ``jax.grad`` for the KKT embedding, batched with ``vmap``.

Half-plane convention: constraint on human A's velocity v is
``line_norm . v >= line_scalar``  <=>  ``-line_norm . v + line_scalar <= 0``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from sicnav_tpu.ops.geometry import det2, dot2
from sicnav_tpu.ops.orca import edge_orca_line

# invalidation bound (orca_casadi.py:305-311): if the ORCA line lies outside
# the |v| <= V_MAX_CHECK disk it cannot be active; replace with a dummy line.
V_MAX_CHECK = 2.0
DUMMY_SCALE = -1.15 * V_MAX_CHECK


class OrcaModelParams(NamedTuple):
    """MPC-internal ORCA parameters (policy.config [humans] section)."""
    time_horizon: float = 2.5        # time_coll_hor
    time_horizon_obst: float = 1.5   # time_coll_hor_obst
    dt: float = 0.25
    radius_buffer: float = 0.01      # added to radii (+ safety_space)
    safety_space: float = 0.01


def pairwise_line(pos_a, vel_a, pos_b, vel_b, rad_a, rad_b, params: OrcaModelParams):
    """ORCA_{A|B} half-plane (norm, scalar) for agent A vs agent B.

    Mirrors orca_casadi.init_get_ORCA_pairwise_casadi_fns:200-314 — the
    no-collision branch is the standard VO projection; the in-collision
    branch is the reference's smoothed 'protrusion' cutoff line (NOT the
    exact RVO2 push-apart), kept for solver conditioning.
    """
    rel_pos = pos_b - pos_a
    rel_vel = vel_a - vel_b
    dist_sq = jnp.maximum(dot2(rel_pos, rel_pos), 1e-12)
    comb_rad = rad_a + rad_b
    comb_rad_sq = comb_rad ** 2

    inv_th = 1.0 / params.time_horizon
    w = rel_vel - inv_th * rel_pos
    w_len_sq = dot2(w, w)
    dot1 = dot2(w, rel_pos)
    on_cutoff = (dot1 < 0.0) & (dot1 * dot1 > comb_rad_sq * w_len_sq)

    w_len = jnp.sqrt(jnp.maximum(w_len_sq, 1e-18))
    unit_w = w / w_len
    dir_cut = jnp.stack([unit_w[1], -unit_w[0]])
    u_cut = (comb_rad * inv_th - w_len) * unit_w

    leg = jnp.sqrt(jnp.maximum(jnp.abs(dist_sq - comb_rad_sq), 0.0))
    d_left = jnp.stack([rel_pos[0] * leg - rel_pos[1] * comb_rad,
                        rel_pos[0] * comb_rad + rel_pos[1] * leg]) / dist_sq
    d_right = -jnp.stack([rel_pos[0] * leg + rel_pos[1] * comb_rad,
                          -rel_pos[0] * comb_rad + rel_pos[1] * leg]) / dist_sq
    dir_leg = jnp.where(det2(rel_pos, w) > 0.0, d_left, d_right)
    u_leg = dot2(rel_vel, dir_leg) * dir_leg - rel_vel

    dir_nc = jnp.where(on_cutoff, dir_cut, dir_leg)
    u_nc = jnp.where(on_cutoff, u_cut, u_leg)

    # in-collision: smoothed protrusion cutoff line (orca_casadi.py:269-290)
    inv_ts = 1.0 / params.dt
    rel_dist = jnp.sqrt(jnp.maximum(dist_sq, 1e-18))
    unit_rel = rel_pos / rel_dist
    protrusion = comb_rad - rel_dist
    norm_c = -unit_rel
    dir_c = jnp.stack([norm_c[1], -norm_c[0]])
    cut_pt = inv_ts * protrusion ** 2 * norm_c
    proj_pt = cut_pt + dot2(rel_vel - cut_pt, dir_c) * dir_c
    u_c = proj_pt - rel_vel

    no_coll = dist_sq > comb_rad_sq
    line_dir = jnp.where(no_coll, dir_nc, dir_c)
    u = jnp.where(no_coll, u_nc, u_c)

    line_pt = vel_a + 0.5 * u
    line_norm = jnp.stack([-line_dir[1], line_dir[0]])
    line_scalar = _checked_scalar(line_norm, line_dir, line_pt)
    return line_norm, line_scalar


def _checked_scalar(line_norm, line_dir, line_pt):
    dp = dot2(line_dir, line_pt)
    disc = dp * dp + V_MAX_CHECK ** 2 - dot2(line_pt, line_pt)
    scalar = dot2(line_norm, line_pt)
    dummy = dot2(line_norm, DUMMY_SCALE * line_norm)
    return jnp.where(disc < 0.0, dummy, scalar)


def static_line(pos_a, vel_a, rad_a, wall, wall_valid, params: OrcaModelParams):
    """Per-wall static-obstacle ORCA half-plane for agent A.

    One fixed line per wall (constraint count parity with
    orca_casadi.get_ORCA_stat_set_list:161-198): the visible directed edge
    is selected by the agent's side, the VO line comes from the shared
    edge geometry (ops.orca.edge_orca_line), and lines that are invalid or
    beyond the velocity bound collapse onto the far dummy line.
    """
    p1, p2 = wall[0], wall[1]
    # visible orientation: agent strictly right of directed edge
    flip = det2(p2 - p1, pos_a - p1) >= 0.0
    e1 = jnp.where(flip, p2, p1)
    e2 = jnp.where(flip, p1, p2)
    pt, line_dir, valid = edge_orca_line(pos_a, vel_a, rad_a, e1, e2,
                                         1.0 / params.time_horizon_obst)
    line_norm = jnp.stack([-line_dir[1], line_dir[0]])
    scalar = _checked_scalar(line_norm, line_dir, pt)
    dummy = dot2(line_norm, DUMMY_SCALE * line_norm)
    scalar = jnp.where(valid & wall_valid, scalar, dummy)
    # ensure a sane norm even for invalid lines
    line_norm = jnp.where(jnp.any(jnp.isnan(line_norm)),
                          jnp.array([0.0, 1.0]), line_norm)
    return line_norm, scalar


def v_pref_from_state(pos, goal, v_max):
    """Preferred velocity toward goal (orca_casadi.py:696-727): the raw goal
    displacement, rescaled to (v_max - 1e-3) when its magnitude >= v_max."""
    v = goal - pos
    mag = jnp.sqrt(jnp.maximum(dot2(v, v), 0.0)) + 0.001
    v_capped = v / mag * (v_max - 1e-3)
    return jnp.where(mag >= v_max, v_capped, v)


def lower_level_cost(v, ksi, v_pref):
    """Human A's relaxed-ORCA objective: ||v - v_pref||^2 + 100 ksi^2
    (orca_casadi.init_one_hum_eqns:~770)."""
    d = v - v_pref
    return dot2(d, d) + 100.0 * ksi ** 2
