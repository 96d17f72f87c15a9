"""Batched ORCA (Optimal Reciprocal Collision Avoidance) in pure JAX.

TPU-native replacement for the Python-RVO2 C++ library the reference drives
from `crowd_sim_plus/envs/policy/orca.py`, `orca_plus.py` and
`sicnav/utils/mpc_utils/orca_c_wrapper.py`. This module re-implements the
published ORCA algorithm (van den Berg, Guy, Lin, Manocha, "Reciprocal n-body
collision avoidance", ISRR 2011) — pairwise velocity-obstacle half-plane
construction, static line-segment obstacle VO construction, and the
incremental 2D linear program with its infeasibility fallback (LP3) — as
branchless, fixed-shape, fully vmappable kernels.

Everything here operates on a single "acting agent" versus a masked, padded
set of neighbor agents and directed obstacle edges; batch over agents and
environments with ``jax.vmap``. All control flow is either ``jnp.where``
masking or fixed-trip-count ``lax`` loops so a single XLA program covers
every geometric case.

Conventions:
  - Each ORCA line is (point, direction); the feasible half-plane is the set
    ``{v : det(direction, point - v) <= 0}`` (left of the directed line).
  - Obstacle walls are standalone 2-vertex segments (the only kind the
    reference ever adds, crowd_sim_plus/envs/policy/orca_plus.py:52-55); each
    wall yields two directed edges with 2-gon topology (prev/next is the
    reversed edge, both endpoints convex).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from sicnav_tpu.ops.geometry import det2, dot2, norm2, normalize, closest_point_on_segment

# RVO2's epsilon for LP degeneracy tests.
RVO_EPSILON = 1e-5
_BIG = 1e9


def _lp_unroll(L: int, cap: int) -> int:
    """Unroll factor for the incremental-LP fori_loops.

    Unrolling lets XLA fuse across lines instead of emitting serial
    while-loops (~1.5x on the vmapped env-step benchmark on TPU), but the
    XLA:CPU backend segfaults compiling the resulting giant bodies when
    the LPs are further nested under vmap+scan (observed: LLVM crash
    compiling `warmstart_horizon` eagerly on CPU hosts). Unroll on
    accelerators only; CPU keeps the rolled loop.
    """
    try:
        backend = jax.default_backend()
    except Exception:
        backend = "cpu"
    return min(L, cap) if backend != "cpu" else 1


class OrcaParams(NamedTuple):
    """ORCA behavioral parameters (defaults = reference ORCA policy defaults,
    crowd_sim_plus/envs/policy/orca.py:58-66)."""
    neighbor_dist: float = 10.0
    time_horizon: float = 2.0
    time_horizon_obst: float = 0.5
    # dt of the simulation (used for the already-in-collision case)
    dt: float = 0.25


# ---------------------------------------------------------------------------
# Half-plane construction: agent pairs
# ---------------------------------------------------------------------------

def agent_orca_lines(pos, vel, rad, max_speed_unused, npos, nvel, nrad, nmask,
                     time_horizon, dt):
    """ORCA lines of one acting agent vs. ``N`` padded neighbor agents.

    Args:
      pos, vel: (2,) acting agent position / current velocity.
      rad: () acting agent (inflated) radius.
      npos, nvel, nrad: (N, 2), (N, 2), (N,) neighbor states.
      nmask: (N,) bool — which neighbor slots are real.
      time_horizon, dt: scalars.

    Returns:
      (points (N,2), dirs (N,2), valid (N,)) — one candidate line per slot.
    """
    inv_th = 1.0 / time_horizon
    inv_dt = 1.0 / dt

    rel_pos = npos - pos[None, :]                     # (N,2)
    rel_vel = vel[None, :] - nvel                     # (N,2)
    dist_sq = jnp.maximum(dot2(rel_pos, rel_pos), 1e-12)
    comb_r = rad + nrad                               # (N,)
    comb_r_sq = comb_r * comb_r

    no_collision = dist_sq > comb_r_sq

    # --- no-collision case ----------------------------------------------
    w = rel_vel - inv_th * rel_pos                    # (N,2)
    w_len_sq = dot2(w, w)
    dot1 = dot2(w, rel_pos)
    # project on cut-off circle?
    on_cutoff = (dot1 < 0.0) & (dot1 * dot1 > comb_r_sq * w_len_sq)

    w_len = jnp.sqrt(jnp.maximum(w_len_sq, 1e-18))
    unit_w = w / w_len[:, None]
    dir_cutoff = jnp.stack([unit_w[:, 1], -unit_w[:, 0]], axis=-1)
    u_cutoff = (comb_r * inv_th - w_len)[:, None] * unit_w

    # legs
    leg = jnp.sqrt(jnp.maximum(dist_sq - comb_r_sq, 0.0))
    left = det2(rel_pos, w) > 0.0
    dir_left = jnp.stack([
        rel_pos[:, 0] * leg - rel_pos[:, 1] * comb_r,
        rel_pos[:, 0] * comb_r + rel_pos[:, 1] * leg], axis=-1) / dist_sq[:, None]
    dir_right = -jnp.stack([
        rel_pos[:, 0] * leg + rel_pos[:, 1] * comb_r,
        -rel_pos[:, 0] * comb_r + rel_pos[:, 1] * leg], axis=-1) / dist_sq[:, None]
    dir_leg = jnp.where(left[:, None], dir_left, dir_right)
    u_leg = dot2(rel_vel, dir_leg)[:, None] * dir_leg - rel_vel

    dir_nc = jnp.where(on_cutoff[:, None], dir_cutoff, dir_leg)
    u_nc = jnp.where(on_cutoff[:, None], u_cutoff, u_leg)

    # --- collision case ---------------------------------------------------
    w_c = rel_vel - inv_dt * rel_pos
    w_c_len = jnp.sqrt(jnp.maximum(dot2(w_c, w_c), 1e-18))
    unit_w_c = w_c / w_c_len[:, None]
    dir_c = jnp.stack([unit_w_c[:, 1], -unit_w_c[:, 0]], axis=-1)
    u_c = (comb_r * inv_dt - w_c_len)[:, None] * unit_w_c

    direction = jnp.where(no_collision[:, None], dir_nc, dir_c)
    u = jnp.where(no_collision[:, None], u_nc, u_c)

    # reciprocal: each agent takes half the responsibility
    points = vel[None, :] + 0.5 * u
    return points, direction, nmask


# ---------------------------------------------------------------------------
# Half-plane construction: static line-segment obstacles
# ---------------------------------------------------------------------------

def edge_orca_line(pos, vel, rad, ep1, ep2, inv_th):
    """ORCA line of one acting agent vs. ONE directed obstacle edge
    (the geometric core of RVO2's obstacle VO construction, minus the
    sequential already-covered pruning). Assumes standalone 2-vertex wall
    topology (both endpoints convex). Differentiable jnp.where chain.

    Args:
      pos, vel: (2,) acting agent state; rad: () inflated radius.
      ep1, ep2: (2,) edge endpoints (direction ep1 -> ep2).
      inv_th: scalar 1/time_horizon_obst.

    Returns (point (2,), direction (2,), valid ()).
    """
    rp1 = ep1 - pos
    rp2 = ep2 - pos
    u_d = normalize(ep2 - ep1)
    r_sq = rad * rad

    d1_sq = dot2(rp1, rp1)
    d2_sq = dot2(rp2, rp2)
    ovec = ep2 - ep1
    ovec_sq = jnp.maximum(dot2(ovec, ovec), 1e-18)
    s = dot2(-rp1, ovec) / ovec_sq
    dline_sq = dot2(-rp1 - s * ovec, -rp1 - s * ovec)

    # --- collision cases (point = 0) ----------------------------------
    coll_v1 = (s < 0.0) & (d1_sq <= r_sq)
    coll_v2 = (s > 1.0) & (d2_sq <= r_sq)
    coll_seg = (s >= 0.0) & (s <= 1.0) & (dline_sq <= r_sq)
    coll_v2_valid = det2(rp2, -u_d) >= 0.0
    dir_coll_v1 = normalize(jnp.stack([-rp1[1], rp1[0]]))
    dir_coll_v2 = normalize(jnp.stack([-rp2[1], rp2[0]]))
    dir_coll_seg = -u_d

    in_collision = coll_v1 | coll_v2 | coll_seg
    coll_valid = jnp.where(coll_v1, True,
                           jnp.where(coll_v2, coll_v2_valid, coll_seg))
    dir_coll = jnp.where(coll_v1, dir_coll_v1,
                         jnp.where(coll_v2, dir_coll_v2, dir_coll_seg))

    # --- no collision: leg directions ---------------------------------
    oblique1 = (s < 0.0) & (dline_sq <= r_sq)
    oblique2 = (s > 1.0) & (dline_sq <= r_sq)

    leg1 = jnp.sqrt(jnp.maximum(d1_sq - r_sq, 0.0))
    leg2 = jnp.sqrt(jnp.maximum(d2_sq - r_sq, 0.0))
    d1s = jnp.maximum(d1_sq, 1e-18)
    d2s = jnp.maximum(d2_sq, 1e-18)
    left1 = jnp.stack([rp1[0] * leg1 - rp1[1] * rad,
                       rp1[0] * rad + rp1[1] * leg1]) / d1s
    right1 = jnp.stack([rp1[0] * leg1 + rp1[1] * rad,
                        -rp1[0] * rad + rp1[1] * leg1]) / d1s
    left2 = jnp.stack([rp2[0] * leg2 - rp2[1] * rad,
                       rp2[0] * rad + rp2[1] * leg2]) / d2s
    right2 = jnp.stack([rp2[0] * leg2 + rp2[1] * rad,
                        -rp2[0] * rad + rp2[1] * leg2]) / d2s

    left_leg = jnp.where(oblique1, left1, jnp.where(oblique2, left2, left1))
    right_leg = jnp.where(oblique1, right1, jnp.where(oblique2, right2, right2))
    same_vertex = oblique1 | oblique2
    cut_l_pt = jnp.where(oblique2, rp2, rp1)
    cut_r_pt = jnp.where(oblique1, rp1, rp2)

    left_foreign = det2(left_leg, u_d) >= 0.0
    right_foreign = det2(right_leg, u_d) <= 0.0
    left_leg = jnp.where(left_foreign, u_d, left_leg)
    right_leg = jnp.where(right_foreign, u_d, right_leg)

    left_cutoff = inv_th * cut_l_pt
    right_cutoff = inv_th * cut_r_pt
    cutoff_vec = right_cutoff - left_cutoff
    cutoff_sq = jnp.maximum(dot2(cutoff_vec, cutoff_vec), 1e-18)

    t = jnp.where(same_vertex, 0.5, dot2(vel - left_cutoff, cutoff_vec) / cutoff_sq)
    t_left = dot2(vel - left_cutoff, left_leg)
    t_right = dot2(vel - right_cutoff, right_leg)

    proj_left_circle = ((t < 0.0) & (t_left < 0.0)) | (same_vertex & (t_left < 0.0) & (t_right < 0.0))
    proj_right_circle = (t > 1.0) & (t_right < 0.0)

    unit_w_l = normalize(vel - left_cutoff)
    unit_w_r = normalize(vel - right_cutoff)
    dir_lc = jnp.stack([unit_w_l[1], -unit_w_l[0]])
    dir_rc = jnp.stack([unit_w_r[1], -unit_w_r[0]])
    pt_lc = left_cutoff + rad * inv_th * unit_w_l
    pt_rc = right_cutoff + rad * inv_th * unit_w_r

    d_cut = jnp.where((t < 0.0) | (t > 1.0) | same_vertex, _BIG,
                      dot2(vel - (left_cutoff + t * cutoff_vec),
                           vel - (left_cutoff + t * cutoff_vec)))
    d_left = jnp.where(t_left < 0.0, _BIG,
                       dot2(vel - (left_cutoff + t_left * left_leg),
                            vel - (left_cutoff + t_left * left_leg)))
    d_right = jnp.where(t_right < 0.0, _BIG,
                        dot2(vel - (right_cutoff + t_right * right_leg),
                             vel - (right_cutoff + t_right * right_leg)))

    use_cut = (d_cut <= d_left) & (d_cut <= d_right)
    use_left = (~use_cut) & (d_left <= d_right)

    dir_cutline = -u_d
    pt_cutline = left_cutoff + rad * inv_th * jnp.stack([-dir_cutline[1], dir_cutline[0]])
    pt_ll = left_cutoff + rad * inv_th * jnp.stack([-left_leg[1], left_leg[0]])
    dir_rl = -right_leg
    pt_rl = right_cutoff + rad * inv_th * jnp.stack([right_leg[1], -right_leg[0]])

    nc_dir_pre = jnp.where(use_cut, dir_cutline, jnp.where(use_left, left_leg, dir_rl))
    nc_pt_pre = jnp.where(use_cut, pt_cutline, jnp.where(use_left, pt_ll, pt_rl))
    nc_valid = jnp.where(use_cut, True,
                         jnp.where(use_left, ~left_foreign, ~right_foreign))
    # projection onto the cutoff circles takes priority over legs/cutline
    nc_dir = jnp.where(proj_left_circle, dir_lc,
                       jnp.where(proj_right_circle, dir_rc, nc_dir_pre))
    nc_pt = jnp.where(proj_left_circle, pt_lc,
                      jnp.where(proj_right_circle, pt_rc, nc_pt_pre))
    nc_valid = jnp.where(proj_left_circle | proj_right_circle, True, nc_valid)

    direction = jnp.where(in_collision, dir_coll, nc_dir)
    point = jnp.where(in_collision, jnp.zeros(2, direction.dtype), nc_pt)
    valid = jnp.where(in_collision, coll_valid, nc_valid)
    return point, direction, valid


def obstacle_orca_lines(pos, vel, rad, p1, p2, emask, time_horizon_obst):
    """ORCA lines of one acting agent vs. ``E`` padded *directed* obstacle
    edges, with RVO2's sequential already-covered pruning.

    Each wall segment contributes two directed edges (both orientations);
    the caller is responsible for ordering edges by increasing distance
    (RVO2 processes obstacle neighbors nearest-first, which the
    already-covered check depends on).

    Args:
      pos, vel: (2,) acting agent state.
      rad: () inflated agent radius.
      p1, p2: (E, 2) edge endpoints (edge direction is p1 -> p2).
      emask: (E,) bool valid-slot mask.
      time_horizon_obst: scalar.

    Returns:
      (points (E,2), dirs (E,2), valid (E,)).
    """
    inv_th = 1.0 / time_horizon_obst
    unit_dir = normalize(p2 - p1)                     # (E,2) o1.unitDir

    def per_edge(i, prev_pts, prev_dirs, prev_valid):
        rp1 = p1[i] - pos
        rp2 = p2[i] - pos
        # already covered by previously added obstacle lines?
        c1 = det2(inv_th * rp1 - prev_pts, prev_dirs) - inv_th * rad >= -RVO_EPSILON
        c2 = det2(inv_th * rp2 - prev_pts, prev_dirs) - inv_th * rad >= -RVO_EPSILON
        covered = jnp.any(prev_valid & c1 & c2)

        point, direction, valid = edge_orca_line(pos, vel, rad, p1[i], p2[i],
                                                 inv_th)
        return point, direction, valid & emask[i] & ~covered

    E = p1.shape[0]

    def scan_body(carry, i):
        pts, dirs, vals = carry
        pt, dr, vl = per_edge(i, pts, dirs, vals)
        pts = pts.at[i].set(pt)
        dirs = dirs.at[i].set(dr)
        vals = vals.at[i].set(vl)
        return (pts, dirs, vals), None

    init = (jnp.zeros((E, 2), p1.dtype), jnp.zeros((E, 2), p1.dtype),
            jnp.zeros((E,), bool))
    (pts, dirs, vals), _ = jax.lax.scan(scan_body, init, jnp.arange(E))
    return pts, dirs, vals


# ---------------------------------------------------------------------------
# Incremental 2D linear program (RVO2 linearProgram1/2/3)
# ---------------------------------------------------------------------------

def _lp1(points, dirs, valid, line_no, radius, opt_vel, direction_opt, result):
    """Solve on the boundary of line ``line_no`` subject to prior lines.

    Vectorized port of RVO2 linearProgram1: the inner loop over prior
    constraints becomes a masked min/max reduction. Returns (new_result, ok).
    """
    L = points.shape[0]
    pt = points[line_no]
    dr = dirs[line_no]

    dot_prod = dot2(pt, dr)
    disc = dot_prod * dot_prod + radius * radius - dot2(pt, pt)
    ok0 = disc >= 0.0
    sqrt_disc = jnp.sqrt(jnp.maximum(disc, 0.0))
    t_left0 = -dot_prod - sqrt_disc
    t_right0 = -dot_prod + sqrt_disc

    idx = jnp.arange(L)
    prior = valid & (idx < line_no)

    denom = det2(dr[None, :], dirs)                   # (L,)
    numer = det2(dirs, pt[None, :] - points)
    parallel = jnp.abs(denom) <= RVO_EPSILON
    fail_parallel = prior & parallel & (numer < 0.0)

    tt = numer / jnp.where(jnp.abs(denom) > RVO_EPSILON, denom, jnp.inf)
    upper = jnp.where(prior & ~parallel & (denom >= 0.0), tt, _BIG)
    lower = jnp.where(prior & ~parallel & (denom < 0.0), tt, -_BIG)
    t_right = jnp.minimum(t_right0, jnp.min(upper))
    t_left = jnp.maximum(t_left0, jnp.max(lower))

    ok = ok0 & ~jnp.any(fail_parallel) & (t_left <= t_right)

    if direction_opt:
        # optimize in the direction of opt_vel (unit vector)
        t = jnp.where(dot2(opt_vel, dr) > 0.0, t_right, t_left)
    else:
        t_opt = dot2(dr, opt_vel - pt)
        t = jnp.clip(t_opt, t_left, t_right)
    new_result = pt + t * dr
    return new_result, ok


def _lp2(points, dirs, valid, radius, opt_vel, direction_opt):
    """RVO2 linearProgram2 over masked fixed-size line set.

    Returns (result, fail_idx) with fail_idx = -1 on success, else the slot
    index of the first line for which LP1 was infeasible.
    """
    if direction_opt:
        result0 = opt_vel * radius
    else:
        over = dot2(opt_vel, opt_vel) > radius * radius
        result0 = jnp.where(over, normalize(opt_vel) * radius, opt_vel)

    L = points.shape[0]

    def body(i, carry):
        result, fail = carry
        active = valid[i] & (fail < 0)
        violated = det2(dirs[i], points[i] - result) > 0.0
        do = active & violated
        new_result, ok = _lp1(points, dirs, valid, i, radius, opt_vel,
                              direction_opt, result)
        result = jnp.where(do & ok, new_result, result)
        fail = jnp.where(do & ~ok, i, fail)
        return result, fail

    return jax.lax.fori_loop(0, L, body, (result0, jnp.int32(-1)),
                             unroll=_lp_unroll(L, 8))


def _lp3(points, dirs, valid, is_obst, begin_line, radius, result):
    """RVO2 linearProgram3: minimize the maximum violation of the agent
    lines at/after ``begin_line`` while keeping obstacle lines hard."""
    L = points.shape[0]
    idx = jnp.arange(L)

    def body(i, carry):
        result, distance = carry
        active = valid[i] & (i >= begin_line)
        viol = det2(dirs[i], points[i] - result)
        do = active & (viol > distance)

        # --- build projected lines -----------------------------------------
        # obstacle lines pass through unchanged; agent lines j < i project
        # onto the bisector of (line_j, line_i).
        d_i = dirs[i]
        p_i = points[i]
        denom = det2(d_i[None, :], dirs)              # (L,)
        parallel = jnp.abs(denom) <= RVO_EPSILON
        same_dir = dot2(d_i[None, :], dirs) > 0.0
        mid_pt = 0.5 * (p_i[None, :] + points)
        inter_pt = p_i[None, :] + (det2(dirs, p_i[None, :] - points) /
                                   jnp.where(jnp.abs(denom) > RVO_EPSILON,
                                             denom, jnp.inf))[:, None] * d_i[None, :]
        proj_pt = jnp.where(parallel[:, None], mid_pt, inter_pt)
        proj_dir = normalize(dirs - d_i[None, :])

        agent_prior = valid & ~is_obst & (idx < i)
        keep = agent_prior & ~(parallel & same_dir)

        pl_pts = jnp.where(is_obst[:, None], points, proj_pt)
        pl_dirs = jnp.where(is_obst[:, None], dirs, proj_dir)
        pl_valid = (valid & is_obst) | keep

        opt = jnp.stack([-d_i[1], d_i[0]])
        new_result, fail = _lp2(pl_pts, pl_dirs, pl_valid, radius, opt, True)
        # keep previous result on inner failure (numerical) — RVO2 comment:
        # "this should in principle not happen"
        result = jnp.where(do & (fail < 0), new_result, result)
        distance = jnp.where(do, det2(d_i, p_i - result), distance)
        return result, distance

    result, _ = jax.lax.fori_loop(0, L, body,
                                  (result, jnp.array(0.0, result.dtype)),
                                  unroll=_lp_unroll(L, 4))
    return result


def solve_orca_lp(points, dirs, valid, is_obst, radius, pref_vel):
    """Full RVO2 velocity selection: LP2 with LP3 fallback.

    Args:
      points, dirs: (L, 2) ORCA line set (obstacle slots first).
      valid: (L,) slot mask.
      is_obst: (L,) marks obstacle lines (kept hard in LP3).
      radius: scalar max speed.
      pref_vel: (2,) preferred velocity.

    Returns: (2,) new velocity.
    """
    result, fail = _lp2(points, dirs, valid, radius, pref_vel, False)
    needs3 = fail >= 0
    begin = jnp.where(needs3, fail, jnp.int32(points.shape[0]))
    result3 = _lp3(points, dirs, valid, is_obst, begin, radius, result)
    return jnp.where(needs3, result3, result)


# ---------------------------------------------------------------------------
# Full acting-agent ORCA step
# ---------------------------------------------------------------------------

def _sort_neighbors(pos, npos, nmask, neighbor_dist, max_neighbors):
    """Order neighbor slots by distance (RVO2 processes nearest-first) and
    mask out-of-range slots. Returns (order, mask) with static shape."""
    d = norm2(npos - pos[None, :])
    in_range = nmask & (d < neighbor_dist)
    key = jnp.where(in_range, d, _BIG)
    order = jnp.argsort(key)
    sorted_in_range = in_range[order]
    if max_neighbors is not None:
        rank = jnp.arange(npos.shape[0])
        sorted_in_range = sorted_in_range & (rank < max_neighbors)
    return order, sorted_in_range


def _sort_edges(pos, ep1, ep2, emask, range_):
    """Order directed obstacle edges by point-to-segment distance.

    An edge is only visible when the agent is strictly on its *right* side
    (RVO2's CCW-winding convention: of the two directed edges of a standalone
    wall, an agent sees exactly the one it is right of; the KdTree enforces
    this side check before inserting obstacle neighbors)."""
    cp = closest_point_on_segment(ep1, ep2, pos[None, :])
    d = norm2(cp - pos[None, :])
    right_of = det2(ep2 - ep1, pos[None, :] - ep1) < 0.0
    in_range = emask & (d < range_) & right_of
    key = jnp.where(in_range, d, _BIG)
    order = jnp.argsort(key)
    return order, in_range[order]


@functools.partial(jax.jit, static_argnames=("max_neighbors",))
def orca_velocity(pos, vel, rad, pref_vel, max_speed,
                  npos, nvel, nrad, nmask,
                  ep1, ep2, emask,
                  params: OrcaParams, max_neighbors: int = 10):
    """New velocity for one acting agent — the TPU-native equivalent of one
    RVO2 ``doStep`` for agent 0 (reference orca_plus.py:29-90).

    Args:
      pos, vel: (2,) acting agent position / velocity.
      rad: () acting agent radius (caller applies +0.01+safety_space
           inflation, matching orca.py:99-104).
      pref_vel: (2,) preferred velocity.
      max_speed: () max speed (LP disk radius).
      npos, nvel, nrad, nmask: (N, ...) neighbor agents (robot included).
      ep1, ep2, emask: (E, 2) directed obstacle edges (2 per wall).
      params: OrcaParams.
      max_neighbors: static cap on attended neighbors.

    Returns: (2,) new velocity. vmap over agents/envs for batching.
    """
    # --- obstacle lines (hard constraints, first slots) -------------------
    obst_range = params.time_horizon_obst * max_speed + rad
    eorder, evalid = _sort_edges(pos, ep1, ep2, emask, obst_range)
    o_pts, o_dirs, o_valid = obstacle_orca_lines(
        pos, vel, rad, ep1[eorder], ep2[eorder], evalid,
        params.time_horizon_obst)

    # --- agent lines -------------------------------------------------------
    norder, nvalid = _sort_neighbors(pos, npos, nmask, params.neighbor_dist,
                                     max_neighbors)
    a_pts, a_dirs, a_valid = agent_orca_lines(
        pos, vel, rad, max_speed,
        npos[norder], nvel[norder], nrad[norder], nvalid,
        params.time_horizon, params.dt)

    points = jnp.concatenate([o_pts, a_pts], axis=0)
    dirs = jnp.concatenate([o_dirs, a_dirs], axis=0)
    valid = jnp.concatenate([o_valid, a_valid], axis=0)
    is_obst = jnp.concatenate([jnp.ones_like(o_valid), jnp.zeros_like(a_valid)])

    return solve_orca_lp(points, dirs, valid, is_obst, max_speed, pref_vel)


def walls_to_edges(walls, wmask):
    """Expand (W, 2, 2) wall segments into (2W, 2) directed edge endpoint
    arrays (both orientations), mirroring RVO2's 2-vertex obstacle topology.

    Returns (ep1, ep2, emask)."""
    p1 = jnp.concatenate([walls[:, 0], walls[:, 1]], axis=0)
    p2 = jnp.concatenate([walls[:, 1], walls[:, 0]], axis=0)
    emask = jnp.concatenate([wmask, wmask], axis=0)
    return p1, p2, emask
