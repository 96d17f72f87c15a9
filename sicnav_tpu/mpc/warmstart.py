"""Feasible warmstart generation for CAMPC.

The reference builds the warmstart by (a) simulating the humans forward with
the real RVO2 ORCA solver (orca_c_wrapper.py:120-178) or the per-human
CasADi NLPs (orca_casadi.optimize_all:845), which also yield the duals, and
(b) treating the robot itself as an ORCA agent with extra rotation/accel
half-planes (orca_casadi.get_rob_warmstart_fn:1022-1161). Here both use the
same batched JAX ORCA LP (ops.orca) over the MPC's internal model
parameters, with duals recovered from the active set by a masked
least-squares fit to the stationarity condition.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sicnav_tpu.mpc import orca_lines as OL
from sicnav_tpu.mpc.ocp import MPCParams, OCP, Slacks
from sicnav_tpu.ops.geometry import norm2
from sicnav_tpu.ops.orca import solve_orca_lp


def _human_lines(ocp: OCP, params: MPCParams, xr, xh, a):
    """All half-planes (norm, scalar) of human ``a``'s model-ORCA problem
    in the same row order as OCP.human_orca_g (minus maxvel/ksi)."""
    cfg = ocp.cfg
    op = cfg.orca_params
    H = cfg.num_hums
    pos_a, vel_a = xh[a, :2], xh[a, 2:4]
    rad_a = params.hum_radii[a]
    rob_pos = xr[:2]
    rob_vel = ocp.rob_vel(xr)

    def pair(b):
        is_rob = b == a
        pos_b = jnp.where(is_rob, rob_pos, xh[b, :2])
        vel_b = jnp.where(is_rob, rob_vel, xh[b, 2:4])
        rad_b = jnp.where(is_rob, params.rob_radius, params.hum_radii[b])
        return OL.pairwise_line(pos_a, vel_a, pos_b, vel_b, rad_a, rad_b, op)

    n_pair, s_pair = jax.vmap(pair)(jnp.arange(H))

    def stat(w):
        return OL.static_line(pos_a, vel_a, rad_a, params.walls[w],
                              params.wall_mask[w], op)

    n_stat, s_stat = jax.vmap(stat)(jnp.arange(cfg.num_walls))
    return (jnp.concatenate([n_pair, n_stat], 0),
            jnp.concatenate([s_pair, s_stat], 0))


def solve_human_step(ocp: OCP, params: MPCParams, xr, xh, a,
                     newton_iters: int = 8):
    """One human's relaxed-ORCA solve, with KKT-consistent duals.

    The reference solves the per-human relaxed NLP with nlpsol/Opti to get a
    primal+dual warmstart (orca_casadi.py:708-841, optimize_all:845). Here:
    the batched ORCA LP gives the primal point, active-set least squares an
    initial dual estimate, then damped square-Newton iterations on the
    *embedded* KKT system F(w, lam) = [grad_w L; lam*g - rho] drive exactly
    the residuals the upper level penalizes to ~0.

    Returns (u (3,) [vx, vy, ksi_raw], lam (n_lam,))."""
    from sicnav_tpu.mpc.ocp import KKT_RHO
    cfg = ocp.cfg
    sv, sk = cfg.orca_vxy_scaling, cfg.orca_ksi_scaling
    norms, scalars = _human_lines(ocp, params, xr, xh, a)
    v_max = params.v_max_prefs[a]
    v_pref = OL.v_pref_from_state(xh[a, :2], xh[a, 4:6], v_max)

    # half-plane form for the LP core: feasible = left of (point, dir)
    # n.v >= b  <=>  det(dir, point - v) <= 0 with dir = (n_y, -n_x)
    nn = jnp.maximum(jnp.sum(norms * norms, -1), 1e-12)
    pts = scalars[:, None] * norms / nn[:, None]
    dirs = jnp.stack([norms[:, 1], -norms[:, 0]], -1)
    valid = jnp.ones(pts.shape[0], bool)
    is_obst = jnp.zeros(pts.shape[0], bool)
    v = solve_orca_lp(pts, dirs, valid, is_obst, v_max, v_pref)

    g_lines = scalars - jnp.sum(norms * v[None, :], -1)   # >0 => violated
    ksi_raw0 = jnp.maximum(jnp.max(g_lines), 0.0) / sk
    w0 = jnp.concatenate([v / sv, ksi_raw0[None]])

    # initial duals: least squares on stationarity over the active set
    g0 = ocp.human_orca_g(params, xr, xh, w0, a)
    n_lam = g0.shape[0]
    act = g0 > -1e-5
    grad_g = jax.jacfwd(lambda w: ocp.human_orca_g(params, xr, xh, w, a))(w0)
    grad_f = jax.grad(lambda w: OL.lower_level_cost(
        sv * w[:2], sk * w[2], v_pref))(w0)
    A = jnp.where(act[:, None], grad_g, 0.0)              # (n_lam, 3)
    AtA = A @ A.T + 1e-8 * jnp.eye(n_lam)
    lam0 = jnp.clip(jnp.linalg.solve(AtA, A @ (-grad_f)), 0.0, 1e4)

    # damped Newton on F(w, lam) = [grad_w L; lam * g - rho]
    def kkt_res(wl):
        w, lam = wl[:3], wl[3:]
        g, grad = ocp.human_kkt_rows(params, xr, xh, w, lam, a)
        return jnp.concatenate([grad, lam * g - KKT_RHO])

    def newton_step(wl, _):
        res = kkt_res(wl)
        J = jax.jacfwd(kkt_res)(wl)
        J = J + 1e-8 * jnp.eye(J.shape[0])
        dwl = jnp.linalg.solve(J, -res)
        # damped update keeping duals nonnegative
        wl_new = wl + jnp.clip(dwl, -1.0, 1.0)
        wl_new = wl_new.at[3:].set(jnp.maximum(wl_new[3:], 0.0))
        better = jnp.sum(kkt_res(wl_new) ** 2) < jnp.sum(res ** 2)
        return jnp.where(better, wl_new, wl), None

    wl0 = jnp.concatenate([w0, lam0])
    wl, _ = jax.lax.scan(newton_step, wl0, None, length=newton_iters)
    return wl[:3], wl[3:]


def robot_warmstart_velocity(ocp: OCP, params: MPCParams, xr, xh):
    """Robot treated as an ORCA agent toward its goal
    (orca_casadi.get_ORCA_rob_simulatedconsts:534-570 simplified): ORCA LP
    over pairwise lines vs all humans + wall lines, pref vel toward goal."""
    cfg = ocp.cfg
    op = cfg.orca_params
    pos = xr[:2]
    vel = ocp.rob_vel(xr)
    rad = params.rob_radius

    def pair(b):
        return OL.pairwise_line(pos, vel, xh[b, :2], xh[b, 2:4], rad,
                                params.hum_radii[b], op)

    n_p, s_p = jax.vmap(pair)(jnp.arange(cfg.num_hums))

    def stat(w):
        return OL.static_line(pos, vel, rad, params.walls[w],
                              params.wall_mask[w], op)

    n_s, s_s = jax.vmap(stat)(jnp.arange(cfg.num_walls))
    norms = jnp.concatenate([n_p, n_s], 0)
    scalars = jnp.concatenate([s_p, s_s], 0)

    goal_vec = params.goal - pos
    mag = norm2(goal_vec)
    v_pref = jnp.where(mag > cfg.pref_speed,
                       goal_vec / jnp.maximum(mag, 1e-9) * cfg.pref_speed,
                       goal_vec)

    if cfg.robot_nx == 8 and cfg.momentum_warmstart:
        # RA-L warmstart pref-vel (orca_casadi_new.init_get_rob_ws_v_pref
        # _fromstate_csfunc:729-775): express the goal pull in the heading
        # frame; when the goal is behind or > 80 deg off-heading, flip to
        # (0.01 x_vf, -y_vf) so the turn-in-place unwinds instead of
        # commanding a backward velocity; then blend 95% momentum — the
        # current speed rotated by the current angular rate.
        s, c = xr[2], xr[3]
        vf_x = c * v_pref[0] + s * v_pref[1]
        vf_y = -s * v_pref[0] + c * v_pref[1]
        in_front = ((vf_x > 0.0) &
                    (jnp.abs(jnp.arctan2(vf_y, vf_x)) < 80.0 * jnp.pi / 180.0))
        fx, fy = 0.01 * vf_x, -vf_y
        flip_i = jnp.stack([c * fx - s * fy, s * fx + c * fy])
        v0 = jnp.where(in_front, v_pref, flip_i)
        om_cur, dt = xr[5], cfg.dt
        s_n = s * jnp.cos(om_cur * dt) + c * jnp.sin(om_cur * dt)
        c_n = c * jnp.cos(om_cur * dt) - s * jnp.sin(om_cur * dt)
        v_mom = xr[4] * jnp.stack([c_n, s_n])
        v_pref = 0.05 * v0 + 0.95 * v_mom

    nn = jnp.maximum(jnp.sum(norms * norms, -1), 1e-12)
    pts = scalars[:, None] * norms / nn[:, None]
    dirs = jnp.stack([norms[:, 1], -norms[:, 0]], -1)
    valid = jnp.ones(pts.shape[0], bool)
    is_obst = jnp.zeros(pts.shape[0], bool)
    return solve_orca_lp(pts, dirs, valid, is_obst, cfg.max_speed, v_pref)


def _vel_to_unicycle(ocp: OCP, xr, v_des):
    """Convert a desired holonomic velocity into feasible (v, om): rotate
    toward the desired heading within max_rot, speed within accel limits."""
    cfg = ocp.cfg
    s, c = ocp.rob_heading(xr)
    th = jnp.arctan2(s, c)
    des_th = jnp.arctan2(v_des[1], v_des[0])
    dth = jnp.arctan2(jnp.sin(des_th - th), jnp.cos(des_th - th))
    om = jnp.clip(dth / cfg.dt, -cfg.max_rot + 0.001, cfg.max_rot)
    sp = norm2(v_des) * jnp.cos(jnp.clip(dth, -jnp.pi / 2, jnp.pi / 2))
    sp = jnp.maximum(sp, 0.0)
    v_prev = ocp.rob_v_prev(xr)
    sp = jnp.clip(sp, jnp.maximum(v_prev + cfg.max_l_dcc * cfg.dt, 0.0),
                  jnp.minimum(v_prev + cfg.max_l_acc * cfg.dt, cfg.max_speed))
    return jnp.stack([sp, om])


def plan_human_rollout(ocp: OCP, params: MPCParams, u_rob):
    """Roll the horizon with the GIVEN robot controls and humans responding
    via exact per-stage lower-level ORCA solves — the ground-truth model
    rollout the reference replays through the real RVO2 callback to audit
    optimizer solutions (campc.calc_actual_orca_for_x_val:1135-1156).

    Returns (X_rob (K+1, nx_r), X_hums (K+1, H, 6), u_hums (K, H, 3),
    lam (K, H, n_lam)) — the human decisions/duals make any robot plan
    packable as a KKT-consistent multi-start z (campc z_from_robot_plan)."""
    cfg = ocp.cfg
    H = cfg.num_hums

    def body(carry, k):
        xr, xh = carry
        uh, lam = jax.vmap(lambda a: solve_human_step(ocp, params, xr, xh, a))(
            jnp.arange(H))
        v, om, dt = u_rob[k, 0], u_rob[k, 1], cfg.dt
        if cfg.robot_nx == 8:
            s, c = xr[2], xr[3]
            s_next = s * jnp.cos(om * dt) + c * jnp.sin(om * dt)
            c_next = c * jnp.cos(om * dt) - s * jnp.sin(om * dt)
            xr_next = jnp.stack([
                xr[0] + dt * v * c_next, xr[1] + dt * v * s_next,
                s_next, c_next, v, om, (v - xr[4]) / dt, (om - xr[5]) / dt])
        else:
            th_next = xr[2] + dt * om
            xr_next = jnp.stack([
                xr[0] + dt * v * jnp.cos(th_next),
                xr[1] + dt * v * jnp.sin(th_next), th_next, v])
        vel = cfg.orca_vxy_scaling * uh[:, :2]
        xh_next = jnp.concatenate([xh[:, :2] + vel * cfg.dt, vel, xh[:, 4:6]],
                                  -1)
        return (xr_next, xh_next), (xr_next, xh_next, uh, lam)

    (_, _), (xr_traj, xh_traj, u_hums, lam) = jax.lax.scan(
        body, (params.x0_rob, params.hums0), jnp.arange(cfg.K))
    X_rob = jnp.concatenate([params.x0_rob[None], xr_traj], axis=0)
    X_hums = jnp.concatenate([params.hums0[None], xh_traj], axis=0)
    return X_rob, X_hums, u_hums, lam


def exact_human_rollout(ocp: OCP, params: MPCParams, u_rob):
    """(X_rob, X_hums) of plan_human_rollout — the unused decision/dual
    outputs are dead-code-eliminated by XLA after jit."""
    X_rob, X_hums, _, _ = plan_human_rollout(ocp, params, u_rob)
    return X_rob, X_hums


def z_from_robot_plan(ocp: OCP, params: MPCParams, u_rob):
    """Pack an arbitrary robot control plan (K, 2) into a KKT-consistent
    decision vector: humans respond via exact per-stage lower-level ORCA
    solves (primal + Newton-polished duals, plan_human_rollout), slacks are
    inferred from the residuals. This makes ANY robot maneuver — a brake
    profile, a side-step, a creep — a feasible multi-start point for the
    NLP (campc._build_starts), which the reference cannot afford with one
    IPOPT process per solve (campc.py:684-832) but a vmapped IPM can."""
    _, _, u_hums, lam = plan_human_rollout(ocp, params, u_rob)
    cfg = ocp.cfg
    H = cfg.num_hums
    zero = jnp.zeros(())
    zH = jnp.zeros((H,))
    slacks = Slacks(zH, zero, zero, zH, zH, zero, zH, zH, zH)
    z = ocp.pack(u_rob, u_hums[:cfg.K_orca], lam[:cfg.K_orca], slacks)
    return ocp.infer_slacks(z, params)


def warmstart_horizon(ocp: OCP, params: MPCParams):
    """Full-horizon feasible warmstart: roll robot (ORCA-as-agent) + humans
    (per-human ORCA solves with duals) forward (campc.warmstart_horiz).

    Returns z0 (packed decision vector)."""
    cfg = ocp.cfg
    H = cfg.num_hums

    def body(carry, k):
        xr, xh = carry
        v_rob = robot_warmstart_velocity(ocp, params, xr, xh)
        u_rob = _vel_to_unicycle(ocp, xr, v_rob)

        uh, lam = jax.vmap(lambda a: solve_human_step(ocp, params, xr, xh, a))(
            jnp.arange(H))

        # integrate (matching the OCP's robot model)
        if cfg.robot_nx == 8:
            s, c = xr[2], xr[3]
            om, dt = u_rob[1], cfg.dt
            s_next = s * jnp.cos(om * dt) + c * jnp.sin(om * dt)
            c_next = c * jnp.cos(om * dt) - s * jnp.sin(om * dt)
            xr_next = jnp.stack([
                xr[0] + dt * u_rob[0] * c_next,
                xr[1] + dt * u_rob[0] * s_next,
                s_next, c_next, u_rob[0], om,
                (u_rob[0] - xr[4]) / dt, (om - xr[5]) / dt])
        else:
            th_next = xr[2] + cfg.dt * u_rob[1]
            xr_next = jnp.stack([
                xr[0] + cfg.dt * u_rob[0] * jnp.cos(th_next),
                xr[1] + cfg.dt * u_rob[0] * jnp.sin(th_next),
                th_next, u_rob[0]])
        vel = cfg.orca_vxy_scaling * uh[:, :2]
        xh_next = jnp.concatenate([xh[:, :2] + vel * cfg.dt, vel, xh[:, 4:6]], -1)
        return (xr_next, xh_next), (u_rob, uh, lam)

    (_, _), (u_rob, u_hums, lam) = jax.lax.scan(
        body, (params.x0_rob, params.hums0), jnp.arange(cfg.K))

    H_ = cfg.num_hums
    zero = jnp.zeros(())
    zH = jnp.zeros((H_,))
    slacks = Slacks(zH, zero, zero, zH, zH, zero, zH, zH, zH)
    return ocp.pack(u_rob, u_hums[:cfg.K_orca], lam[:cfg.K_orca], slacks)
