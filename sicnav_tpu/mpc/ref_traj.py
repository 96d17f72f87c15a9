"""Point-stabilization reference trajectory with rotate-in-place phases.

Re-implements the reference's default ``ref_type = point_stab`` reference
generation (sicnav_diffusion/policy/sicnav_acados.py calc_ref_traj:296-440,
gen_ref_traj:462-495, get_ref_traj:648-670; same logic in
sicnav/policy/campc.py) as a single fixed-shape ``lax.scan``:

  phase 1 (rotate-in-place, only when already within ``robot_radius`` of the
      goal): v = 0, |omega| >= max_rot toward the goal direction;
  phase 2 (cruise): v = pref_speed, heading servoed to point at the goal;
  phase 3 (arrival): one partial step v = dist/dt that lands exactly on the
      goal, then rotate-in-place toward the arrival heading.

The reference regenerates this trajectory from the current state at every
control step and slices the first K stages (point_stab branch sets
``start = 0``), which is exactly what one K-step scan from the measured
state produces — no stored trajectory or closest-point search is needed.
The |omega| >= max_rot floor in the rotate phase (and the resulting
oscillation once aligned within one step) matches the reference's
``corrected_dpg_theta`` clamp (sicnav_acados.py:372-376).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sicnav_tpu.ops.geometry import wrap_angle


def point_stab_reference(pos, theta, goal, K: int, dt: float,
                         pref_speed: float, max_rot: float,
                         robot_radius: float):
    """Roll the multi-phase unicycle reference K steps from (pos, theta).

    Returns (poses (K+1, 3) [x, y, theta], actions (K, 2) [v, omega]).
    """
    dpg0 = goal - pos
    dist0 = jnp.linalg.norm(dpg0)
    far0 = dist0 > 1e-5
    theta_enroute = jnp.where(far0, jnp.arctan2(dpg0[1], dpg0[0]), theta)

    # steps needed for the initial rotate-in-place phase (only engaged when
    # the robot is already within its own radius of the goal,
    # sicnav_acados.py:475-481) and for the cruise phase
    init_angle = jnp.abs(wrap_angle(theta_enroute - theta))
    n_init = jnp.where(
        dist0 > robot_radius, 0.0,
        jnp.ceil(init_angle / (dt * max_rot))).astype(jnp.int32)
    n_req = n_init + jnp.ceil(dist0 / (dt * pref_speed)).astype(jnp.int32)

    def body(carry, idx):
        x, y, th = carry
        dpg_x = goal[0] - x
        dpg_y = goal[1] - y
        dist = jnp.sqrt(dpg_x ** 2 + dpg_y ** 2)
        far = (jnp.abs(dpg_x) > 1e-5) | (jnp.abs(dpg_y) > 1e-5)
        target = jnp.where(far, jnp.arctan2(dpg_y, dpg_x), theta_enroute)
        dth = wrap_angle(target - th)

        cruise = (idx < n_req) & (idx > n_init)
        arrive = idx == n_req
        v = jnp.where(cruise, pref_speed, jnp.where(arrive, dist / dt, 0.0))
        # rotate-in-place: at least max_rot toward the target heading
        dth_rot = jnp.where(dth > 0.0, jnp.maximum(max_rot * dt, dth),
                            jnp.minimum(-max_rot * dt, dth))
        om = jnp.where(cruise | arrive, dth / dt, dth_rot / dt)

        th_n = wrap_angle(th + dt * om)
        x_n = x + dt * v * jnp.cos(th_n)
        y_n = y + dt * v * jnp.sin(th_n)
        return (x_n, y_n, th_n), (jnp.stack([x_n, y_n, th_n]),
                                  jnp.stack([v, om]))

    init = (pos[0], pos[1], theta)
    _, (tail, actions) = jax.lax.scan(body, init, jnp.arange(1, K + 1))
    poses = jnp.concatenate(
        [jnp.stack([pos[0], pos[1], theta])[None], tail], axis=0)
    return poses, actions
