"""CollisionAvoidMPC (CAMPC) — the SICNav robot policy.

Functional port of sicnav/policy/campc.py: per control step, build the
reference trajectory (point stabilization with hallway intermediate goals,
get_ref_traj:1201-1252), generate/shift the feasible warmstart
(select_action:569-610 + bring_fwd:539-566), solve the ORCA-KKT NLP with
the batched interior-point solver, and run the failure cascade
(warmstart-guess -> previous-solution -> emergency brake,
campc.py:684-832). One call = one jitted program; vmap for fleets.

Variants (policy.config parity): ``hum_model='orca_casadi_kkt'`` with
``priviledged_info`` True/False gives SICNav-p / SICNav-np;
``hum_model='cvmm'`` gives the MPC-CVMM baseline.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from sicnav_tpu.env.crowd_sim import intermediate_goals
from sicnav_tpu.env.types import EnvConfig, SimState
from sicnav_tpu.mpc import ipm, warmstart as WS
from sicnav_tpu.mpc.ocp import MPCConfig, MPCParams, OCP
from sicnav_tpu.mpc.ref_traj import point_stab_reference
from sicnav_tpu.ops.geometry import (norm2, point_to_segment_dist,
                                     seg_seg_dist, wrap_angle)


class CAMPCCarry(NamedTuple):
    """Cross-step policy state (reference reset_scenario_values:1255-1272).

    ``pred_rob`` / ``pred_hums`` hold the previous solution's stage-1 robot
    pose (x, y, theta) and human positions — the reality-check anchor for
    the bring_fwd discrepancy test (campc.py:546-550)."""
    z_prev: jnp.ndarray
    has_prev: jnp.ndarray       # bool
    prev_ok: jnp.ndarray        # bool — previous solve SUCCEEDED; on failure
                                # the reference regenerates the fresh
                                # full-horizon warmstart instead of shifting
                                # the failed plan (sicnav_acados.py:1341-1343)
    num_prev_used: jnp.ndarray  # int32
    pred_rob: jnp.ndarray       # (3,)
    pred_hums: jnp.ndarray      # (H, 2)
    door_stall: jnp.ndarray     # int32 — consecutive stalled-near-door steps
                                # (cfg.door_yield trigger counter)
    door_latch: jnp.ndarray     # bool — yield mode latched until the door
                                # mouth clears of transiting humans


class CAMPCAux(NamedTuple):
    """Per-step solve telemetry for episode-level collision taxonomy
    (round-3 safety audit): which cascade branch produced the executed
    action and how safe the adopted plan looked under the EXACT lower-level
    human model. All scalars — cheap to stack over a rollout scan."""
    use_guess: jnp.ndarray      # bool — cascade rejected the solver output
    sol_feasible: jnp.ndarray   # bool
    sol_realistic: jnp.ndarray  # bool — exact-rollout reality check passed
    cost_worse: jnp.ndarray     # bool — optimizer worse than warmstart
    braked: jnp.ndarray         # bool — emergency brake branch taken
    rescued: jnp.ndarray        # bool — best-exact-margin start executed
                                # in place of a failed guess (multi-start
                                # cfg.rescue_best_margin)
    slack_max: jnp.ndarray      # max slack of the adopted plan
    exact_margin: jnp.ndarray   # min_k,h (d_exact - comb) of the ADOPTED
                                # plan under exact human responses
    ineq_viol: jnp.ndarray
    eq_viol: jnp.ndarray


def init_carry(ocp: OCP) -> CAMPCCarry:
    return CAMPCCarry(z_prev=jnp.zeros((ocp.cfg.n_z,), jnp.float32),
                      has_prev=jnp.array(False),
                      prev_ok=jnp.array(False),
                      num_prev_used=jnp.int32(0),
                      pred_rob=jnp.zeros((3,), jnp.float32),
                      pred_hums=jnp.zeros((ocp.cfg.num_hums, 2), jnp.float32),
                      door_stall=jnp.int32(0),
                      door_latch=jnp.array(False))


# door-yield behavioral constants (cfg.door_yield). The GEOMETRIC values
# (mouth radius, pass band, pocket placement) are derived per layout from
# DoorParams + the actual wall segments in _yield_geometry below; only the
# layout-independent behavior thresholds remain constants.
_YIELD_TRANSIT_D = 0.30   # goal-estimate displacement that marks "moving"
_YIELD_STALL_V = 0.05     # executed speed below this counts as stalled
# the latch timeout / cooldown economy moved to MPCConfig
# (door_yield_hold_max / door_yield_cooldown) in round 5 so the timeout
# taxonomy's tuning can sweep them per run (--mpc_kw)


def _yield_geometry(state: SimState, cfg: MPCConfig, r_dir, side):
    """Layout-derived door-yield geometry (round-4 generalization of the
    former _YIELD_* position constants, which hard-coded the bottleneck's
    door width 1.0 / walls +-1.0 / radii). Everything scales off
    DoorParams, the robot radius, and the REAL wall segments:

    - r_occ: "in the mouth" disc = door half-width + 0.05;
    - pass_band: committed once the robot center is a robot radius + 0.10
      past the door line;
    - near_d: stall-counting radius around the door center;
    - pocket: the waiting spot. Lateral offset starts just OUTSIDE the
      door's x-span (out of the outflow lane being yielded to) and is
      validated against the actual walls: among a small outward grid of
      candidates at the setback line, take the innermost whose clearance
      from every active wall segment satisfies the MPC's own wall-row
      radius (rob_radius + stat_buf + wall_margin) — the pocket must be a
      point the wall constraint will let the robot reach. If NO lateral
      candidate clears (slanted-jamb layouts like hallway_squeeze where
      the walls converge at the door), fall back to backing straight off
      in-lane at 1.5x the setback.

    At the published bottleneck layout (door 1.0, walls +-1.0,
    rob_radius 0.25, wall_margin 0.10) this reproduces the round-3 tuned
    values exactly: r_occ 0.55, pass_band 0.35, near_d 1.20, pocket at
    (+-0.58, -r_dir 0.90). Returns the pocket (2,); the scalar geometry
    comes from _yield_scalars."""
    door = state.door
    center = jnp.stack([door.x_mid, 0.5 * (door.y_min + door.y_max)])
    pocket_back = 0.9 * door.width

    # wall-row combined radius (mirrors ocp._ineq_groups' stat_buf rule)
    rob_r = state.r_radius
    stat_buf = jnp.where(cfg.max_speed * cfg.dt >= rob_r,
                         cfg.max_speed * cfg.dt - rob_r + 0.01, 0.05)
    comb = rob_r + stat_buf + cfg.wall_margin

    y_p = center[1] - r_dir * pocket_back
    want = 0.5 * door.width + 0.08
    cand_x = door.x_mid + side * (want + jnp.linspace(0.0, 0.6, 8))
    cand = jnp.stack([cand_x, jnp.broadcast_to(y_p, cand_x.shape)], -1)
    # clearance of the whole approach segment (lane center at the setback
    # line -> candidate) from every ACTIVE wall: a bare point-distance test
    # cannot tell a candidate BEHIND a wall (far side, large distance) from
    # a reachable one — the converging-jamb failure mode
    anchor = jnp.stack([door.x_mid, y_p])
    d_walls = jax.vmap(
        lambda c: jnp.min(jnp.where(
            state.wall_mask,
            seg_seg_dist(jnp.broadcast_to(anchor, state.walls[:, 0].shape),
                         jnp.broadcast_to(c, state.walls[:, 0].shape),
                         state.walls[:, 0], state.walls[:, 1]),
            jnp.inf)))(cand)                       # (8,)
    clears = d_walls >= comb
    first = jnp.argmax(clears)                     # innermost clearing cand
    side_pocket = cand[jnp.where(jnp.any(clears), first,
                                 jnp.argmax(d_walls))]
    back_pocket = jnp.stack([door.x_mid, center[1] - r_dir * 1.5 * pocket_back])
    return jnp.where(jnp.any(clears), side_pocket, back_pocket)


def _yield_scalars(state: SimState):
    """(center, r_occ, pass_band, near_d) of the door-yield geometry —
    see _yield_geometry's docstring for the derivation."""
    door = state.door
    center = jnp.stack([door.x_mid, 0.5 * (door.y_min + door.y_max)])
    r_occ = 0.5 * door.width + 0.05
    pass_band = state.r_radius + 0.10
    near_d = r_occ + 0.65
    return center, r_occ, pass_band, near_d


def door_yield_update(state: SimState, h_goal_est, cfg: MPCConfig,
                      door_stall, door_latch):
    """Direction-filtered latched door yielding (cfg.door_yield).

    Round-3 timeout audit: all 32/32 fused-RA-L bottleneck timeouts were
    door-mouth standoffs — the robot wedges at the gap edge, its presence
    freezes the oncoming humans' ORCA LPs, and the slack-penalty optimum
    of the 1 s horizon is to wait out the clock. Iteration history on the
    100-case suite: an ALWAYS-ON depth-priority yield fixed 11/32 of
    those but broke 29 flowing episodes (success 68% -> 50%) — it also
    retreated from SAME-direction traffic it should simply follow through
    the door; a stall-only trigger fixed just 3 (jams do not dissolve
    once formed). Hence this version: a human gets door priority only if
    it is TRANSITING (its intent estimate says it is moving — humans
    parked at a final goal in the mouth are pushed past) AND ONCOMING
    (its intent displacement opposes the robot's crossing direction),
    gated on cfg.door_yield_stall consecutive stalled-near-door steps
    (0 = pre-emptive). Once triggered it LATCHES: the reference goal
    stays at a waiting pocket set back from the door against the side
    wall (outside the outflow lane) until the mouth clears of oncoming
    transiting humans — but only up to cfg.door_yield_hold_max steps: the trace
    audit of the latch-forever variant showed robots parked in the
    pocket from t~3 s to the time limit while the "oncoming" humans
    jammed among themselves and never cleared. A timed-out yield
    releases into a cfg.door_yield_cooldown assert window (trigger off),
    so the robot alternates yield/assert instead of deadlocking in
    either mode. The carry's door_stall counter is dual-purpose:
    unlatched >=0 counts consecutive stalled steps, unlatched <0 counts
    up through the cooldown, latched it counts hold duration. Returns
    (use_pocket, pocket, stall', latch'). Pure behavior deviation from
    the reference (no analog in campc.get_int_goal); config-gated so the
    published plain baselines are unchanged. Geometry is derived per
    layout from DoorParams + the real wall segments (_yield_scalars /
    _yield_geometry), not hard-coded to the bottleneck."""
    door = state.door
    center, r_occ, pass_band, near_d = _yield_scalars(state)
    r_dir = jnp.where(state.r_goal[1] >= state.r_pos[1], 1.0, -1.0)
    # engaged whenever the robot's remaining path crosses the door band
    # (NOT gated on the intermediate goal being active: that switch turns
    # off within door_width/2 of the center — exactly the standoff region)
    ys_min = jnp.minimum(state.r_pos[1], state.r_goal[1])
    ys_max = jnp.maximum(state.r_pos[1], state.r_goal[1])
    crosses = (ys_min < door.y_mid_min) & (ys_max > door.y_mid_max)
    not_through = (state.r_pos[1] - center[1]) * r_dir < pass_band
    engaged = door.has_door & crosses & not_through
    robot_d = norm2(state.r_pos - center)

    h = slice(0, cfg.num_hums)
    h_goal_est = h_goal_est[h]
    h_d = jnp.linalg.norm(state.h_pos[h] - center[None], axis=-1)
    disp = h_goal_est - state.h_pos[h]
    # oncoming = intent opposes the robot's crossing direction; followers
    # (same-direction transit) never get priority — the robot tails them
    oncoming = disp[:, 1] * r_dir < 0.0
    transiting = (state.h_mask[h] & (h_d < r_occ) & oncoming &
                  (jnp.linalg.norm(disp, axis=-1) > _YIELD_TRANSIT_D))
    deeper = transiting & (h_d < robot_d)

    stalled_now = (engaged & (robot_d < near_d) &
                   (norm2(state.r_vel) < _YIELD_STALL_V))
    # unlatched: counter < 0 is the post-timeout cooldown (counts up to 0,
    # trigger suppressed); >= 0 counts consecutive stalled steps
    cnt_unl = jnp.where(door_stall < 0, door_stall + 1,
                        jnp.where(stalled_now, door_stall + 1, jnp.int32(0)))
    trigger = (engaged & (cnt_unl >= 0) &
               (cnt_unl >= cfg.door_yield_stall) & jnp.any(deeper))
    # latched: hold while an oncoming transiting human occupies the mouth,
    # up to the timeout
    cnt_lat = door_stall + 1
    timed_out = cnt_lat >= cfg.door_yield_hold_max
    stay = engaged & jnp.any(transiting) & ~timed_out
    latch_new = jnp.where(door_latch, stay, trigger)
    stall_new = jnp.where(
        door_latch,
        jnp.where(stay, cnt_lat,
                  jnp.where(timed_out,
                            jnp.int32(-cfg.door_yield_cooldown),
                            jnp.int32(0))),
        jnp.where(trigger, jnp.int32(0), cnt_unl))
    use_pocket = latch_new

    # pocket on the side away from the blocking traffic's lateral mean
    blockers = jnp.where(jnp.any(deeper), deeper, transiting)
    wx = jnp.sum(jnp.where(blockers, state.h_pos[h][:, 0] - door.x_mid, 0.0))
    side = jnp.where(wx >= 0.0, -1.0, 1.0)
    pocket = _yield_geometry(state, cfg, r_dir, side)
    return use_pocket, pocket, stall_new, latch_new


def build_params(ocp: OCP, state: SimState, env_cfg: EnvConfig,
                 mid_samples=None, mid_logw0=None,
                 goal_override=None, cost_weights=None) -> MPCParams:
    """SimState -> MPCParams, applying the privileged / unprivileged model
    view (campc.predict:1285-1330): unprivileged replaces human goals with a
    2 s constant-velocity projection and v_pref with the configured bound.
    ``mid_samples`` (S, H, K+2, 2) / ``mid_logw0`` (S,) supply the MID
    forecast grid when cfg.human_pred_mid is on. ``cost_weights``
    (ocp.CostWeights) overrides the Q/R/termQ diagonals per solve — a
    runtime parameter like the reference's (mpc_env_new.py:136-159), so
    online weight tuning reuses the compiled program."""
    cfg = ocp.cfg
    H = cfg.num_hums
    h = slice(0, H)

    v = state.r_vel
    heading = jnp.arctan2(v[1], v[0])
    # wrapped angular distance: jnp.mod(th - heading, 2 pi) < eps misses the
    # -eps side (mod gives 2 pi - eps), randomly flagging forward motion as
    # reverse at float precision
    aligned = jnp.abs(wrap_angle(state.r_theta - heading)) < 1e-3
    speed = norm2(v)
    v_signed = jnp.where(speed < 1e-9, 0.0,
                         jnp.where(aligned, speed, -speed))
    if cfg.robot_nx == 8:
        # RA-L state (mpc_env_new.py:620-660); the accel entries are only
        # cost terms at stage 0 and start from the measured rates
        x0_rob = jnp.stack([
            state.r_pos[0], state.r_pos[1],
            jnp.sin(state.r_theta), jnp.cos(state.r_theta),
            v_signed, state.r_omega,
            jnp.float32(0.0), jnp.float32(0.0)])
    else:
        x0_rob = jnp.stack([state.r_pos[0], state.r_pos[1], state.r_theta,
                            v_signed])

    if cfg.priviledged_info:
        goals = state.h_goal[h]
        v_max = state.h_v_pref[h]
    else:
        goals = state.h_pos[h] + state.h_vel[h] * 2.0
        v_max = jnp.full((H,), cfg.human_max_speed)

    hums0 = jnp.concatenate([state.h_pos[h], state.h_vel[h], goals], axis=-1)

    # robot intermediate goal through hallway doors (campc.get_int_goal)
    goal = intermediate_goals(state.r_pos[None], state.r_goal[None],
                              state.door)[0]
    if goal_override is not None:
        # door-yield waiting pocket (campc_action computes the latched
        # stall-triggered protocol; see door_yield_update)
        use_pocket, pocket = goal_override
        goal = jnp.where(use_pocket, pocket, goal)

    if cfg.ref_type == "point_stab":
        # rolled rotate/cruise/arrive reference regenerated each control
        # step (sicnav_acados.py get_ref_traj:648-670 point_stab branch)
        poses, ref_act = point_stab_reference(
            state.r_pos, state.r_theta, goal, cfg.K, cfg.dt,
            cfg.pref_speed, cfg.max_rot, state.r_radius)
        if cfg.robot_nx == 8:
            # the RA-L cost tracks the FULL reference state incl. speed
            # (mpc_env_new.get_cost_eqn:345 residual X[4:] - Xr[4:]; the
            # reference's goal_states carry the rolled cruise speeds) —
            # v_ref at stage k is the action that reaches pose k
            v_ref = jnp.concatenate([ref_act[0:1, 0], ref_act[:, 0]])[:, None]
            x_ref = jnp.concatenate(
                [poses[:, :2], jnp.sin(poses[:, 2:3]),
                 jnp.cos(poses[:, 2:3]), v_ref], axis=-1)
        else:
            x_ref = poses[:, :2]
    elif cfg.robot_nx == 8:
        # goal-tile: reference includes the goal heading (sin/cos) and the
        # cruise speed; driving toward the goal direction subsumes the
        # rotate-in-place phase
        to_goal = goal - state.r_pos
        ref_th = jnp.arctan2(to_goal[1], to_goal[0])
        v_ref = jnp.where(norm2(to_goal) > state.r_radius,
                          cfg.pref_speed, 0.0)
        x_ref = jnp.tile(jnp.concatenate(
            [goal, jnp.sin(ref_th)[None], jnp.cos(ref_th)[None],
             v_ref[None]])[None], (cfg.K + 1, 1))
    else:
        x_ref = jnp.tile(goal[None], (cfg.K + 1, 1))
    inflation = 0.01 + cfg.orca_params.safety_space
    n_s = max(cfg.num_mid_samples, 1)
    if mid_samples is None:
        # dummy grid: constant-velocity continuation of the current state
        steps = jnp.arange(cfg.K + 2)[None, :, None] * cfg.dt
        cv = state.h_pos[h][:, None, :] + state.h_vel[h][:, None, :] * steps
        mid_samples = jnp.broadcast_to(cv[None], (n_s, H, cfg.K + 2, 2))
    if mid_logw0 is None:
        mid_logw0 = jnp.full((n_s,), -jnp.log(n_s))
    return MPCParams(
        x0_rob=x0_rob, goal=goal, hums0=hums0,
        hum_radii=state.h_radius[h] + inflation,
        hum_coll_radii=state.h_radius[h],
        v_max_prefs=v_max,
        rob_radius=state.r_radius,
        walls=state.walls[:cfg.num_walls],
        wall_mask=state.wall_mask[:cfg.num_walls],
        x_ref=x_ref,
        mid_samples=mid_samples, mid_logw0=mid_logw0,
        cost_w=(cfg.default_weights() if cost_weights is None
                else cost_weights))


def _shift_guess(ocp: OCP, z_prev, params: MPCParams):
    """bring_fwd (campc.py:539-566): shift the previous solution one stage
    and fill the tail with a one-step warmstart from the rolled-out state."""
    cfg = ocp.cfg
    u_rob, u_hums, lam, slacks = ocp.unpack(z_prev)
    u_rob = jnp.concatenate([u_rob[1:], u_rob[-1:]], 0)
    u_hums = jnp.concatenate([u_hums[1:], u_hums[-1:]], 0)
    lam = jnp.concatenate([lam[1:], lam[-1:]], 0)
    # recompute the final stage from the rolled state
    X_rob, X_hums = ocp.rollout(params, u_rob, u_hums)
    k_last = cfg.K_orca - 1
    uh, lm = jax.vmap(lambda a: WS.solve_human_step(
        ocp, params, X_rob[k_last], X_hums[k_last], a))(jnp.arange(cfg.num_hums))
    u_hums = u_hums.at[k_last].set(uh)
    lam = lam.at[k_last].set(lm)
    return ocp.pack(u_rob, u_hums, lam, slacks)


def reuse_limit(cfg: MPCConfig):
    """The reference's ``reuse_K`` previous-solution budget (campc.py:121-123):
    unlimited with warmstart + the embedded-KKT model, else the ORCA-KKT
    horizon (KKT model) / the full horizon (CVMM). Returns None for
    unlimited."""
    if cfg.hum_model == "orca_casadi_kkt":
        return None if cfg.warmstart else max(cfg.K_orca, 0)
    return cfg.K


def _rob_pose(ocp: OCP, xr):
    sin_t, cos_t = ocp.rob_heading(xr)
    return jnp.stack([xr[0], xr[1], jnp.arctan2(sin_t, cos_t)])


def _select_guess(ocp: OCP, carry: CAMPCCarry, params: MPCParams):
    """Warmstart-or-shifted-previous guess selection (campc.py:595-707):
    the shifted previous solution is used while the consecutive-failure
    counter is under ``reuse_K`` AND the world evolved the way the previous
    solution predicted — the bring_fwd discrepancy test (campc.py:546-550)
    rebuilds the fresh feasible warmstart when the observed robot pose
    deviates > 1e-2 or any human position deviates > rob_rad_buffer.
    Without this check a model-vs-sim divergence (e.g. a wall clamp the
    model didn't predict) turns the shifted guess into a self-perpetuating
    fixpoint of huge-slack plans."""
    z_fresh = ocp.infer_slacks(WS.warmstart_horizon(ocp, params), params)
    return _select_from_fresh(ocp, carry, params, z_fresh)


def _select_from_fresh(ocp: OCP, carry: CAMPCCarry, params: MPCParams,
                       z_fresh):
    """_select_guess body with the fresh warmstart precomputed (the
    multi-start path reuses it as its own start instead of rolling the
    warmstart scan twice)."""
    cfg = ocp.cfg
    limit = reuse_limit(cfg)
    counter_ok = (jnp.array(True) if limit is None
                  else carry.num_prev_used < limit)

    cur_rob = _rob_pose(ocp, params.x0_rob)
    d_rob = jnp.abs(cur_rob - carry.pred_rob)
    d_rob = d_rob.at[2].set(jnp.abs(wrap_angle(cur_rob[2] -
                                               carry.pred_rob[2])))
    hums_xy = params.hums0[:, :2]
    d_hum = jnp.linalg.norm(hums_xy - carry.pred_hums, axis=-1)
    consistent = (jnp.all(d_rob <= 1e-2) &
                  jnp.all(d_hum <= cfg.rob_rad_buffer))

    use_prev = carry.has_prev & carry.prev_ok & counter_ok & consistent
    z_shift = _shift_guess(ocp, jnp.where(use_prev, carry.z_prev, z_fresh),
                           params)
    z_shift = ocp.infer_slacks(z_shift, params)
    z_guess = jnp.where(use_prev, z_shift, z_fresh)
    return jnp.where(jnp.all(jnp.isfinite(z_guess)), z_guess, z_fresh)


def _brake_profile(ocp: OCP, params: MPCParams):
    """Robot brake control plan (K, 2): decelerate at max_l_dcc to a stop,
    no rotation — the emergency-brake maneuver as a full-horizon plan."""
    cfg = ocp.cfg
    v0 = ocp.rob_v_prev(params.x0_rob)
    ks = jnp.arange(1, cfg.K + 1, dtype=jnp.float32)
    v = jnp.maximum(v0 + cfg.max_l_dcc * cfg.dt * ks, 0.0)
    return jnp.stack([v, jnp.zeros_like(v)], -1)


def _min_wall_clearance(params: MPCParams, Xr):
    """Min robot-circle clearance to the active wall segments over a
    rollout's robot states (inf when no walls)."""
    d_w = jax.vmap(lambda wall, wmask: jnp.where(
        wmask,
        jnp.min(jax.vmap(lambda q: point_to_segment_dist(
            wall[0], wall[1], q))(Xr[:, :2])),
        jnp.inf))(params.walls, params.wall_mask)
    return jnp.min(d_w) - params.rob_radius


def _evasive_brake_action(ocp: OCP, params: MPCParams):
    """Max-margin emergency-brake maneuver: instead of decelerating in a
    straight line (the reference's brake, campc.py:754-786), evaluate a
    small fan of constant-turn-rate decel plans (straight, half/full rate
    left and right) against the EXACT lower-level human rollout and the
    wall segments, and execute the first action of the plan with the
    largest worst-case clearance.

    Motivation (round-4 taxonomy, BENCH_EXTRA): with tiered multi-start,
    every residual collision was `ebrake`-class — the cascade correctly
    refused all candidate plans as exact-rollout-infeasible, and the
    stop-in-place brake was then hit anyway. When every plan is doomed,
    steering toward the emptiest direction while shedding speed collides
    later and shallower than freezing on the spot. One vmapped 5-candidate
    exact rollout, evaluated only inside the brake branch (lax.cond)."""
    cfg = ocp.cfg
    v0 = ocp.rob_v_prev(params.x0_rob)
    ks = jnp.arange(1, cfg.K + 1, dtype=jnp.float32)
    v = jnp.maximum(v0 + cfg.max_l_dcc * cfg.dt * ks, 0.0)
    omegas = jnp.array([0.0, 0.5, -0.5, 1.0, -1.0], jnp.float32) * cfg.max_rot
    comb = params.hum_coll_radii + params.rob_radius

    def margin_of(om):
        u = jnp.stack([v, jnp.full_like(v, om)], -1)
        Xr, Xh = WS.exact_human_rollout(ocp, params, u)
        d_h = jnp.linalg.norm(Xr[:, None, :2] - Xh[:, :, :2], axis=-1)
        m_h = jnp.min(d_h - comb[None, :])
        # a steer-away brake must not trade the human miss for a wall hit:
        # rank by the worst of the two clearances
        return jnp.minimum(m_h, _min_wall_clearance(params, Xr))

    margins = jax.vmap(margin_of)(omegas)
    om_best = omegas[jnp.argmax(margins)]
    return jnp.stack([v[0], om_best])


def _dodge_goal(params: MPCParams):
    """Laterally offset pull target for the side-step start: a point ~1.5 m
    ahead on the goal line, displaced 0.8 m perpendicular AWAY from the
    crowd's lateral mean. Only the warmstart's preferred velocity uses it —
    the NLP still optimizes the true cost, so the side-step start simply
    seeds a different homotopy basin (pass-left vs pass-right vs yield),
    which a local NLP solver cannot cross on its own."""
    pos = params.x0_rob[:2]
    to_goal = params.goal - pos
    d = norm2(to_goal)
    dirv = to_goal / jnp.maximum(d, 1e-6)
    perp = jnp.stack([-dirv[1], dirv[0]])
    lat = jnp.sum((params.hums0[:, :2] - pos[None]) * perp[None], -1)
    side = jnp.where(jnp.sum(lat) >= 0.0, -1.0, 1.0)
    return pos + dirv * jnp.minimum(d, 1.5) + perp * (side * 0.8)


def _build_starts(ocp: OCP, carry: CAMPCCarry, params: MPCParams):
    """The cfg.multi_start parallel initial guesses, stacked (M, n_z), plus
    the selected cascade guess. Order: [selected (shift-or-fresh), fresh
    ORCA warmstart, brake profile, lateral side-step]. Every start is
    KKT-consistent (exact lower-level human primals + polished duals) so
    each seeds a distinct basin of the nonconvex NLP; the vmapped IPM
    solves all of them as one batched program (the cascade fix the
    reference cannot afford with serial IPOPT, campc.py:684-832)."""
    cfg = ocp.cfg
    z_fresh = ocp.infer_slacks(WS.warmstart_horizon(ocp, params), params)
    z_sel = _select_from_fresh(ocp, carry, params, z_fresh)
    zs = [z_sel, z_fresh]
    if cfg.multi_start > 2:
        zs.append(WS.z_from_robot_plan(ocp, params,
                                       _brake_profile(ocp, params)))
    if cfg.multi_start > 3:
        zs.append(ocp.infer_slacks(WS.warmstart_horizon(
            ocp, params._replace(goal=_dodge_goal(params))), params))
    return z_sel, jnp.stack(zs[:cfg.multi_start])


def exact_plan_margin(ocp: OCP, params: MPCParams, u_rob, horizon: int = 0):
    """Min human-collision margin of a robot plan replayed against EXACT
    lower-level human responses (the brake_on_unreal_guess gate).
    horizon > 0 restricts the check to the first `horizon` stages
    (imminent contact only); 0 scans the full horizon."""
    Xr, Xh = WS.exact_human_rollout(ocp, params, u_rob)
    d = jnp.linalg.norm(Xr[:, None, :2] - Xh[:, :, :2], axis=-1)
    m = d - (params.hum_coll_radii[None, :] + params.rob_radius)
    if horizon > 0:
        m = m[:horizon + 1]
    return jnp.min(m)


@functools.partial(jax.jit,
                   static_argnames=("ocp", "env_cfg", "settings", "debug",
                                    "aux"))
def campc_action(ocp: OCP, state: SimState, carry: CAMPCCarry,
                 env_cfg: EnvConfig,
                 settings: ipm.IPMSettings = ipm.IPMSettings(),
                 mid_samples=None, mid_logw0=None, debug: bool = False,
                 aux: bool = False, h_intent=None, cost_weights=None):
    """One CAMPC control step. Returns (action (2,) = (v, r=om*dt), carry');
    with ``debug=True`` also a ``introspection.SolveDebug`` pytree (the
    reference's per-solve debug_material, campc.py:861-979); with
    ``aux=True`` instead a light ``CAMPCAux`` scalar pytree for rollout
    tracing.

    Note: the debug path never escalates (cfg.adaptive_effort is ignored
    when ``debug=True`` — iteration traces need ipm.solve's fixed-trip
    scan, which rejects n_iter_dyn). To trace what an escalated step
    computes, pass settings with n_iter = n_iter + adaptive_effort; a
    debug solve therefore matches the production solve only on
    non-escalated steps of an adaptive-effort run."""
    cfg = ocp.cfg
    if cfg.door_yield:
        # intent estimate for the transit-vs-parked test: callers with a
        # better signal pass h_intent (the fused controller passes the raw
        # observed h_goal — its mpc_view h_goal is the t+1 forecast, whose
        # one-step displacement is ~0 for door-BLOCKED humans, misreading
        # them as parked); default = the privilege-respecting goal model
        if h_intent is None:
            h_intent = (state.h_goal if cfg.priviledged_info
                        else state.h_pos + state.h_vel * 2.0)
        use_pocket, pocket, door_stall, door_latch = door_yield_update(
            state, h_intent, cfg, carry.door_stall, carry.door_latch)
        goal_override = (use_pocket, pocket)
    else:
        door_stall, door_latch = carry.door_stall, carry.door_latch
        goal_override = None
    params = build_params(ocp, state, env_cfg, mid_samples, mid_logw0,
                          goal_override=goal_override,
                          cost_weights=cost_weights)

    f_fn = lambda z: ocp.cost(z, params)
    ce_fn = lambda z: ocp.eq_residuals(z, params)
    ci_fn = lambda z: ocp.ineq_residuals(z, params)
    comb = params.hum_coll_radii + params.rob_radius + cfg.rob_rad_buffer

    def plan_margin(u_rob_plan):
        # reality check: replay a robot plan against EXACT lower-level
        # human responses (the reference audits solutions the same way via
        # the real RVO2 callback, campc.calc_actual_orca_for_x_val:
        # 1135-1156); plans that only avoid collisions under
        # unconverged-KKT humans get a negative margin
        Xr_ex, Xh_ex = WS.exact_human_rollout(ocp, params, u_rob_plan)
        d_ex = jnp.linalg.norm(Xr_ex[:, None, :2] - Xh_ex[:, :, :2], axis=-1)
        m = jnp.min(d_ex - comb[None, :])
        if cfg.wall_aware_realism:
            # also refuse plans whose exact replay scrapes a wall — the
            # slacked wall rows let the NLP trade wall violation for
            # progress (round-3 taxonomy: half the wall scrapes are
            # model_mismatch on SUCCESSFUL solves); with multi-start the
            # rescue basins then take over exactly on those steps
            m = jnp.minimum(m, _min_wall_clearance(params, Xr_ex))
        return m

    # failure-triggered effort escalation (cfg.adaptive_effort): a step
    # whose previous solve was cascade-rejected gets extra IPM iterations
    # as a TRACED budget — same compiled program, more grinding exactly
    # inside the consecutive-failure windows the collision taxonomy blames
    n_dyn = None
    if cfg.adaptive_effort > 0 and not debug:
        n_dyn = jnp.int32(settings.n_iter) + jnp.where(
            carry.has_prev & ~carry.prev_ok,
            jnp.int32(cfg.adaptive_effort), jnp.int32(0))

    if debug or cfg.multi_start <= 1:
        # single-start (reference-shaped cascade); debug traces need the
        # one-solve iteration history, so debug always takes this path
        z_guess = _select_guess(ocp, carry, params)
        if debug:
            z_sol, info, raw_trace = ipm.solve(f_fn, ce_fn, ci_fn, z_guess,
                                               settings, return_trace=True)
        else:
            z_sol, info = ipm.solve(f_fn, ce_fn, ci_fn, z_guess, settings,
                                    n_iter_dyn=n_dyn)
        sol_margin = plan_margin(ocp.unpack(z_sol)[0])
    else:
        # batched multi-start: one vmapped IPM solve over all starts, then
        # adopt the best exact-rollout-feasible solution by cost
        z_guess, starts = _build_starts(ocp, carry, params)
        z_sols, infos = jax.vmap(
            lambda z0: ipm.solve(f_fn, ce_fn, ci_fn, z0, settings,
                                 n_iter_dyn=n_dyn))(starts)
        costs = jax.vmap(f_fn)(z_sols)
        finite = jnp.all(jnp.isfinite(z_sols), axis=-1)
        feas = finite & (infos.ineq_viol < 1e-2) & (infos.eq_viol < 1e-1)
        margins = jax.vmap(lambda z: plan_margin(ocp.unpack(z)[0]))(z_sols)
        ok = feas & (margins > cfg.accept_margin)
        # TIERED selection (round-4 probe: a flat min-cost over all starts
        # let the brake/side-step basins win whenever congestion made
        # slack savings beat tracking cost — success 69% vs 78% control,
        # BENCH_EXTRA round-4 probes): the goal-directed starts
        # [selected, fresh] are the primary tier; the brake/side-step
        # rescue basins are only eligible when NO primary solution is
        # feasible-realistic — exactly the situation the round-3 taxonomy
        # blamed on the stale single guess.
        n_primary = min(2, cfg.multi_start)
        primary = jnp.arange(cfg.multi_start) < n_primary
        ok_primary = jnp.any(ok & primary)
        eligible = ok & jnp.where(ok_primary, primary, True)
        score = jnp.where(eligible & jnp.isfinite(costs), costs, jnp.inf)
        idx = jnp.where(jnp.any(eligible), jnp.argmin(score),
                        jnp.argmin(costs))
        z_sol = z_sols[idx]
        info = jax.tree.map(lambda x: x[idx], infos)
        sol_margin = margins[idx]
        # best-exact-margin start for the rescue branch (cfg.
        # rescue_best_margin): vetted by the same exact rollout that
        # rejected everything else, and free — margins are already here
        m_idx = jnp.argmax(jnp.where(finite, margins, -jnp.inf))
        z_mbest = z_sols[m_idx]
        m_best = jnp.where(jnp.any(finite), margins[m_idx], -jnp.inf)

    # --- failure cascade --------------------------------------------------
    sol_cost = ocp.cost(z_sol, params)
    guess_cost = ocp.cost(z_guess, params)
    sol_finite = jnp.all(jnp.isfinite(z_sol))
    sol_feasible = sol_finite & (info.ineq_viol < 1e-2) & (info.eq_viol < 1e-1)
    # cfg.accept_margin > 0 refuses razor-thin plans (see MPCConfig); the
    # emergency-brake gate below stays at 0 so a thin-but-clear adopted
    # guess still executes rather than over-braking
    sol_realistic = sol_margin > cfg.accept_margin
    # reference: keep warmstart when the "optimized" value is worse (:695-707).
    # Multi-start refinement: the guess only wins on cost if it is itself
    # exact-rollout-realistic — otherwise a cheap-but-colliding guess would
    # shadow a realistic (possibly pricier, e.g. brake/side-step) solution,
    # exactly the stale-single-guess failure multi-start exists to fix.
    cost_worse = sol_cost > guess_cost
    if cfg.multi_start > 1 and not debug:
        cost_worse = cost_worse & (plan_margin(ocp.unpack(z_guess)[0])
                                   > cfg.accept_margin)
    use_guess = (~sol_feasible) | (~sol_realistic) | cost_worse
    z_used = jnp.where(use_guess, z_guess, z_sol)

    # emergency brake if even the guess is broken (:754-786); with
    # cfg.brake_on_unreal_guess, also brake when the adopted guess's own
    # exact-rollout predicts a collision (cascade tightening — extends the
    # reference's solution audit, calc_actual_orca_for_x_val:1135-1156,
    # to the fallback branch)
    guess_ok = jnp.all(jnp.isfinite(z_guess))
    if cfg.brake_on_unreal_guess:
        u_rob_g, _, _, _ = ocp.unpack(z_guess)

        def _guess_margin(_):
            return exact_plan_margin(ocp, params, u_rob_g,
                                     cfg.brake_horizon)

        # the margin only gates the brake when the guess is ADOPTED —
        # lax.cond skips the extra exact rollout on successful solves in
        # the unbatched real-time path (vmapped fleets select both sides)
        margin_g = jax.lax.cond(use_guess, _guess_margin,
                                lambda _: jnp.float32(jnp.inf), None)
        guess_ok = guess_ok & (margin_g > cfg.brake_margin)
    use_rescue = jnp.array(False)
    if cfg.rescue_best_margin and cfg.multi_start > 1 and not debug:
        # cascade level between "adopt guess" and "e-brake": when the
        # guess fails its gate, execute the best-exact-margin start if
        # ITS margin clears the same gate — a moving, vetted plan beats
        # stopping in the door (queue9: parked robots collect the
        # collisions the refusal was meant to avoid)
        use_rescue = (use_guess & ~guess_ok & jnp.all(jnp.isfinite(z_mbest))
                      & (m_best > cfg.brake_margin))
        z_used = jnp.where(use_rescue, z_mbest, z_used)
    u_rob, _, _, _ = ocp.unpack(z_used)
    exec_plan = guess_ok | ~use_guess | use_rescue
    if cfg.evasive_brake:
        # max-margin brake fan; lax.cond keeps the 5-candidate exact
        # rollout off the happy path in the unbatched real-time program
        action_u = jax.lax.cond(
            exec_plan, lambda _: u_rob[0],
            lambda _: _evasive_brake_action(ocp, params), None)
    else:
        v_brake = jnp.maximum(
            ocp.rob_v_prev(params.x0_rob) + cfg.max_l_dcc * cfg.dt, 0.0)
        action_u = jnp.where(exec_plan, u_rob[0],
                             jnp.stack([v_brake, jnp.float32(0.0)]))

    action = jnp.stack([action_u[0], action_u[1] * cfg.dt])
    # stage-1 prediction of the adopted plan: the next step's bring_fwd
    # discrepancy anchor (campc.py:546-550)
    u_rob_used, u_hums_used, _, _ = ocp.unpack(z_used)
    Xr_used, Xh_used = ocp.rollout(params, u_rob_used, u_hums_used)
    carry_new = CAMPCCarry(
        z_prev=z_used, has_prev=jnp.array(True),
        prev_ok=~use_guess,
        num_prev_used=jnp.where(use_guess, carry.num_prev_used + 1,
                                jnp.int32(0)),
        pred_rob=_rob_pose(ocp, Xr_used[1]),
        pred_hums=Xh_used[1][:, :2],
        door_stall=door_stall, door_latch=door_latch)
    if aux:
        _, _, _, slacks_used = ocp.unpack(z_used)
        # exact-rollout margin of the ADOPTED plan (may be the guess)
        Xr_a, Xh_a = WS.exact_human_rollout(ocp, params, u_rob_used)
        d_a = jnp.linalg.norm(Xr_a[:, None, :2] - Xh_a[:, :, :2], axis=-1)
        step_aux = CAMPCAux(
            use_guess=use_guess,
            sol_feasible=sol_feasible,
            sol_realistic=sol_realistic,
            cost_worse=cost_worse,
            braked=use_guess & ~guess_ok & ~use_rescue,
            rescued=use_rescue,
            slack_max=jnp.max(jnp.concatenate(
                [jnp.atleast_1d(x) for x in slacks_used])),
            exact_margin=jnp.min(d_a - comb[None, :]),
            ineq_viol=info.ineq_viol, eq_viol=info.eq_viol)
        return action, carry_new, step_aux
    if debug:
        from sicnav_tpu.mpc import introspection as IN
        _, _, _, slacks_used = ocp.unpack(z_used)
        u_rob_g, u_hums_g, _, _ = ocp.unpack(z_guess)
        Xr_g, _ = ocp.rollout(params, u_rob_g, u_hums_g)
        dbg = IN.SolveDebug(
            trace=IN.IterTrace(*raw_trace),
            info=info,
            viol_sol=IN.constraint_report(ocp, z_sol, params),
            viol_used=IN.constraint_report(ocp, z_used, params),
            used_guess=use_guess,
            sol_cost=sol_cost, guess_cost=guess_cost,
            slack_max=jnp.max(jnp.concatenate(
                [jnp.atleast_1d(x) for x in slacks_used])),
            plan=Xr_used[:, :2],
            guess_plan=Xr_g[:, :2],
            human_plans=jnp.swapaxes(Xh_used[:, :, :2], 0, 1))
        return action, carry_new, dbg
    return action, carry_new


def make_policy(env_cfg: EnvConfig, mpc_cfg: Optional[MPCConfig] = None,
                settings: Optional[ipm.IPMSettings] = None):
    """Build (ocp, policy_fn) where policy_fn(state, carry) -> (action, carry)."""
    if mpc_cfg is None:
        mpc_cfg = MPCConfig(num_hums=env_cfg.max_humans,
                            num_walls=env_cfg.wall_slots,
                            dt=env_cfg.dt)
    ocp = OCP(mpc_cfg)
    if settings is None:
        # per-crowd-size iteration caps ("To run at 10 Hz",
        # campc_acados_opt.py:411-439)
        settings = ipm.realtime_settings(mpc_cfg.num_hums)

    def policy_fn(state: SimState, carry: CAMPCCarry):
        return campc_action(ocp, state, carry, env_cfg, settings)

    return ocp, policy_fn
