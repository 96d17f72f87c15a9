"""CAMPC optimal control problem: cost, dynamics rollout, constraints.

TPU-native re-formulation of the reference NLP (sicnav/policy/campc.py
get_opti_dict:191-510 + sicnav/utils/mpc_utils/mpc_env.py): instead of a
CasADi Opti multiple-shooting program solved by IPOPT, the OCP is a pure
function of a single dense decision vector

    z = [U_rob (K,2) | U_hums (K_orca,H,3) | Lambda (K_orca,H,n_lam) | slacks]

with states eliminated by a ``lax.scan`` rollout (single shooting). Every
constraint class of the reference is reproduced, including the per-human
ORCA-KKT embedding (stationarity + complementarity with rho=1e-10,
mpc_env.py:611-641), the class-shared scaled slack variables with their
exact penalty coefficients (campc.py:217-243,280-330), and the
degeneracy-breaking random jitter (mpc_env.py:527-596, seeded rng(5)).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from sicnav_tpu.mpc import orca_lines as OL
from sicnav_tpu.ops.geometry import dot2

SLACK_SCALING = 1e-3       # campc.py:219
SLACK_PENAL = 1e9          # campc.py:220
KKT_RHO = 1e-10            # mpc_env.py:637


@dataclasses.dataclass(frozen=True)
class MPCConfig:
    """Static CAMPC configuration (defaults = sicnav/configs/policy.config)."""
    horiz: int = 4                    # K
    orca_kkt_horiz: int = 4           # K_orca (0 => = horiz)
    hum_model: str = "orca_casadi_kkt"   # "orca_casadi_kkt" | "cvmm"
    # reference trajectory mode ([campc] ref_type = point_stab default):
    # "point_stab" rolls the multi-phase rotate/cruise/arrive unicycle
    # reference (mpc/ref_traj.py); "goal_tile" repeats the goal pose.
    ref_type: str = "point_stab"
    # warmstart toggle ([campc] warmstart): with the KKT model it also makes
    # the previous-solution reuse budget unlimited (campc.py:121-123)
    warmstart: bool = True
    num_hums: int = 3
    num_walls: int = 4
    soft_constraints: bool = True
    priviledged_info: bool = False
    human_max_speed: float = 0.5      # v-max assumption when unprivileged
    # robot limits ([mpc_env])
    pref_speed: float = 0.90
    max_speed: float = 0.95
    max_rev_speed: float = 0.95
    max_rot: float = float(60.0 * np.pi / 180.0)
    max_l_acc: float = 0.5
    max_l_dcc: float = -1.5
    rob_rad_buffer: float = 0.02
    orca_ksi_scaling: float = 1e-2
    orca_vxy_scaling: float = 1.0
    # MPC-internal ORCA model params ([humans] of policy.config)
    orca_time_horizon: float = 2.5
    orca_time_horizon_obst: float = 1.5
    dt: float = 0.25
    # cost: T-RO hardcoded weights (mpc_env.py:104-107); the RA-L 8-state
    # mode uses the diag-parameterized weights of policy.config
    # (mpc_env_new.get_cost_eqn:320-351)
    term_q_coeff: float = 100.0
    r_om: float = 0.1
    # robot state model: 4 = T-RO [x,y,th,v_prev]; 8 = RA-L
    # [x,y,sin th,cos th,v_prev,om_prev,vdot,omdot] (mpc_env_new.py:620-660)
    robot_nx: int = 4
    q_x: float = 1.0
    q_y: float = 1.0
    q_theta: float = 0.05
    q_v_prev: float = 2.5
    q_om_prev: float = 0.0
    q_v_prev_dot: float = 3.5
    q_om_prev_dot: float = 0.1
    term_q_theta: float = 2.0
    # MID-driven human goals (SICNav-Diffusion, mpc_env_new.py:380-520)
    human_pred_mid: bool = False
    mid_stateful_weights: bool = True
    num_mid_samples: int = 1
    # hums-close-to-preds soft constraint (mpc_env_new.py:1454-1528);
    # separable from the weighted-goal dynamics for A/B studies
    close_to_preds: bool = True
    # RA-L momentum-blended warmstart pref-vel (orca_casadi_new.py:729-775,
    # 95% momentum). Measured closed-loop the blend makes the warmstart
    # crawl from rest (v <- 0.95 v + 0.05 goal-pull, ~5 s time constant)
    # and our cascade adopts warmstarts more often than Acados SQP does,
    # so it is opt-in here
    momentum_warmstart: bool = False
    # robot capsule collision model (mpc_env_new.get_rob_coll_capsule:971):
    # half-length = 0.5 len + len_buffer - 0.5 (wid + wid_buffer), radius =
    # hum_r + 0.5 (wid + wid_buffer); with len = wid = 2 robot_radius the
    # capsule degenerates to the circle model, exactly as the reference's
    # 0.5 x 0.5 sim robot does (env.config:58-60, buffers policy.config:47)
    robot_capsule: bool = False
    rob_len: float = 0.6
    rob_wid: float = 0.6
    rob_len_buffer: float = 0.01
    rob_wid_buffer: float = 0.01
    # stage-indexed collision-margin growth (extension beyond the reference:
    # robust-horizon tightening for model-prediction error growth; 0 = off).
    # Applies to both the circle and capsule human-collision rows.
    stage_margin: float = 0.0
    # flat extra clearance on the robot-wall capsule rows (the wall rows are
    # slacked, so near boundaries the solver trades slack penalty for
    # progress — a margin restores clearance without hardening the rows).
    # Default ON (round-3 A/B: +4 pts success, wall-episodes halved on the
    # 25-case bottleneck slice; no cost at 100 cases).
    wall_margin: float = 0.05
    # hard short-horizon wall rows (round-4, VERDICT r3 #7): the slacked
    # wall rows let the real-time solver trade small wall violations for
    # progress under the acados penalties — the round-3 taxonomy attributes
    # half the wall scrapes to successful solves with model_mismatch. With
    # hard_wall_stages = n > 0, the robot-wall rows at stages 1..n are NOT
    # slack-shifted (hard), the rest stay slacked — mirroring the
    # reference exporter's SLACKED/HARD constraint sorting
    # (campc_acados_opt.py:264-374, which keeps some rows out of the slack
    # set). Stage 0 is the measured state and must remain slacked (it is
    # not decidable by the controls; hard would make the NLP infeasible
    # with no recourse whenever the sim wall clamp already nudged the
    # robot inside the margin).
    hard_wall_stages: int = 0
    # cascade tightening (round-3 safety audit): when the cascade adopts
    # the guess, ALSO reality-check the guess plan against the exact
    # lower-level human responses and fall through to the emergency brake
    # if the guess itself is in predicted collision. The reference's
    # cascade brakes only when no plan is available (campc.py:754-786);
    # this extends the same exact-rollout audit it applies to solutions
    # (calc_actual_orca_for_x_val:1135-1156) to adopted guesses. Default
    # ON: the round-3 taxonomy traced EVERY bottleneck collision episode
    # to cascade steps executing negative-margin guesses; this flag cuts
    # collision-episodes 10% -> 4% (fused) and 11% -> 4% (plain) on the
    # 100-case suite at unchanged success.
    brake_on_unreal_guess: bool = True
    # evasive brake (round-4 taxonomy follow-up): when the cascade falls
    # through to the emergency brake, pick the first action of the
    # max-clearance member of a 5-candidate constant-turn-rate decel fan
    # (straight, half/full rate left/right), each reality-checked against
    # the exact lower-level human rollout AND the wall segments — instead
    # of the reference's stop-in-place decel (campc.py:754-786). Under
    # tiered multi-start every residual collision was `ebrake`-class
    # (the brake itself was hit); steering toward the emptiest direction
    # while shedding speed is strictly better ranked by worst-case
    # clearance. OFF by default pending the TPU probe (published rows
    # were measured with the straight brake).
    evasive_brake: bool = False
    # wall-aware exact-rollout realism (round-4, VERDICT r3 #7): the
    # plan_margin reality check historically scored HUMAN clearance only,
    # so solutions whose exact replay scrapes a wall still read as
    # "realistic" and get adopted (the round-3 wall taxonomy's
    # model_mismatch class: successful solves, predicted clearance, sim
    # scrape). When ON, plan_margin is min(human margin, wall clearance),
    # demoting wall-scraping plans in the multi-start tiers and the
    # single-start acceptance alike. OFF by default pending the TPU probe
    # (published rows were measured human-only).
    wall_aware_realism: bool = False
    # minimum exact-rollout clearance (m) a plan must keep to count as
    # realistic (round-4): the ms4-tiered taxonomy's residual collisions
    # are all ebrake-class with margins already at -0.01..-0.25 m when the
    # brake engages — by then no maneuver (including the evasive fan, e2
    # probe) clears. Raising the acceptance bar above 0 refuses the
    # razor-thin plans that put the robot in that cornered state a step
    # earlier, while the multi-start rescue basins supply an alternative.
    # 0.0 = the reference semantics (any positive margin accepted).
    accept_margin: float = 0.0
    # minimum exact-rollout clearance (m) the ADOPTED GUESS must keep
    # before the e-brake fires (the brake_on_unreal_guess gate). The e3
    # taxonomy shows every residual collision window executed a
    # thin-positive-margin guess for 2-3 steps before the gate (at 0)
    # finally tripped with margin already negative — too late for any
    # brake maneuver. brake_margin > 0 trips the brake those 2-3 steps
    # earlier. 0.0 = reference semantics; pairs with evasive_brake so the
    # earlier brake steers instead of freezing in the lane.
    brake_margin: float = 0.0
    # multi-start only: when the cascade has rejected the solve AND the
    # adopted guess fails its brake gate (the exact window where every
    # residual ebrake-class collision happens — queue9 showed refusing
    # plans EARLIER just converts near-misses into parked collisions),
    # execute the start whose EXACT-rollout margin is best instead of
    # braking in the humans' lane — the batched multi-start already
    # computed every start's margin, so the rescue is free. The e-brake
    # remains the last resort when even the best start's margin fails the
    # brake gate. Extends the reference's cascade (campc.py:722-832)
    # with an option IPOPT could never afford: a vetted alternative PLAN,
    # not just a stop.
    rescue_best_margin: bool = False
    # number of leading horizon stages the brake_on_unreal_guess margin is
    # evaluated over (0 = full horizon). The taxonomy's collision episodes
    # materialized within a few steps of the negative-margin guess, so a
    # short prefix keeps the safety while not e-braking for predicted
    # contact 2+ s out (which costs success as timeout).
    brake_horizon: int = 0
    # door-yield protocol (round-3 timeout audit): every bottleneck timeout
    # is a door-mouth standoff — the robot wedges at the gap, its presence
    # freezes the oncoming ORCA humans' velocity LPs, and the slack-penalty
    # optimum of the 1 s horizon is to wait out the clock. When enabled, a
    # direction-filtered latched rule adjusts the robot's INTERMEDIATE
    # goal: if an ONCOMING transiting human (one whose intent estimate
    # says it is moving against the robot's crossing direction) is deeper
    # into the door mouth than the robot, the robot's reference goal
    # becomes a waiting pocket off the door lane until the mouth clears;
    # same-direction traffic is followed, and humans parked at their final
    # goal get no priority (yielding to them would wait forever). Pure
    # deviation from the reference (no analog in campc.get_int_goal);
    # config-gated so the published plain baselines are unchanged.
    door_yield: bool = False
    # consecutive stalled-near-door steps before the yield triggers:
    # 0 = pre-emptive (yield as soon as oncoming traffic is deeper in the
    # mouth); N>0 = only after the robot has actually been wedged N steps
    door_yield_stall: int = 0
    # yield-latch economy (round-5 configurable; formerly module
    # constants): a latch that has not let the mouth clear within
    # hold_max steps is a human-human jam the wait cannot fix — release
    # and push through; the release opens a cooldown assert window with
    # the trigger suppressed so the protocol alternates yield/assert
    # instead of deadlocking in either mode
    door_yield_hold_max: int = 16    # latch timeout (steps; 16 = 4 s)
    door_yield_cooldown: int = 12    # post-timeout assert window (3 s)
    # batched multi-start (round-4 cascade fix): solve the NLP from
    # multi_start parallel initial guesses — [selected (shift-or-fresh),
    # fresh ORCA warmstart, brake profile, lateral side-step] — as ONE
    # vmapped IPM solve, then adopt the best exact-rollout-feasible
    # solution by cost. The round-3 taxonomy traced every residual
    # collision to the cascade adopting a stale/infeasible SINGLE guess;
    # the reference cannot afford multiple IPOPT processes per control
    # step (campc.py:684-832) but the TPU solves 4 starts in one batched
    # program. 1 = off (reference-shaped single-start cascade).
    multi_start: int = 1
    # failure-triggered effort escalation (round-4, the taxonomy's open
    # lever): the residual ebrake-class collisions are created UPSTREAM,
    # in the 2-3 consecutive failed-solve steps that force guess adoption
    # (ten margin/rescue probes agree the terminal maneuver is
    # immaterial). When > 0, a control step whose PREVIOUS solve was
    # rejected by the cascade grants the IPM this many EXTRA iterations —
    # a traced runtime budget (ipm.solve n_iter_dyn): no recompile, and
    # the happy-path ITERATION COUNT is unchanged. (Codegen does change:
    # any adaptive_effort > 0 switches the solve from lax.scan to
    # lax.while_loop, and under a vmapped fleet JAX's while_loop batching
    # runs the masked body until the slowest lane's limit — one escalated
    # episode extends that batch's step wall-clock. The unbatched
    # real-time path only pays on actually-escalated steps.) Targets
    # exactly the failure windows the uniform-budget
    # frontier (flat 10-40 iters) cannot see, the way IPOPT's unbounded
    # iteration count lets the reference grind through the same
    # instances (campc.py:430-467 sets max_iter 1000). 0 = off.
    adaptive_effort: int = 0
    # slack penalty family: "tro" = the Opti penalties (campc.py:280-330,
    # 1e9-scale quadratics on 1e-3-scaled slacks); "acados" = the RA-L
    # exporter's per-row L1/L2 penalties (campc_acados_opt.py:363-374,
    # zl = 10, Zl = 1e4 on RAW violations) — ~5e4x softer, letting the
    # real-time solver trade small violations for progress
    slack_mode: str = "tro"

    @property
    def K(self):
        return self.horiz

    @property
    def K_orca(self):
        k = self.orca_kkt_horiz
        return self.horiz if k == 0 else min(k, self.horiz)

    @property
    def n_lam(self):
        # pairwise (others + robot) + walls + maxvel + ksi  (mpc_env.py:64)
        return self.num_hums + self.num_walls + 2

    @property
    def kkt(self):
        return self.hum_model == "orca_casadi_kkt"

    @property
    def slack_sc(self):
        return SLACK_SCALING if self.slack_mode == "tro" else 1.0

    @property
    def preds_con(self):
        # active whenever a real MID sample grid is supplied (> 1 sample),
        # independent of the weighted-goal dynamics: the reference gates
        # them by separate config keys (human_pred_MID vs
        # hums_close_to_preds, mpc_env_new.py)
        return self.close_to_preds and self.num_mid_samples > 1

    @property
    def n_z(self):
        n = self.K * 2
        if self.kkt:
            n += self.K_orca * self.num_hums * 3
            n += self.K_orca * self.num_hums * self.n_lam
        n += self.n_slack
        return n

    @property
    def n_slack(self):
        # all classes always present: coll(H) + stat + bound + maxvel(H)
        # + ksi(H) + acc + kkt_ineq(H) + kkt_eq(H) + preds(H)
        return 6 * self.num_hums + 3 if self.soft_constraints else 0

    @property
    def orca_params(self) -> OL.OrcaModelParams:
        return OL.OrcaModelParams(time_horizon=self.orca_time_horizon,
                                  time_horizon_obst=self.orca_time_horizon_obst,
                                  dt=self.dt)

    def default_weights(self) -> "CostWeights":
        """CostWeights filled from the static config (the compiled-in
        defaults; override per solve via build_params(cost_weights=...))."""
        return CostWeights(
            q_x=jnp.float32(self.q_x), q_y=jnp.float32(self.q_y),
            q_theta=jnp.float32(self.q_theta),
            q_v_prev=jnp.float32(self.q_v_prev),
            q_om_prev=jnp.float32(self.q_om_prev),
            q_v_prev_dot=jnp.float32(self.q_v_prev_dot),
            q_om_prev_dot=jnp.float32(self.q_om_prev_dot),
            term_q_coeff=jnp.float32(self.term_q_coeff),
            term_q_theta=jnp.float32(self.term_q_theta),
            r_om=jnp.float32(self.r_om))


class CostWeights(NamedTuple):
    """Runtime-parametric cost diagonals. The RA-L MPCEnv passes the
    Q/R/termQ diagonals to the solver as per-stage runtime parameters
    (mpc_env_new.py:136-159) so weights can be retuned online without
    regenerating the Acados C code; here they live in MPCParams (traced
    solve inputs), so a weight sweep reuses ONE compiled XLA program."""
    q_x: jnp.ndarray
    q_y: jnp.ndarray
    q_theta: jnp.ndarray
    q_v_prev: jnp.ndarray
    q_om_prev: jnp.ndarray
    q_v_prev_dot: jnp.ndarray
    q_om_prev_dot: jnp.ndarray
    term_q_coeff: jnp.ndarray
    term_q_theta: jnp.ndarray
    r_om: jnp.ndarray


class MPCParams(NamedTuple):
    """Per-solve problem data (pytree)."""
    x0_rob: jnp.ndarray       # (4,) [x, y, theta, v_prev]
    goal: jnp.ndarray         # (2,) robot goal (may be intermediate)
    hums0: jnp.ndarray        # (H, 6) [px, py, vx, vy, gx, gy] (model view)
    hum_radii: jnp.ndarray    # (H,) model radii for ORCA lines
    hum_coll_radii: jnp.ndarray  # (H,) radii for robot-human collision
    v_max_prefs: jnp.ndarray  # (H,) model v_pref bound per human
    rob_radius: jnp.ndarray   # ()
    walls: jnp.ndarray        # (W, 2, 2)
    wall_mask: jnp.ndarray    # (W,)
    x_ref: jnp.ndarray        # (K+1, 2) reference robot positions
    # MID forecast samples (joint weights): S samples x H humans x (K+2)
    # horizon steps (step 0 = current time); dummy shape (1, H, K+2, 2)
    # and logw0 = zeros when human_pred_mid is off
    mid_samples: jnp.ndarray  # (S, H, K+2, 2)
    mid_logw0: jnp.ndarray    # (S,) joint log-weights
    cost_w: CostWeights       # runtime Q/R/termQ diagonals


class Slacks(NamedTuple):
    coll: jnp.ndarray         # (H,)
    stat: jnp.ndarray         # ()
    bound: jnp.ndarray        # ()
    maxvel: jnp.ndarray       # (H,)
    ksi: jnp.ndarray          # (H,)
    acc: jnp.ndarray          # ()
    kkt_ineq: jnp.ndarray     # (H,)
    kkt_eq: jnp.ndarray       # (H,)
    preds: jnp.ndarray        # (H,) hums-close-to-preds class


def _build_jitter(cfg: MPCConfig):
    """Degeneracy-breaking constants, one per (human, constraint row), drawn
    once with the reference's seeded generator (mpc_env.py:66 rng(5);
    :527,550,594)."""
    rng = np.random.default_rng(5)
    H, W = cfg.num_hums, cfg.num_walls
    pair_adj = 1.0 + rng.uniform(-5e-4, 5e-4, size=(H, H))       # per (A, B incl rob)
    stat_adj = rng.choice([-1.0, 1.0], size=(H, W)) * rng.uniform(1e-4, 9e-4, size=(H, W))
    ksi_vx = rng.choice([-1.0, 1.0], size=(H,)) * rng.uniform(1e-5, 9e-4, size=(H,))
    ksi_vy = rng.choice([-1.0, 1.0], size=(H,)) * rng.uniform(1e-5, 9e-4, size=(H,))
    return (jnp.asarray(pair_adj, jnp.float32), jnp.asarray(stat_adj, jnp.float32),
            jnp.asarray(ksi_vx, jnp.float32), jnp.asarray(ksi_vy, jnp.float32))


class OCP:
    """Assembles cost / equality / inequality residual functions over z."""

    def __init__(self, cfg: MPCConfig):
        self.cfg = cfg
        self.jitter = _build_jitter(cfg)

    # ------------------------------------------------------------------ z
    def unpack(self, z):
        cfg = self.cfg
        K, Ko, H, nl = cfg.K, cfg.K_orca, cfg.num_hums, cfg.n_lam
        i = 0
        u_rob = z[i:i + K * 2].reshape(K, 2); i += K * 2
        if cfg.kkt:
            u_hums = z[i:i + Ko * H * 3].reshape(Ko, H, 3); i += Ko * H * 3
            lam = z[i:i + Ko * H * nl].reshape(Ko, H, nl); i += Ko * H * nl
        else:
            u_hums = jnp.zeros((Ko, H, 3), z.dtype)
            lam = jnp.zeros((Ko, H, nl), z.dtype)
        if cfg.soft_constraints:
            s = z[i:]
            slacks = Slacks(
                coll=s[0:H],
                stat=s[H], bound=s[H + 1],
                maxvel=s[H + 2:2 * H + 2],
                ksi=s[2 * H + 2:3 * H + 2],
                acc=s[3 * H + 2],
                kkt_ineq=s[3 * H + 3:4 * H + 3],
                kkt_eq=s[4 * H + 3:5 * H + 3],
                preds=s[5 * H + 3:6 * H + 3])
        else:
            zero = jnp.zeros((), z.dtype)
            zH = jnp.zeros((cfg.num_hums,), z.dtype)
            slacks = Slacks(zH, zero, zero, zH, zH, zero, zH, zH, zH)
        return u_rob, u_hums, lam, slacks

    def pack(self, u_rob, u_hums, lam, slacks: Slacks):
        cfg = self.cfg
        parts = [u_rob.ravel()]
        if cfg.kkt:
            parts += [u_hums.ravel(), lam.ravel()]
        if cfg.soft_constraints:
            parts += [slacks.coll, slacks.stat[None], slacks.bound[None],
                      slacks.maxvel, slacks.ksi, slacks.acc[None],
                      slacks.kkt_ineq, slacks.kkt_eq, slacks.preds]
        return jnp.concatenate(parts)

    # ------------------------------------------------------------ dynamics
    def u_hums_at(self, u_hums, k):
        """Human decision vars at stage k (repeated beyond K_orca,
        campc.py:247-249)."""
        return u_hums[jnp.minimum(k, self.cfg.K_orca - 1)]

    def rollout(self, params: MPCParams, u_rob, u_hums):
        """Single-shooting rollout. Returns (X_rob (K+1,4), X_hums (K+1,H,6)).

        Robot: unicycle with lookahead heading (mpc_env.gen_kin_model:315-345).
        Humans: position integrates the decision velocity (KKT model,
        mpc_env.get_ORCA_human_dynamics_eqn) or CVMM. With
        ``human_pred_mid`` on, the human goal slots evolve through the
        horizon via the stateful joint MID-sample log-weight dynamics
        (mpc_env_new.py:380-520): weights update by the clipped
        -2^10 * mean-over-humans squared distance of next positions to the
        samples, and the goal is the weight-averaged next-step sample."""
        cfg = self.cfg
        dt = cfg.dt
        sv = cfg.orca_vxy_scaling

        def body(carry, k):
            xr, xh, logw = carry
            v, om = u_rob[k, 0], u_rob[k, 1]
            if cfg.robot_nx == 8:
                # RA-L sin/cos-heading model (mpc_env_new.py:649-660)
                s, c = xr[2], xr[3]
                s_next = s * jnp.cos(om * dt) + c * jnp.sin(om * dt)
                c_next = c * jnp.cos(om * dt) - s * jnp.sin(om * dt)
                xr_next = jnp.stack([
                    xr[0] + dt * v * c_next,
                    xr[1] + dt * v * s_next,
                    s_next, c_next, v, om,
                    (v - xr[4]) / dt, (om - xr[5]) / dt])
            else:
                th_next = xr[2] + dt * om
                xr_next = jnp.stack([
                    xr[0] + dt * v * jnp.cos(th_next),
                    xr[1] + dt * v * jnp.sin(th_next),
                    th_next, v])
            if cfg.kkt:
                uh = self.u_hums_at(u_hums, k)          # (H, 3)
                vel = sv * uh[:, :2]
            else:
                vel = xh[:, 2:4]
            p_next = xh[:, :2] + vel * dt
            if cfg.human_pred_mid:
                # samples aligned with the NEXT positions (stage k+1)
                S_t = params.mid_samples[:, :, k + 1]    # (S, H, 2)
                d2 = jnp.sum((S_t - p_next[None]) ** 2, axis=-1)  # (S, H)
                avg_d2 = jnp.mean(d2, axis=1)            # joint: mean over hums
                lw = jnp.maximum(-(2.0 ** 10) * avg_d2, -20.0)
                lw = lw - jax.scipy.special.logsumexp(lw)
                if cfg.mid_stateful_weights:
                    lw = logw + lw
                    lw = lw - jax.scipy.special.logsumexp(lw)
                w = jnp.maximum(jnp.exp(lw), 1e-10)
                goals = jnp.einsum("s,she->he", w,
                                   params.mid_samples[:, :, k + 2])
                logw_next = lw
            else:
                goals = xh[:, 4:6]
                logw_next = logw
            xh_next = jnp.concatenate([p_next, vel, goals], axis=-1)
            return (xr_next, xh_next, logw_next), (xr_next, xh_next)

        init = (params.x0_rob, params.hums0, params.mid_logw0)
        _, (xr_traj, xh_traj) = jax.lax.scan(body, init, jnp.arange(cfg.K))
        X_rob = jnp.concatenate([params.x0_rob[None], xr_traj], axis=0)
        X_hums = jnp.concatenate([params.hums0[None], xh_traj], axis=0)
        return X_rob, X_hums

    # ---------------------------------------------------------------- cost
    def tracking_cost(self, params: MPCParams, X_rob, u_rob):
        """T-RO: 0.5 |p_k - p_ref|^2 (+ terminal coeff) + 0.5 r_om om^2
        (mpc_env.py:104-107). RA-L 8-state: diag-weighted residual with the
        sin(th - th_ref) heading term and accel-state penalties
        (mpc_env_new.get_cost_eqn:320-351; x_ref columns [x, y, sin, cos]).
        All diagonals come from params.cost_w (runtime parameters, matching
        mpc_env_new.py:136-159) — weight sweeps reuse one compiled program."""
        cfg = self.cfg
        cw = params.cost_w
        if cfg.robot_nx == 8:
            dp = X_rob[:, :2] - params.x_ref[:, :2]
            # sin(th - th_ref) = sin cos_r - cos sin_r
            sin_res = (X_rob[:, 2] * params.x_ref[:, 3] -
                       X_rob[:, 3] * params.x_ref[:, 2])
            w_pos = jnp.concatenate([jnp.ones(cfg.K), cw.term_q_coeff[None]])
            w_th = jnp.concatenate([jnp.broadcast_to(cw.q_theta, (cfg.K,)),
                                    cw.term_q_theta[None]])
            cost = 0.5 * jnp.sum(
                w_pos * (cw.q_x * dp[:, 0] ** 2 + cw.q_y * dp[:, 1] ** 2))
            cost = cost + 0.5 * jnp.sum(w_th * sin_res ** 2)
            # residual X[4:] - Xr[4:] (mpc_env_new.get_cost_eqn:345): the
            # speed tracks the rolled reference's cruise speed (x_ref col 4),
            # not zero — tracking zero freezes the robot
            v_ref = params.x_ref[:, 4] if params.x_ref.shape[-1] > 4 else 0.0
            cost = cost + 0.5 * jnp.sum(
                cw.q_v_prev * (X_rob[:, 4] - v_ref) ** 2 +
                cw.q_om_prev * X_rob[:, 5] ** 2 +
                cw.q_v_prev_dot * X_rob[:, 6] ** 2 +
                cw.q_om_prev_dot * X_rob[:, 7] ** 2)
            cost = cost + 0.5 * cw.r_om * jnp.sum(u_rob[:, 1] ** 2)
            return cost
        dp = X_rob[:, :2] - params.x_ref[:, :2]         # (K+1, 2)
        w = jnp.concatenate([jnp.ones(cfg.K), cw.term_q_coeff[None]])
        cost = 0.5 * jnp.sum(w * jnp.sum(dp * dp, axis=-1))
        cost = cost + 0.5 * cw.r_om * jnp.sum(u_rob[:, 1] ** 2)
        return cost

    def slack_cost(self, slacks: Slacks):
        """Exact reference penalty terms (campc.py:280-330), or the RA-L
        Acados L1/L2 row penalties (campc_acados_opt.py:363-374) scaled by
        each class's row multiplicity."""
        cfg = self.cfg
        if not cfg.soft_constraints:
            return jnp.float32(0.0)
        K, Ko, W = cfg.K, cfg.K_orca, cfg.num_walls
        if cfg.slack_mode == "acados":
            def pen(s, rows):
                return rows * (1e4 * s ** 2 + 10.0 * jnp.abs(s))
            tot = jnp.sum(pen(slacks.coll, K + 1))
            tot += pen(slacks.stat, W * (K + 1))
            tot += pen(slacks.bound, 4 * K)
            tot += jnp.sum(pen(slacks.maxvel, K))
            tot += jnp.sum(pen(slacks.ksi, K))
            tot += pen(slacks.acc, 3 * K)
            tot += jnp.sum(pen(slacks.kkt_ineq, 2 * Ko * cfg.n_lam))
            tot += jnp.sum(1e4 * Ko * (3 + cfg.n_lam) * slacks.kkt_eq ** 2)
            tot += jnp.sum(pen(slacks.preds, K))
            return tot
        sc = SLACK_SCALING
        c = SLACK_PENAL
        tot = jnp.sum(101.0 * (K + 1) * c * (sc * slacks.coll) ** 2)
        tot += 101.0 * W * (K + 1) * c * (sc * slacks.stat) ** 2
        tot += 101.0 * K * c * (sc * slacks.bound) ** 2
        tot += jnp.sum(101.0 * K * c * (sc * slacks.maxvel) ** 2)
        tot += jnp.sum(101.0 * K * c * (sc * slacks.ksi) ** 2)
        tot += K * c * (sc * slacks.acc) ** 2
        tot += jnp.sum(101.0 * Ko * c * (sc * slacks.kkt_ineq) ** 2)
        tot += jnp.sum(0.1 * Ko * c * (sc * slacks.kkt_eq) ** 2)
        tot += jnp.sum(K * c * (sc * slacks.preds) ** 2)
        return tot

    def cost(self, z, params: MPCParams):
        u_rob, u_hums, lam, slacks = self.unpack(z)
        X_rob, _ = self.rollout(params, u_rob, u_hums)
        return self.tracking_cost(params, X_rob, u_rob) + self.slack_cost(slacks)

    def tracking_cost_only(self, z, params: MPCParams):
        """Unpenalized cost (for warmstart comparison, campc.py:695)."""
        u_rob, u_hums, _, _ = self.unpack(z)
        X_rob, _ = self.rollout(params, u_rob, u_hums)
        return self.tracking_cost(params, X_rob, u_rob)

    # ------------------------------------------------------ robot accessors
    def rob_heading(self, xr):
        """(sin th, cos th) of the robot state in either mode."""
        if self.cfg.robot_nx == 8:
            return xr[2], xr[3]
        return jnp.sin(xr[2]), jnp.cos(xr[2])

    def rob_v_prev(self, xr):
        return xr[4] if self.cfg.robot_nx == 8 else xr[3]

    def rob_vel(self, xr):
        s, c = self.rob_heading(xr)
        return self.rob_v_prev(xr) * jnp.stack([c, s])

    # ------------------------------------------------- human ORCA geometry
    def human_lines(self, params: MPCParams, xr, xh, a):
        """All (n_lam - 2) half-plane rows of human ``a``'s relaxed-ORCA
        problem: pairwise (others + robot in slot a) then walls.
        Returns (norms (L, 2), scalars (L,), adj (L,)) where adj is the
        degeneracy-jitter coefficient multiplying sk*ksi in each row."""
        cfg = self.cfg
        op = cfg.orca_params
        pair_adj, stat_adj, _, _ = self.jitter
        H = cfg.num_hums

        pos_a = xh[a, :2]
        vel_a = xh[a, 2:4]
        rad_a = params.hum_radii[a]
        rob_pos = xr[:2]
        rob_vel = self.rob_vel(xr)

        def pair_row(b):
            is_rob = b == a      # slot a repurposed for the robot
            pos_b = jnp.where(is_rob, rob_pos, xh[b, :2])
            vel_b = jnp.where(is_rob, rob_vel, xh[b, 2:4])
            rad_b = jnp.where(is_rob, params.rob_radius, params.hum_radii[b])
            return OL.pairwise_line(pos_a, vel_a, pos_b, vel_b, rad_a, rad_b, op)

        n_pair, s_pair = jax.vmap(pair_row)(jnp.arange(H))

        def stat_row(w_idx):
            return OL.static_line(pos_a, vel_a, rad_a, params.walls[w_idx],
                                  params.wall_mask[w_idx], op)

        n_stat, s_stat = jax.vmap(stat_row)(jnp.arange(cfg.num_walls))
        norms = jnp.concatenate([n_pair, n_stat], axis=0)
        scalars = jnp.concatenate([s_pair, s_stat], axis=0)
        adj = jnp.concatenate([pair_adj[a], stat_adj[a]], axis=0)
        return norms, scalars, adj

    def _g_from_lines(self, params, norms, scalars, adj, uh_a, a):
        cfg = self.cfg
        sv, sk = cfg.orca_vxy_scaling, cfg.orca_ksi_scaling
        _, _, ksi_vx, ksi_vy = self.jitter
        v = sv * uh_a[:2]
        ksi = uh_a[2]
        g_lines = -(norms @ v) + scalars - adj * sk * ksi
        g_maxvel = dot2(v, v) - params.v_max_prefs[a] ** 2
        g_ksi = ksi_vx[a] * v[0] + ksi_vy[a] * v[1] - sk * ksi
        return jnp.concatenate([g_lines, g_maxvel[None], g_ksi[None]])

    def human_orca_g(self, params: MPCParams, xr, xh, uh_a, a):
        """Inequality vector g (n_lam,) of human ``a``'s relaxed-ORCA problem
        at one stage (mpc_env.get_symcon_ORCA_* :527-612).
        uh_a = (3,) raw [vx, vy, ksi]."""
        norms, scalars, adj = self.human_lines(params, xr, xh, a)
        return self._g_from_lines(params, norms, scalars, adj, uh_a, a)

    def human_kkt_rows(self, params: MPCParams, xr, xh, uh_a, lam_a, a):
        """(g, stationarity) of the embedded lower-level KKT system with the
        stationarity gradient written ANALYTICALLY (the constraint gradients
        w.r.t. (v, ksi) are closed-form), which keeps the upper-level
        Hessian free of third-order AD through the ORCA geometry."""
        cfg = self.cfg
        sv, sk = cfg.orca_vxy_scaling, cfg.orca_ksi_scaling
        _, _, ksi_vx, ksi_vy = self.jitter
        norms, scalars, adj = self.human_lines(params, xr, xh, a)
        g = self._g_from_lines(params, norms, scalars, adj, uh_a, a)

        v = sv * uh_a[:2]
        ksi = uh_a[2]
        v_pref = OL.v_pref_from_state(xh[a, :2], xh[a, 4:6],
                                      params.v_max_prefs[a])
        lam_lines = lam_a[:-2]
        lam_mv = lam_a[-2]
        lam_ksi = lam_a[-1]
        # d/d(uh_a[:2]) of [cost + lam^T g]:
        #   cost: |sv u - vpref|^2 -> 2 sv (v - vpref)
        #   lines: -sv norms^T lam; maxvel: 2 sv^2 u lam_mv = 2 sv v lam_mv
        #   ksi-row: sv [kx, ky] lam_ksi
        grad_v = (2.0 * sv * (v - v_pref) - sv * (norms.T @ lam_lines) +
                  2.0 * sv * v * lam_mv +
                  sv * jnp.stack([ksi_vx[a], ksi_vy[a]]) * lam_ksi)
        # d/d(ksi): cost 200 sk^2 ksi; lines -adj sk lam; ksi-row -sk lam_ksi
        grad_ksi = (200.0 * sk * sk * ksi - sk * jnp.dot(adj, lam_lines) -
                    sk * lam_ksi)
        grad = jnp.concatenate([grad_v, grad_ksi[None]])
        return g, grad

    def human_lagrangian(self, params: MPCParams, xr, xh, uh_a, lam_a, a):
        """Lower-level Lagrangian L = cost + lam^T g of human a at one stage
        (mpc_env.get_symcon_ORCA_humA_kkt_const:611-641)."""
        cfg = self.cfg
        v_pref = OL.v_pref_from_state(xh[a, :2], xh[a, 4:6], params.v_max_prefs[a])
        cost = OL.lower_level_cost(cfg.orca_vxy_scaling * uh_a[:2],
                                   cfg.orca_ksi_scaling * uh_a[2], v_pref)
        g = self.human_orca_g(params, xr, xh, uh_a, a)
        return cost + jnp.dot(lam_a, g), g

    # ---------------------------------------------------------- residuals
    def eq_residuals(self, z, params: MPCParams):
        """KKT equality block: stationarity + complementarity (soft: minus
        the shared per-human eq slack). Shape (K_orca, H, 3 + n_lam)."""
        cfg = self.cfg
        if not cfg.kkt:
            return jnp.zeros((0,), z.dtype)
        u_rob, u_hums, lam, slacks = self.unpack(z)
        X_rob, X_hums = self.rollout(params, u_rob, u_hums)

        def stage(k):
            xr, xh = X_rob[k], X_hums[k]

            def per_hum(a):
                uh_a = u_hums[k, a]
                lam_a = lam[k, a]
                g, grad = self.human_kkt_rows(params, xr, xh, uh_a, lam_a, a)
                comp = lam_a * g - KKT_RHO
                res = jnp.concatenate([grad, comp])
                return res - cfg.slack_sc * slacks.kkt_eq[a]

            return jax.vmap(per_hum)(jnp.arange(cfg.num_hums))

        res = jax.vmap(stage)(jnp.arange(cfg.K_orca))
        return res.ravel()

    def _ineq_groups(self, z, params: MPCParams):
        """Raw (un-slack-shifted) inequality rows grouped by constraint
        class. Returns dict name -> rows (class slack broadcasting shape
        kept in the trailing axes)."""
        cfg = self.cfg
        K, Ko, H, W = cfg.K, cfg.K_orca, cfg.num_hums, cfg.num_walls
        u_rob, u_hums, lam, slacks = self.unpack(z)
        X_rob, X_hums = self.rollout(params, u_rob, u_hums)
        g = {}

        # robot-human collision, stages 0..K
        if cfg.robot_capsule:
            # robot as a heading-aligned capsule (mpc_env_new.
            # get_rob_coll_capsule:971-1000): corrected_width = wid +
            # wid_buffer; segment half-length = 0.5 len + len_buffer
            # - 0.5 corrected_width (>= 0 degenerate = circle)
            corr_wid = cfg.rob_wid + cfg.rob_wid_buffer
            half_len = jnp.maximum(
                0.5 * cfg.rob_len + cfg.rob_len_buffer - 0.5 * corr_wid, 0.0)
            comb = (params.hum_coll_radii[None, :] + 0.5 * corr_wid +
                    cfg.stage_margin * jnp.arange(K + 1)[:, None])
            if cfg.robot_nx == 8:
                heading = jnp.stack([X_rob[:, 3], X_rob[:, 2]], -1)
            else:
                heading = jnp.stack([jnp.cos(X_rob[:, 2]),
                                     jnp.sin(X_rob[:, 2])], -1)  # (K+1, 2)
            a0 = X_rob[:, :2] - half_len * heading
            seg = 2.0 * half_len * heading
            w_vec = X_hums[:, :, :2] - a0[:, None, :]          # (K+1, H, 2)
            t = jnp.clip(jnp.sum(w_vec * seg[:, None, :], -1) /
                         jnp.maximum(jnp.sum(seg * seg, -1), 1e-9)[:, None],
                         0.0, 1.0)
            cp = a0[:, None, :] + t[..., None] * seg[:, None, :]
            d = X_hums[:, :, :2] - cp
            g["coll"] = -(jnp.sum(d * d, -1) - comb ** 2)      # (K+1, H)
        else:
            # circle model (mpc_env.get_mpc_coll_constraints)
            comb = (params.hum_coll_radii[None, :] + params.rob_radius +
                    cfg.rob_rad_buffer + 0.01 +
                    cfg.stage_margin * jnp.arange(K + 1)[:, None])  # (K+1, H)
            d = X_rob[:, None, :2] - X_hums[:, :, :2]    # (K+1, H, 2)
            g["coll"] = -(jnp.sum(d * d, -1) - comb ** 2)           # (K+1, H)

        # robot-wall capsule, stages 0..K; buffer rule (mpc_env.py:364-375)
        rob_r = params.rob_radius
        stat_buf = jnp.where(cfg.max_speed * cfg.dt >= rob_r,
                             cfg.max_speed * cfg.dt - rob_r + 0.01, 0.05)
        comb_rad = rob_r + stat_buf + cfg.wall_margin

        def wall_rows(wall, wmask):
            p1, p2 = wall[0], wall[1]
            vv = p2 - p1
            ww = X_rob[:, :2] - p1[None]
            t = jnp.clip(jnp.sum(ww * vv, -1) / jnp.maximum(jnp.dot(vv, vv), 1e-12),
                         0.0, 1.0)
            cp = p1[None] + t[:, None] * vv[None]
            dvec = X_rob[:, :2] - cp
            val = -(jnp.sum(dvec * dvec, -1) - comb_rad ** 2)
            return jnp.where(wmask, val, -1.0)           # inactive padded walls

        g["stat"] = jax.vmap(wall_rows)(params.walls, params.wall_mask)  # (W, K+1)

        # robot input bounds (mpc_env.get_kin_bound_constraint)
        lb = jnp.array([-cfg.max_rev_speed, -cfg.max_rot + 0.001])
        ub = jnp.array([cfg.max_speed, cfg.max_rot])
        g["bound"] = jnp.concatenate([(u_rob - ub[None]).ravel(),
                                      (lb[None] - u_rob).ravel()])

        # accel constraints (mpc_env.get_kin_acc_constraint)
        v_prev = X_rob[:K, 4] if cfg.robot_nx == 8 else X_rob[:K, 3]
        v_u = u_rob[:, 0]
        diff = jnp.abs(v_u) - jnp.abs(v_prev)
        upper = diff - cfg.max_l_acc * cfg.dt
        low_b = jnp.maximum(cfg.max_l_dcc * cfg.dt, -jnp.abs(v_prev))
        lower = -diff + low_b
        sign = -jnp.sign(v_prev) * v_u - 1e-5
        g["acc"] = jnp.stack([upper, lower, sign], -1)   # (K, 3)

        if cfg.kkt:
            # human maxvel + ksi rows over the full horizon K (on repeated u)
            uh_full = jax.vmap(lambda k: self.u_hums_at(u_hums, k))(
                jnp.arange(K))                           # (K, H, 3)
            sv, sk = cfg.orca_vxy_scaling, cfg.orca_ksi_scaling
            vmag2 = jnp.sum((sv * uh_full[:, :, :2]) ** 2, -1)
            g["maxvel"] = vmag2 - params.v_max_prefs[None, :] ** 2   # (K, H)
            _, _, ksi_vx, ksi_vy = self.jitter
            g["ksi"] = (ksi_vx[None, :] * sv * uh_full[:, :, 0] +
                        ksi_vy[None, :] * sv * uh_full[:, :, 1] -
                        sk * uh_full[:, :, 2])           # (K, H)

            # KKT inequality block: primal feas g <= 0, dual feas -lam <= 0
            def kkt_stage(k):
                xr, xh = X_rob[k], X_hums[k]

                def per_hum(a):
                    gg = self.human_orca_g(params, xr, xh, u_hums[k, a], a)
                    return jnp.concatenate([gg, -lam[k, a]])

                return jax.vmap(per_hum)(jnp.arange(H))

            g["kkt"] = jax.vmap(kkt_stage)(jnp.arange(Ko))  # (Ko, H, 2*n_lam)

        if cfg.preds_con:
            # hums-close-to-preds (mpc_env_new.get_hums_close_to_preds
            # _constraints:1454-1528): per stage, each human's next position
            # must lie within sqrt(0.5 * max-NN-spread^2) of its closest
            # sample; degenerate (identical-sample) spread relaxes to 10.
            def preds_row(k):
                S_t = params.mid_samples[:, :, k + 1]        # (S, H, 2)
                p_next = X_hums[k + 1, :, :2]                # (H, 2)
                d2 = jnp.sum((S_t - p_next[None]) ** 2, -1)  # (S, H)
                closest = jnp.min(d2, axis=0)                # (H,)
                pair = jnp.sum((S_t[:, None] - S_t[None, :]) ** 2, -1)
                nS = pair.shape[0]
                pair = pair + jnp.eye(nS)[:, :, None] * 1e9  # exclude self
                nn = jnp.min(pair, axis=1)                   # (S, H)
                max_nn = jnp.max(nn, axis=0)                 # (H,)
                max_nn = jnp.where(max_nn > 1e-3, max_nn, 10.0)
                return closest - 0.5 * max_nn
            g["preds"] = jax.vmap(preds_row)(jnp.arange(K))  # (K, H)
        return g

    def ineq_residuals(self, z, params: MPCParams):
        """All inequality rows (<= 0), slack-shifted."""
        cfg = self.cfg
        sc = cfg.slack_sc
        _, _, _, slacks = self.unpack(z)
        g = self._ineq_groups(z, params)
        # hard short-horizon wall rows: stages 1..hard_wall_stages get no
        # slack shift (see MPCConfig.hard_wall_stages)
        stat_soft = self._stat_soft_mask()                # (K+1,)
        rows = [
            (g["coll"] - sc * slacks.coll[None, :]).ravel(),
            (g["stat"] - sc * slacks.stat * stat_soft[None, :]).ravel(),
            (g["bound"] - sc * slacks.bound).ravel(),
            (g["acc"] - sc * slacks.acc).ravel(),
        ]
        if cfg.kkt:
            rows += [
                (g["maxvel"] - sc * slacks.maxvel[None, :]).ravel(),
                (g["ksi"] - sc * slacks.ksi[None, :]).ravel(),
                (g["kkt"] - sc * slacks.kkt_ineq[None, :, None]).ravel(),
            ]
        if cfg.preds_con:
            rows.append((g["preds"] - sc * slacks.preds[None, :]).ravel())
        if cfg.soft_constraints:
            rows += [-slacks.coll, -slacks.stat[None], -slacks.bound[None],
                     -slacks.maxvel, -slacks.ksi, -slacks.acc[None],
                     -slacks.kkt_ineq, -slacks.preds]
        return jnp.concatenate(rows)

    def _stat_soft_mask(self):
        """(K+1,) 1.0 where the robot-wall row is slacked, 0.0 where hard
        (stages 1..hard_wall_stages; stage 0 always slacked)."""
        cfg = self.cfg
        ks = jnp.arange(cfg.K + 1)
        hard = (ks >= 1) & (ks <= cfg.hard_wall_stages)
        return jnp.where(hard, 0.0, 1.0)

    def infer_slacks(self, z, params: MPCParams):
        """Honest slack values for a primal guess: per-class maximum raw
        violation (the reference initializes slacks the same way via
        get_slackvar_initializer, campc.py:286,301,...)."""
        cfg = self.cfg
        u_rob, u_hums, lam, _ = self.unpack(z)
        g = self._ineq_groups(z, params)
        sc = cfg.slack_sc

        def pos_max(x, axis=None):
            return jnp.maximum(jnp.max(x, axis=axis), 0.0) / sc

        slacks = Slacks(
            coll=pos_max(g["coll"], axis=0),
            # the stat slack only absorbs SLACKED rows; hard-stage
            # violations cannot be shifted and must not inflate it
            stat=pos_max(g["stat"] * self._stat_soft_mask()[None, :]),
            bound=pos_max(g["bound"]),
            maxvel=pos_max(g["maxvel"], axis=0) if cfg.kkt
            else jnp.zeros(cfg.num_hums),
            ksi=pos_max(g["ksi"], axis=0) if cfg.kkt
            else jnp.zeros(cfg.num_hums),
            acc=pos_max(g["acc"]),
            kkt_ineq=pos_max(g["kkt"], axis=(0, 2)) if cfg.kkt
            else jnp.zeros(cfg.num_hums),
            kkt_eq=jnp.zeros(cfg.num_hums),
            preds=pos_max(g["preds"], axis=0) if cfg.preds_con
            else jnp.zeros(cfg.num_hums))
        z2 = self.pack(u_rob, u_hums, lam, slacks)
        if cfg.kkt:
            # eq slacks: mean residual per human (free sign, L2-penalized)
            res = self.eq_residuals(z2, params).reshape(
                cfg.K_orca, cfg.num_hums, 3 + cfg.n_lam)
            # solve for the shared slack minimizing the L2 eq residual
            eq_s = jnp.mean(res, axis=(0, 2)) / sc
            slacks = slacks._replace(kkt_eq=eq_s)
            z2 = self.pack(u_rob, u_hums, lam, slacks)
        return z2

    # ------------------------------------------------------------ sizes
    @property
    def n_eq(self):
        cfg = self.cfg
        return cfg.K_orca * cfg.num_hums * (3 + cfg.n_lam) if cfg.kkt else 0

    @property
    def n_ineq(self):
        cfg = self.cfg
        K, Ko, H, W = cfg.K, cfg.K_orca, cfg.num_hums, cfg.num_walls
        n = (K + 1) * H + (K + 1) * W + 2 * 2 * K + 3 * K
        if cfg.kkt:
            n += 2 * K * H + 2 * Ko * H * cfg.n_lam
        if cfg.preds_con:
            n += K * H
        if cfg.soft_constraints:
            n += 5 * H + 3
        return n
