"""Observation-path state filter: per-human constant-velocity Kalman.

The robustness protocol (utils/robustness.py, after
sicnav_acados.py:1184-1237) showed the controllers' safety machinery —
exact-rollout vetting, KKT-consistent warmstarts, discomfort margins —
degrades 5-8x in collision episodes under 5-10 cm observation noise,
because every one of those mechanisms reasons about the OBSERVED human
positions and a 5 cm error is large against the 2 cm acceptance buffer.
The reference's real-robot stack gets its filtering for free from the
perception pipeline upstream of `select_action`; the sim-eval path feeds
raw noise by design. This module is the sim-side counterpart of that
perception filtering (and of `realtime.py`'s resampling for the
streaming path): a steady-gain constant-velocity Kalman filter applied
to the human observations before the policy sees them.

Structure: per human and per axis the state is [p, v] with the standard
CV model F = [[1, dt], [0, 1]], white-accel process noise Q(sigma_a),
and a full [p, v] measurement (the sim observes both). Because every
human/axis shares one (R, Q), a single 2x2 covariance P drives all of
them — the per-step cost is one 2x2 solve plus two fused multiplies over
(H, 2) arrays, noise-level in the control-step budget.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax.numpy as jnp

from sicnav_tpu.env.types import SimState


@dataclasses.dataclass(frozen=True)
class KFConfig:
    dt: float = 0.25
    pos_std: float = 0.05    # assumed measurement noise (match NoiseConfig)
    vel_std: float = 0.05
    # process-noise accel scale: how hard the filter believes a human can
    # maneuver between frames. ORCA agents at v_pref 1 m/s and dt 0.25 s
    # reverse a full velocity in ~2 frames => sigma_a ~ dv/dt ~ 2 m/s^2.
    # Larger = less smoothing (trust measurements); smaller = more lag on
    # turns (a lagged position estimate is WORSE than a noisy one for the
    # collision rows, so err high).
    accel_std: float = 2.0


class KFState(NamedTuple):
    x: jnp.ndarray       # (H, 4) filtered [px, py, vx, vy]
    P: jnp.ndarray       # (2, 2) shared per-axis [p, v] covariance
    initialized: jnp.ndarray  # bool — first call seeds x from the obs


def init_filter(num_hums: int) -> KFState:
    return KFState(x=jnp.zeros((num_hums, 4), jnp.float32),
                   P=jnp.eye(2, dtype=jnp.float32),
                   initialized=jnp.array(False))


def _matrices(cfg: KFConfig):
    dt = cfg.dt
    F = jnp.array([[1.0, dt], [0.0, 1.0]], jnp.float32)
    q = cfg.accel_std ** 2
    Q = q * jnp.array([[dt ** 4 / 4.0, dt ** 3 / 2.0],
                       [dt ** 3 / 2.0, dt ** 2]], jnp.float32)
    R = jnp.diag(jnp.array([cfg.pos_std ** 2, cfg.vel_std ** 2], jnp.float32))
    return F, Q, R


def kf_step(obs_pos: jnp.ndarray, obs_vel: jnp.ndarray, kf: KFState,
            cfg: KFConfig):
    """One predict+update on the (H, 2) position/velocity observations.
    Returns (pos_f, vel_f, kf')."""
    F, Q, R = _matrices(cfg)
    p_prev = kf.x[:, 0:2]
    v_prev = kf.x[:, 2:4]
    # predict
    p_pred = p_prev + v_prev * cfg.dt
    v_pred = v_prev
    P_pred = F @ kf.P @ F.T + Q
    # update: z = [p, v], H = I => K = P_pred (P_pred + R)^-1
    K = jnp.linalg.solve((P_pred + R).T, P_pred.T).T     # (2, 2)
    y_p = obs_pos - p_pred                               # (H, 2)
    y_v = obs_vel - v_pred
    p_new = p_pred + K[0, 0] * y_p + K[0, 1] * y_v
    v_new = v_pred + K[1, 0] * y_p + K[1, 1] * y_v
    P_new = (jnp.eye(2, dtype=jnp.float32) - K) @ P_pred
    # first observation seeds the state directly (no prior to predict from)
    p_out = jnp.where(kf.initialized, p_new, obs_pos)
    v_out = jnp.where(kf.initialized, v_new, obs_vel)
    P_out = jnp.where(kf.initialized, P_new, R)
    return p_out, v_out, KFState(
        x=jnp.concatenate([p_out, v_out], axis=-1),
        P=P_out, initialized=jnp.array(True))


def filter_observation(state: SimState, kf: KFState, cfg: KFConfig):
    """Returns (state with filtered human pos/vel, kf')."""
    pos_f, vel_f, kf2 = kf_step(state.h_pos, state.h_vel, kf, cfg)
    return state._replace(h_pos=pos_f, h_vel=vel_f), kf2


def filtered_policy_stateful(step_fn, cfg: KFConfig):
    """Wrap a stateful policy ``step_fn(state, carry) -> (action, carry)``
    so it observes Kalman-filtered human states. The wrapped carry is
    ``(KFState, inner_carry)`` — pair with ``init_filter`` when building
    the harness ``stateful_policy`` tuple. Compose INSIDE the robustness
    noise wrapper (noise first, then filter, then policy):

        policy = noisy_policy_stateful(
            filtered_policy_stateful(step_fn, kf_cfg), noise_cfg)
    """
    def wrapped(state: SimState, carry):
        kf, inner = carry
        st_f, kf2 = filter_observation(state, kf, cfg)
        action, inner2 = step_fn(st_f, inner)
        return action, (kf2, inner2)
    return wrapped
