"""Observation-path Kalman filter (utils/state_filter.py): noise
suppression, noiseless transparency, and wrapper carry threading."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sicnav_tpu.env import crowd_sim
from sicnav_tpu.env.types import EnvConfig
from sicnav_tpu.utils.robustness import NoiseConfig, noisy_policy_stateful
from sicnav_tpu.utils.state_filter import (KFConfig, filter_observation,
                                           filtered_policy_stateful,
                                           init_filter, kf_step)


def _cv_track(key, H=4, T=60, dt=0.25):
    kp, kv = jax.random.split(key)
    p0 = jax.random.uniform(kp, (H, 2), minval=-3.0, maxval=3.0)
    v = jax.random.uniform(kv, (H, 2), minval=-1.0, maxval=1.0)
    t = jnp.arange(T)[:, None, None] * dt
    return p0[None] + v[None] * t, jnp.broadcast_to(v[None], (T, H, 2))


def _run_filter(pos_obs, vel_obs, cfg):
    kf = init_filter(pos_obs.shape[1])
    outs = []
    for t in range(pos_obs.shape[0]):
        p, v, kf = kf_step(pos_obs[t], vel_obs[t], kf, cfg)
        outs.append((p, v))
    return (jnp.stack([o[0] for o in outs]),
            jnp.stack([o[1] for o in outs]))


def test_noise_suppression_constant_velocity():
    """On a constant-velocity track with the protocol's 5 cm noise, the
    filtered RMSE must beat the raw measurement RMSE by a clear factor."""
    key = jax.random.PRNGKey(0)
    pos, vel = _cv_track(key)
    kn1, kn2 = jax.random.split(jax.random.PRNGKey(1))
    std = 0.05
    pos_obs = pos + std * jax.random.normal(kn1, pos.shape)
    vel_obs = vel + std * jax.random.normal(kn2, vel.shape)
    cfg = KFConfig(dt=0.25, pos_std=std, vel_std=std)
    pos_f, vel_f = _run_filter(pos_obs, vel_obs, cfg)
    burn = 10
    rmse = lambda a, b: float(jnp.sqrt(jnp.mean((a[burn:] - b[burn:]) ** 2)))
    # at the shipped accel_std=2 the velocity-measurement anchor halves the
    # POSITION noise (the channel the collision rows consume) while passing
    # velocity through nearly raw (by design — low turn lag)
    assert rmse(pos_f, pos) < 0.6 * rmse(pos_obs, pos)
    assert rmse(vel_f, vel) < 1.05 * rmse(vel_obs, vel)
    # a smoother config (accel_std 0.5) must also filter the velocity
    pos_s, vel_s = _run_filter(pos_obs, vel_obs,
                               KFConfig(dt=0.25, pos_std=std, vel_std=std,
                                        accel_std=0.5))
    assert rmse(vel_s, vel) < 0.9 * rmse(vel_obs, vel)
    assert rmse(pos_s, pos) < 0.6 * rmse(pos_obs, pos)


def test_noiseless_transparency():
    """With exact CV observations the filter must track truth ~exactly —
    no added lag on agents that move the way the model expects."""
    pos, vel = _cv_track(jax.random.PRNGKey(2))
    pos_f, vel_f = _run_filter(pos, vel, KFConfig())
    assert float(jnp.max(jnp.abs(pos_f - pos))) < 1e-4
    assert float(jnp.max(jnp.abs(vel_f - vel))) < 1e-4


def test_turning_lag_bounded():
    """A hard 90-degree turn (the ORCA-maneuver stress case): the filtered
    position error right after the turn must stay within ~one noise std —
    the accel_std=2 default trusts measurements enough not to smear turns
    into multi-frame lag (a lagged estimate is worse than a noisy one for
    the collision rows)."""
    dt, T = 0.25, 40
    v1 = jnp.array([1.0, 0.0])
    v2 = jnp.array([0.0, 1.0])
    pos = [jnp.zeros((1, 2))]
    vel = []
    for t in range(T):
        v = v1 if t < T // 2 else v2
        vel.append(v[None])
        pos.append(pos[-1] + v[None] * dt)
    pos, vel = jnp.stack(pos[:-1]), jnp.stack(vel)
    pos_f, _ = _run_filter(pos, vel, KFConfig(dt=dt))
    err = jnp.linalg.norm(pos_f - pos, axis=-1)
    # the CV prediction is wrong by v*dt = 0.25 m at the turn frame itself;
    # the transient must decay below 5 cm within 4 frames (1 s) and never
    # exceed half the one-frame displacement
    assert float(jnp.max(err)) < 0.6 * 0.25
    assert float(jnp.max(err[T // 2 + 5:])) < 0.05


def test_wrapper_carry_threading_and_equivalence():
    """filtered_policy_stateful threads (KFState, inner) and, on noiseless
    CV-moving humans, produces ~the raw policy's action."""
    cfg = EnvConfig(max_humans=3)
    state = crowd_sim.reset_host(cfg, case=7)

    def step_fn(s, inner):
        # action = mean human position + inner counter (exercises both)
        return jnp.mean(s.h_pos, axis=0) + inner, inner + 1.0

    wrapped = filtered_policy_stateful(step_fn, KFConfig(dt=cfg.dt))
    carry = (init_filter(cfg.max_humans), jnp.float32(0.0))
    a_raw, _ = step_fn(state, jnp.float32(0.0))
    a_f, carry = wrapped(state, carry)
    # first call seeds from the observation: identical
    np.testing.assert_allclose(np.asarray(a_f), np.asarray(a_raw), atol=1e-6)
    assert float(carry[1]) == 1.0
    # second call on a CV-evolved state stays close to raw
    state2 = state._replace(h_pos=state.h_pos + state.h_vel * cfg.dt)
    a_raw2, _ = step_fn(state2, jnp.float32(1.0))
    a_f2, carry = wrapped(state2, carry)
    np.testing.assert_allclose(np.asarray(a_f2), np.asarray(a_raw2),
                               atol=1e-3)
    assert float(carry[1]) == 2.0


def test_composes_inside_noise_wrapper():
    """noisy(filtered(policy)): the policy must see filtered-noisy obs and
    the whole stack must jit."""
    cfg = EnvConfig(max_humans=3)
    state = crowd_sim.reset_host(cfg, case=3)
    seen = {}

    def step_fn(s, inner):
        return s.h_pos[0], inner

    stack = noisy_policy_stateful(
        filtered_policy_stateful(step_fn, KFConfig(dt=cfg.dt)),
        NoiseConfig(0.05, 0.05))
    carry = (init_filter(cfg.max_humans), jnp.int32(0))
    a1, carry = jax.jit(stack)(state, carry)
    a2, carry = jax.jit(stack)(state._replace(step_idx=state.step_idx + 1),
                               carry)
    assert np.all(np.isfinite(np.asarray(a1)))
    assert np.all(np.isfinite(np.asarray(a2)))
    # the filter must actually change what the policy sees vs raw noise
    key = jax.random.fold_in(jax.random.PRNGKey(0), state.step_idx)
    from sicnav_tpu.utils.robustness import perturb_observation
    noisy_raw = perturb_observation(state, key, NoiseConfig(0.05, 0.05))
    # (first step seeds from the obs, so compare the second step)
    assert not np.allclose(np.asarray(a2), np.asarray(noisy_raw.h_pos[0]))
