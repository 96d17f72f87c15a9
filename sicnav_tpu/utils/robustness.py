"""Robustness evaluation: seeded observation-noise injection.

Port of SICNavAcados.init_robustness_eval (sicnav_diffusion/policy/
sicnav_acados.py:1184-1237): the policy observes human positions/velocities
perturbed by Gaussian noise while the simulator evolves the true state —
used to measure controller sensitivity to perception error.
"""

from __future__ import annotations

import dataclasses

import jax

from sicnav_tpu.env.types import SimState


@dataclasses.dataclass(frozen=True)
class NoiseConfig:
    pos_std: float = 0.05
    vel_std: float = 0.05
    seed: int = 0


def perturb_observation(state: SimState, key, cfg: NoiseConfig) -> SimState:
    """Returns a copy of the state with noisy human observations (the true
    state is untouched; feed the perturbed copy to the policy only)."""
    k1, k2 = jax.random.split(key)
    noise_p = cfg.pos_std * jax.random.normal(k1, state.h_pos.shape)
    noise_v = cfg.vel_std * jax.random.normal(k2, state.h_vel.shape)
    return state._replace(h_pos=state.h_pos + noise_p,
                          h_vel=state.h_vel + noise_v)


def noisy_policy(policy_fn, cfg: NoiseConfig):
    """Wrap a stateless policy so it sees perturbed observations; the key is
    folded from the sim step counter for reproducibility."""
    def wrapped(state: SimState):
        key = jax.random.fold_in(jax.random.PRNGKey(cfg.seed),
                                 state.step_idx)
        return policy_fn(perturb_observation(state, key, cfg))
    return wrapped


def noisy_policy_stateful(step_fn, cfg: NoiseConfig):
    """Carry-state variant for CAMPC / SICNav-Diffusion — the controllers the
    reference's robustness eval actually targets (sicnav_acados.py:1184-1237).
    ``step_fn(state, carry) -> (action, carry)``; returns a wrapper with the
    same signature that perturbs only what the policy observes."""
    def wrapped(state: SimState, carry):
        key = jax.random.fold_in(jax.random.PRNGKey(cfg.seed),
                                 state.step_idx)
        return step_fn(perturb_observation(state, key, cfg), carry)
    return wrapped
