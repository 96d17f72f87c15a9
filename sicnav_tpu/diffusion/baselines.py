"""Prediction baselines: constant velocity (with collision fixing) and
standing.

Ports of sicnav_diffusion/JMID/MID/{constant_velocity_baseline, baseline,
standing_baseline}.py: CV forecasts, the iterative pairwise collision-fix
variant (baseline.py's fix loop), and the zero-velocity baseline — as
batched JAX with fixed iteration counts.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def standing_forecast(pos, horizon: int):
    """(H, 2) current positions -> (H, T, 2): agents stay put."""
    return jnp.broadcast_to(pos[:, None, :], pos.shape[:1] + (horizon, 2))


def constant_velocity_forecast(pos, vel, dt: float, horizon: int):
    """(H, 2) positions + velocities -> (H, T, 2) CV extrapolation."""
    steps = (jnp.arange(horizon) + 1)[None, :, None] * dt
    return pos[:, None, :] + vel[:, None, :] * steps


def cv_collision_fixed_forecast(pos, vel, radius, mask, dt: float,
                                horizon: int, fix_iters: int = 5,
                                margin: float = 0.02):
    """CV forecast with iterative pairwise collision resolution
    (baseline.py's collision-fix iterations): at each future step,
    overlapping agent pairs are pushed apart symmetrically along their
    separation direction until (combined radius + margin) apart, repeated
    ``fix_iters`` times per step, sequentially through the horizon so the
    fixes propagate.

    pos, vel: (H, 2); radius, mask: (H,). Returns (H, T, 2)."""
    H = pos.shape[0]
    eye = jnp.eye(H, dtype=bool)

    def fix_step(p):
        def one_iter(p, _):
            d = p[:, None, :] - p[None, :, :]              # (H, H, 2)
            dist = jnp.sqrt(jnp.maximum(jnp.sum(d * d, -1), 1e-12))
            comb = radius[:, None] + radius[None, :] + margin
            pair_ok = mask[:, None] & mask[None, :] & ~eye
            overlap = jnp.where(pair_ok, jnp.maximum(comb - dist, 0.0), 0.0)
            push = 0.5 * overlap[..., None] * d / dist[..., None]
            return p + jnp.sum(push, axis=1), None

        p, _ = jax.lax.scan(one_iter, p, None, length=fix_iters)
        return p

    def body(p_prev, t):
        p_next = fix_step(p_prev + vel * dt)
        return p_next, p_next

    _, traj = jax.lax.scan(body, pos, jnp.arange(horizon))
    return jnp.transpose(traj, (1, 0, 2))
