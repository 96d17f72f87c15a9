"""Diffusion core: variance schedule, epsilon-loss, DDPM/DDIM samplers.

Port of sicnav_diffusion/JMID/MID/models/diffusion.py (VarianceSchedule:12-64,
DiffusionTraj.get_loss:448-476, sample_sicnav_inference:478-541) with the
reverse loop as a fixed-trip-count ``lax.scan`` — all samples x agents
denoised as one batch, TPU-resident end to end.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class VarianceSchedule(NamedTuple):
    betas: jnp.ndarray        # (T+1,) padded with beta_0 = 0
    alphas: jnp.ndarray
    alpha_bars: jnp.ndarray
    sigmas_flex: jnp.ndarray
    sigmas_inflex: jnp.ndarray
    num_steps: int


def make_schedule(num_steps: int = 100, mode: str = "linear",
                  beta_1: float = 1e-4, beta_T: float = 5e-2,
                  cosine_s: float = 8e-3) -> VarianceSchedule:
    if mode == "linear":
        betas = np.linspace(beta_1, beta_T, num_steps)
    elif mode == "cosine":
        ts = np.arange(num_steps + 1) / num_steps + cosine_s
        al = np.cos(ts / (1 + cosine_s) * np.pi / 2) ** 2
        al = al / al[0]
        betas = np.clip(1 - al[1:] / al[:-1], None, 0.999)
    else:
        raise ValueError(mode)
    betas = np.concatenate([[0.0], betas])
    alphas = 1.0 - betas
    alpha_bars = np.exp(np.cumsum(np.log(alphas)))
    sigmas_flex = np.sqrt(betas)
    sigmas_inflex = np.zeros_like(betas)
    sigmas_inflex[1:] = np.sqrt(
        (1 - alpha_bars[:-1]) / (1 - alpha_bars[1:]) * betas[1:])
    f32 = lambda x: jnp.asarray(x, jnp.float32)
    return VarianceSchedule(f32(betas), f32(alphas), f32(alpha_bars),
                            f32(sigmas_flex), f32(sigmas_inflex), num_steps)


def diffusion_loss(net_apply: Callable, sched: VarianceSchedule, key,
                   x0, context, loss_mask=None, **net_kwargs):
    """Epsilon-prediction MSE (get_loss:448-476).

    net_apply(x_t, beta, context, **net_kwargs) -> eps_hat.
    x0: (B, T, 2) raw target velocities; loss_mask: (B, T) True = IGNORE
    (reference convention: masked_select(~loss_mask))."""
    B = x0.shape[0]
    k_t, k_e = jax.random.split(key)
    t = jax.random.randint(k_t, (B,), 1, sched.num_steps + 1)
    alpha_bar = sched.alpha_bars[t]
    beta = sched.betas[t]
    c0 = jnp.sqrt(alpha_bar)[:, None, None]
    c1 = jnp.sqrt(1 - alpha_bar)[:, None, None]
    e_rand = jax.random.normal(k_e, x0.shape, x0.dtype)
    e_theta = net_apply(c0 * x0 + c1 * e_rand, beta, context, **net_kwargs)
    err = (e_theta - e_rand) ** 2
    if loss_mask is not None:
        keep = (~loss_mask)[..., None].astype(err.dtype)
        return jnp.sum(err * keep) / jnp.maximum(jnp.sum(keep) * err.shape[-1]
                                                 / keep.shape[-1], 1.0)
    return jnp.mean(err)


def nfe_count(num_steps: int = 100, stride: int = 2) -> int:
    """Denoiser function evaluations per sampling call (the reference counts
    NFEs at diffusion.py:540; here the schedule is static so the count is a
    closed form of the config)."""
    return len(np.arange(num_steps, 0, -stride))


def sample(net_apply: Callable, sched: VarianceSchedule, key,
           n_samples: int, context, horizon: int, point_dim: int = 2,
           sampling: str = "ddim", stride: int = 2, flexibility: float = 0.0,
           bestof: bool = True, **net_kwargs):
    """Reverse diffusion (sample_sicnav_inference:478-541): all
    samples x agents denoised in one batch, loop over t as lax.scan.

    context: (B, F). Returns (n_samples, B, horizon, point_dim).
    """
    B = context.shape[0]
    bs = n_samples * B
    ctx = jnp.tile(context, (n_samples, 1))
    k_init, k_loop = jax.random.split(key)
    if bestof:
        x_T = jax.random.normal(k_init, (bs, horizon, point_dim))
    else:
        x_T = jnp.zeros((bs, horizon, point_dim))

    ts = np.arange(sched.num_steps, 0, -stride)        # static schedule
    keys = jax.random.split(k_loop, len(ts))

    def body(x_t, inp):
        t, k = inp
        z = jnp.where(t > 1, jax.random.normal(k, x_t.shape), 0.0)
        alpha = sched.alphas[t]
        alpha_bar = sched.alpha_bars[t]
        alpha_bar_next = sched.alpha_bars[jnp.maximum(t - stride, 0)]
        sigma = (sched.sigmas_flex[t] * flexibility +
                 sched.sigmas_inflex[t] * (1 - flexibility))
        beta = jnp.full((bs,), sched.betas[t])
        e_theta = net_apply(x_t, beta, ctx, **net_kwargs)
        if sampling == "ddpm":
            c0 = 1.0 / jnp.sqrt(alpha)
            c1 = (1 - alpha) / jnp.sqrt(1 - alpha_bar)
            x_next = c0 * (x_t - c1 * e_theta) + sigma * z
        elif sampling == "ddim":
            x0_t = (x_t - e_theta * jnp.sqrt(1 - alpha_bar)) / jnp.sqrt(alpha_bar)
            x_next = (jnp.sqrt(alpha_bar_next) * x0_t +
                      jnp.sqrt(1 - alpha_bar_next) * e_theta)
        else:
            raise ValueError(sampling)
        return x_next, None

    x_0, _ = jax.lax.scan(body, x_T, (jnp.asarray(ts), keys))
    return x_0.reshape(n_samples, B, horizon, point_dim)
