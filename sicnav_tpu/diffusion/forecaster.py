"""Human trajectory forecaster for the closed control loop.

Functional port of sicnav_diffusion/JMID/mid_sim_wrapper.py
(HumanTrajectoryForecasterSim): a per-human position-history ring buffer,
scene construction around the robot with attention-radius clustering
(convert_to_mid_state_env:313-437 — agents outside the cluster get
constant-velocity dummy forecasts :413-429), batched diffusion sampling,
and KDE top-k ranking (get_most_likely_samples). The whole predict step is
one jittable function; the pandas resampling of the reference is
unnecessary in-sim (history is sampled at the model dt by construction).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from sicnav_tpu.diffusion import kde
from sicnav_tpu.diffusion.data import ATTENTION_RADIUS
from sicnav_tpu.diffusion.mid import JMIDModel
from sicnav_tpu.diffusion.data import SceneBatch
from sicnav_tpu.env.types import SimState


@dataclasses.dataclass(frozen=True)
class ForecasterConfig:
    """Defaults from env.config [human_trajectory_forecaster]."""
    past_frames: int = 6
    horizon: int = 8
    num_samples: int = 100
    num_ret_samples: int = 10
    # DDIM stride over the 100-step schedule (test_time_configs num_steps);
    # NFE per forecast = 100 / stride
    ddim_stride: int = 2
    dt: float = 0.25
    joint: bool = True
    cluster_radius: float = ATTENTION_RADIUS


class ForecasterState(NamedTuple):
    hist: jnp.ndarray       # (H, T_h, 2) position history (old -> new)
    count: jnp.ndarray      # (H,) valid frames per human


def init_state(max_humans: int, cfg: ForecasterConfig) -> ForecasterState:
    return ForecasterState(
        hist=jnp.zeros((max_humans, cfg.past_frames, 2), jnp.float32),
        count=jnp.zeros((max_humans,), jnp.int32))


def update_state_hists(fstate: ForecasterState, sim: SimState,
                       cfg: ForecasterConfig) -> ForecasterState:
    """Push current human positions (mid_sim_wrapper.update_state_hists)."""
    hist = jnp.concatenate([fstate.hist[:, 1:], sim.h_pos[:, None, :]], axis=1)
    count = jnp.minimum(fstate.count + 1, cfg.past_frames)
    return ForecasterState(hist=hist, count=count)


def _scene_batch_from_hist(fstate: ForecasterState, sim: SimState,
                           cfg: ForecasterConfig) -> SceneBatch:
    """Histories -> SceneBatch (finite-diff vel/acc, masks)."""
    T = cfg.past_frames
    pos = fstate.hist                                   # (H, T, 2)
    dvel = jnp.diff(pos, axis=1) / cfg.dt
    vel = jnp.concatenate([dvel[:, :1], dvel], axis=1)
    dacc = jnp.diff(vel, axis=1) / cfg.dt
    acc = jnp.concatenate([dacc[:, :1], dacc], axis=1)
    hist = jnp.concatenate([pos, vel, acc], axis=-1)

    frame_idx = jnp.arange(T)[None, :]
    hist_mask = frame_idx >= (T - fstate.count[:, None])
    agent_mask = sim.h_mask & (fstate.count > 0)

    cur = sim.h_pos
    d = jnp.linalg.norm(cur[:, None] - cur[None, :], axis=-1)
    H = cur.shape[0]
    neighbor_mask = (d < ATTENTION_RADIUS) & agent_mask[:, None] & \
        agent_mask[None, :] & ~jnp.eye(H, dtype=bool)

    F = cfg.horizon
    return SceneBatch(
        hist=jnp.where(hist_mask[..., None], hist, 0.0),
        hist_mask=hist_mask,
        fut_vel=jnp.zeros((H, F, 2), jnp.float32),
        fut_mask=jnp.zeros((H, F), bool),
        agent_mask=agent_mask,
        neighbor_mask=neighbor_mask)


def cvmm_forecast(sim: SimState, cfg: ForecasterConfig):
    """Constant-velocity dummy forecast (mid_sim_wrapper:413-429):
    (H, T_f, 2)."""
    steps = (jnp.arange(cfg.horizon) + 1)[None, :, None] * cfg.dt
    return sim.h_pos[:, None, :] + sim.h_vel[:, None, :] * steps


@functools.partial(jax.jit, static_argnames=("model", "cfg"))
def predict_ret_best(model: JMIDModel, params, fstate: ForecasterState,
                     sim: SimState, key, cfg: ForecasterConfig):
    """Forecast + rank. Returns (forecasts (H, k, horizon+1, 2) with the
    current pose prepended, log_weights (H, k)) —
    mid_sim_wrapper.predict_ret_best:482-511 semantics."""
    batch = _scene_batch_from_hist(fstate, sim, cfg)

    # cluster around the robot: humans beyond the radius get CVMM forecasts
    dist_to_rob = jnp.linalg.norm(sim.h_pos - sim.r_pos[None], axis=-1)
    in_cluster = batch.agent_mask & (dist_to_rob < cfg.cluster_radius)
    batch = batch._replace(agent_mask=in_cluster,
                           neighbor_mask=batch.neighbor_mask &
                           in_cluster[:, None] & in_cluster[None, :])

    samples = model.apply(params, batch, key, cfg.num_samples,
                          stride=cfg.ddim_stride,
                          method=JMIDModel.sample)      # (S, H, T_f, 2)

    cv = cvmm_forecast(sim, cfg)
    samples = jnp.where(in_cluster[None, :, None, None], samples, cv[None])

    top, log_w = kde.most_likely_samples(samples, cfg.num_ret_samples,
                                         joint=cfg.joint)
    # prepend the current pose (predict_ret_best:495-505)
    k = cfg.num_ret_samples
    cur = jnp.broadcast_to(sim.h_pos[:, None, None, :],
                           (sim.h_pos.shape[0], k, 1, 2))
    return jnp.concatenate([cur, top], axis=2), log_w
