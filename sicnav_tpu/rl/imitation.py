"""Imitation-learning bootstrap: ORCA demonstrations -> value regression.

Port of RL_nav/imitation_learning/{explorer,memory,trainer}.py: run the
ORCA-plus policy as the robot over vectorized envs, label every visited
state with its discounted return (Explorer.run_k_episodes:21), then fit the
value network by MSE (Trainer.optimize_epoch:28 — SGD with momentum).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax

from sicnav_tpu.env import crowd_sim, rollout
from sicnav_tpu.env.types import EnvConfig
from sicnav_tpu.policies.orca_robot import orca_robot_action


@dataclasses.dataclass(frozen=True)
class ILConfig:
    """[imitation_learning] of sarl_policy.config."""
    il_episodes: int = 300
    il_epochs: int = 100
    il_learning_rate: float = 0.01
    momentum: float = 0.9
    gamma: float = 0.9
    safety_space: float = 0.15
    batch_size: int = 100


def collect_demonstrations(env_cfg: EnvConfig, il: ILConfig, seed: int = 0,
                           n_episodes: int = None, max_steps: int = None):
    """Batched ORCA-plus rollouts with discounted-return state values.

    Returns arrays (robot (N, 9), humans (N, H, 5), hmask (N, H),
    values (N,)). Value labeling: gamma^((steps-to-go) * dt * v_pref) times
    the episode outcome (success = 1). This is the dominant term of
    Explorer.run_k_episodes' discounted-return labels; intermediate reward
    terms (collision/discomfort contributions along the way) are not yet
    accumulated — ORCA demonstrations are collision-free so the difference
    is the rare discomfort term only.
    """
    n_episodes = n_episodes or il.il_episodes
    max_steps = max_steps or int(env_cfg.time_limit / env_cfg.dt) + 2
    # ORCA demonstration robot is holonomic
    cfg = dataclasses.replace(env_cfg, robot_kinematics="holonomic")

    keys = jax.random.split(jax.random.PRNGKey(seed), n_episodes)
    states = jax.vmap(lambda k: crowd_sim.reset_device(k, cfg))(keys)

    pol = lambda s: orca_robot_action(s, cfg, safety_space=il.safety_space)
    _, stats, traj = rollout.batch_rollout(states, pol, cfg, max_steps)
    # traj leaves: (B, T, ...); rewards via re-stepping are embedded in stats;
    # recompute per-step rewards from the trajectory for the returns:
    robot = jax.vmap(jax.vmap(crowd_sim.robot_full_state))(traj)   # (B,T,9)
    humans = jax.vmap(jax.vmap(
        lambda s: crowd_sim.observable_human_states(s)[0]))(traj)
    hmask = traj.h_mask                                             # (B,T,H)
    live = ~traj.done                                               # (B,T)

    # discounted returns from the per-episode total: label each visited state
    # with gamma^(dt*v_pref)^(steps-to-go) * final reward-to-go approximation
    adj_gamma = il.gamma ** (cfg.dt * cfg.robot_v_pref)
    # terminal value: +success , collision penalty etc. folded into reward sum
    B, T = live.shape
    succ = stats.success.astype(jnp.float32)

    steps = stats.steps.astype(jnp.float32)
    t_idx = jnp.arange(T)[None, :].astype(jnp.float32)
    steps_to_go = jnp.maximum(steps[:, None] - t_idx, 0.0)
    values = (adj_gamma ** steps_to_go) * succ[:, None]
    valid = live

    def flat(x):
        return x.reshape((B * T,) + x.shape[2:])

    keep = np.asarray(flat(valid))
    return (np.asarray(flat(robot))[keep], np.asarray(flat(humans))[keep],
            np.asarray(flat(hmask))[keep], np.asarray(flat(values))[keep])


def fit_value_net(net, data, il: ILConfig = ILConfig(), seed: int = 0,
                  init_params=None):
    """MSE regression of the value net to demonstration returns
    (Trainer.optimize_epoch: SGD + momentum)."""
    robot, humans, hmask, values = data
    N = robot.shape[0]
    key = jax.random.PRNGKey(seed)
    if init_params is None:
        init_params = net.init(key, jnp.asarray(robot[0]),
                               jnp.asarray(humans[0]), jnp.asarray(hmask[0]))
    params = init_params
    tx = optax.chain(optax.clip_by_global_norm(1.0),
                     optax.sgd(il.il_learning_rate, momentum=il.momentum))
    opt_state = tx.init(params)

    @jax.jit
    def train_batch(params, opt_state, r, h, m, v):
        def loss_fn(p):
            pred = net.apply(p, r, h, m)
            return jnp.mean((pred - v) ** 2)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    bs = il.batch_size
    losses = []
    for epoch in range(il.il_epochs):
        key, k = jax.random.split(key)
        perm = np.asarray(jax.random.permutation(k, N))
        ep = []
        for i in range(0, N - bs + 1, bs):
            idx = perm[i:i + bs]
            params, opt_state, loss = train_batch(
                params, opt_state, jnp.asarray(robot[idx]),
                jnp.asarray(humans[idx]), jnp.asarray(hmask[idx]),
                jnp.asarray(values[idx]))
            ep.append(float(loss))
        losses.append(float(np.mean(ep)) if ep else np.nan)
    return params, losses
