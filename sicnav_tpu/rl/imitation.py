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


def discounted_reward_to_go(rewards, live, adj_gamma):
    """Per-visited-state labels: value_i = sum_{t>=i} adj_gamma^(t-i) * r_t
    (explorer.update_memory:108-117 imitation branch). rewards/live: (T,)."""
    r = jnp.where(live, rewards, 0.0)

    def back(acc, r_t):
        acc = r_t + adj_gamma * acc
        return acc, acc

    _, vals = jax.lax.scan(back, jnp.float32(0.0), r, reverse=True)
    return vals


def collect_demonstrations(env_cfg: EnvConfig, il: ILConfig, seed: int = 0,
                           n_episodes: int = None, max_steps: int = None):
    """Batched ORCA-plus rollouts with discounted-return state values.

    Returns arrays (robot (N, 9), humans (N, H, 5), hmask (N, H),
    values (N,)). Value labeling follows Explorer.run_k_episodes /
    update_memory (RL_nav/imitation_learning/explorer.py:21,104-117): each
    visited state of a SUCCESSFUL episode is labeled with the full
    discounted cumulative reward-to-go sum_{t>=i} gamma^((t-i) dt v_pref) r_t
    (success episodes only — update_memory is gated on ReachGoal)."""
    n_episodes = n_episodes or il.il_episodes
    max_steps = max_steps or int(env_cfg.time_limit / env_cfg.dt) + 2
    # ORCA demonstration robot is holonomic
    cfg = dataclasses.replace(env_cfg, robot_kinematics="holonomic")

    keys = jax.random.split(jax.random.PRNGKey(seed), n_episodes)
    states = jax.vmap(lambda k: crowd_sim.reset_device(k, cfg))(keys)

    pol = lambda s: orca_robot_action(s, cfg, safety_space=il.safety_space)
    _, stats, traj = rollout.batch_rollout(states, pol, cfg, max_steps)
    # traj holds post-step states; the visited (pre-step) state at t is
    # states for t=0 and traj[t-1] after — recompute each step's reward by
    # replaying the deterministic policy + env step on the visited state
    pre = jax.tree.map(
        lambda s0, tr: jnp.concatenate([s0[:, None], tr[:, :-1]], axis=1),
        states, traj)

    @jax.jit
    def replay(pre):
        def one(s):
            a = pol(s)
            _, r, _ = crowd_sim.step_masked(s, a, cfg)
            return r
        return jax.vmap(jax.vmap(one))(pre)

    rewards = replay(pre)                                          # (B,T)
    live = ~pre.done                                               # (B,T)

    robot = jax.vmap(jax.vmap(crowd_sim.robot_full_state))(pre)    # (B,T,9)
    humans = jax.vmap(jax.vmap(
        lambda s: crowd_sim.observable_human_states(s)[0]))(pre)
    hmask = pre.h_mask                                             # (B,T,H)

    adj_gamma = jnp.float32(il.gamma ** (cfg.dt * cfg.robot_v_pref))
    values = jax.vmap(lambda r, l: discounted_reward_to_go(r, l, adj_gamma))(
        rewards, live)
    B, T = live.shape
    # reference gates memory updates on episode success
    valid = live & stats.success[:, None]

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
