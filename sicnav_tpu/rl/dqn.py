"""DQN over vectorized crowd-nav environments.

TPU-native replacement for the reference's SB3 fork
(RL_nav/SB3_models/DQNGeneral.py + RL_train.py): the Dict-observation
contortion — the env embedding one-step lookahead states and rewards for
every discrete action into the observation (crowd_sim_plus.py
SARL_input_complete:797-811) — becomes an in-graph vmapped branch
evaluation; rollout collection, the on-device replay buffer, the
epsilon-schedule, target-network updates and the fitted-value train step
are all jitted and run over thousands of parallel envs.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from sicnav_tpu.env import crowd_sim
from sicnav_tpu.env.crowd_sim import step_with_human_actions
from sicnav_tpu.env.human_policies import human_actions
from sicnav_tpu.env.types import EnvConfig, SimState


@dataclasses.dataclass(frozen=True)
class DQNConfig:
    """Defaults = RL_nav/configs/sarl_policy.config [rl]/[train]."""
    gamma: float = 0.9
    lr: float = 5e-4
    total_timesteps: int = 200_000
    buffer_capacity: int = 100_000
    batch_size: int = 100
    target_update_interval: int = 50
    eps_start: float = 0.5
    eps_end: float = 0.1
    eps_decay: int = 4000
    # discrete action space (crowd_sim_plus.build_action_space:275-301)
    speed_samples: int = 5
    rotation_samples: int = 6
    rotation_bound_per_second: float = 180.0
    learning_starts: int = 1000


def build_action_space(cfg: EnvConfig, dqn: DQNConfig) -> jnp.ndarray:
    """(A, 2) discrete (v, r) actions: exp-spaced speeds x linspace rotations
    plus the null action (crowd_sim_plus.py:286-297)."""
    v_pref = cfg.robot_v_pref
    n_s, n_r = dqn.speed_samples, dqn.rotation_samples
    speeds = [(np.exp((i + 1) / n_s) - 1) / (np.e - 1) * v_pref
              for i in range(n_s)]
    bound = dqn.rotation_bound_per_second * cfg.dt * np.pi / 180.0
    rotations = np.linspace(-bound, bound, n_r, endpoint=False)
    actions = [(0.0, 0.0)]
    for r in rotations:
        for s in speeds:
            actions.append((s, r))
    return jnp.asarray(np.array(actions, np.float32))


def lookahead(state: SimState, actions: jnp.ndarray, cfg: EnvConfig):
    """Evaluate every discrete action: one human-policy evaluation, vmapped
    robot branches (the TPU-native form of SARL_input_complete, SURVEY §3.3).

    Returns (robot_states (A, 9), human_states (A, H, 5), rewards (A,),
    dones (A,))."""
    h_act = human_actions(state, cfg)

    def branch(a):
        s2, rew, info = step_with_human_actions(state, a, h_act, cfg)
        rs = crowd_sim.robot_full_state(s2)
        hs, _ = crowd_sim.observable_human_states(s2)
        return rs, hs, rew, info.done

    return jax.vmap(branch)(actions)


def lookahead2(state: SimState, actions: jnp.ndarray, cfg: EnvConfig):
    """Two-step lookahead (the rgl_multistep observation scheme,
    crowd_sim_plus.RGL_multistep_input_complete:842-866): for every pair of
    discrete actions (a, b), the state and reward after playing a then b.

    Returns (robot_states (A, A, 9), human_states (A, A, H, 5),
    rewards1 (A,), rewards2 (A, A), done1 (A,))."""
    h_act = human_actions(state, cfg)

    def branch(a):
        s1, rew1, info1 = step_with_human_actions(state, a, h_act, cfg)
        h_act2 = human_actions(s1, cfg)

        def branch2(b):
            s2, rew2, info2 = step_with_human_actions(s1, b, h_act2, cfg)
            return (crowd_sim.robot_full_state(s2),
                    crowd_sim.observable_human_states(s2)[0], rew2)

        rs2, hs2, rew2 = jax.vmap(branch2)(actions)
        return rs2, hs2, rew1, rew2, info1.done

    rs2, hs2, rew1, rew2, done1 = jax.vmap(branch)(actions)
    return rs2, hs2, rew1, rew2, done1


def make_q2_fn(net, env_cfg: EnvConfig, dqn: DQNConfig, actions):
    """Two-step Q for rgl_multistep:
    Q(s, a) = r_a + g * max_b [ r_ab + g * V(s''_ab) ]."""
    adj_gamma = dqn.gamma ** (env_cfg.dt * env_cfg.robot_v_pref)

    def q_values(params, state: SimState):
        rs2, hs2, rew1, rew2, done1 = lookahead2(state, actions, env_cfg)
        A = actions.shape[0]
        hmask = jnp.broadcast_to(state.h_mask[None, None],
                                 (A, A) + state.h_mask.shape)
        v2 = net.apply(params, rs2, hs2, hmask)          # (A, A)
        q2 = rew2 + adj_gamma * v2
        return rew1 + adj_gamma * jnp.where(done1, 0.0, jnp.max(q2, axis=-1))

    return q_values


class Transition(NamedTuple):
    robot: jnp.ndarray       # (9,)
    humans: jnp.ndarray      # (H, 5)
    hmask: jnp.ndarray       # (H,)
    next_robot: jnp.ndarray
    next_humans: jnp.ndarray
    reward: jnp.ndarray
    done: jnp.ndarray


class ReplayBuffer(NamedTuple):
    data: Transition         # stacked, capacity-leading
    idx: jnp.ndarray
    size: jnp.ndarray

    @staticmethod
    def create(capacity: int, H: int):
        z = jnp.zeros
        data = Transition(z((capacity, 9)), z((capacity, H, 5)),
                          z((capacity, H), bool), z((capacity, 9)),
                          z((capacity, H, 5)), z((capacity,)),
                          z((capacity,), bool))
        return ReplayBuffer(data, jnp.int32(0), jnp.int32(0))


def buffer_add(buf: ReplayBuffer, batch: Transition, n: int) -> ReplayBuffer:
    """Insert a batch of n transitions (ring)."""
    cap = buf.data.reward.shape[0]
    locs = (buf.idx + jnp.arange(n)) % cap
    data = jax.tree.map(lambda d, b: d.at[locs].set(b), buf.data, batch)
    return ReplayBuffer(data, (buf.idx + n) % cap,
                        jnp.minimum(buf.size + n, cap))


def buffer_sample(buf: ReplayBuffer, key, batch_size: int) -> Transition:
    idx = jax.random.randint(key, (batch_size,), 0,
                             jnp.maximum(buf.size, 1))
    return jax.tree.map(lambda d: d[idx], buf.data)


def epsilon(step, dqn: DQNConfig):
    frac = jnp.clip(step / dqn.eps_decay, 0.0, 1.0)
    return dqn.eps_start + frac * (dqn.eps_end - dqn.eps_start)


def make_q_fn(net, env_cfg: EnvConfig, dqn: DQNConfig, actions):
    """Q(s, a) = r_a + gamma^(dt * v_pref) * V(s'_a) (SARL.py:95-116)."""
    adj_gamma = dqn.gamma ** (env_cfg.dt * env_cfg.robot_v_pref)

    def q_values(params, state: SimState):
        rs, hs, rew, done = lookahead(state, actions, env_cfg)
        hmask = jnp.broadcast_to(state.h_mask[None],
                                 (actions.shape[0],) + state.h_mask.shape)
        v = net.apply(params, rs, hs, hmask)
        return rew + adj_gamma * jnp.where(done, 0.0, v)

    return q_values


@functools.partial(jax.jit, static_argnames=("net", "tx"))
def train_step(net, tx, params, target_params, opt_state, batch: Transition,
               gamma: float):
    """Fitted value iteration (DQNGeneral.train + SARL.calc_target_values):
    V(s) <- r + (1 - done) * gamma * V_target(s')."""
    v_next = net.apply(target_params, batch.next_robot, batch.next_humans,
                       batch.hmask)
    target = batch.reward + (1.0 - batch.done) * gamma * v_next

    def loss_fn(p):
        v = net.apply(p, batch.robot, batch.humans, batch.hmask)
        return jnp.mean((v - target) ** 2)

    loss, grads = jax.value_and_grad(loss_fn)(params)
    updates, opt_state = tx.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, loss


def make_collect_step(net, env_cfg: EnvConfig, dqn: DQNConfig, actions):
    """One vectorized env step with epsilon-greedy action selection.
    Returns a jitted fn (params, states, key, step) ->
    (new_states, Transition batch, resets_needed)."""
    q_fn = make_q_fn(net, env_cfg, dqn, actions)

    @jax.jit
    def collect(params, states: SimState, key, global_step):
        B = states.t.shape[0]
        k_eps, k_act, k_reset = jax.random.split(key, 3)
        q = jax.vmap(lambda s: q_fn(params, s))(states)      # (B, A)
        greedy = jnp.argmax(q, axis=-1)
        rand = jax.random.randint(k_act, (B,), 0, actions.shape[0])
        eps = epsilon(global_step, dqn)
        explore = jax.random.uniform(k_eps, (B,)) < eps
        act_idx = jnp.where(explore, rand, greedy)
        act = actions[act_idx]

        rs = jax.vmap(crowd_sim.robot_full_state)(states)
        hs = jax.vmap(lambda s: crowd_sim.observable_human_states(s)[0])(states)
        new_states, rew, info = jax.vmap(
            lambda s, a: crowd_sim.step(s, a, env_cfg))(states, act)
        nrs = jax.vmap(crowd_sim.robot_full_state)(new_states)
        nhs = jax.vmap(lambda s: crowd_sim.observable_human_states(s)[0])(new_states)

        trans = Transition(rs, hs, states.h_mask, nrs, nhs, rew, info.done)

        # auto-reset finished envs (device-side scenario generation)
        keys = jax.random.split(k_reset, B)
        fresh = jax.vmap(lambda k: crowd_sim.reset_device(k, env_cfg))(keys)
        new_states = jax.tree.map(
            lambda f, n: jnp.where(
                info.done.reshape((-1,) + (1,) * (n.ndim - 1)), f, n),
            fresh, new_states)
        return new_states, trans, info
    return collect


class EpisodeRates(NamedTuple):
    """Per-env episodic event counters + rolling completed-episode sums
    (the reference CustomCallback's Collision/Frozen/Danger per-episode
    occurrence rates + ReachGoal/Timeout rolling rates,
    RL_nav/SB3_Support/callbacks.py:62-77)."""
    steps: jnp.ndarray       # (B,) steps in the running episode
    coll: jnp.ndarray        # (B,) event steps in the running episode
    wall: jnp.ndarray
    frozen: jnp.ndarray
    danger: jnp.ndarray
    ep_count: jnp.ndarray    # () completed episodes since last log
    reach: jnp.ndarray       # () completed with ReachGoal
    timeout: jnp.ndarray     # () completed with Timeout
    rate_coll: jnp.ndarray   # () sum of per-episode step-fractions
    rate_wall: jnp.ndarray
    rate_frozen: jnp.ndarray
    rate_danger: jnp.ndarray


def init_episode_rates(n_envs: int) -> EpisodeRates:
    z = jnp.zeros((n_envs,), jnp.float32)
    s = jnp.float32(0.0)
    return EpisodeRates(z, z, z, z, z, s, s, s, s, s, s, s)


@jax.jit
def update_episode_rates(acc: EpisodeRates, info) -> EpisodeRates:
    steps = acc.steps + 1.0
    coll = acc.coll + info.collision
    wall = acc.wall + info.wall_collision
    frozen = acc.frozen + info.frozen
    danger = acc.danger + info.danger
    done = info.done
    fin = lambda ev: jnp.sum(jnp.where(done, ev / steps, 0.0))
    acc = EpisodeRates(
        steps=jnp.where(done, 0.0, steps),
        coll=jnp.where(done, 0.0, coll),
        wall=jnp.where(done, 0.0, wall),
        frozen=jnp.where(done, 0.0, frozen),
        danger=jnp.where(done, 0.0, danger),
        ep_count=acc.ep_count + jnp.sum(done),
        reach=acc.reach + jnp.sum(done & info.reach_goal),
        timeout=acc.timeout + jnp.sum(done & info.timeout),
        rate_coll=acc.rate_coll + fin(coll),
        rate_wall=acc.rate_wall + fin(wall),
        rate_frozen=acc.rate_frozen + fin(frozen),
        rate_danger=acc.rate_danger + fin(danger))
    return acc


def episode_rates_record(acc: EpisodeRates) -> dict:
    n = max(float(acc.ep_count), 1.0)
    return {
        "episodes": float(acc.ep_count),
        "reach_goal_rate": float(acc.reach) / n,
        "timeout_rate": float(acc.timeout) / n,
        "collision_rate": float(acc.rate_coll) / n,
        "wall_collision_rate": float(acc.rate_wall) / n,
        "frozen_rate": float(acc.rate_frozen) / n,
        "danger_rate": float(acc.rate_danger) / n,
    }


def train(net, env_cfg: EnvConfig, dqn: DQNConfig = DQNConfig(),
          n_envs: int = 32, seed: int = 0, total_steps: int = None,
          init_params=None, log_every: int = 200, log_dir: str = None,
          tensorboard: bool = False, mesh=None, save_freq: int = 0,
          checkpoint_dir: str = None):
    """Full DQN training loop. Returns (params, metrics history).

    ``log_dir`` streams JSONL metrics (utils/metrics.MetricsLogger);
    ``tensorboard=True`` additionally writes TB event files like the
    reference's CustomCallback (RL_nav/SB3_Support/callbacks.py:62-77).
    ``mesh`` (jax.sharding.Mesh): data-parallel training — the env batch
    and sampled replay batches shard over the mesh's data axis, params
    replicate, and XLA all-reduces the gradients over ICI.

    ``save_freq`` > 0 with ``checkpoint_dir`` checkpoints params + target
    + optimizer + the FULL replay buffer every save_freq env steps (the
    reference CustomCallback's model+replay-buffer saves,
    RL_nav/SB3_Support/callbacks.py:27-80); training resumes losslessly
    via ``load_train_checkpoint``."""
    logger = None
    if log_dir is not None:
        from sicnav_tpu.utils.metrics import MetricsLogger
        logger = MetricsLogger(log_dir, "dqn", tensorboard=tensorboard)
    actions = build_action_space(env_cfg, dqn)
    key = jax.random.PRNGKey(seed)
    key, k_init, k_env = jax.random.split(key, 3)

    H = env_cfg.max_humans
    if init_params is None:
        init_params = net.init(k_init, jnp.zeros(9), jnp.zeros((H, 5)),
                               jnp.ones(H, bool))
    params = init_params
    target_params = params
    tx = optax.adam(dqn.lr)
    opt_state = tx.init(params)

    states = jax.vmap(lambda k: crowd_sim.reset_device(k, env_cfg))(
        jax.random.split(k_env, n_envs))
    buf = ReplayBuffer.create(dqn.buffer_capacity, H)
    collect = make_collect_step(net, env_cfg, dqn, actions)

    shard = lambda x: x
    if mesh is not None:
        from sicnav_tpu.parallel.mesh import replicate, shard_batch
        assert n_envs % mesh.devices.size == 0
        shard = lambda tree: shard_batch(tree, mesh)
        states = shard(states)
        params = replicate(params, mesh)
        target_params = params
        opt_state = replicate(opt_state, mesh)

    total = total_steps or dqn.total_timesteps
    history = []
    step_count = 0
    ep_rates = init_episode_rates(n_envs)
    while step_count < total:
        key, k = jax.random.split(key)
        states, trans, info = collect(params, states, k, step_count)
        buf = buffer_add(buf, trans, n_envs)
        ep_rates = update_episode_rates(ep_rates, info)
        step_count += n_envs

        if step_count > dqn.learning_starts:
            key, k = jax.random.split(key)
            batch = buffer_sample(buf, k, dqn.batch_size)
            if mesh is not None and dqn.batch_size % mesh.devices.size == 0:
                batch = shard(batch)
            params, opt_state, loss = train_step(net, tx, params,
                                                 target_params, opt_state,
                                                 batch, dqn.gamma)
            if (step_count // n_envs) % dqn.target_update_interval == 0:
                target_params = params
            if (step_count // n_envs) % log_every == 0:
                rec = {"step": step_count, "loss": float(loss),
                       "eps": float(epsilon(step_count, dqn)),
                       "reward_mean": float(jnp.mean(trans.reward)),
                       "done_rate": float(jnp.mean(trans.done))}
                # per-episode Collision/Frozen/Danger/ReachGoal/Timeout
                # rates over the window (CustomCallback parity)
                rec.update(episode_rates_record(ep_rates))
                ep_rates = init_episode_rates(n_envs)._replace(
                    steps=ep_rates.steps, coll=ep_rates.coll,
                    wall=ep_rates.wall, frozen=ep_rates.frozen,
                    danger=ep_rates.danger)
                history.append(rec)
                if logger is not None:
                    logger.log(**rec)
        if (save_freq and checkpoint_dir and
                step_count % max(save_freq - save_freq % n_envs, n_envs) == 0):
            save_train_checkpoint(checkpoint_dir, step_count, params,
                                  target_params, opt_state, buf)
    if save_freq and checkpoint_dir:
        save_train_checkpoint(checkpoint_dir, step_count, params,
                              target_params, opt_state, buf)
    if logger is not None:
        logger.close()
    return params, history


def save_train_checkpoint(path, step, params, target_params, opt_state,
                          buf: ReplayBuffer):
    """Persist the full training state incl. the replay buffer
    (callbacks.py:27-80 model + replay-buffer save)."""
    import os
    import pickle

    os.makedirs(path, exist_ok=True)
    state = dict(step=int(step),
                 params=jax.tree.map(np.asarray, params),
                 target_params=jax.tree.map(np.asarray, target_params),
                 opt_state=jax.tree.map(np.asarray, opt_state),
                 buffer=jax.tree.map(np.asarray, buf))
    tmp = os.path.join(path, "train_state.pkl.tmp")
    with open(tmp, "wb") as f:
        pickle.dump(state, f)
    os.replace(tmp, os.path.join(path, "train_state.pkl"))


def load_train_checkpoint(path):
    """Returns (step, params, target_params, opt_state, ReplayBuffer)."""
    import os
    import pickle

    with open(os.path.join(path, "train_state.pkl"), "rb") as f:
        st = pickle.load(f)
    to_dev = lambda tree: jax.tree.map(jnp.asarray, tree)
    buf = st["buffer"]
    buf = ReplayBuffer(Transition(*[jnp.asarray(x) for x in buf.data]),
                       jnp.asarray(buf.idx), jnp.asarray(buf.size))
    return (st["step"], to_dev(st["params"]), to_dev(st["target_params"]),
            to_dev(st["opt_state"]), buf)
