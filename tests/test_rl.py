"""RL layer tests: networks, lookahead semantics, replay, short DQN run."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from sicnav_tpu.env.types import EnvConfig
from sicnav_tpu.env import crowd_sim as CS
from sicnav_tpu.rl.networks import SARLNetwork, RGLNetwork, input_transformation
from sicnav_tpu.rl import dqn as D

ENV = EnvConfig(scenario="circle_crossing", human_policy="orca", human_num=3,
                max_humans=3, starts_moving=0, robot_kinematics="unicycle")
DQN = D.DQNConfig(buffer_capacity=500, learning_starts=32, eps_decay=100)


def test_action_space_structure():
    acts = np.asarray(D.build_action_space(ENV, DQN))
    assert acts.shape == (1 + 5 * 6, 2)
    np.testing.assert_allclose(acts[0], [0.0, 0.0])
    # speeds exponential in (0, v_pref]
    assert acts[1:, 0].max() <= ENV.robot_v_pref + 1e-6
    assert (acts[1:, 0] > 0).all()


def test_input_transformation():
    robot = jnp.array([1.0, 2.0, 0.1, 0.2, 0.25, 4.0, 6.0, 1.0, 0.5])
    humans = jnp.array([[2.0, 3.0, -0.1, 0.0, 0.3]])
    out = np.asarray(input_transformation(robot, humans))[0]
    np.testing.assert_allclose(out[:6], [3.0, 4.0, 1.0, 0.25, 0.1, 0.2],
                               atol=1e-6)
    np.testing.assert_allclose(out[6:8], [1.0, 1.0], atol=1e-6)      # px1, py1
    np.testing.assert_allclose(out[11], np.sqrt(2), atol=1e-6)       # da
    np.testing.assert_allclose(out[12], 0.55, atol=1e-6)             # r_sum


@pytest.mark.slow
def test_sarl_mask_invariance():
    """Padded human slots must not change the value."""
    net = SARLNetwork()
    key = jax.random.PRNGKey(0)
    robot = jax.random.normal(key, (9,))
    humans = jax.random.normal(key, (3, 5))
    params = net.init(key, robot, humans, jnp.ones(3, bool))
    mask = jnp.array([True, True, False])
    v1 = net.apply(params, robot, humans, mask)
    humans2 = humans.at[2].set(999.0)   # garbage in the masked slot
    v2 = net.apply(params, robot, humans2, mask)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-4)


@pytest.mark.slow
def test_lookahead_matches_step():
    state = CS.reset_host(ENV, case=0)
    actions = D.build_action_space(ENV, DQN)
    rs, hs, rew, done = D.lookahead(state, actions, ENV)
    assert rs.shape == (31, 9) and hs.shape == (31, 3, 5)
    # branch 5 must equal a direct env step with that action
    s2, r2, info2 = CS.step(state, actions[5], ENV)
    np.testing.assert_allclose(np.asarray(rs[5]),
                               np.asarray(CS.robot_full_state(s2)), atol=1e-5)
    np.testing.assert_allclose(float(rew[5]), float(r2), atol=1e-5)


def test_replay_buffer_ring():
    buf = D.ReplayBuffer.create(8, 3)
    t = D.Transition(jnp.ones((4, 9)), jnp.ones((4, 3, 5)),
                     jnp.ones((4, 3), bool), jnp.ones((4, 9)),
                     jnp.ones((4, 3, 5)), jnp.arange(4.0), jnp.zeros(4, bool))
    buf = D.buffer_add(buf, t, 4)
    assert int(buf.size) == 4
    buf = D.buffer_add(buf, t, 4)
    buf = D.buffer_add(buf, t, 4)   # wraps
    assert int(buf.size) == 8
    batch = D.buffer_sample(buf, jax.random.PRNGKey(0), 16)
    assert batch.reward.shape == (16,)


@pytest.mark.slow
def test_short_dqn_run():
    net = SARLNetwork()
    params, hist = D.train(net, ENV, DQN, n_envs=4, total_steps=120,
                           log_every=2)
    assert all(np.isfinite(h["loss"]) for h in hist)
    # CustomCallback-parity per-episode rates present and sane
    for h in hist:
        for k in ("collision_rate", "frozen_rate", "danger_rate",
                  "reach_goal_rate", "timeout_rate",
                  "wall_collision_rate"):
            assert k in h and 0.0 <= h[k] <= 1.0


def test_episode_rates_accumulator():
    """Per-episode rate semantics: an episode with 2 collision steps out
    of 4 contributes a 0.5 collision rate; rates average over completed
    episodes only (callbacks.py:62-77)."""
    import jax.numpy as jnp
    acc = D.init_episode_rates(2)
    from sicnav_tpu.env.types import StepInfo

    def info(coll, done, reach):
        z = jnp.zeros(2)
        b = lambda v: jnp.asarray(v, bool)
        return StepInfo(
            reach_goal=b(reach), timeout=b(done) & ~b(reach),
            collision=b(coll), wall_collision=b([False, False]),
            frozen=b([False, False]), danger=b(coll), dmin=z,
            r_success=z, r_timeout=z, r_collision=z, r_wall=z, r_danger=z,
            r_progress=z, r_freezing=z, r_angular=z, r_linear=z,
            total_reward=z, done=b(done))

    # env0: collision on steps 1, 2 of 4; env1: clean, never done
    acc = D.update_episode_rates(acc, info([True, False], [False, False],
                                           [False, False]))
    acc = D.update_episode_rates(acc, info([True, False], [False, False],
                                           [False, False]))
    acc = D.update_episode_rates(acc, info([False, False], [False, False],
                                           [False, False]))
    acc = D.update_episode_rates(acc, info([False, False], [True, False],
                                           [True, False]))
    rec = D.episode_rates_record(acc)
    assert rec["episodes"] == 1.0
    assert rec["collision_rate"] == 0.5
    assert rec["reach_goal_rate"] == 1.0
    assert rec["timeout_rate"] == 0.0


def test_rgl_forward_finite():
    net = RGLNetwork()
    key = jax.random.PRNGKey(1)
    robot = jax.random.normal(key, (9,))
    humans = jax.random.normal(key, (3, 5))
    params = net.init(key, robot, humans, jnp.ones(3, bool))
    v = net.apply(params, robot, humans, jnp.array([True, True, False]))
    assert np.isfinite(float(v))


@pytest.mark.slow
def test_il_labels_match_reference_formula():
    """IL value labels = full discounted reward-to-go per visited state
    (explorer.update_memory:108-117): oracle check on a toy reward sequence
    and on real collected demonstrations."""
    from sicnav_tpu.rl import imitation as IL

    # toy oracle: hand-computed reference formula
    rewards = jnp.array([0.1, -0.25, 0.0, 1.0], jnp.float32)
    live = jnp.array([True, True, True, True])
    g = 0.9 ** (0.25 * 1.0)
    vals = np.asarray(IL.discounted_reward_to_go(rewards, live, g))
    want = np.array([sum(g ** (t - i) * float(rewards[t]) for t in range(i, 4))
                     for i in range(4)], np.float32)
    np.testing.assert_allclose(vals, want, rtol=1e-5)

    # dead steps contribute nothing
    live2 = jnp.array([True, True, False, False])
    vals2 = np.asarray(IL.discounted_reward_to_go(rewards, live2, g))
    np.testing.assert_allclose(vals2[0], 0.1 + g * -0.25, rtol=1e-5)

    # end-to-end: successful demos carry the success reward in the labels
    cfg = EnvConfig(scenario="circle_crossing", human_policy="orca",
                    human_num=2, max_humans=2, starts_moving=0)
    il = IL.ILConfig()
    robot, humans, hmask, values = IL.collect_demonstrations(
        cfg, il, n_episodes=4, max_steps=30)
    assert len(values) > 0
    # last visited state of each episode gets ~ the terminal success reward
    assert values.max() > 0.9
    # all labels bounded by the max possible discounted return
    assert values.max() <= 1.0 + 1e-5


@pytest.mark.slow
def test_train_checkpoint_roundtrip(tmp_path):
    """save_freq checkpoints persist params + target + optimizer + replay
    buffer and reload losslessly (CustomCallback parity)."""
    cfg = EnvConfig(scenario="circle_crossing", human_policy="orca",
                    human_num=2, max_humans=2, starts_moving=0,
                    robot_kinematics="unicycle")
    net = SARLNetwork()
    dqn = D.DQNConfig(learning_starts=16, batch_size=16,
                      buffer_capacity=512)
    params, _ = D.train(net, cfg, dqn, n_envs=8, seed=1, total_steps=64,
                        save_freq=32, checkpoint_dir=str(tmp_path))
    step, p2, tp2, opt2, buf = D.load_train_checkpoint(str(tmp_path))
    assert step == 64
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    assert int(buf.size) > 0
    assert buf.data.robot.shape[0] == 512
