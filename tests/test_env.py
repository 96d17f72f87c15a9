"""Environment semantics tests (reset determinism, step integration,
reward/termination parity, batching)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from sicnav_tpu.env.types import EnvConfig, RewardConfig
from sicnav_tpu.env import crowd_sim as CS
from sicnav_tpu.env import rollout as R

CFG = EnvConfig(scenario="circle_crossing", human_policy="orca", human_num=4,
                starts_moving=0, robot_kinematics="unicycle")


def test_reset_determinism():
    s1 = CS.reset_host(CFG, case=7)
    s2 = CS.reset_host(CFG, case=7)
    np.testing.assert_array_equal(np.asarray(s1.h_pos), np.asarray(s2.h_pos))
    s3 = CS.reset_host(CFG, case=8)
    assert not np.allclose(np.asarray(s1.h_pos), np.asarray(s3.h_pos))


def test_reset_min_separation():
    for case in range(5):
        s = CS.reset_host(CFG, case=case)
        hp = np.asarray(s.h_pos)[np.asarray(s.h_mask)]
        hr = np.asarray(s.h_radius)[np.asarray(s.h_mask)]
        # humans vs robot with discomfort buffer
        for i in range(len(hp)):
            d = np.linalg.norm(hp[i] - np.asarray(s.r_pos))
            assert d >= hr[i] + float(s.r_radius) + CFG.rewards.discomfort_dist - 1e-5
        # humans pairwise
        for i in range(len(hp)):
            for j in range(i + 1, len(hp)):
                d = np.linalg.norm(hp[i] - hp[j])
                assert d >= hr[i] + hr[j] + CFG.rewards.discomfort_dist - 1e-5


@pytest.mark.slow
def test_unicycle_integration():
    s = CS.reset_host(CFG, case=0)
    a = jnp.array([0.8, 0.3])
    s2, _, _ = CS.step(s, a, CFG)
    theta_new = float(s.r_theta) + 0.3
    exp = np.asarray(s.r_pos) + 0.8 * 0.25 * np.array(
        [np.cos(theta_new), np.sin(theta_new)])
    np.testing.assert_allclose(np.asarray(s2.r_pos), exp, atol=1e-6)
    assert abs(float(s2.r_theta) - (((theta_new + np.pi) % (2 * np.pi)) - np.pi)) < 1e-6
    np.testing.assert_allclose(
        np.asarray(s2.r_vel),
        0.8 * np.array([np.cos(theta_new), np.sin(theta_new)]), atol=1e-6)


def test_success_and_done():
    s = CS.reset_host(CFG, case=0)
    # teleport robot near its goal
    s = s._replace(r_pos=jnp.array([0.0, CFG.circle_radius - 0.3]),
                   r_theta=jnp.float32(np.pi / 2))
    s2, rew, info = CS.step(s, jnp.array([0.8, 0.0]), CFG)
    assert bool(info.reach_goal)
    assert bool(info.done) and bool(s2.done)
    assert float(info.r_success) == 1.0


def test_timeout():
    s = CS.reset_host(CFG, case=0)
    s = s._replace(t=jnp.float32(CFG.time_limit))
    s2, rew, info = CS.step(s, jnp.array([0.0, 0.0]), CFG)
    assert bool(info.timeout) and bool(info.done)
    assert float(info.r_timeout) == -1.0


def test_frozen_penalty():
    s = CS.reset_host(CFG, case=0)
    _, rew, info = CS.step(s, jnp.array([0.0, 0.0]), CFG)
    assert bool(info.frozen)
    assert float(info.r_freezing) == CFG.rewards.freezing_penalty


def test_collision_and_danger():
    s = CS.reset_host(CFG, case=0)
    # teleport first human in front of the robot
    hp = np.asarray(s.h_pos).copy()
    hv = np.asarray(s.h_vel).copy()
    hp[0] = np.asarray(s.r_pos) + np.array([0.0, 0.3])
    hv[0] = 0.0
    s = s._replace(h_pos=jnp.array(hp), h_vel=jnp.array(hv))
    _, rew, info = CS.step(s, jnp.array([0.0, 0.0]), CFG)
    assert bool(info.collision)
    assert float(info.r_collision) == CFG.rewards.collision_penalty


def test_danger_discomfort_reward():
    s = CS.reset_host(CFG, case=0)
    hp = np.asarray(s.h_pos).copy()
    hv = np.asarray(s.h_vel).copy()
    # next-state distance = 0.65 -> dmin-based discomfort (robot frozen)
    hp[0] = np.asarray(s.r_pos) + np.array([0.0, 0.65])
    hv[0] = 0.0
    s = s._replace(h_pos=jnp.array(hp), h_vel=jnp.array(hv))
    # use linear humans so human 0 stays put-ish? keep orca; measure via info
    _, rew, info = CS.step(s, jnp.array([0.0, 0.0]), CFG)
    if bool(info.danger):
        expected = (float(info.dmin) - 0.2) * 0.5 * 0.25
        np.testing.assert_allclose(float(info.r_danger), expected, rtol=1e-5)


def test_progress_and_smoothness_rewards():
    rc = RewardConfig(progress_factor=1.0, angular_smoothness_factor=-0.1,
                      linear_smoothness_factor=-0.1)
    cfg = EnvConfig(scenario="circle_crossing", human_policy="orca",
                    human_num=2, starts_moving=0,
                    robot_kinematics="unicycle", rewards=rc)
    s = CS.reset_host(cfg, case=0)
    prev_dist = float(s.prev_dist_to_goal)
    s2, rew, info = CS.step(s, jnp.array([0.5, 0.1]), cfg)
    # progress = (prev - curr) * factor
    curr_dist = np.linalg.norm(np.asarray(s2.r_goal) - np.asarray(s2.r_pos))
    np.testing.assert_allclose(float(info.r_progress), prev_dist - curr_dist,
                               atol=1e-5)
    # first step: no smoothness reward yet
    assert float(info.r_angular) == 0.0
    assert float(info.r_linear) == 0.0
    s3, rew3, info3 = CS.step(s2, jnp.array([0.7, 0.2]), cfg)
    # unicycle angular diff = r * dt (reference :1150)
    np.testing.assert_allclose(float(info3.r_angular),
                               abs(0.2 * 0.25) * -0.1, rtol=1e-4)
    np.testing.assert_allclose(float(info3.r_linear),
                               abs(0.5 - 0.7) * -0.1, rtol=1e-4)


def test_step_masked_freezes_done():
    s = CS.reset_host(CFG, case=0)
    s = s._replace(done=jnp.array(True))
    s2, rew, info = CS.step_masked(s, jnp.array([0.9, 0.0]), CFG)
    np.testing.assert_array_equal(np.asarray(s2.r_pos), np.asarray(s.r_pos))
    assert float(rew) == 0.0


@pytest.mark.slow
def test_hallway_door_intermediate_goal():
    cfg = EnvConfig()  # hallway_bottleneck, orca_plus
    s = CS.reset_host(cfg, case=0, phase="test")
    hp = np.asarray(s.h_pos)
    fg = np.asarray(s.h_final_goal)
    hg = np.asarray(s.h_goal)
    door_mid = np.array([0.0, 0.0])
    for i in range(cfg.human_num):
        ys = sorted([hp[i, 1], fg[i, 1]])
        crosses = ys[0] < float(s.door.y_mid_min) and ys[1] > float(s.door.y_mid_max)
        near = np.linalg.norm(door_mid - hp[i]) <= float(s.door.width) / 2
        if crosses and not near:
            np.testing.assert_allclose(hg[i], door_mid, atol=1e-6)
        else:
            np.testing.assert_allclose(hg[i], fg[i], atol=1e-6)


@pytest.mark.slow
def test_batch_rollout_matches_single():
    from sicnav_tpu.policies.orca_robot import orca_robot_action
    cfg = EnvConfig(scenario="circle_crossing", human_policy="orca",
                    human_num=3, starts_moving=0, robot_kinematics="holonomic")
    states = [CS.reset_host(cfg, case=c) for c in range(3)]
    batch = jax.tree.map(lambda *xs: jnp.stack(xs), *states)
    pol = lambda s: orca_robot_action(s, cfg)
    _, stats_b, _ = R.batch_rollout(batch, pol, cfg, max_steps=20)
    for i, s in enumerate(states):
        _, stats_s, _ = R.rollout_episode(s, pol, cfg, max_steps=20)
        assert bool(stats_b.success[i]) == bool(stats_s.success)
        np.testing.assert_allclose(float(stats_b.total_reward[i]),
                                   float(stats_s.total_reward), atol=1e-4)


def test_device_reset_separation():
    cfg = EnvConfig(scenario="circle_crossing", human_policy="orca",
                    human_num=4, starts_moving=0)
    keys = jax.random.split(jax.random.PRNGKey(0), 8)
    states = jax.vmap(lambda k: CS.reset_device(k, cfg))(keys)
    hp = np.asarray(states.h_pos)
    for b in range(8):
        for i in range(4):
            for j in range(i + 1, 4):
                d = np.linalg.norm(hp[b, i] - hp[b, j])
                assert d >= 2 * cfg.human_radius - 1e-5


def test_scenario_generator_golden():
    """Golden regression: the host generator's RNG call sequence must stay
    exactly as the reference's (case index == seed); these values were
    produced by the current implementation and lock the draw order."""
    from sicnav_tpu.env import scenarios, walls as W

    cfg = EnvConfig(scenario="circle_crossing", human_policy="orca",
                    human_num=3, max_humans=3)
    walls, mask, door = W.build_walls(cfg)
    pos, goal, *_ = scenarios.generate_host(cfg, 0, "test", walls, mask)
    np.testing.assert_allclose(
        pos[:3],
        [[-1.221571, -1.21381], [-1.047455, -0.16433], [-0.777305, 1.483615]],
        atol=1e-5)
    np.testing.assert_allclose(goal[:3], -pos[:3], atol=1e-5)

    cfg2 = EnvConfig(scenario="hallway_bottleneck", human_policy="orca_plus",
                     human_num=3, max_humans=3)
    walls2, mask2, door2 = W.build_walls(cfg2)
    pos2, goal2, th2, rad2, vp2, m2 = scenarios.generate_host(
        cfg2, 0, "test", walls2, mask2)
    np.testing.assert_allclose(
        pos2[:3],
        [[0.095515, -0.607995], [0.619986, -2.275269], [-0.561028, 1.443641]],
        atol=1e-5)
    np.testing.assert_allclose(
        vp2[:3], [0.791025, 1.408492, 0.94045], atol=1e-5)


@pytest.mark.slow
def test_device_square_crossing_distribution():
    """The device square_crossing generator matches the host (reference
    crowd_sim_plus.py:484-520) distribution: KS-style comparison of the
    start/goal coordinate marginals plus the opposite-half-square invariant."""
    from sicnav_tpu.env import scenarios as SC
    from sicnav_tpu.env.types import EnvConfig

    cfg = EnvConfig(scenario="square_crossing", human_policy="orca",
                    human_num=4, max_humans=4, starts_moving=0)

    # device sample
    keys = jax.random.split(jax.random.PRNGKey(0), 256)
    walls = jnp.zeros((cfg.wall_slots, 2, 2))
    wmask = jnp.zeros((cfg.wall_slots,), bool)
    gen = jax.jit(lambda k: SC.generate_device(k, cfg, walls, wmask))
    d_pos, d_goal, _, _, _, d_mask = jax.vmap(gen)(keys)
    d_pos = np.asarray(d_pos[np.asarray(d_mask)])
    d_goal = np.asarray(d_goal[np.asarray(d_mask)])

    # host sample
    h_pos, h_goal = [], []
    for case in range(256):
        p, g, _, _, _, m = SC.generate_host(cfg, case)
        h_pos.append(p[m])
        h_goal.append(g[m])
    h_pos = np.concatenate(h_pos)
    h_goal = np.concatenate(h_goal)

    # opposite-half invariant: start x and goal x on opposite sides
    assert np.all(d_pos[:, 0] * d_goal[:, 0] <= 0)

    # two-sample KS on each marginal
    def ks(a, b):
        xs = np.sort(np.concatenate([a, b]))
        ca = np.searchsorted(np.sort(a), xs, side="right") / len(a)
        cb = np.searchsorted(np.sort(b), xs, side="right") / len(b)
        return np.max(np.abs(ca - cb))

    n = min(len(d_pos), len(h_pos))
    # critical value at alpha=1e-3 for the two-sample KS statistic
    crit = 1.95 * np.sqrt(2.0 / n)
    for k, (dv, hv) in enumerate([(d_pos[:, 0], h_pos[:, 0]),
                                  (d_pos[:, 1], h_pos[:, 1]),
                                  (d_goal[:, 0], h_goal[:, 0]),
                                  (d_goal[:, 1], h_goal[:, 1])]):
        assert ks(dv[:n], hv[:n]) < crit, f"marginal {k} diverges"


def test_robocentric_transforms():
    """Robocentric frames (robot_plus.py:73-166): robot at origin; goal on
    the +x axis in the goal-aligned frame; distances preserved."""
    from sicnav_tpu.env import occlusion as OC
    from sicnav_tpu.env.types import EnvConfig

    cfg = EnvConfig(scenario="circle_crossing", human_policy="orca",
                    human_num=3, max_humans=3, starts_moving=0)
    st = CS.reset_host(cfg, case=5)
    st = st._replace(r_theta=jnp.float32(0.7),
                     r_vel=jnp.array([0.3 * np.cos(0.7), 0.3 * np.sin(0.7)]))

    rc = OC.robocentric_state(st)
    np.testing.assert_allclose(np.asarray(rc.r_pos), 0.0, atol=1e-6)
    assert float(rc.r_theta) == 0.0
    # heading-aligned: velocity has no y component
    assert abs(float(rc.r_vel[1])) < 1e-5
    # relative distances preserved
    np.testing.assert_allclose(
        np.asarray(jnp.linalg.norm(rc.h_pos, axis=-1)),
        np.asarray(jnp.linalg.norm(st.h_pos - st.r_pos, axis=-1)), atol=1e-5)

    robot, humans = OC.robocentric_goal_aligned(st)
    # goal on +x axis at the true distance (reference's own sanity checks)
    dist = float(jnp.linalg.norm(st.r_goal - st.r_pos))
    np.testing.assert_allclose(float(robot[5]), dist, atol=1e-5)
    assert abs(float(robot[6])) < 1e-5
    assert humans.shape == (3, 5)


def test_occlusion_mask():
    """A human directly behind a nearer one is occluded; offset humans are
    not; masked-out humans never occlude (robot_plus.map_occlusion)."""
    from sicnav_tpu.env import occlusion as OC

    r = jnp.full((3,), 0.3)
    mask = jnp.array([True, True, True])
    # human 1 exactly behind human 0 (same bearing, farther)
    pos = jnp.array([[1.0, 0.0], [2.5, 0.0], [0.0, 2.0]])
    vis = np.asarray(OC.occlusion_mask(pos, r, mask))
    assert vis.tolist() == [True, False, True]

    # offset enough to stay visible
    pos2 = jnp.array([[1.0, 0.0], [2.5, 1.8], [0.0, 2.0]])
    vis2 = np.asarray(OC.occlusion_mask(pos2, r, mask))
    assert vis2.tolist() == [True, True, True]

    # the blocker is masked out -> nothing occluded
    mask3 = jnp.array([False, True, True])
    vis3 = np.asarray(OC.occlusion_mask(pos, r, mask3))
    assert vis3.tolist() == [False, True, True]
