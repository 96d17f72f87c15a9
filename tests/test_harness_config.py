"""Config loading, eval harness, robustness wrapper, 2-step lookahead."""
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from sicnav_tpu.config import config_hash, load_env_config, load_mpc_config
from sicnav_tpu.env.types import EnvConfig
from sicnav_tpu.env import crowd_sim as CS
from sicnav_tpu import harness

CFG_DIR = os.path.join(os.path.dirname(__file__), "..", "sicnav_tpu", "configs")


def test_load_env_config():
    cfg = load_env_config(os.path.join(CFG_DIR, "env.config"))
    assert cfg.time_limit == 15.0
    assert cfg.dt == 0.25
    assert cfg.scenario == "hallway_bottleneck"
    assert cfg.human_policy == "orca_plus"
    assert cfg.rewards.collision_penalty == -0.25
    assert cfg.rewards.discomfort_dist == 0.2
    # non-SB3 fill-ins
    assert cfg.rewards.timeout == -1.0
    assert cfg.rewards.wall_collision_penalty == -1.0


def test_load_mpc_config():
    env_cfg = load_env_config(os.path.join(CFG_DIR, "env.config"))
    mpc = load_mpc_config(os.path.join(CFG_DIR, "policy.config"), env_cfg)
    assert mpc.horiz == 4
    assert mpc.hum_model == "orca_casadi_kkt"
    assert not mpc.priviledged_info
    assert abs(mpc.max_rot - 60 * np.pi / 180) < 1e-9
    assert mpc.orca_time_horizon == 2.5
    assert mpc.n_z > 0


def test_config_hash_stable():
    p = os.path.join(CFG_DIR, "env.config")
    assert config_hash(p) == config_hash(p)
    assert len(config_hash(p)) == 32


@pytest.mark.slow
def test_harness_small_suite():
    from sicnav_tpu.policies.orca_robot import orca_robot_action
    cfg = EnvConfig(scenario="circle_crossing", human_policy="orca",
                    human_num=2, max_humans=2, starts_moving=0,
                    robot_kinematics="holonomic")
    res = harness.evaluate_policy(lambda s: orca_robot_action(s, cfg), cfg,
                                  num_cases=6, batch=3)
    assert res["num_cases"] == 6
    assert 0.0 <= res["success_rate"] <= 1.0
    assert res["mean_nav_time"] <= cfg.time_limit + 1e-6


def test_robustness_noise_wrapper():
    from sicnav_tpu.utils.robustness import NoiseConfig, noisy_policy
    cfg = EnvConfig(scenario="circle_crossing", human_policy="orca",
                    human_num=2, max_humans=2, starts_moving=0,
                    robot_kinematics="holonomic")
    state = CS.reset_host(cfg, case=0)
    seen = {}

    def probe(s):
        seen["h_pos"] = s.h_pos
        return jnp.zeros(2)

    noisy_policy(probe, NoiseConfig(pos_std=0.1))(state)
    d = np.abs(np.asarray(seen["h_pos"]) - np.asarray(state.h_pos))
    assert d.max() > 0.0           # observation perturbed
    # deterministic per step index
    p1 = np.asarray(seen["h_pos"])
    noisy_policy(probe, NoiseConfig(pos_std=0.1))(state)
    np.testing.assert_array_equal(p1, np.asarray(seen["h_pos"]))


@pytest.mark.slow
def test_two_step_lookahead():
    from sicnav_tpu.rl import dqn as D
    cfg = EnvConfig(scenario="circle_crossing", human_policy="linear",
                    human_num=2, max_humans=2, starts_moving=0,
                    robot_kinematics="unicycle")
    dq = D.DQNConfig(speed_samples=2, rotation_samples=2)
    actions = D.build_action_space(cfg, dq)
    A = actions.shape[0]
    state = CS.reset_host(cfg, case=0)
    rs2, hs2, rew1, rew2, done1 = D.lookahead2(state, actions, cfg)
    assert rs2.shape == (A, A, 9)
    assert rew2.shape == (A, A)
    # (a, b) branch must equal stepping a then b directly
    s1, r1, _ = CS.step(state, actions[1], cfg)
    s2, r2, _ = CS.step(s1, actions[2], cfg)
    np.testing.assert_allclose(float(rew1[1]), float(r1), atol=1e-5)
    np.testing.assert_allclose(float(rew2[1, 2]), float(r2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(rs2[1, 2]),
                               np.asarray(CS.robot_full_state(s2)), atol=1e-5)


def test_shipped_example_configs_load():
    """configs/{env,policy}.config round-trip through the reference-format
    loaders, incl. the RA-L keys (commented-out block parses as absent)."""
    import os
    from sicnav_tpu.config import load_env_config, load_mpc_config

    root = os.path.join(os.path.dirname(__file__), "..")
    e = load_env_config(os.path.join(root, "configs/env.config"))
    assert e.scenario == "hallway_bottleneck"
    assert e.dt == 0.25
    m = load_mpc_config(os.path.join(root, "configs/policy.config"), e)
    assert m.hum_model == "orca_casadi_kkt"
    assert m.robot_nx == 4 and m.slack_mode == "tro"
    # RA-L keys parse when present
    import tempfile
    ral = "[campc]\nhoriz = 4\n[mpc_env]\nrobot_model_8state = true\n" \
          "rob_collision_capsule = true\nslack_mode = acados\n" \
          "term_q_coeff = 75.0\nhums_close_to_preds = true\n"
    with tempfile.NamedTemporaryFile("w", suffix=".config",
                                     delete=False) as f:
        f.write(ral)
        path = f.name
    m2 = load_mpc_config(path, e)
    assert m2.robot_nx == 8 and m2.robot_capsule
    assert m2.slack_mode == "acados" and m2.term_q_coeff == 75.0
