"""Multi-chip SPMD correctness on the virtual 8-device CPU mesh.

The reference scales by OS processes on one machine (SURVEY.md §2.8); here
the scaling axis is batch sharding over a jax.sharding.Mesh. These tests
pin the property the dryrun relies on: sharded execution is numerically
identical to single-device execution, with XLA inserting the collectives.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sicnav_tpu.parallel.mesh import make_mesh, replicate, shard_batch


def test_mesh_uses_all_devices():
    mesh = make_mesh(8)
    assert mesh.devices.size == 8


@pytest.mark.slow
def test_sharded_ipm_batch_matches_unsharded():
    """A batch of box-constrained QPs solved by the IPM, vmapped and sharded
    over the mesh, matches the unsharded solve bit-for-bit-ish."""
    from sicnav_tpu.mpc import ipm

    B, n = 16, 4
    rng = np.random.default_rng(0)
    targets = jnp.asarray(rng.uniform(-2.0, 2.0, (B, n)), jnp.float32)

    settings = ipm.IPMSettings(n_iter=12, precondition=False)

    def solve_one(t):
        f = lambda z: jnp.sum((z - t) ** 2)
        ce = lambda z: jnp.zeros((0,))
        # box |z_i| <= 1  ->  g(z) <= 0 with 2n rows
        ci = lambda z: jnp.concatenate([z - 1.0, -z - 1.0])
        z, info = ipm.solve(f, ce, ci, jnp.zeros(n), settings)
        return z

    batched = jax.jit(jax.vmap(solve_one))
    z_plain = batched(targets)

    mesh = make_mesh(8)
    z_shard = batched(shard_batch(targets, mesh))
    np.testing.assert_allclose(np.asarray(z_shard), np.asarray(z_plain),
                               atol=1e-6)
    # solution sanity: clipped projection of the target onto the box
    np.testing.assert_allclose(np.asarray(z_plain),
                               np.clip(np.asarray(targets), -1, 1), atol=5e-2)


@pytest.mark.slow
def test_sharded_env_rollout_matches_unsharded():
    """Batched env stepping produces identical trajectories sharded vs not
    (the dryrun path, with a psum-style mean reduction)."""
    from sicnav_tpu.env import crowd_sim as CS
    from sicnav_tpu.env.types import EnvConfig
    from sicnav_tpu.policies.dwa import dwa_policy

    cfg = EnvConfig(scenario="circle_crossing", human_policy="orca",
                    human_num=3, max_humans=3, starts_moving=0,
                    robot_kinematics="unicycle")
    B = 16
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    states = jax.vmap(lambda k: CS.reset_device(k, cfg))(keys)

    @jax.jit
    def step_all(states):
        action = jax.vmap(lambda st: dwa_policy(st, cfg))(states)
        s2, rew, _ = jax.vmap(
            lambda st, a: CS.step_masked(st, a, cfg))(states, action)
        return s2, rew.mean()

    s_plain, r_plain = step_all(states)
    mesh = make_mesh(8)
    s_shard, r_shard = step_all(shard_batch(states, mesh))
    np.testing.assert_allclose(np.asarray(r_shard), np.asarray(r_plain),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(s_shard.r_pos),
                               np.asarray(s_plain.r_pos), atol=1e-6)


@pytest.mark.slow
def test_sharded_harness_matches_unsharded():
    """evaluate_policy(mesh=...) — the production eval path — yields the
    same summary metrics as the single-device run."""
    from sicnav_tpu import harness
    from sicnav_tpu.env.types import EnvConfig
    from sicnav_tpu.policies.dwa import dwa_policy

    cfg = EnvConfig(scenario="circle_crossing", human_policy="orca",
                    human_num=3, max_humans=3, starts_moving=0,
                    robot_kinematics="unicycle")
    pol = lambda s: dwa_policy(s, cfg)
    r_plain = harness.evaluate_policy(pol, cfg, num_cases=8, batch=8)
    r_shard = harness.evaluate_policy(pol, cfg, num_cases=8, batch=8,
                                      mesh=make_mesh(8))
    for k in r_plain:
        np.testing.assert_allclose(r_shard[k], r_plain[k], atol=1e-6,
                                   err_msg=k)


@pytest.mark.slow
def test_sharded_campc_fleet_step():
    """parallel.fleet: one sharded fleet CAMPC control step runs and
    matches the unsharded vmapped solve."""
    from sicnav_tpu.env import crowd_sim as CS
    from sicnav_tpu.env.types import EnvConfig
    from sicnav_tpu.mpc import campc, ipm
    from sicnav_tpu.mpc.ocp import MPCConfig
    from sicnav_tpu.parallel.fleet import make_fleet_policy

    env_cfg = EnvConfig(scenario="circle_crossing", human_policy="orca",
                        human_num=2, max_humans=2, starts_moving=0,
                        robot_kinematics="unicycle")
    mpc_cfg = MPCConfig(num_hums=2, num_walls=env_cfg.wall_slots,
                        dt=env_cfg.dt, horiz=2, orca_kkt_horiz=2)
    ocp, fleet_fn = make_fleet_policy(env_cfg, mpc_cfg,
                                      ipm.IPMSettings(n_iter=3))
    B = 8
    keys = jax.random.split(jax.random.PRNGKey(7), B)
    states = jax.vmap(lambda k: CS.reset_device(k, env_cfg))(keys)
    carries = jax.vmap(lambda _: campc.init_carry(ocp))(jnp.arange(B))

    a_plain, _ = fleet_fn(states, carries)
    mesh = make_mesh(8)
    a_shard, _ = fleet_fn(shard_batch(states, mesh),
                          shard_batch(carries, mesh))
    np.testing.assert_allclose(np.asarray(a_shard), np.asarray(a_plain),
                               atol=1e-5)


@pytest.mark.slow
def test_replicated_params_sharded_batch_training_step():
    """DP training step: replicated params + sharded batch yields the same
    loss and updated params as single-device (XLA all-reduces grads)."""
    import optax
    from sicnav_tpu.rl.networks import SARLNetwork
    from sicnav_tpu.rl import dqn as RD

    net = SARLNetwork()
    H = 3
    params = net.init(jax.random.PRNGKey(0), jnp.zeros(9),
                      jnp.zeros((H, 5)), jnp.ones(H, bool))
    tx = optax.adam(1e-3)
    opt = tx.init(params)
    B = 16
    rng = np.random.default_rng(1)
    batch = RD.Transition(
        jnp.asarray(rng.normal(size=(B, 9)), jnp.float32),
        jnp.asarray(rng.normal(size=(B, H, 5)), jnp.float32),
        jnp.ones((B, H), bool),
        jnp.asarray(rng.normal(size=(B, 9)), jnp.float32),
        jnp.asarray(rng.normal(size=(B, H, 5)), jnp.float32),
        jnp.asarray(rng.normal(size=(B,)), jnp.float32),
        jnp.zeros((B,), bool))

    p1, o1, l1 = RD.train_step(net, tx, params, params, opt, batch, 0.9)

    mesh = make_mesh(8)
    p2, o2, l2 = RD.train_step(net, tx, replicate(params, mesh),
                               replicate(params, mesh),
                               replicate(opt, mesh),
                               shard_batch(batch, mesh), 0.9)
    np.testing.assert_allclose(float(l2), float(l1), atol=1e-5)
    flat1 = jax.tree.leaves(p1)
    flat2 = jax.tree.leaves(p2)
    for a, b in zip(flat1, flat2):
        # f32 cross-device reduction order shifts adam stats by ~1e-5
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=5e-5)


@pytest.mark.slow
def test_sharded_dqn_train_loop_matches_unsharded():
    """dqn.train(mesh=...) — the production RL path — produces the same
    params as single-device for a short run (same keys, same batches)."""
    from sicnav_tpu.env.types import EnvConfig
    from sicnav_tpu.rl.networks import SARLNetwork
    from sicnav_tpu.rl import dqn as RD

    cfg = EnvConfig(scenario="circle_crossing", human_policy="orca",
                    human_num=2, max_humans=2, starts_moving=0,
                    robot_kinematics="unicycle")
    net = SARLNetwork()
    dqn = RD.DQNConfig(learning_starts=32, batch_size=32,
                       target_update_interval=2)

    p1, h1 = RD.train(net, cfg, dqn, n_envs=16, seed=3, total_steps=128)
    p2, h2 = RD.train(net, cfg, dqn, n_envs=16, seed=3, total_steps=128,
                      mesh=make_mesh(8))
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=5e-5)
