"""Multi-chip dry-run body: jit the framework's full data-parallel paths
over an n-device mesh with real shardings on tiny shapes.

This module is executed in a subprocess by ``__graft_entry__.dryrun_multichip``
with ``JAX_PLATFORMS=cpu`` and
``XLA_FLAGS=--xla_force_host_platform_device_count=<n>`` pinned BEFORE jax
initializes — the ambient dev/driver shell exports ``JAX_PLATFORMS=axon``
(one tunneled TPU chip), which cannot host an n-device mesh and whose AOT
libtpu may mismatch the terminal (the round-1 failure mode).

Three stages, mirroring the production data-parallel paths (SURVEY.md §2.9):
  1. vectorized env + DWA step (batch dp over the mesh, metric psum)
  2. JMID diffusion training step (scenes dp, replicated params, gradient
     all-reduce inserted by XLA)
  3. SARL DQN fitted-value training step (replay batch dp)
  4. batched CAMPC fleet solve sharded over the mesh (the §2.9 obligation:
     environments x MPC problems ride ICI)
"""

from __future__ import annotations

import os

if __name__ == "__main__":
    # executed standalone: pin the virtual CPU mesh before jax initializes
    # (defense in depth — the launching entry also sets these)
    import sys

    _n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    os.environ["JAX_PLATFORMS"] = "cpu"
    _flags = " ".join(f for f in os.environ.get("XLA_FLAGS", "").split()
                      if "xla_force_host_platform_device_count" not in f)
    os.environ["XLA_FLAGS"] = (
        _flags + f" --xla_force_host_platform_device_count={_n}").strip()
    if "xla_cpu_max_isa" not in os.environ["XLA_FLAGS"]:
        # ISA cap: this jaxlib targets a newer CPU than some build hosts;
        # uncapped XLA:CPU codegen intermittently SIGILLs (see conftest)
        os.environ["XLA_FLAGS"] += " --xla_cpu_max_isa=AVX2"

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402


def main(n_devices: int) -> None:
    assert len(jax.devices()) >= n_devices, (
        f"need {n_devices} devices, have {jax.devices()}")

    import numpy as np
    from sicnav_tpu.env.types import EnvConfig
    from sicnav_tpu.env import crowd_sim as CS
    from sicnav_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from sicnav_tpu.policies.dwa import dwa_policy

    cfg = EnvConfig(scenario="circle_crossing", human_policy="orca",
                    human_num=3, max_humans=3, starts_moving=0,
                    robot_kinematics="unicycle")
    mesh = make_mesh(n_devices)
    B = 2 * n_devices
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    states = jax.vmap(lambda k: CS.reset_device(k, cfg))(keys)
    states = shard_batch(states, mesh)

    @jax.jit
    def step_all(states):
        action = jax.vmap(lambda st: dwa_policy(st, cfg))(states)
        s2, rew, _ = jax.vmap(lambda st, a: CS.step_masked(st, a, cfg))(states, action)
        # cross-chip metric reduction rides ICI
        return s2, rew.mean()

    s2, mean_rew = step_all(states)
    jax.block_until_ready(mean_rew)
    assert s2.r_pos.shape == (B, 2)

    # --- 2. diffusion training step, scenes sharded over the mesh ---------
    from sicnav_tpu.diffusion import data as D
    from sicnav_tpu.diffusion.models import ModelConfig
    from sicnav_tpu.diffusion.mid import (JMIDModel, TrainConfig,
                                          make_train_state, train_step)

    rng = np.random.default_rng(0)
    A, T = 3, 30
    pos = (rng.uniform(-2, 2, (A, 1, 2)) +
           rng.uniform(-1, 1, (A, 1, 2)) * np.arange(T)[None, :, None] * 0.25)
    examples = D.build_examples(pos, np.ones((A, T), bool), 0.25,
                                history_len=6, horizon=8, stride=8)
    scenes = D.stack_batches((examples * B)[:B])
    model = JMIDModel(ModelConfig(context_dim=32, enc_rnn_dim=16, tf_layer=1),
                      joint=True)
    tc = TrainConfig()
    params, tx, opt = make_train_state(
        model, jax.tree.map(lambda x: x[0], scenes), tc, 1)
    scenes = shard_batch(jax.tree.map(jnp.asarray, scenes), mesh)
    params = replicate(params, mesh)
    opt = replicate(opt, mesh)
    params, opt, loss = train_step(model, tx, params, opt, scenes,
                                   jax.random.PRNGKey(0))
    jax.block_until_ready(loss)
    assert jnp.isfinite(loss)

    # --- 3. RL fitted-value training step, replay batch sharded -----------
    import optax
    from sicnav_tpu.rl.networks import SARLNetwork
    from sicnav_tpu.rl import dqn as RD

    net = SARLNetwork()
    H = cfg.max_humans
    rl_params = net.init(jax.random.PRNGKey(0), jnp.zeros(9),
                         jnp.zeros((H, 5)), jnp.ones(H, bool))
    rl_tx = optax.adam(1e-3)
    rl_opt = rl_tx.init(rl_params)
    batch = RD.Transition(
        jnp.zeros((B, 9)), jnp.zeros((B, H, 5)), jnp.ones((B, H), bool),
        jnp.zeros((B, 9)), jnp.zeros((B, H, 5)), jnp.zeros((B,)),
        jnp.zeros((B,), bool))
    batch = shard_batch(batch, mesh)
    rl_params = replicate(rl_params, mesh)
    rl_opt = replicate(rl_opt, mesh)
    rl_params, rl_opt, rl_loss = RD.train_step(net, rl_tx, rl_params,
                                               rl_params, rl_opt, batch, 0.9)
    jax.block_until_ready(rl_loss)
    assert jnp.isfinite(rl_loss)

    # --- 4. batched CAMPC fleet solve sharded over the mesh ----------------
    from sicnav_tpu.parallel.fleet import fleet_solve_demo

    p50_cost = fleet_solve_demo(mesh, batch_size=B)
    assert jnp.isfinite(p50_cost)


if __name__ == "__main__":
    import sys

    main(int(sys.argv[1]) if len(sys.argv) > 1 else len(jax.devices()))
    print("dryrun ok")
