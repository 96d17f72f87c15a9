"""Sharded MPC fleet solves: batch-of-CAMPC-problems over a device mesh.

The reference parallelizes one solve over CPU threads (CasADi ``map``,
sicnav/policy/campc.py:254); the TPU-native scaling axis is a *fleet* of
independent solves (one per environment / eval case) vmapped into a single
XLA program and sharded over the mesh's data axis, so per-step solver cost
amortizes across episodes and chips (SURVEY.md §2.9).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from sicnav_tpu.env import crowd_sim as CS
from sicnav_tpu.env.types import EnvConfig
from sicnav_tpu.mpc import campc, ipm
from sicnav_tpu.mpc.ocp import MPCConfig, OCP
from sicnav_tpu.parallel.mesh import shard_batch


def make_fleet_policy(env_cfg: EnvConfig,
                      mpc_cfg: Optional[MPCConfig] = None,
                      settings: Optional[ipm.IPMSettings] = None):
    """Build (ocp, fleet_fn): fleet_fn(states, carries) -> (actions, carries)
    vmapped over a leading batch axis. Shard the inputs over a mesh's data
    axis (``parallel.mesh.shard_batch``) and XLA partitions the solves."""
    ocp, policy_fn = campc.make_policy(env_cfg, mpc_cfg, settings)

    @jax.jit
    def fleet_fn(states, carries):
        return jax.vmap(policy_fn)(states, carries)

    return ocp, fleet_fn


def fleet_solve_demo(mesh: Mesh, batch_size: int) -> jnp.ndarray:
    """Dryrun stage: one sharded fleet CAMPC control step on tiny shapes.
    Returns the mean |action| across the fleet (finite iff solves ran)."""
    env_cfg = EnvConfig(scenario="circle_crossing", human_policy="orca",
                        human_num=2, max_humans=2, starts_moving=0,
                        robot_kinematics="unicycle")
    mpc_cfg = MPCConfig(num_hums=2, num_walls=env_cfg.wall_slots,
                        dt=env_cfg.dt, horiz=2, orca_kkt_horiz=2)
    settings = ipm.IPMSettings(n_iter=3)
    ocp, fleet_fn = make_fleet_policy(env_cfg, mpc_cfg, settings)

    keys = jax.random.split(jax.random.PRNGKey(7), batch_size)
    states = jax.vmap(lambda k: CS.reset_device(k, env_cfg))(keys)
    carries = jax.vmap(lambda _: campc.init_carry(ocp))(jnp.arange(batch_size))

    states = shard_batch(states, mesh)
    carries = shard_batch(carries, mesh)
    actions, _ = fleet_fn(states, carries)
    jax.block_until_ready(actions)
    return jnp.abs(actions).mean()
