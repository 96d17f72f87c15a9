"""Device mesh / sharding helpers.

The reference has no distributed backend (SURVEY.md §2.8-2.9: single process,
CPU threads + one CUDA device). The TPU-native scaling axis is data
parallelism over (environments x MPC problems x diffusion samples): shard
the leading batch axis over a 1-D mesh and let XLA insert collectives
(psum for gradient/metric reductions) over ICI.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def shard_batch(tree, mesh: Mesh, axis: str = "data"):
    """Place a pytree with leading batch axis sharded over the mesh."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree.map(
        lambda x: jax.device_put(x, sharding) if hasattr(x, "ndim") and x.ndim > 0
        else x, tree)


def replicate(tree, mesh: Mesh):
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
