"""Native C++ ORCA engine: build + parity vs the numpy oracle and the JAX core."""
import numpy as np
import jax.numpy as jnp
import pytest

from sicnav_tpu.native import orca_cpp
from tests import rvo2_oracle as O


pytestmark = pytest.mark.skipif(not orca_cpp.native_available(),
                                reason="native toolchain unavailable")


def test_native_matches_oracle_agents():
    rng = np.random.default_rng(0)
    for _ in range(40):
        n = rng.integers(2, 7)
        pos = rng.uniform(-4, 4, (n, 2))
        vel = rng.uniform(-1, 1, (n, 2))
        rad = rng.uniform(0.2, 0.5, n)
        pref = rng.uniform(-1.2, 1.2, (n, 2))
        ms = rng.uniform(0.8, 1.6, n)
        out = orca_cpp.orca_step_native(pos, vel, rad, pref, ms)
        for a in range(n):
            neighbors = [(pos[b], vel[b], rad[b]) for b in range(n) if b != a]
            want = O.orca_velocity(pos[a], vel[a], rad[a], pref[a], ms[a],
                                   neighbors, [])
            assert np.linalg.norm(out[a] - want) < 2e-3, (a, out[a], want)


def test_native_matches_oracle_walls():
    rng = np.random.default_rng(1)
    bad = 0
    for _ in range(40):
        pos = rng.uniform(-3, 3, (1, 2))
        vel = rng.uniform(-1, 1, (1, 2))
        rad = np.array([0.3])
        pref = rng.uniform(-1, 1, (1, 2))
        ms = np.array([1.2])
        walls = []
        for _ in range(rng.integers(1, 4)):
            a = rng.uniform(-3, 3, 2)
            walls.append((tuple(a), tuple(a + rng.uniform(-2, 2, 2))))
        out = orca_cpp.orca_step_native(pos, vel, rad, pref, ms,
                                        np.array([[w[0], w[1]] for w in walls]))
        want = O.orca_velocity(pos[0], vel[0], rad[0], pref[0], ms[0], [],
                               walls)
        if np.linalg.norm(out[0] - want) > 2e-3:
            bad += 1
    assert bad <= 2, f"{bad}/40 mismatches"


def test_native_matches_jax_core():
    from sicnav_tpu.ops import orca as J
    rng = np.random.default_rng(2)
    mism = 0
    for _ in range(25):
        n = 4
        pos = rng.uniform(-3, 3, (n, 2)).astype(np.float32)
        vel = rng.uniform(-1, 1, (n, 2)).astype(np.float32)
        rad = rng.uniform(0.2, 0.4, n).astype(np.float32)
        pref = rng.uniform(-1, 1, (n, 2)).astype(np.float32)
        ms = np.full(n, 1.2, np.float32)
        native = orca_cpp.orca_step_native(pos, vel, rad, pref, ms)

        walls = np.zeros((1, 2, 2), np.float32)
        ep1, ep2, emask = J.walls_to_edges(jnp.array(walls),
                                           jnp.zeros(1, bool))
        for a in range(n):
            mask = np.ones(n, bool)
            mask[a] = False
            got = J.orca_velocity(
                jnp.array(pos[a]), jnp.array(vel[a]), jnp.float32(rad[a]),
                jnp.array(pref[a]), jnp.float32(ms[a]),
                jnp.array(pos), jnp.array(vel), jnp.array(rad),
                jnp.array(mask), ep1, ep2, emask, J.OrcaParams())
            if np.linalg.norm(np.asarray(got) - native[a]) > 2e-3:
                mism += 1
    assert mism <= 2, f"{mism} mismatches"
