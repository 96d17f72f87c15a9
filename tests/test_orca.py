"""Parity tests: batched JAX ORCA vs. scalar numpy oracle of the published
RVO2 algorithm (tests/rvo2_oracle.py)."""
import numpy as np
import jax
import jax.numpy as jnp

from sicnav_tpu.ops import orca as J
from tests import rvo2_oracle as O

N_PAD = 8   # neighbor slots
W_PAD = 6   # wall slots


def _pad_neighbors(neighbors):
    npos = np.zeros((N_PAD, 2), np.float32)
    nvel = np.zeros((N_PAD, 2), np.float32)
    nrad = np.zeros((N_PAD,), np.float32)
    nmask = np.zeros((N_PAD,), bool)
    for i, (p, v, r) in enumerate(neighbors):
        npos[i], nvel[i], nrad[i], nmask[i] = p, v, r, True
    return npos, nvel, nrad, nmask


def _pad_walls(walls):
    w = np.zeros((W_PAD, 2, 2), np.float32)
    m = np.zeros((W_PAD,), bool)
    for i, (a, b) in enumerate(walls):
        w[i, 0], w[i, 1], m[i] = a, b, True
    return w, m


def run_both(pos, vel, rad, pref_vel, max_speed, neighbors, walls,
             params=J.OrcaParams()):
    want = O.orca_velocity(pos, vel, rad, pref_vel, max_speed, neighbors, walls,
                           neighbor_dist=params.neighbor_dist,
                           time_horizon=params.time_horizon,
                           time_horizon_obst=params.time_horizon_obst,
                           dt=params.dt)
    npos, nvel, nrad, nmask = _pad_neighbors(neighbors)
    w, m = _pad_walls(walls)
    ep1, ep2, emask = J.walls_to_edges(jnp.array(w), jnp.array(m))
    got = J.orca_velocity(jnp.array(pos, jnp.float32), jnp.array(vel, jnp.float32),
                          jnp.float32(rad), jnp.array(pref_vel, jnp.float32),
                          jnp.float32(max_speed),
                          jnp.array(npos), jnp.array(nvel), jnp.array(nrad),
                          jnp.array(nmask), ep1, ep2, emask, params)
    return np.asarray(got, np.float64), want


def test_free_agent_takes_pref_velocity():
    got, want = run_both([0, 0], [0, 0], 0.3, [0.7, 0.2], 1.0, [], [])
    np.testing.assert_allclose(got, [0.7, 0.2], atol=1e-5)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_pref_velocity_clipped_to_max_speed():
    got, want = run_both([0, 0], [0, 0], 0.3, [3.0, 4.0], 1.0, [], [])
    np.testing.assert_allclose(np.linalg.norm(got), 1.0, atol=1e-5)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_head_on_pair_swerves():
    # two agents heading at each other: ORCA must deviate from pref velocity
    got, want = run_both([0, 0], [1.0, 0], 0.3, [1.0, 0.0], 1.5,
                         [([2.5, 0.0], [-1.0, 0.0], 0.3)], [])
    np.testing.assert_allclose(got, want, atol=1e-4)
    assert abs(got[1]) > 1e-3  # sidesteps


def test_wall_blocks_motion():
    # wall directly ahead within the obstacle time horizon
    got, want = run_both([0, 0], [1.0, 0], 0.3, [1.0, 0.0], 1.0,
                         [], [((0.6, -2.0), (0.6, 2.0))])
    np.testing.assert_allclose(got, want, atol=1e-4)
    # cannot keep full speed into the wall: vx limited so it won't penetrate
    # within timeHorizonObst
    assert got[0] < 0.85


def test_in_collision_pair_pushes_apart():
    got, want = run_both([0, 0], [0.0, 0], 0.3, [1.0, 0.0], 1.5,
                         [([0.4, 0.0], [0.0, 0.0], 0.3)], [])
    np.testing.assert_allclose(got, want, atol=1e-4)
    assert got[0] < 0.0  # pushed away from the overlapping agent


def _random_case(rng, n_agents, n_walls):
    pos = rng.uniform(-4, 4, 2)
    vel = rng.uniform(-1, 1, 2)
    rad = rng.uniform(0.2, 0.5)
    pref = rng.uniform(-1.2, 1.2, 2)
    max_speed = rng.uniform(0.8, 1.6)
    neighbors = []
    for _ in range(n_agents):
        neighbors.append((rng.uniform(-4, 4, 2), rng.uniform(-1, 1, 2),
                          rng.uniform(0.2, 0.5)))
    walls = []
    for _ in range(n_walls):
        a = rng.uniform(-4, 4, 2)
        b = a + rng.uniform(-3, 3, 2)
        walls.append((tuple(a), tuple(b)))
    return pos, vel, rad, pref, max_speed, neighbors, walls


def test_random_parity_agents_only():
    rng = np.random.default_rng(42)
    bad = 0
    for _ in range(120):
        case = _random_case(rng, n_agents=rng.integers(1, 7), n_walls=0)
        got, want = run_both(*case)
        if np.linalg.norm(got - want) > 1e-3:
            bad += 1
    # f32 vs f64 branch boundaries can flip on rare near-degenerate cases
    assert bad <= 2, f"{bad} / 120 mismatches"


def test_random_parity_with_walls():
    rng = np.random.default_rng(7)
    bad = 0
    for _ in range(120):
        case = _random_case(rng, n_agents=rng.integers(0, 5),
                            n_walls=rng.integers(1, 4))
        got, want = run_both(*case)
        if np.linalg.norm(got - want) > 1e-3:
            bad += 1
    assert bad <= 4, f"{bad} / 120 mismatches"


def test_dense_crowd_parity_lp3_path():
    # crowded ring: infeasible LP2 cases exercise linearProgram3
    rng = np.random.default_rng(3)
    bad = 0
    for _ in range(60):
        n = 6
        neighbors = []
        for k in range(n):
            ang = 2 * np.pi * k / n + rng.uniform(-0.1, 0.1)
            p = 0.75 * np.array([np.cos(ang), np.sin(ang)])
            v = -p + rng.uniform(-0.2, 0.2, 2)
            neighbors.append((p, v, 0.35))
        got, want = run_both(rng.uniform(-0.05, 0.05, 2), rng.uniform(-1, 1, 2),
                             0.35, rng.uniform(-1, 1, 2), 1.2, neighbors, [])
        if np.linalg.norm(got - want) > 2e-3:
            bad += 1
    assert bad <= 2, f"{bad} / 60 mismatches"


def test_vmap_batch_matches_single():
    rng = np.random.default_rng(11)
    cases = [_random_case(rng, 3, 1) for _ in range(16)]
    params = J.OrcaParams()

    singles = []
    batch_in = []
    for case in cases:
        pos, vel, rad, pref, ms, neighbors, walls = case
        npos, nvel, nrad, nmask = _pad_neighbors(neighbors)
        w, m = _pad_walls(walls)
        ep1, ep2, emask = J.walls_to_edges(jnp.array(w), jnp.array(m))
        args = (jnp.array(pos, jnp.float32), jnp.array(vel, jnp.float32),
                jnp.float32(rad), jnp.array(pref, jnp.float32), jnp.float32(ms),
                jnp.array(npos), jnp.array(nvel), jnp.array(nrad),
                jnp.array(nmask), ep1, ep2, emask)
        batch_in.append(args)
        singles.append(np.asarray(J.orca_velocity(*args, params)))

    stacked = [jnp.stack([b[i] for b in batch_in]) for i in range(12)]
    batched = jax.vmap(lambda *a: J.orca_velocity(*a, params))(*stacked)
    np.testing.assert_allclose(np.asarray(batched), np.stack(singles),
                               atol=1e-5)
