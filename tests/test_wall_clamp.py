"""Parity tests for exact wall clamping vs a scalar oracle of the reference
algorithm (crowd_sim_plus.py constrain_agent_action_exact :869-989)."""
import numpy as np
import pytest
import jax.numpy as jnp

from sicnav_tpu.env import wall_clamp as WC


# ---------------------------------------------------------------------------
# scalar oracle (numpy transcription of the reference's case analysis)
# ---------------------------------------------------------------------------

def _seg_seg_closest_np(a0, a1, b0, b1):
    # brute-force sampled closest points (robust oracle; fine for tests)
    t = np.linspace(0, 1, 801)
    pa = a0[None] + t[:, None] * (a1 - a0)[None]
    pb = b0[None] + t[:, None] * (b1 - b0)[None]
    d = np.linalg.norm(pa[:, None] - pb[None], axis=-1)
    i, j = np.unravel_index(np.argmin(d), d.shape)
    return pa[i], pb[j], d[i, j]


def oracle_clamp_xy(cur, vel, radius, dt, walls):
    cur = np.asarray(cur, float)
    fut = cur + np.asarray(vel, float) * dt
    movement = fut - cur
    movement_mag = np.linalg.norm(movement)

    best = np.asarray(vel, float)
    for (w0, w1) in walls:
        w0, w1 = np.asarray(w0, float), np.asarray(w1, float)
        pA, pB, cd = _seg_seg_closest_np(w0, w1, cur, fut)
        if cd - radius >= 0.0:
            continue
        at_endpoint = (min(np.linalg.norm(pA - w0), np.linalg.norm(pA - w1)) < 1e-8
                       and np.linalg.norm(pA - pB) > 1e-8)
        if at_endpoint:
            direction_vec = pB - cur
            dir_mag = np.linalg.norm(direction_vec)
            if dir_mag > 0 and np.linalg.norm(pA - cur) - radius < 1e-4 and \
                    np.dot(movement, pA - cur) > -1e-8:
                redux = dir_mag
                unit = direction_vec / dir_mag
            elif dir_mag > 0:
                unit = direction_vec / dir_mag
                arccos_val = -direction_vec @ (pA - pB) / (dir_mag * cd)
                alpha = np.arccos(np.clip(arccos_val, -1.0, 1.0))
                if alpha == np.pi:
                    redux = radius - cd
                else:
                    gamma = np.arcsin(min(cd * np.sin(alpha) / radius, 1.0))
                    beta = np.pi - alpha - gamma
                    redux = radius * np.sin(beta) / np.sin(alpha) + 1e-7
            else:
                redux = 0.0
                unit = direction_vec
            final = cur + unit * max(dir_mag - redux, 0.0)
        else:
            d = w1 - w0
            u = np.dot(cur - w0, d) / np.dot(d, d)
            cl = w0 + u * d
            if movement_mag > 0 and np.linalg.norm(cl - cur) - radius < 1e-4 and \
                    np.dot(movement, cl - cur) > -1e-8:
                final = cur
            elif movement_mag > 0:
                # intersection of travel ray with the wall line:
                # cur + t*movement = w0 + s*(w1-w0)
                d2 = w1 - w0
                denom = movement[0] * d2[1] - movement[1] * d2[0]
                t = ((w0 - cur)[0] * d2[1] - (w0 - cur)[1] * d2[0]) / denom
                inter = cur + t * movement
                d_vec = inter - cur
                dc0 = np.linalg.norm(cur - cl)
                scale = max(0.0, (dc0 - (radius + 1e-7)) / dc0)
                final = cur + d_vec * scale
            else:
                final = cur
        cand = (final - cur) / dt
        if cand @ cand < best @ best:
            best = cand
    return best


def run_both(cur, vel, radius, dt, walls):
    W = len(walls)
    wa = np.zeros((max(W, 1), 2, 2), np.float32)
    wm = np.zeros((max(W, 1),), bool)
    for i, (a, b) in enumerate(walls):
        wa[i, 0], wa[i, 1], wm[i] = a, b, True
    got, _ = WC.clamp_holonomic_action(
        jnp.array(cur, jnp.float32), jnp.array(vel, jnp.float32),
        jnp.float32(radius), dt, jnp.array(wa), jnp.array(wm))
    want = oracle_clamp_xy(cur, vel, radius, dt, walls)
    return np.asarray(got, float), want


def test_no_wall_passthrough():
    got, want = run_both([0, 0], [1.0, 0.3], 0.3, 0.25, [])
    np.testing.assert_allclose(got, [1.0, 0.3], atol=1e-6)


def test_head_on_wall_stops_at_radius():
    # wall at x=0.5, agent heading +x at speed 4 -> crosses in one step
    got, want = run_both([0, 0], [4.0, 0.0], 0.3, 0.25, [((0.5, -2), (0.5, 2))])
    np.testing.assert_allclose(got, want, atol=1e-3)
    final_x = got[0] * 0.25
    assert final_x <= 0.5 - 0.3 + 1e-3
    assert final_x > 0.0  # still allowed to approach


def test_already_touching_blocks():
    got, want = run_both([0.2, 0.0], [2.0, 0.0], 0.3, 0.25, [((0.5, -2), (0.5, 2))])
    np.testing.assert_allclose(got, want, atol=1e-3)
    np.testing.assert_allclose(got, [0.0, 0.0], atol=1e-3)


def test_oblique_slide():
    got, want = run_both([0, 0], [2.0, 2.0], 0.3, 0.25, [((0.4, -2), (0.4, 2))])
    np.testing.assert_allclose(got, want, atol=1e-2)


def test_corner_case():
    # wall endpoint in the path
    got, want = run_both([0, 0], [2.0, 0.0], 0.3, 0.25, [((0.4, 0.05), (0.4, 2))])
    np.testing.assert_allclose(got, want, atol=1e-2)


@pytest.mark.slow
def test_random_parity():
    rng = np.random.default_rng(5)
    bad = 0
    for _ in range(150):
        cur = rng.uniform(-1, 1, 2)
        vel = rng.uniform(-2, 2, 2)
        radius = rng.uniform(0.2, 0.4)
        walls = []
        for _ in range(rng.integers(1, 4)):
            a = rng.uniform(-2, 2, 2)
            b = a + rng.uniform(-2, 2, 2)
            walls.append((tuple(a), tuple(b)))
        got, want = run_both(cur, vel, radius, 0.25, walls)
        if np.linalg.norm(got - want) > 5e-2:
            bad += 1
    assert bad <= 6, f"{bad}/150 mismatches"


def test_unicycle_clamp_sign():
    wa = np.zeros((1, 2, 2), np.float32)
    wa[0, 0], wa[0, 1] = (0.5, -2), (0.5, 2)
    wm = np.ones((1,), bool)
    v, changed = WC.clamp_unicycle_action(
        jnp.array([0.0, 0.0]), jnp.float32(0.0), jnp.float32(4.0),
        jnp.float32(0.0), jnp.float32(0.3), 0.25, jnp.array(wa), jnp.array(wm))
    assert bool(changed)
    assert 0.0 < float(v) * 0.25 <= 0.2 + 1e-3
