import numpy as np
import jax.numpy as jnp

from sicnav_tpu.ops import geometry as G


def ref_point_to_segment_dist(x1, y1, x2, y2, x3, y3):
    # scalar reference formula (crowd_sim_plus/envs/utils/utils_plus.py:73-96)
    px, py = x2 - x1, y2 - y1
    if px == 0 and py == 0:
        return np.linalg.norm((x3 - x1, y3 - y1))
    u = ((x3 - x1) * px + (y3 - y1) * py) / (px * px + py * py)
    u = min(max(u, 0.0), 1.0)
    x, y = x1 + u * px, y1 + u * py
    return np.linalg.norm((x - x3, y - y3))


def test_point_to_segment_dist_random():
    rng = np.random.default_rng(0)
    for _ in range(200):
        a = rng.uniform(-5, 5, 2)
        b = rng.uniform(-5, 5, 2)
        q = rng.uniform(-5, 5, 2)
        got = float(G.point_to_segment_dist(jnp.array(a), jnp.array(b), jnp.array(q)))
        want = ref_point_to_segment_dist(*a, *b, *q)
        assert abs(got - want) < 1e-5


def test_point_to_segment_degenerate():
    a = jnp.array([1.0, 1.0])
    q = jnp.array([4.0, 5.0])
    assert abs(float(G.point_to_segment_dist(a, a, q)) - 5.0) < 1e-6


def test_seg_seg_dist_crossing():
    # crossing segments -> distance 0
    d = G.seg_seg_dist(jnp.array([-1.0, 0.0]), jnp.array([1.0, 0.0]),
                       jnp.array([0.0, -1.0]), jnp.array([0.0, 1.0]))
    assert float(d) < 1e-6


def test_seg_seg_dist_parallel():
    d = G.seg_seg_dist(jnp.array([0.0, 0.0]), jnp.array([1.0, 0.0]),
                       jnp.array([0.0, 1.0]), jnp.array([1.0, 1.0]))
    assert abs(float(d) - 1.0) < 1e-6


def test_seg_seg_dist_random_vs_sampling():
    rng = np.random.default_rng(1)
    for _ in range(100):
        a0, a1, b0, b1 = rng.uniform(-3, 3, (4, 2))
        got = float(G.seg_seg_dist(*map(jnp.array, (a0, a1, b0, b1))))
        # brute force sample
        t = np.linspace(0, 1, 200)
        pa = a0[None] + t[:, None] * (a1 - a0)[None]
        pb = b0[None] + t[:, None] * (b1 - b0)[None]
        want = np.min(np.linalg.norm(pa[:, None] - pb[None], axis=-1))
        assert got <= want + 1e-4
        assert got >= want - 0.05  # sampling resolution slack


def test_wrap_angle():
    assert abs(float(G.wrap_angle(jnp.array(3 * np.pi))) - np.pi) < 1e-6
    assert abs(float(G.wrap_angle(jnp.array(-0.5))) + 0.5) < 1e-6
    # reference convention: (pi, 2pi) wraps negative, pi stays pi
    assert float(G.wrap_angle(jnp.array(np.pi + 0.1))) < 0


def test_batched_broadcast():
    p1 = jnp.zeros((4, 7, 2))
    p2 = jnp.ones((4, 7, 2))
    q = jnp.full((4, 7, 2), 0.5)
    d = G.point_to_segment_dist(p1, p2, q)
    assert d.shape == (4, 7)
    np.testing.assert_allclose(np.asarray(d), 0.0, atol=1e-6)
