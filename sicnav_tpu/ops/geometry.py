"""Batched 2D geometry kernels.

Pure-JAX, branchless (``jnp.where``) re-implementations of the geometry the
reference framework computes with scalar numpy (reference:
crowd_sim_plus/envs/utils/utils_plus.py). All functions operate on the
trailing axes and broadcast / vmap cleanly, so the same kernel serves a
single query or a ``(batch, agents, segments)`` sweep.

Conventions: points are ``(..., 2)`` float arrays; segments are given either
as four scalars ``x1,y1,x2,y2`` (reference API parity) or as ``(..., 2, 2)``
endpoint arrays.
"""

from __future__ import annotations

import jax.numpy as jnp

EPS = 1e-12


def det2(a, b):
    """2D cross product (determinant) of vectors a, b with shape (..., 2)."""
    return a[..., 0] * b[..., 1] - a[..., 1] * b[..., 0]


def dot2(a, b):
    return a[..., 0] * b[..., 0] + a[..., 1] * b[..., 1]


def norm2(a):
    """Euclidean norm over the trailing axis, safe gradient at 0."""
    return jnp.sqrt(jnp.maximum(dot2(a, a), 0.0))


def normalize(a, eps: float = EPS):
    """Unit vector along ``a``; returns 0 for (near-)zero input."""
    n = norm2(a)
    return jnp.where(n[..., None] > eps, a / jnp.maximum(n[..., None], eps), jnp.zeros_like(a))


def closest_point_on_segment(p1, p2, q):
    """Closest point to ``q`` on segment ``p1``-``p2``.

    Parity: utils_plus.closest_point_on_segment (reference
    crowd_sim_plus/envs/utils/utils_plus.py:21-42), vectorized.
    """
    d = p2 - p1
    dd = jnp.maximum(dot2(d, d), EPS)
    u = dot2(q - p1, d) / dd
    u = jnp.clip(u, 0.0, 1.0)
    # degenerate segment -> p1
    degen = dot2(d, d)[..., None] <= EPS
    pt = p1 + u[..., None] * d
    return jnp.where(degen, p1, pt)


def closest_point_on_line(p1, p2, q):
    """Closest point to ``q`` on the *infinite line* through p1-p2.

    Parity: utils_plus.closest_point_on_segment_extended (:44-66).
    """
    d = p2 - p1
    dd = jnp.maximum(dot2(d, d), EPS)
    u = dot2(q - p1, d) / dd
    degen = dot2(d, d)[..., None] <= EPS
    pt = p1 + u[..., None] * d
    return jnp.where(degen, p1, pt)


def point_to_segment_dist(p1, p2, q):
    """Distance from point(s) ``q`` to segment(s) ``p1``-``p2``.

    Parity: utils_plus.point_to_segment_dist (:73-96).
    """
    return norm2(q - closest_point_on_segment(p1, p2, q))


def line_intersection(a0, adir, b0, b1):
    """Intersection of the line through ``a0`` with direction ``adir`` and the
    line through points ``b0``, ``b1``.

    Parity: utils_plus.intersection_of_vec_line_and_2p_line (:6-19). Returns
    the intersection point; where the lines are (near-)parallel the result is
    clamped to ``a0`` (reference would divide by ~0; callers guard this case).
    """
    d1 = adir
    d2 = b1 - b0
    # solve a0 + t*d1 = b0 + s*d2  =>  t = det(b0 - a0, d2) / det(d1, d2)
    denom = det2(d1, d2)
    t = det2(b0 - a0, d2) / jnp.where(jnp.abs(denom) > EPS, denom, jnp.inf)
    return a0 + t[..., None] * d1


def seg_seg_closest(a0, a1, b0, b1):
    """Closest points between 2D segments A=(a0,a1) and B=(b0,b1).

    Returns (pA, pB, dist). Behavioral parity with
    utils_plus.closest_distance_between_line_segments (:205-337) — which works
    in 3D with z=0 — but computed with a direct 2D clamped-projection scheme
    that is branchless and batched. For non-degenerate, non-parallel segments
    the results agree to float tolerance; for parallel/degenerate cases the
    returned *distance* agrees (closest points may differ along the overlap,
    where the minimizer is non-unique).
    """
    dA = a1 - a0
    dB = b1 - b0
    r = b0 - a0
    aa = dot2(dA, dA)
    bb = dot2(dB, dB)
    ab = dot2(dA, dB)
    ar = dot2(dA, r)
    br = dot2(dB, r)
    denom = aa * bb - ab * ab

    # General case: solve for line params, clamp, then re-project.
    s = jnp.where(denom > EPS * jnp.maximum(aa * bb, 1e-30),
                  (ar * bb - br * ab) / jnp.maximum(denom, EPS), 0.0)
    s = jnp.clip(s, 0.0, 1.0)
    # project B-param for this s
    t = jnp.where(bb > EPS, (s * ab - br) / jnp.maximum(bb, EPS), 0.0)
    t = jnp.clip(t, 0.0, 1.0)
    # re-project A-param for this t
    s2 = jnp.where(aa > EPS, (t * ab + ar) / jnp.maximum(aa, EPS), 0.0)
    s2 = jnp.clip(s2, 0.0, 1.0)

    pA = a0 + s2[..., None] * dA
    pB = b0 + t[..., None] * dB
    return pA, pB, norm2(pA - pB)


def seg_seg_dist(a0, a1, b0, b1):
    return seg_seg_closest(a0, a1, b0, b1)[2]


def wrap_angle(theta):
    """Wrap angle(s) to (-pi, pi]. Matches the reference's
    ``theta % 2pi`` then shift convention (agent_plus.py:207-209)."""
    wrapped = jnp.mod(theta, 2.0 * jnp.pi)
    return jnp.where(wrapped > jnp.pi, wrapped - 2.0 * jnp.pi, wrapped)


def rot_2d(theta, p):
    """Rotate point(s) ``p`` into a frame rotated by ``theta``
    (parity: robot_plus.rot_2D — note this is the *inverse* rotation)."""
    c, s = jnp.cos(theta), jnp.sin(theta)
    x = c * p[..., 0] + s * p[..., 1]
    y = -s * p[..., 0] + c * p[..., 1]
    return jnp.stack([x, y], axis=-1)


def tsf_2d(q, p):
    """Rigid transform of point(s) ``p`` into the frame at pose ``q=(x,y,theta)``
    (parity: robot_plus.tsf_2D)."""
    return rot_2d(q[..., 2], p - q[..., 0:2])
