"""Scenario generation: human start/goal placement.

Two generators with the same distributions:

- ``generate_host``: numpy, mirrors the reference's RNG call sequence
  exactly (``np.random.default_rng(counter_offset + case)`` and the same
  order of draws — crowd_sim_plus.py:654-673, 454-605) so that a given
  (phase, case) pair produces the *identical* scenario layout as the
  reference's seeded 500-case evaluation protocol.
- ``generate_device``: pure JAX with bounded rejection sampling (fixed trip
  count + accept-first-valid) for massively vmapped on-device resets during
  RL training.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sicnav_tpu.env.types import EnvConfig

# phase -> case counter offset (crowd_sim_plus.py:658-659 with
# case_capacity val=1000, test=1000)
CASE_OFFSET = {"train": 2000, "val": 0, "test": 1000}


def _point_to_seg_dist_np(w, p):
    a, b = w[0], w[1]
    d = b - a
    dd = float(np.dot(d, d))
    if dd == 0.0:
        return float(np.linalg.norm(p - a))
    u = float(np.clip(np.dot(p - a, d) / dd, 0.0, 1.0))
    return float(np.linalg.norm(a + u * d - p))


def generate_host(cfg: EnvConfig, case: int, phase: str = "test",
                  walls: np.ndarray = None, wall_mask: np.ndarray = None
                  ) -> Tuple[np.ndarray, ...]:
    """Generate human (pos, goal, v_pref, radius, theta) arrays for a seeded
    test case, replicating the reference RNG sequence.

    Returns (h_pos (H,2), h_goal (H,2), h_theta (H,), h_radius (H,),
    h_v_pref (H,), h_mask (H,)) padded to cfg.max_humans.
    """
    seed = CASE_OFFSET[phase] + case
    np.random.seed(seed % (2 ** 32))  # legacy seed kept for repeatability
    rng = np.random.default_rng(seed)

    rule = cfg.scenario
    n = cfg.human_num
    H = cfg.max_humans
    assert n <= H

    robot_pos = np.array([0.0, -cfg.circle_radius])
    robot_goal = np.array([0.0, cfg.circle_radius])
    robot_radius = cfg.robot_radius
    discomfort = cfg.rewards.discomfort_dist

    humans = []  # (pos, goal, v_pref, radius, theta)

    def agents_so_far():
        out = [(robot_pos, robot_goal, robot_radius)]
        out += [(h[0], h[1], h[3]) for h in humans]
        return out

    wall_list = []
    if walls is not None:
        for i in range(len(walls)):
            if wall_mask[i]:
                wall_list.append(np.asarray(walls[i], np.float64))

    for _ in range(n):
        radius = cfg.human_radius
        v_pref = cfg.human_v_pref

        if rule == "circle_crossing":
            if cfg.randomize_attributes:
                v_pref = rng.uniform(0.5, 1.5)
            while True:
                angle = rng.random() * np.pi * 2
                px_noise = (rng.random() - 0.5) * v_pref
                py_noise = (rng.random() - 0.5) * v_pref
                px = cfg.circle_radius * np.cos(angle) + px_noise
                py = cfg.circle_radius * np.sin(angle) + py_noise
                collide = False
                for (apos, agoal, arad) in agents_so_far():
                    min_dist = radius + arad + discomfort
                    if (np.linalg.norm((px - apos[0], py - apos[1])) < min_dist or
                            np.linalg.norm((px - agoal[0], py - agoal[1])) < min_dist):
                        collide = True
                        break
                if not collide:
                    break
            humans.append((np.array([px, py]), np.array([-px, -py]),
                           v_pref, radius, 0.0))

        elif rule == "square_crossing":
            if cfg.randomize_attributes:
                v_pref = rng.uniform(0.5, 1.5)
            sign = -1 if rng.random() > 0.5 else 1
            while True:
                px = rng.random() * cfg.square_width * 0.5 * sign
                py = (rng.random() - 0.5) * cfg.square_width
                collide = any(
                    np.linalg.norm((px - a[0][0], py - a[0][1])) < radius + a[2] + discomfort
                    for a in agents_so_far())
                if not collide:
                    break
            while True:
                gx = rng.random() * cfg.square_width * 0.5 * -sign
                gy = (rng.random() - 0.5) * cfg.square_width
                collide = any(
                    np.linalg.norm((gx - a[1][0], gy - a[1][1])) < radius + a[2] + discomfort
                    for a in agents_so_far())
                if not collide:
                    break
            humans.append((np.array([px, py]), np.array([gx, gy]),
                           v_pref, radius, 0.0))

        else:
            # hallway family (crowd_sim_plus.py:522-605)
            effective_rect_height = cfg.rect_height
            while True:
                if cfg.randomize_attributes:
                    v_pref = rng.uniform(0.5, 1.5)
                dir_sign = 1 if rng.random() < 0.15 else -1
                prob_right = 0.8
                right_num = prob_right if dir_sign > 0 else 1 - prob_right
                wor_sign = -1 if rng.random() < right_num else 1
                prob_cross = 0.3
                if rng.random() < right_num:
                    prob_cross = 1 - prob_cross
                cross_sign = -wor_sign if rng.random() < prob_cross else wor_sign

                px = rng.random() * 0.5 * wor_sign * (cfg.rect_width - radius * 2)
                py = (rng.random() * 0.25 * dir_sign * cfg.circle_radius *
                      (effective_rect_height - radius * 2))
                collide = False
                # robot proximity with discomfort buffer
                if np.linalg.norm((px - robot_pos[0], py - robot_pos[1])) < \
                        radius + robot_radius + discomfort:
                    collide = True
                # all agents without buffer
                for (apos, _, arad) in agents_so_far():
                    if np.linalg.norm((px - apos[0], py - apos[1])) < radius + arad:
                        collide = True
                        break
                if not collide:
                    for w in wall_list:
                        if abs(_point_to_seg_dist_np(w, np.array([px, py]))) < radius + 0.01:
                            collide = True
                            break
                if collide:
                    effective_rect_height *= 1.1
                    continue

                gx = rng.random() * 0.5 * cross_sign * (cfg.rect_width - radius * 2)
                gy = (rng.random() * 0.5 * -dir_sign * cfg.circle_radius *
                      (effective_rect_height - radius * 2))
                collide = False
                for (_, agoal, arad) in agents_so_far():
                    if np.linalg.norm((gx - agoal[0], gy - agoal[1])) < radius + arad:
                        collide = True
                        break
                if not collide:
                    for w in wall_list:
                        if abs(_point_to_seg_dist_np(w, np.array([gx, gy]))) < radius:
                            collide = True
                            break
                if not collide:
                    break
                effective_rect_height *= 1.1
            theta = float(np.arctan2(gy - py, gx - px))
            humans.append((np.array([px, py]), np.array([gx, gy]),
                           v_pref, radius, theta))

    h_pos = np.zeros((H, 2), np.float32)
    h_goal = np.zeros((H, 2), np.float32)
    h_theta = np.zeros((H,), np.float32)
    h_radius = np.zeros((H,), np.float32)
    h_v_pref = np.zeros((H,), np.float32)
    h_mask = np.zeros((H,), bool)
    for i, (p, g, vp, r, th) in enumerate(humans):
        h_pos[i] = p
        h_goal[i] = g
        h_theta[i] = th
        h_radius[i] = r
        h_v_pref[i] = vp
        h_mask[i] = True
    return h_pos, h_goal, h_theta, h_radius, h_v_pref, h_mask


# ---------------------------------------------------------------------------
# On-device generation (bounded rejection, for vmapped training resets)
# ---------------------------------------------------------------------------

_TRIES = 64


def _device_circle_human(key, cfg: EnvConfig, prev_pos, prev_goal, prev_rad,
                         prev_mask, robot_pos, robot_goal):
    radius = jnp.float32(cfg.human_radius)
    k_vp, k_draw = jax.random.split(key)
    v_pref = jnp.where(cfg.randomize_attributes,
                       jax.random.uniform(k_vp, (), minval=0.5, maxval=1.5),
                       jnp.float32(cfg.human_v_pref))
    draws = jax.random.uniform(k_draw, (_TRIES, 3))
    angle = draws[:, 0] * 2 * jnp.pi
    noise = (draws[:, 1:3] - 0.5) * v_pref
    p = cfg.circle_radius * jnp.stack([jnp.cos(angle), jnp.sin(angle)], -1) + noise

    apos = jnp.concatenate([robot_pos[None], prev_pos], 0)
    agoal = jnp.concatenate([robot_goal[None], prev_goal], 0)
    arad = jnp.concatenate([jnp.array([cfg.robot_radius], jnp.float32), prev_rad], 0)
    amask = jnp.concatenate([jnp.array([True]), prev_mask], 0)
    min_dist = radius + arad + cfg.rewards.discomfort_dist

    d_pos = jnp.linalg.norm(p[:, None, :] - apos[None, :, :], axis=-1)
    d_goal = jnp.linalg.norm(p[:, None, :] - agoal[None, :, :], axis=-1)
    bad = jnp.any(amask[None, :] & ((d_pos < min_dist[None, :]) |
                                    (d_goal < min_dist[None, :])), axis=1)
    idx = jnp.argmax(~bad)  # first valid try (or 0 if none valid)
    return p[idx], -p[idx], v_pref, radius, jnp.float32(0.0)


def _device_square_human(key, cfg: EnvConfig, prev_pos, prev_goal, prev_rad,
                         prev_mask, robot_pos, robot_goal):
    """Square-crossing distribution (crowd_sim_plus.py:484-520): start in a
    random half-square (side chosen p=0.5), goal in the opposite half;
    position and goal rejected independently against existing agents."""
    radius = jnp.float32(cfg.human_radius)
    k_vp, k_sign, k_p, k_g = jax.random.split(key, 4)
    v_pref = jnp.where(cfg.randomize_attributes,
                       jax.random.uniform(k_vp, (), minval=0.5, maxval=1.5),
                       jnp.float32(cfg.human_v_pref))
    sign = jnp.where(jax.random.uniform(k_sign) > 0.5, -1.0, 1.0)

    up = jax.random.uniform(k_p, (_TRIES, 2))
    p = jnp.stack([up[:, 0] * cfg.square_width * 0.5 * sign,
                   (up[:, 1] - 0.5) * cfg.square_width], -1)
    ug = jax.random.uniform(k_g, (_TRIES, 2))
    g = jnp.stack([ug[:, 0] * cfg.square_width * 0.5 * -sign,
                   (ug[:, 1] - 0.5) * cfg.square_width], -1)

    apos = jnp.concatenate([robot_pos[None], prev_pos], 0)
    agoal = jnp.concatenate([robot_goal[None], prev_goal], 0)
    arad = jnp.concatenate([jnp.array([cfg.robot_radius], jnp.float32),
                            prev_rad], 0)
    amask = jnp.concatenate([jnp.array([True]), prev_mask], 0)
    min_dist = radius + arad + cfg.rewards.discomfort_dist

    d_pos = jnp.linalg.norm(p[:, None, :] - apos[None, :, :], axis=-1)
    bad_p = jnp.any(amask[None, :] & (d_pos < min_dist[None, :]), axis=1)
    d_goal = jnp.linalg.norm(g[:, None, :] - agoal[None, :, :], axis=-1)
    bad_g = jnp.any(amask[None, :] & (d_goal < min_dist[None, :]), axis=1)

    i_p = jnp.argmax(~bad_p)
    i_g = jnp.argmax(~bad_g)
    return p[i_p], g[i_g], v_pref, radius, jnp.float32(0.0)


def _device_hallway_human(key, cfg: EnvConfig, prev_pos, prev_goal, prev_rad,
                          prev_mask, robot_pos, robot_goal, walls, wall_mask):
    radius = jnp.float32(cfg.human_radius)
    keys = jax.random.split(key, 3)
    v_pref = jnp.where(cfg.randomize_attributes,
                       jax.random.uniform(keys[0], (), minval=0.5, maxval=1.5),
                       jnp.float32(cfg.human_v_pref))
    u = jax.random.uniform(keys[1], (_TRIES, 6))
    dir_sign = jnp.where(u[:, 0] < 0.15, 1.0, -1.0)
    right_num = jnp.where(dir_sign > 0, 0.8, 0.2)
    wor_sign = jnp.where(u[:, 1] < right_num, -1.0, 1.0)
    prob_cross = jnp.where(u[:, 2] < right_num, 0.7, 0.3)
    cross_sign = jnp.where(u[:, 3] < prob_cross, -wor_sign, wor_sign)

    px = u[:, 4] * 0.5 * wor_sign * (cfg.rect_width - radius * 2)
    py = u[:, 5] * 0.25 * dir_sign * cfg.circle_radius * (cfg.rect_height - radius * 2)
    p = jnp.stack([px, py], -1)

    ug = jax.random.uniform(keys[2], (_TRIES, 2))
    gx = ug[:, 0] * 0.5 * cross_sign * (cfg.rect_width - radius * 2)
    gy = ug[:, 1] * 0.5 * -dir_sign * cfg.circle_radius * (cfg.rect_height - radius * 2)
    g = jnp.stack([gx, gy], -1)

    apos = jnp.concatenate([robot_pos[None], prev_pos], 0)
    agoal = jnp.concatenate([robot_goal[None], prev_goal], 0)
    arad = jnp.concatenate([jnp.array([cfg.robot_radius], jnp.float32), prev_rad], 0)
    amask = jnp.concatenate([jnp.array([True]), prev_mask], 0)

    d_pos = jnp.linalg.norm(p[:, None, :] - apos[None, :, :], axis=-1)
    bad_p = jnp.any(amask[None, :] & (d_pos < radius + arad[None, :]), axis=1)
    bad_p |= jnp.linalg.norm(p - robot_pos[None], axis=-1) < \
        radius + cfg.robot_radius + cfg.rewards.discomfort_dist
    d_goal = jnp.linalg.norm(g[:, None, :] - agoal[None, :, :], axis=-1)
    bad_g = jnp.any(amask[None, :] & (d_goal < radius + arad[None, :]), axis=1)

    # wall clearance
    from sicnav_tpu.ops.geometry import point_to_segment_dist
    dw_p = jax.vmap(lambda q: jnp.where(
        wall_mask, point_to_segment_dist(walls[:, 0], walls[:, 1], q[None]),
        jnp.inf).min())(p)
    dw_g = jax.vmap(lambda q: jnp.where(
        wall_mask, point_to_segment_dist(walls[:, 0], walls[:, 1], q[None]),
        jnp.inf).min())(g)
    bad = bad_p | bad_g | (dw_p < radius + 0.01) | (dw_g < radius)

    idx = jnp.argmax(~bad)
    theta = jnp.arctan2(g[idx, 1] - p[idx, 1], g[idx, 0] - p[idx, 0])
    return p[idx], g[idx], v_pref, radius, theta


def generate_device(key, cfg: EnvConfig, walls, wall_mask):
    """Pure-JAX scenario generation (same distribution family as the host
    generator, bounded rejection). Returns padded human arrays."""
    H = cfg.max_humans
    n = cfg.human_num
    robot_pos = jnp.array([0.0, -cfg.circle_radius], jnp.float32)
    robot_goal = jnp.array([0.0, cfg.circle_radius], jnp.float32)
    circle = cfg.scenario == "circle_crossing"
    square = cfg.scenario == "square_crossing"

    def body(carry, key_i):
        (pos, goal, vp, rad, theta, mask, i) = carry
        if circle:
            p, g, v, r, th = _device_circle_human(
                key_i, cfg, pos, goal, rad, mask, robot_pos, robot_goal)
        elif square:
            p, g, v, r, th = _device_square_human(
                key_i, cfg, pos, goal, rad, mask, robot_pos, robot_goal)
        else:
            p, g, v, r, th = _device_hallway_human(
                key_i, cfg, pos, goal, rad, mask, robot_pos, robot_goal,
                walls, wall_mask)
        write = i < n
        pos = jnp.where(write, pos.at[i].set(p), pos)
        goal = jnp.where(write, goal.at[i].set(g), goal)
        vp = jnp.where(write, vp.at[i].set(v), vp)
        rad = jnp.where(write, rad.at[i].set(r), rad)
        theta = jnp.where(write, theta.at[i].set(th), theta)
        mask = jnp.where(write, mask.at[i].set(True), mask)
        return (pos, goal, vp, rad, theta, mask, i + 1), None

    init = (jnp.zeros((H, 2), jnp.float32), jnp.zeros((H, 2), jnp.float32),
            jnp.zeros((H,), jnp.float32), jnp.zeros((H,), jnp.float32),
            jnp.zeros((H,), jnp.float32), jnp.zeros((H,), bool), jnp.int32(0))
    keys = jax.random.split(key, H)
    (pos, goal, vp, rad, theta, mask, _), _ = jax.lax.scan(body, init, keys)
    return pos, goal, theta, rad, vp, mask
