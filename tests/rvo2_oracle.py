"""Scalar numpy oracle of the ORCA algorithm (van den Berg et al., ISRR 2011).

Independent, readable transcription of the published algorithm used ONLY as a
test oracle for sicnav_tpu.ops.orca (the Python-RVO2 C++ library is not
available in this environment). Structured as the classic agent-update:
obstacle lines -> agent lines -> linearProgram2 -> linearProgram3 fallback.
"""
import numpy as np

RVO_EPSILON = 1e-5


def det(a, b):
    return a[0] * b[1] - a[1] * b[0]


def absq(a):
    return float(np.dot(a, a))


def norm(a):
    return float(np.linalg.norm(a))


def normalize(a):
    n = norm(a)
    return a / n if n > 0 else a * 0.0


class Line:
    def __init__(self, point, direction):
        self.point = np.asarray(point, dtype=np.float64)
        self.dir = np.asarray(direction, dtype=np.float64)


def agent_lines(pos, vel, rad, neighbors, time_horizon, dt):
    """neighbors: list of (pos, vel, rad) sorted by distance."""
    lines = []
    inv_th = 1.0 / time_horizon
    for (npos, nvel, nrad) in neighbors:
        rel_pos = np.asarray(npos) - pos
        rel_vel = vel - np.asarray(nvel)
        dist_sq = absq(rel_pos)
        comb_r = rad + nrad
        comb_r_sq = comb_r * comb_r
        if dist_sq > comb_r_sq:
            w = rel_vel - inv_th * rel_pos
            w_len_sq = absq(w)
            dot1 = float(np.dot(w, rel_pos))
            if dot1 < 0.0 and dot1 * dot1 > comb_r_sq * w_len_sq:
                w_len = np.sqrt(w_len_sq)
                unit_w = w / w_len
                direction = np.array([unit_w[1], -unit_w[0]])
                u = (comb_r * inv_th - w_len) * unit_w
            else:
                leg = np.sqrt(dist_sq - comb_r_sq)
                if det(rel_pos, w) > 0.0:
                    direction = np.array([rel_pos[0] * leg - rel_pos[1] * comb_r,
                                          rel_pos[0] * comb_r + rel_pos[1] * leg]) / dist_sq
                else:
                    direction = -np.array([rel_pos[0] * leg + rel_pos[1] * comb_r,
                                           -rel_pos[0] * comb_r + rel_pos[1] * leg]) / dist_sq
                u = float(np.dot(rel_vel, direction)) * direction - rel_vel
        else:
            inv_dt = 1.0 / dt
            w = rel_vel - inv_dt * rel_pos
            w_len = norm(w)
            unit_w = w / w_len
            direction = np.array([unit_w[1], -unit_w[0]])
            u = (comb_r * inv_dt - w_len) * unit_w
        lines.append(Line(vel + 0.5 * u, direction))
    return lines


def obstacle_lines(pos, vel, rad, edges, time_horizon_obst):
    """edges: list of (p1, p2) directed edges of standalone 2-vertex walls,
    sorted by distance. 2-gon topology: both vertices convex, prev edge
    direction = -unit_dir, next edge direction = unit_dir."""
    lines = []
    inv_th = 1.0 / time_horizon_obst
    r_sq = rad * rad
    for (p1, p2) in edges:
        p1 = np.asarray(p1, np.float64)
        p2 = np.asarray(p2, np.float64)
        rp1 = p1 - pos
        rp2 = p2 - pos
        unit_dir = normalize(p2 - p1)

        covered = False
        for l in lines:
            if (det(inv_th * rp1 - l.point, l.dir) - inv_th * rad >= -RVO_EPSILON and
                    det(inv_th * rp2 - l.point, l.dir) - inv_th * rad >= -RVO_EPSILON):
                covered = True
                break
        if covered:
            continue

        d1_sq = absq(rp1)
        d2_sq = absq(rp2)
        ovec = p2 - p1
        s = float(np.dot(-rp1, ovec)) / absq(ovec)
        dline_sq = absq(-rp1 - s * ovec)

        if s < 0.0 and d1_sq <= r_sq:
            # collision with left vertex (convex)
            lines.append(Line(np.zeros(2), normalize(np.array([-rp1[1], rp1[0]]))))
            continue
        elif s > 1.0 and d2_sq <= r_sq:
            # collision with right vertex
            if det(rp2, -unit_dir) >= 0.0:
                lines.append(Line(np.zeros(2), normalize(np.array([-rp2[1], rp2[0]]))))
            continue
        elif 0.0 <= s <= 1.0 and dline_sq <= r_sq:
            lines.append(Line(np.zeros(2), -unit_dir))
            continue

        same_vertex = False
        if s < 0.0 and dline_sq <= r_sq:
            same_vertex = True
            leg1 = np.sqrt(d1_sq - r_sq)
            left_leg = np.array([rp1[0] * leg1 - rp1[1] * rad,
                                 rp1[0] * rad + rp1[1] * leg1]) / d1_sq
            right_leg = np.array([rp1[0] * leg1 + rp1[1] * rad,
                                  -rp1[0] * rad + rp1[1] * leg1]) / d1_sq
            cut_l, cut_r = rp1, rp1
        elif s > 1.0 and dline_sq <= r_sq:
            same_vertex = True
            leg2 = np.sqrt(d2_sq - r_sq)
            left_leg = np.array([rp2[0] * leg2 - rp2[1] * rad,
                                 rp2[0] * rad + rp2[1] * leg2]) / d2_sq
            right_leg = np.array([rp2[0] * leg2 + rp2[1] * rad,
                                  -rp2[0] * rad + rp2[1] * leg2]) / d2_sq
            cut_l, cut_r = rp2, rp2
        else:
            leg1 = np.sqrt(d1_sq - r_sq)
            left_leg = np.array([rp1[0] * leg1 - rp1[1] * rad,
                                 rp1[0] * rad + rp1[1] * leg1]) / d1_sq
            leg2 = np.sqrt(d2_sq - r_sq)
            right_leg = np.array([rp2[0] * leg2 + rp2[1] * rad,
                                  -rp2[0] * rad + rp2[1] * leg2]) / d2_sq
            cut_l, cut_r = rp1, rp2

        left_foreign = False
        right_foreign = False
        if det(left_leg, unit_dir) >= 0.0:  # prev edge dir = -unit_dir; -prev = unit_dir
            left_leg = unit_dir
            left_foreign = True
        if det(right_leg, unit_dir) <= 0.0:  # next edge dir = unit_dir
            right_leg = unit_dir
            right_foreign = True

        left_cutoff = inv_th * cut_l
        right_cutoff = inv_th * cut_r
        cutoff_vec = right_cutoff - left_cutoff

        t = 0.5 if same_vertex else float(np.dot(vel - left_cutoff, cutoff_vec)) / absq(cutoff_vec)
        t_left = float(np.dot(vel - left_cutoff, left_leg))
        t_right = float(np.dot(vel - right_cutoff, right_leg))

        if (t < 0.0 and t_left < 0.0) or (same_vertex and t_left < 0.0 and t_right < 0.0):
            unit_w = normalize(vel - left_cutoff)
            lines.append(Line(left_cutoff + rad * inv_th * unit_w,
                              np.array([unit_w[1], -unit_w[0]])))
            continue
        elif t > 1.0 and t_right < 0.0:
            unit_w = normalize(vel - right_cutoff)
            lines.append(Line(right_cutoff + rad * inv_th * unit_w,
                              np.array([unit_w[1], -unit_w[0]])))
            continue

        d_cut = np.inf if (t < 0.0 or t > 1.0 or same_vertex) else absq(vel - (left_cutoff + t * cutoff_vec))
        d_left = np.inf if t_left < 0.0 else absq(vel - (left_cutoff + t_left * left_leg))
        d_right = np.inf if t_right < 0.0 else absq(vel - (right_cutoff + t_right * right_leg))

        if d_cut <= d_left and d_cut <= d_right:
            direction = -unit_dir
            lines.append(Line(left_cutoff + rad * inv_th * np.array([-direction[1], direction[0]]),
                              direction))
        elif d_left <= d_right:
            if left_foreign:
                continue
            direction = left_leg
            lines.append(Line(left_cutoff + rad * inv_th * np.array([-direction[1], direction[0]]),
                              direction))
        else:
            if right_foreign:
                continue
            direction = -right_leg
            lines.append(Line(right_cutoff + rad * inv_th * np.array([-direction[1], direction[0]]),
                              direction))
    return lines


def linear_program1(lines, line_no, radius, opt_vel, direction_opt, result):
    pt, dr = lines[line_no].point, lines[line_no].dir
    dot_product = float(np.dot(pt, dr))
    disc = dot_product * dot_product + radius * radius - absq(pt)
    if disc < 0.0:
        return result, False
    sqrt_disc = np.sqrt(disc)
    t_left = -dot_product - sqrt_disc
    t_right = -dot_product + sqrt_disc
    for i in range(line_no):
        denom = det(dr, lines[i].dir)
        numer = det(lines[i].dir, pt - lines[i].point)
        if abs(denom) <= RVO_EPSILON:
            if numer < 0.0:
                return result, False
            continue
        t = numer / denom
        if denom >= 0.0:
            t_right = min(t_right, t)
        else:
            t_left = max(t_left, t)
        if t_left > t_right:
            return result, False
    if direction_opt:
        t = t_right if np.dot(opt_vel, dr) > 0.0 else t_left
    else:
        t = float(np.clip(np.dot(dr, opt_vel - pt), t_left, t_right))
    return pt + t * dr, True


def linear_program2(lines, radius, opt_vel, direction_opt):
    if direction_opt:
        result = opt_vel * radius
    elif absq(opt_vel) > radius * radius:
        result = normalize(opt_vel) * radius
    else:
        result = np.array(opt_vel, dtype=np.float64)
    for i, line in enumerate(lines):
        if det(line.dir, line.point - result) > 0.0:
            new_result, ok = linear_program1(lines, i, radius, opt_vel,
                                             direction_opt, result)
            if not ok:
                return result, i
            result = new_result
    return result, len(lines)


def linear_program3(lines, num_obst, begin, radius, result):
    distance = 0.0
    for i in range(begin, len(lines)):
        if det(lines[i].dir, lines[i].point - result) > distance:
            proj = list(lines[:num_obst])
            for j in range(num_obst, i):
                denom = det(lines[i].dir, lines[j].dir)
                if abs(denom) <= RVO_EPSILON:
                    if np.dot(lines[i].dir, lines[j].dir) > 0.0:
                        continue
                    point = 0.5 * (lines[i].point + lines[j].point)
                else:
                    point = lines[i].point + (det(lines[j].dir, lines[i].point - lines[j].point) /
                                              denom) * lines[i].dir
                proj.append(Line(point, normalize(lines[j].dir - lines[i].dir)))
            opt = np.array([-lines[i].dir[1], lines[i].dir[0]])
            new_result, fail = linear_program2(proj, radius, opt, True)
            if fail >= len(proj):
                result = new_result
            distance = det(lines[i].dir, lines[i].point - result)
    return result


def orca_velocity(pos, vel, rad, pref_vel, max_speed, neighbors, walls,
                  neighbor_dist=10.0, max_neighbors=10,
                  time_horizon=2.0, time_horizon_obst=0.5, dt=0.25):
    """Full ORCA step for one acting agent.

    neighbors: list of (pos, vel, rad); walls: list of ((x1,y1),(x2,y2))."""
    pos = np.asarray(pos, np.float64)
    vel = np.asarray(vel, np.float64)
    pref_vel = np.asarray(pref_vel, np.float64)

    # neighbor selection: nearest-first within neighbor_dist
    neigh = [(np.asarray(p, np.float64), np.asarray(v, np.float64), float(r))
             for (p, v, r) in neighbors]
    neigh = [n for n in neigh if norm(n[0] - pos) < neighbor_dist]
    neigh.sort(key=lambda n: norm(n[0] - pos))
    neigh = neigh[:max_neighbors]

    # obstacle edges: both orientations per wall, nearest-first within range
    def seg_dist(p1, p2):
        p1, p2 = np.asarray(p1, np.float64), np.asarray(p2, np.float64)
        d = p2 - p1
        u = np.clip(np.dot(pos - p1, d) / max(absq(d), 1e-18), 0.0, 1.0)
        return norm(p1 + u * d - pos)

    obst_range = time_horizon_obst * max_speed + rad
    edges = []
    for (a, b) in walls:
        for (p1, p2) in [(a, b), (b, a)]:
            p1 = np.asarray(p1, np.float64)
            p2 = np.asarray(p2, np.float64)
            # agent must be strictly on the right side of the directed edge
            # (RVO2 CCW winding / KdTree side check)
            if det(p2 - p1, pos - p1) >= 0.0:
                continue
            dd = seg_dist(p1, p2)
            if dd < obst_range:
                edges.append((dd, (p1, p2)))
    edges.sort(key=lambda e: e[0])
    edges = [e[1] for e in edges]

    o_lines = obstacle_lines(pos, vel, rad, edges, time_horizon_obst)
    a_lines = agent_lines(pos, vel, rad, neigh, time_horizon, dt)
    lines = o_lines + a_lines
    result, fail = linear_program2(lines, max_speed, pref_vel, False)
    if fail < len(lines):
        result = linear_program3(lines, len(o_lines), fail, max_speed, result)
    return result
