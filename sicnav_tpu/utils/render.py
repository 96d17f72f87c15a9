"""Host-side episode rendering (matplotlib), mirroring the reference's
``CrowdSimPlus.render`` video mode (crowd_sim_plus.py:1260-1824): agents as
circles with goals, walls as segments, optional MPC plan / human forecast
overlays; writes mp4 (ffmpeg) or gif (pillow)."""

from __future__ import annotations

from typing import Optional

import numpy as np


def render_episode(traj, cfg, output_file: Optional[str] = None,
                   plans: Optional[np.ndarray] = None,
                   forecasts: Optional[np.ndarray] = None, fps: int = 4,
                   robocentric: bool = False):
    """traj: stacked SimState with leading time axis (from rollout_episode).

    plans: optional (T, K+1, 2) robot MPC plan per step.
    forecasts: optional (T, H, k, F, 2) human forecast samples per step.
    robocentric: render in the robot's heading frame (the reference's
    robocentric video mode, crowd_sim_plus.py:1179,1462 via
    robot_plus.get_robocentric_state) — robot pinned at the origin facing
    +x, world/goals/walls moving around it.
    """
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib import animation, patches

    if robocentric:
        import jax
        from sicnav_tpu.env.occlusion import robocentric_state
        traj = jax.vmap(robocentric_state)(traj)

    r_pos = np.asarray(traj.r_pos)
    r_rad = float(np.asarray(traj.r_radius)[0])
    r_goal_t = np.asarray(traj.r_goal)
    r_goal = r_goal_t[0]
    h_pos = np.asarray(traj.h_pos)
    h_rad = np.asarray(traj.h_radius)[0]
    h_mask = np.asarray(traj.h_mask)[0]
    walls_t = np.asarray(traj.walls)
    walls = walls_t[0]
    wall_mask = np.asarray(traj.wall_mask)[0]
    T = r_pos.shape[0]
    H = h_pos.shape[1]

    fig, ax = plt.subplots(figsize=(7, 7))
    lim = max(4.0, np.abs(r_pos).max() + 1.0)
    ax.set_xlim(-lim, lim)
    ax.set_ylim(-lim, lim)
    ax.set_aspect("equal")

    wall_lines = []
    for w in range(walls.shape[0]):
        if wall_mask[w]:
            ln, = ax.plot(walls[w, :, 0], walls[w, :, 1], "k-", lw=2)
            wall_lines.append((w, ln))
    goal_marker, = ax.plot(*r_goal, "r*", markersize=14)

    robot_c = patches.Circle(r_pos[0], r_rad, fc="gold", ec="k", zorder=3)
    ax.add_patch(robot_c)
    human_cs = []
    for i in range(H):
        c = patches.Circle(h_pos[0, i], h_rad[i], fc="C0", ec="k",
                           alpha=0.8 if h_mask[i] else 0.0, zorder=2)
        ax.add_patch(c)
        human_cs.append(c)
    plan_line, = ax.plot([], [], "r--", lw=1.5, zorder=4)
    fc_lines = [ax.plot([], [], "c-", lw=0.7, alpha=0.4, zorder=1)[0]
                for _ in range(H * 5)]
    time_text = ax.text(0.02, 0.97, "", transform=ax.transAxes, va="top")

    def update(t):
        robot_c.center = r_pos[t]
        if robocentric:
            for w, ln in wall_lines:
                ln.set_data(walls_t[t, w, :, 0], walls_t[t, w, :, 1])
            goal_marker.set_data([r_goal_t[t, 0]], [r_goal_t[t, 1]])
        for i in range(H):
            human_cs[i].center = h_pos[t, i]
        if plans is not None:
            plan_line.set_data(plans[t, :, 0], plans[t, :, 1])
        if forecasts is not None:
            k = min(forecasts.shape[2], 5)
            for i in range(H):
                for j in range(k):
                    fc_lines[i * 5 + j].set_data(forecasts[t, i, j, :, 0],
                                                 forecasts[t, i, j, :, 1])
        time_text.set_text(f"t = {t * cfg.dt:.2f}s")
        return [robot_c] + human_cs + [plan_line, time_text]

    anim = animation.FuncAnimation(fig, update, frames=T, blit=False)
    if output_file:
        if output_file.endswith(".gif"):
            anim.save(output_file, writer="pillow", fps=fps)
        else:
            anim.save(output_file, writer="ffmpeg", fps=fps)
    plt.close(fig)
    return output_file
