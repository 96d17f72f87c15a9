"""Real-robot streaming control loop (the reference's documented robot API).

Equivalent of ``SICNavAcados.select_action`` driven from asynchronous
sensors (sicnav_diffusion/policy/sicnav_acados.py:1309-1628, README.md:116)
with the thread-locked streaming forecaster state of
``ForecasterSimSuper.update_state_hists`` (JMID/mid_sim_wrapper.py:174,
196-258): observation callbacks push timestamped poses at arbitrary rates;
each control tick resamples the histories onto the model's dt grid
(subsample_df's origin-at-end binning + linear interpolation, :283-299),
rebuilds the forecaster state, and runs ONE jitted fused control step.

Static obstacles are runtime parameters of the OCP (the reference's
``outdoor_robot_setting`` parametric walls, mpc_env_new.py:673-685), so
``set_static_obstacles`` retargets the controller without recompiling.
"""

from __future__ import annotations

import threading
import time
from typing import Optional

import jax
import numpy as np

from sicnav_tpu.env.types import DoorParams, EnvConfig, SimState


class ObservationBuffer:
    """Thread-safe asynchronous observation intake.

    ``push`` may be called from sensor callbacks at any rate; ``resample``
    (from the control thread) linearly interpolates every channel onto an
    origin-at-end dt grid — the reference's pandas
    ``resample(origin="end").last().interpolate()`` (mid_sim_wrapper.py:
    283-299) collapsed into direct grid interpolation.
    """

    def __init__(self, max_humans: int, maxlen: int = 600):
        self.lock = threading.Lock()
        self.max_humans = max_humans
        self.maxlen = maxlen
        self.t = []           # list of float timestamps (monotone)
        self.robot = []       # list of (x, y, theta)
        self.humans = []      # list of (H, 2) arrays

    def push(self, t_stamp: float, robot_pose, human_positions):
        """robot_pose: (x, y, theta); human_positions: (H, 2)."""
        hp = np.zeros((self.max_humans, 2), np.float64)
        hp_in = np.asarray(human_positions, np.float64)
        n = min(hp_in.shape[0], self.max_humans)
        hp[:n] = hp_in[:n]
        with self.lock:
            self.t.append(float(t_stamp))
            self.robot.append(np.asarray(robot_pose, np.float64))
            self.humans.append(hp)
            if len(self.t) > self.maxlen:
                self.t.pop(0)
                self.robot.pop(0)
                self.humans.pop(0)

    def resample(self, dt: float, n_frames: int):
        """Interpolate onto the grid t_last - dt*(n_frames-1 .. 0).

        Returns (grid_times (n,), robot (n, 3), humans (H, n, 2),
        frames_covered int) — frames_covered counts grid points inside the
        observed time span (the rest are edge-extrapolated)."""
        with self.lock:
            if not self.t:
                raise RuntimeError("no observations received yet")
            t = np.asarray(self.t)
            robot = np.stack(self.robot)              # (N, 3)
            humans = np.stack(self.humans)            # (N, H, 2)
        grid = t[-1] - dt * np.arange(n_frames - 1, -1, -1)
        # unwrap heading before interpolation
        robot = robot.copy()
        robot[:, 2] = np.unwrap(robot[:, 2])
        rob_g = np.stack([np.interp(grid, t, robot[:, d]) for d in range(3)],
                         axis=-1)
        H = humans.shape[1]
        hum_g = np.stack(
            [np.stack([np.interp(grid, t, humans[:, h, d]) for d in range(2)],
                      axis=-1) for h in range(H)])    # (H, n, 2)
        covered = int(np.sum(grid >= t[0] - 1e-9))
        return grid, rob_g, hum_g, covered


class StreamingController:
    """Asynchronous-sensor SICNav-Diffusion controller.

    Usage (10 Hz real-robot loop):
      ctl = StreamingController(env_cfg, model, params)
      ctl.set_goal((gx, gy)); ctl.set_static_obstacles(segments)
      sensor thread:  ctl.observe(t, (x, y, th), human_xy)
      control thread: v, om, diag = ctl.select_action()
    """

    def __init__(self, env_cfg: EnvConfig, model, params, fcfg=None,
                 settings=None, ral: bool = True,
                 num_stat_obs: Optional[int] = None, seed: int = 0):
        from sicnav_tpu.diffusion import forecaster as FC
        from sicnav_tpu.mpc import sicnav_diffusion as SD
        self.env_cfg = env_cfg
        if fcfg is None:
            fcfg = FC.ForecasterConfig(num_samples=48, num_ret_samples=10,
                                       dt=env_cfg.dt)
        self.fcfg = fcfg
        self.FC = FC
        self.SD = SD
        self.ocp, _ = SD.make_policy(env_cfg, model, params, fcfg=fcfg,
                                     settings=settings, ral=ral)
        if settings is None:
            from sicnav_tpu.mpc import ipm
            settings = ipm.realtime_settings(self.ocp.cfg.num_hums,
                                             with_mid=True)
        self._model, self._params, self._settings = model, params, settings
        self.W = self.ocp.cfg.num_walls if num_stat_obs is None \
            else num_stat_obs
        self.buffer = ObservationBuffer(env_cfg.max_humans)
        self.carry = SD.init_carry(self.ocp, env_cfg.max_humans, fcfg, seed)
        self.goal = np.zeros(2)
        self.walls = np.zeros((self.env_cfg.wall_slots, 2, 2), np.float32)
        self.wall_mask = np.zeros((self.env_cfg.wall_slots,), bool)
        self._prev_cmd = np.zeros(2)
        self._have_prev = False
        self._step_idx = 0
        self._pack_layout = None
        self._unpack = None
        self._packed_step = None

    # -- intake -----------------------------------------------------------

    def observe(self, t_stamp, robot_pose, human_positions):
        self.buffer.push(t_stamp, robot_pose, human_positions)

    def set_goal(self, goal):
        self.goal = np.asarray(goal, np.float64)

    def set_static_obstacles(self, segments):
        """segments: (n, 2, 2) wall endpoints — runtime OCP params (the
        outdoor parametric static-obstacle mode)."""
        seg = np.asarray(segments, np.float32).reshape(-1, 2, 2)
        W = self.env_cfg.wall_slots
        self.walls = np.zeros((W, 2, 2), np.float32)
        self.wall_mask = np.zeros((W,), bool)
        n = min(seg.shape[0], W)
        self.walls[:n] = seg[:n]
        self.wall_mask[:n] = True

    # -- control ----------------------------------------------------------

    def _build_state(self):
        cfg, fcfg = self.env_cfg, self.fcfg
        grid, rob, hums, covered = self.buffer.resample(
            fcfg.dt, fcfg.past_frames)
        H = cfg.max_humans
        h_pos = hums[:, -1].astype(np.float32)
        h_vel = ((hums[:, -1] - hums[:, -2]) / fcfg.dt).astype(np.float32) \
            if fcfg.past_frames > 1 and covered > 1 else np.zeros((H, 2),
                                                                  np.float32)
        r_pos = rob[-1, :2].astype(np.float32)
        r_theta = np.float32(np.mod(rob[-1, 2] + np.pi, 2 * np.pi) - np.pi)
        r_vel = ((rob[-1, :2] - rob[-2, :2]) / fcfg.dt).astype(np.float32) \
            if covered > 1 else np.zeros(2, np.float32)
        r_omega = np.float32((rob[-1, 2] - rob[-2, 2]) / fcfg.dt) \
            if covered > 1 else np.float32(0.0)
        z2, zH = np.zeros(2, np.float32), np.zeros(H, np.float32)
        door = DoorParams(*(np.asarray(x) for x in
                            (False, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0)))
        state = SimState(
            r_pos=r_pos, r_vel=r_vel, r_theta=r_theta, r_omega=r_omega,
            r_goal=self.goal.astype(np.float32),
            r_radius=np.float32(cfg.robot_radius),
            r_v_pref=np.float32(cfg.robot_v_pref),
            h_pos=h_pos, h_vel=h_vel,
            h_theta=np.arctan2(h_vel[:, 1], h_vel[:, 0]).astype(np.float32),
            h_goal=h_pos + 2.0 * h_vel, h_final_goal=h_pos + 2.0 * h_vel,
            h_radius=np.full(H, cfg.human_radius, np.float32),
            h_v_pref=np.full(H, cfg.human_v_pref, np.float32),
            h_mask=np.ones(H, bool),
            walls=self.walls, wall_mask=self.wall_mask, door=door,
            t=np.float32(grid[-1]), step_idx=np.int32(self._step_idx),
            prev_dist_to_goal=np.float32(
                np.linalg.norm(r_pos - self.goal)),
            prev_ang=np.float32(self._prev_cmd[1]),
            has_prev_ang=np.asarray(self._have_prev),
            prev_lin=np.float32(self._prev_cmd[0]),
            has_prev_lin=np.asarray(self._have_prev),
            human_times=zH, done=np.asarray(False))
        # Forecaster state from the resampled history grid, shifted back
        # one frame: the fused control step pushes the CURRENT position
        # onto the ring itself (update_state_hists), after which the ring
        # equals the grid exactly.
        hist_pre = np.concatenate([hums[:, :1], hums[:, :-1]], axis=1)
        cnt = max(min(covered, fcfg.past_frames) - 1, 0)
        fstate = self.FC.ForecasterState(
            hist=hist_pre.astype(np.float32),
            count=np.full(H, cnt, np.int32))
        return state, fstate

    def _pack(self, state, fstate):
        """Flatten (SimState, ForecasterState) into ONE host float32 vector.

        Remote/tunneled TPU runtimes pay a per-buffer RPC on every
        host->device transfer; shipping the ~35-leaf observation pytree
        leaf-by-leaf costs 45-80 ms per tick (measured, one v5e via axon).
        One packed buffer makes it a single transfer; the jitted unpack
        below (slices + casts) fuses into the control-step program."""
        import jax.numpy as jnp
        leaves, treedef = jax.tree.flatten((state, fstate))
        if self._pack_layout is None:
            shapes = [np.shape(l) for l in leaves]
            dtypes = [np.asarray(l).dtype for l in leaves]
            sizes = [int(np.prod(s)) if s else 1 for s in shapes]
            offs = np.concatenate([[0], np.cumsum(sizes)]).tolist()
            self._pack_layout = (treedef, shapes, dtypes, sizes, offs)

            def unpack(flat):
                out = []
                for sh, dt, sz, o in zip(shapes, dtypes, sizes, offs[:-1]):
                    piece = flat[o:o + sz]
                    piece = piece.reshape(sh) if sh else piece[0]
                    out.append(piece.astype(dt))
                return jax.tree.unflatten(treedef, out)

            self._unpack = unpack
        _, shapes, dtypes, sizes, offs = self._pack_layout
        flat = np.empty((offs[-1],), np.float32)
        for l, sz, o in zip(leaves, sizes, offs[:-1]):
            flat[o:o + sz] = np.asarray(l, np.float64).ravel()
        return jnp.asarray(flat)

    def select_action(self):
        """One streaming control step. Returns (v, omega, diag)."""
        t0 = time.perf_counter()
        state, fstate = self._build_state()
        flat = self._pack(state, fstate)

        if self._packed_step is None:
            import functools

            @functools.partial(jax.jit, static_argnames=("settings",))
            def _packed_step(flat, carry, params, settings):
                st, fs = self._unpack(flat)
                # history comes from the resample, not the carry ring
                c = carry._replace(forecaster=fs)
                return self.SD.sicnav_diffusion_action(
                    self.ocp, self._model, params, st, c,
                    self.env_cfg, self.fcfg, settings)

            self._packed_step = _packed_step
        action, carry = self._packed_step(flat, self.carry, self._params,
                                          self._settings)
        action = np.asarray(jax.block_until_ready(action))
        self.carry = carry
        self._prev_cmd = action
        self._have_prev = True
        self._step_idx += 1
        latency = time.perf_counter() - t0
        v, r = float(action[0]), float(action[1])
        omega = r / self.env_cfg.dt
        return v, omega, {"latency_s": latency, "t_obs": float(state.t)}
