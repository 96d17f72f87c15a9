"""Streaming real-robot controller (realtime.py) tests.

Covers the reference's asynchronous select_action entry: thread-safe
observation intake (mid_sim_wrapper.py:174,251-258), origin-at-end dt-grid
resampling (:283-299), and a full streaming control step with carry
continuity + runtime static obstacles (outdoor mode,
mpc_env_new.py:673-685).
"""

import numpy as np
import pytest


def test_buffer_resample_linear():
    from sicnav_tpu.realtime import ObservationBuffer
    buf = ObservationBuffer(max_humans=2)
    # irregular timestamps, linear trajectories: x_r = t, y_r = 2t,
    # human0 = (-t, 0), human1 = (0.5 t, t)
    for t in [0.0, 0.07, 0.19, 0.31, 0.52, 0.55, 0.74, 1.01]:
        buf.push(t, (t, 2 * t, 0.1 * t),
                 [(-t, 0.0), (0.5 * t, t)])
    grid, rob, hums, covered = buf.resample(0.25, 4)
    np.testing.assert_allclose(grid, [0.26, 0.51, 0.76, 1.01], atol=1e-9)
    assert covered == 4
    np.testing.assert_allclose(rob[:, 0], grid, atol=1e-6)
    np.testing.assert_allclose(rob[:, 1], 2 * grid, atol=1e-6)
    np.testing.assert_allclose(hums[0, :, 0], -grid, atol=1e-6)
    np.testing.assert_allclose(hums[1, :, 1], grid, atol=1e-6)


def test_buffer_resample_edge_extrapolation():
    from sicnav_tpu.realtime import ObservationBuffer
    buf = ObservationBuffer(max_humans=1)
    buf.push(1.0, (1.0, 0.0, 0.0), [(0.0, 0.0)])
    buf.push(1.1, (1.1, 0.0, 0.0), [(0.0, 0.0)])
    grid, rob, hums, covered = buf.resample(0.25, 6)
    # only the last two grid points fall inside the observed span
    assert covered == 1 or covered == 2
    # edge values clamp to the earliest observation (np.interp semantics,
    # the analog of pandas interpolate's ffill at the head)
    assert rob[0, 0] == pytest.approx(1.0)


def test_buffer_thread_safety():
    import threading
    from sicnav_tpu.realtime import ObservationBuffer
    buf = ObservationBuffer(max_humans=3, maxlen=50)
    stop = threading.Event()
    errs = []

    def writer():
        t = 0.0
        while not stop.is_set():
            buf.push(t, (t, t, 0.0), np.zeros((3, 2)))
            t += 0.01

    th = threading.Thread(target=writer, daemon=True)
    th.start()
    try:
        import time
        time.sleep(0.02)
        for _ in range(200):
            try:
                buf.resample(0.25, 6)
            except Exception as e:  # pragma: no cover
                errs.append(e)
    finally:
        stop.set()
        th.join(timeout=1)
    assert not errs


@pytest.mark.slow
def test_streaming_controller_step():
    import jax
    from sicnav_tpu.env.types import EnvConfig
    from sicnav_tpu.env import crowd_sim
    from sicnav_tpu.diffusion.models import ModelConfig
    from sicnav_tpu.diffusion.mid import JMIDModel
    from sicnav_tpu.diffusion import forecaster as FC
    from sicnav_tpu.mpc import ipm
    from sicnav_tpu.realtime import StreamingController

    env_cfg = EnvConfig(scenario="hallway_bottleneck", human_policy="orca_plus",
                        human_num=2, max_humans=2, starts_moving=0,
                        robot_kinematics="unicycle")
    model = JMIDModel(ModelConfig(context_dim=16, tf_layer=1), joint=True)
    fcfg = FC.ForecasterConfig(num_samples=4, num_ret_samples=2,
                               dt=env_cfg.dt)
    state0 = crowd_sim.reset_host(env_cfg, case=0)
    fstate = FC.init_state(env_cfg.max_humans, fcfg)
    batch0 = FC._scene_batch_from_hist(fstate, state0, fcfg)
    key = jax.random.PRNGKey(0)
    params = model.init({"params": key, "dropout": key}, batch0, key)

    ctl = StreamingController(env_cfg, model, params, fcfg=fcfg,
                              settings=ipm.IPMSettings(n_iter=3))
    ctl.set_goal((0.0, 2.0))
    ctl.set_static_obstacles([[[-3.0, -1.0], [3.0, -1.0]],
                              [[-3.0, 3.0], [3.0, 3.0]]])
    # 20 Hz sensor feed for 2 s
    for k in range(40):
        t = 0.05 * k
        ctl.observe(t, (0.0, 0.1 * t, np.pi / 2),
                    [(1.0 - 0.2 * t, 1.0), (-1.0, 1.0 + 0.1 * t)])
    v1, om1, d1 = ctl.select_action()
    assert np.isfinite(v1) and np.isfinite(om1)
    assert d1["t_obs"] == pytest.approx(0.05 * 39, abs=1e-5)
    # second step: carry advances, still finite
    ctl.observe(2.0, (0.0, 0.21, np.pi / 2), [(0.6, 1.0), (-1.0, 1.2)])
    v2, om2, _ = ctl.select_action()
    assert np.isfinite(v2) and np.isfinite(om2)
    assert ctl._step_idx == 2
