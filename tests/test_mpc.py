"""MPC stack tests: OCP consistency, warmstart feasibility, solver behavior.

CAMPC full-solve tests use small configs (CPU compile time of the exact-
Hessian IPM is the binding constraint, not runtime)."""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sicnav_tpu.env.types import EnvConfig
from sicnav_tpu.env import crowd_sim as CS
from sicnav_tpu.mpc.ocp import MPCConfig, OCP
from sicnav_tpu.mpc import campc as C, ipm, warmstart as WS

ENV = EnvConfig(scenario="circle_crossing", human_policy="orca", human_num=2,
                max_humans=2, starts_moving=0, robot_kinematics="unicycle")
MPC = MPCConfig(num_hums=2, num_walls=1, priviledged_info=True)


@pytest.fixture(scope="module")
def ocp():
    return OCP(MPC)


@pytest.fixture(scope="module")
def setup(ocp):
    state = CS.reset_host(ENV, case=1)
    params = C.build_params(ocp, state, ENV)
    return state, params


@pytest.mark.slow
def test_ocp_shapes(ocp, setup):
    _, params = setup
    z = jnp.zeros(MPC.n_z)
    assert ocp.eq_residuals(z, params).shape == (ocp.n_eq,)
    assert ocp.ineq_residuals(z, params).shape == (ocp.n_ineq,)
    assert np.isfinite(float(ocp.cost(z, params)))


def test_pack_unpack_roundtrip(ocp):
    rng = np.random.default_rng(0)
    z = jnp.asarray(rng.normal(size=MPC.n_z), jnp.float32)
    u_rob, u_hums, lam, slacks = ocp.unpack(z)
    z2 = ocp.pack(u_rob, u_hums, lam, slacks)
    np.testing.assert_allclose(np.asarray(z), np.asarray(z2), atol=1e-6)


def test_rollout_dynamics(ocp, setup):
    _, params = setup
    u_rob = jnp.array([[0.5, 0.2]] * MPC.K)
    u_hums = jnp.zeros((MPC.K_orca, MPC.num_hums, 3))
    X_rob, X_hums = ocp.rollout(params, u_rob, u_hums)
    # manual first step
    th1 = float(params.x0_rob[2]) + 0.25 * 0.2
    exp_x = float(params.x0_rob[0]) + 0.25 * 0.5 * np.cos(th1)
    np.testing.assert_allclose(float(X_rob[1, 0]), exp_x, atol=1e-6)
    np.testing.assert_allclose(float(X_rob[1, 3]), 0.5, atol=1e-6)
    # humans with zero decision velocity stay put
    np.testing.assert_allclose(np.asarray(X_hums[1, :, :2]),
                               np.asarray(X_hums[0, :, :2]), atol=1e-6)


@pytest.mark.slow
def test_warmstart_feasibility(ocp, setup):
    _, params = setup
    z = ocp.infer_slacks(WS.warmstart_horizon(ocp, params), params)
    assert bool(jnp.all(jnp.isfinite(z)))
    ineq = ocp.ineq_residuals(z, params)
    assert float(jnp.max(ineq)) < 1e-4          # slack-shifted feasible
    eq = ocp.eq_residuals(z, params)
    # Newton-polished lower-level KKT: embedded equalities near-satisfied
    assert float(jnp.max(jnp.abs(eq))) < 1e-3


@pytest.mark.slow
def test_isolated_human_tracks_v_pref(ocp, setup):
    """A far-from-everything human's warmstart velocity ~ its pref velocity."""
    state, params = setup
    far = params._replace(
        hums0=params.hums0.at[0, :2].set(jnp.array([50.0, 50.0]))
        .at[0, 4:6].set(jnp.array([55.0, 50.0])))
    u, lam = WS.solve_human_step(ocp, far, params.x0_rob, far.hums0, 0)
    from sicnav_tpu.mpc.orca_lines import v_pref_from_state
    vp = v_pref_from_state(far.hums0[0, :2], far.hums0[0, 4:6],
                           far.v_max_prefs[0])
    np.testing.assert_allclose(np.asarray(u[:2]), np.asarray(vp), atol=1e-2)


def test_ipm_solves_simple_qp():
    # min (x-2)^2 s.t. x <= 1  ->  x* = 1
    f = lambda z: (z[0] - 2.0) ** 2
    ce = lambda z: jnp.zeros((0,), z.dtype)
    ci = lambda z: jnp.array([z[0] - 1.0])
    z, info = ipm.solve(f, ce, ci, jnp.array([0.0]),
                        ipm.IPMSettings(n_iter=25))
    np.testing.assert_allclose(float(z[0]), 1.0, atol=1e-3)


def test_ipm_equality_constrained():
    # min x^2 + y^2 s.t. x + y = 1 -> (0.5, 0.5)
    f = lambda z: z[0] ** 2 + z[1] ** 2
    ce = lambda z: jnp.array([z[0] + z[1] - 1.0])
    ci = lambda z: jnp.array([-z[0] - 10.0])   # inactive
    z, info = ipm.solve(f, ce, ci, jnp.array([2.0, -1.0]),
                        ipm.IPMSettings(n_iter=25))
    np.testing.assert_allclose(np.asarray(z), [0.5, 0.5], atol=1e-3)


def test_ipm_soc_on_curved_equality():
    """Second-order correction: on a curved equality manifold
    (x^2 + y^2 = 1, min -x -> (1, 0)) the SOC candidate must not break
    convergence and the solver still lands on the optimum; the no-SOC and
    SOC paths agree at the solution."""
    f = lambda z: -z[0]
    ce = lambda z: jnp.array([z[0] ** 2 + z[1] ** 2 - 1.0])
    ci = lambda z: jnp.array([z[1] - 10.0])   # inactive
    z0 = jnp.array([0.3, 0.8])
    z_plain, info_plain = ipm.solve(f, ce, ci, z0,
                                    ipm.IPMSettings(n_iter=30))
    z_soc, info_soc = ipm.solve(f, ce, ci, z0,
                                ipm.IPMSettings(n_iter=30, soc=True))
    np.testing.assert_allclose(np.asarray(z_soc), [1.0, 0.0], atol=2e-3)
    np.testing.assert_allclose(np.asarray(z_plain), np.asarray(z_soc),
                               atol=5e-3)
    assert float(info_soc.eq_viol) < 1e-3


@pytest.mark.slow
def test_campc_cvmm_moves_toward_goal():
    """MPC-CVMM baseline variant (small problem, fast compile)."""
    mpc_cfg = MPCConfig(num_hums=2, num_walls=1, hum_model="cvmm",
                        priviledged_info=True)
    ocp2 = OCP(mpc_cfg)
    state = CS.reset_host(ENV, case=2)
    carry = C.init_carry(ocp2)
    action, carry = C.campc_action(ocp2, state, carry, ENV,
                                   ipm.IPMSettings(n_iter=15))
    a = np.asarray(action)
    assert np.isfinite(a).all()
    # robot starts at rest facing the goal: expect forward accel, small turn
    assert 0.0 < a[0] <= MPC.max_l_acc * ENV.dt + 1e-5
    assert abs(a[1]) <= MPC.max_rot * ENV.dt + 1e-5


@pytest.mark.slow
def test_mid_weight_dynamics_and_preds_constraint():
    """human_pred_mid: goals track weighted samples; preds rows sized."""
    import numpy as np
    cfg = MPCConfig(num_hums=2, num_walls=1, priviledged_info=True,
                    human_pred_mid=True, num_mid_samples=4)
    ocp2 = OCP(cfg)
    state = CS.reset_host(ENV, case=1)
    rng = np.random.default_rng(0)
    steps = np.arange(cfg.K + 2)[None, None, :, None] * 0.25
    cv = (np.asarray(state.h_pos)[None, :, None, :] +
          np.asarray(state.h_vel)[None, :, None, :] * steps)
    samples = jnp.asarray(cv + rng.normal(0, 0.1, (4, 2, cfg.K + 2, 2)),
                          jnp.float32)
    logw0 = jnp.log(jnp.ones(4) / 4)
    params = C.build_params(ocp2, state, ENV, samples, logw0)

    ci = ocp2.ineq_residuals(jnp.zeros(cfg.n_z), params)
    assert ci.shape[0] == ocp2.n_ineq

    u_rob = jnp.zeros((cfg.K, 2))
    u_hums = jnp.zeros((cfg.K_orca, 2, 3))
    _, X_hums = ocp2.rollout(params, u_rob, u_hums)
    # stage-k goals approximate the sample mean at k+2 (near-uniform weights)
    want = np.asarray(samples[:, :, 3].mean(0))
    got = np.asarray(X_hums[1, :, 4:6])
    assert np.linalg.norm(got - want) < 0.5


def test_capsule_collision_rows():
    cfg = MPCConfig(num_hums=2, num_walls=1, priviledged_info=True,
                    robot_capsule=True)
    ocp2 = OCP(cfg)
    state = CS.reset_host(ENV, case=1)
    params = C.build_params(ocp2, state, ENV)
    g = ocp2._ineq_groups(jnp.zeros(cfg.n_z), params)
    assert g["coll"].shape == (cfg.K + 1, 2)
    assert bool(jnp.all(jnp.isfinite(g["coll"])))


def test_realtime_settings_table():
    s1 = ipm.realtime_settings(1)
    s4 = ipm.realtime_settings(4)
    assert s1.n_iter > s4.n_iter
    sm = ipm.realtime_settings(3, with_mid=True)
    assert sm.n_iter > 0


@pytest.mark.slow
def test_ral_8state_mode():
    """RA-L 8-dim robot state: dynamics invariants + cost/constraint sizing
    (mpc_env_new.py:320-351, 620-660)."""
    cfg = MPCConfig(num_hums=2, num_walls=1, priviledged_info=True,
                    robot_nx=8, r_om=50.0, term_q_coeff=75.0,
                    robot_capsule=True)
    ocp2 = OCP(cfg)
    state = CS.reset_host(ENV, case=1)
    params = C.build_params(ocp2, state, ENV)
    assert params.x0_rob.shape == (8,)
    # sin/cos of the initial heading
    np.testing.assert_allclose(
        float(params.x0_rob[2] ** 2 + params.x0_rob[3] ** 2), 1.0, atol=1e-6)

    u_rob = jnp.array([[0.5, 0.3]] * cfg.K)
    u_hums = jnp.zeros((cfg.K_orca, 2, 3))
    X_rob, _ = ocp2.rollout(params, u_rob, u_hums)
    sc = np.asarray(X_rob[:, 2] ** 2 + X_rob[:, 3] ** 2)
    np.testing.assert_allclose(sc, 1.0, atol=1e-5)   # unit heading preserved
    # vdot/omdot states track the input differences
    np.testing.assert_allclose(float(X_rob[1, 6]),
                               (0.5 - float(params.x0_rob[4])) / 0.25,
                               atol=1e-5)
    assert np.isfinite(float(ocp2.cost(jnp.zeros(cfg.n_z), params)))
    ci = ocp2.ineq_residuals(jnp.zeros(cfg.n_z), params)
    assert ci.shape[0] == ocp2.n_ineq


def test_point_stab_reference_phases():
    """The rolled reference cruises at pref_speed, lands exactly on the
    goal, and rotates in place first when starting within robot_radius
    (sicnav_acados.py calc_ref_traj:296-440)."""
    from sicnav_tpu.mpc.ref_traj import point_stab_reference

    dt, v_pref, max_rot, rad = 0.25, 0.9, np.pi / 3, 0.3
    # far from goal, already heading there: pure cruise then arrival
    pos = jnp.array([0.0, 0.0])
    goal = jnp.array([1.6, 0.0])
    poses, acts = point_stab_reference(pos, 0.0, goal, 12, dt,
                                       v_pref, max_rot, rad)
    np.testing.assert_allclose(np.asarray(acts[:7, 0]),
                               [v_pref] * 7, atol=1e-6)
    # arrival step closes the remaining distance exactly
    np.testing.assert_allclose(np.asarray(poses[8, :2]), [1.6, 0.0],
                               atol=1e-5)
    # after arrival the reference parks (v = 0)
    np.testing.assert_allclose(np.asarray(acts[8:, 0]), 0.0, atol=1e-6)
    assert np.all(np.abs(np.asarray(poses[:, 1])) < 1e-5)

    # within robot_radius, facing away: rotate-in-place at >= max_rot
    pos2 = jnp.array([0.2, 0.0])
    goal2 = jnp.array([0.0, 0.0])
    poses2, acts2 = point_stab_reference(pos2, 0.0, goal2, 8, dt,
                                         v_pref, max_rot, rad)
    # needs ceil(pi / (dt * max_rot)) = 13 > 8 steps: whole horizon rotates
    np.testing.assert_allclose(np.asarray(acts2[:, 0])[:3], 0.0, atol=1e-6)
    assert np.all(np.abs(np.asarray(acts2[:3, 1])) >= max_rot - 1e-6)
    # position holds while rotating
    np.testing.assert_allclose(np.asarray(poses2[3, :2]), [0.2, 0.0],
                               atol=1e-6)


@pytest.mark.slow
def test_campc_point_stab_x_ref():
    """build_params with ref_type=point_stab paces x_ref at pref_speed
    instead of tiling the goal."""
    from sicnav_tpu.env import crowd_sim
    from sicnav_tpu.env.types import EnvConfig
    from sicnav_tpu.mpc import campc
    from sicnav_tpu.mpc.ocp import MPCConfig, OCP

    env_cfg = EnvConfig(scenario="circle_crossing", human_policy="orca",
                        human_num=2, max_humans=2,
                        robot_kinematics="unicycle")
    state = crowd_sim.reset_device(jax.random.PRNGKey(0), env_cfg)
    cfg = MPCConfig(num_hums=2, ref_type="point_stab")
    params = campc.build_params(OCP(cfg), state, env_cfg)
    steps = np.linalg.norm(np.diff(np.asarray(params.x_ref[:, :2]), axis=0),
                           axis=1)
    # every reference stage advances by at most one pref_speed step and the
    # first stages move (robot starts far from goal in circle crossing)
    assert np.all(steps <= cfg.pref_speed * cfg.dt + 1e-5)
    assert steps[0] > 0.9 * cfg.pref_speed * cfg.dt


@pytest.mark.slow
def test_reuse_k_budget():
    """Previous-solution reuse is unlimited with warmstart+KKT, budget-
    limited otherwise (campc.py:121-123, 601, 742)."""
    from sicnav_tpu.mpc import campc
    from sicnav_tpu.mpc.ocp import MPCConfig, OCP

    assert campc.reuse_limit(MPCConfig(num_hums=2)) is None
    assert campc.reuse_limit(
        MPCConfig(num_hums=2, warmstart=False)) == MPCConfig(num_hums=2).K_orca
    assert campc.reuse_limit(
        MPCConfig(num_hums=2, hum_model="cvmm")) == MPCConfig(num_hums=2).K

    from sicnav_tpu.env import crowd_sim
    from sicnav_tpu.env.types import EnvConfig
    env_cfg = EnvConfig(scenario="circle_crossing", human_policy="orca",
                        human_num=2, max_humans=2,
                        robot_kinematics="unicycle")
    state = crowd_sim.reset_device(jax.random.PRNGKey(3), env_cfg)
    cfg = MPCConfig(num_hums=2, hum_model="cvmm")
    ocp = OCP(cfg)
    params = campc.build_params(ocp, state, env_cfg)

    # a previous solution poisoned with a large constant: while under the
    # budget the shifted guess inherits it; past the budget it's discarded.
    # pred_rob/pred_hums must match the observed state or the bring_fwd
    # discrepancy check discards the previous solution outright.
    carry = campc.init_carry(ocp)._replace(
        z_prev=jnp.full((cfg.n_z,), 7.7), has_prev=jnp.array(True),
        prev_ok=jnp.array(True),
        pred_rob=campc._rob_pose(ocp, params.x0_rob),
        pred_hums=params.hums0[:, :2])
    z_fresh = campc._select_guess(
        ocp, carry._replace(num_prev_used=jnp.int32(cfg.K)), params)
    z_reuse = campc._select_guess(
        ocp, carry._replace(num_prev_used=jnp.int32(0)), params)
    assert not np.allclose(np.asarray(z_fresh), np.asarray(z_reuse))
    # past-budget guess equals the fresh warmstart built with no history
    z_no_hist = campc._select_guess(ocp, campc.init_carry(ocp), params)
    np.testing.assert_allclose(np.asarray(z_fresh), np.asarray(z_no_hist),
                               atol=1e-6)


@pytest.mark.slow
def test_bring_fwd_discrepancy_rebuilds_warmstart():
    """When the world deviates from the previous solution's stage-1
    prediction (campc.py:546-550), the shifted guess is discarded for a
    fresh feasible warmstart — the recovery that breaks stale-guess
    fixpoints after wall clamps."""
    from sicnav_tpu.env import crowd_sim
    from sicnav_tpu.env.types import EnvConfig
    from sicnav_tpu.mpc import campc
    from sicnav_tpu.mpc.ocp import MPCConfig, OCP

    env_cfg = EnvConfig(scenario="circle_crossing", human_policy="orca",
                        human_num=2, max_humans=2,
                        robot_kinematics="unicycle")
    state = crowd_sim.reset_device(jax.random.PRNGKey(4), env_cfg)
    cfg = MPCConfig(num_hums=2)
    ocp = OCP(cfg)
    params = campc.build_params(ocp, state, env_cfg)

    base = campc.init_carry(ocp)._replace(
        z_prev=jnp.full((cfg.n_z,), 3.3), has_prev=jnp.array(True),
        prev_ok=jnp.array(True),
        pred_rob=campc._rob_pose(ocp, params.x0_rob),
        pred_hums=params.hums0[:, :2])
    z_fresh = campc._select_guess(ocp, campc.init_carry(ocp), params)
    z_consistent = campc._select_guess(ocp, base, params)
    assert not np.allclose(np.asarray(z_consistent), np.asarray(z_fresh))

    # robot pose off by 5 cm -> rebuild
    off_rob = base._replace(pred_rob=base.pred_rob + jnp.array([0.05, 0, 0]))
    np.testing.assert_allclose(
        np.asarray(campc._select_guess(ocp, off_rob, params)),
        np.asarray(z_fresh), atol=1e-6)
    # a human off by 5 cm -> rebuild
    off_hum = base._replace(pred_hums=base.pred_hums.at[1, 0].add(0.05))
    np.testing.assert_allclose(
        np.asarray(campc._select_guess(ocp, off_hum, params)),
        np.asarray(z_fresh), atol=1e-6)


@pytest.mark.slow
def test_introspection_reports(ocp, setup):
    """Named constraint groups + argmax-violated decode + instrumented solve
    (the reference's debug_material / argmax-violated-constraint tooling)."""
    from sicnav_tpu.mpc import introspection as IN

    state, params = setup
    z = jnp.zeros(MPC.n_z)
    rep = jax.jit(IN.constraint_report, static_argnums=0)(ocp, z, params)
    # all groups present and named
    for k in ("coll", "stat", "bound", "acc", "maxvel", "ksi", "kkt",
              "kkt_stationarity", "kkt_complementarity"):
        assert k in rep, k
    name, val, flat = IN.argmax_violated(jax.tree.map(np.asarray, rep))
    assert val >= 0.0
    row = IN.describe_row(ocp, name, flat)
    assert name in row

    # the zero guess violates KKT stationarity (v_pref pull with zero duals)
    assert float(rep["kkt_stationarity"].max_viol) > 0.0

    # instrumented solve returns a full per-iteration table
    report = IN.debug_solve_report(ocp, params, z,
                                   ipm.IPMSettings(n_iter=4))
    assert report["iterations"]["merit"].shape == (4,)
    assert np.isfinite(report["info"]["obj"])
    assert "name" in report["worst"]


@pytest.mark.slow
def test_campc_debug_mode(ocp, setup):
    """campc_action(debug=True) returns the SolveDebug pytree and the same
    action as the plain path."""
    state, _ = setup
    settings = ipm.IPMSettings(n_iter=3)
    a0, c0 = C.campc_action(ocp, state, C.init_carry(ocp), ENV, settings)
    a1, c1, dbg = C.campc_action(ocp, state, C.init_carry(ocp), ENV,
                                 settings, debug=True)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a0), atol=1e-6)
    assert dbg.trace.merit.shape == (3,)
    assert np.asarray(dbg.used_guess).dtype == bool
    assert set(dbg.viol_used) == set(dbg.viol_sol)


@pytest.mark.slow
def test_campc_aux_mode(ocp, setup):
    """campc_action(aux=True) returns the CAMPCAux telemetry pytree with
    the same action as the plain path; the cascade flags are mutually
    consistent."""
    state, _ = setup
    settings = ipm.IPMSettings(n_iter=3)
    a0, _ = C.campc_action(ocp, state, C.init_carry(ocp), ENV, settings)
    a1, _, aux = C.campc_action(ocp, state, C.init_carry(ocp), ENV,
                                settings, aux=True)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a0), atol=1e-6)
    use_guess = bool(aux.use_guess)
    # use_guess implies at least one rejection reason
    if use_guess:
        assert (not bool(aux.sol_feasible) or not bool(aux.sol_realistic)
                or bool(aux.cost_worse))
    assert np.isfinite(float(aux.exact_margin))
    assert np.isfinite(float(aux.slack_max))


@pytest.mark.slow
def test_traced_rollout_matches_stateful(ocp, setup):
    """rollout_episode_traced returns the same EpisodeStats as the plain
    stateful rollout plus a per-step StepTrace."""
    from sicnav_tpu.env import rollout as R
    state, _ = setup
    settings = ipm.IPMSettings(n_iter=2)

    def step_plain(s, c):
        return C.campc_action(ocp, s, c, ENV, settings)

    def step_aux(s, c):
        return C.campc_action(ocp, s, c, ENV, settings, aux=True)

    _, stats0 = R.rollout_episode_stateful(state, C.init_carry(ocp),
                                           step_plain, ENV, 5)
    _, stats1, trace = R.rollout_episode_traced(state, C.init_carry(ocp),
                                                step_aux, ENV, 5)
    for f in stats0._fields:
        np.testing.assert_allclose(np.asarray(getattr(stats1, f)),
                                   np.asarray(getattr(stats0, f)),
                                   atol=1e-5)
    assert trace.dmin.shape == (5,)
    assert trace.aux.use_guess.shape == (5,)


@pytest.mark.slow
def test_failed_solve_rebuilds_fresh_warmstart():
    """After a failed solve (prev_ok=False) the next guess is the fresh
    full-horizon warmstart, not the shifted failed plan
    (sicnav_acados.py:1341-1343 'not self.mpc_sol_succ' branch)."""
    from sicnav_tpu.mpc import campc
    from sicnav_tpu.mpc.ocp import MPCConfig, OCP
    from sicnav_tpu.env import crowd_sim
    from sicnav_tpu.env.types import EnvConfig

    env_cfg = EnvConfig(scenario="circle_crossing", human_policy="orca",
                        human_num=2, max_humans=2,
                        robot_kinematics="unicycle")
    state = crowd_sim.reset_device(jax.random.PRNGKey(3), env_cfg)
    cfg = MPCConfig(num_hums=2, hum_model="cvmm")
    ocp = OCP(cfg)
    params = campc.build_params(ocp, state, env_cfg)
    poisoned = campc.init_carry(ocp)._replace(
        z_prev=jnp.full((cfg.n_z,), 7.7), has_prev=jnp.array(True),
        prev_ok=jnp.array(False),
        pred_rob=campc._rob_pose(ocp, params.x0_rob),
        pred_hums=params.hums0[:, :2])
    z_fresh = campc._select_guess(ocp, campc.init_carry(ocp), params)
    np.testing.assert_allclose(
        np.asarray(campc._select_guess(ocp, poisoned, params)),
        np.asarray(z_fresh), atol=1e-6)


@pytest.mark.slow
def test_acados_slack_mode():
    """slack_mode='acados': raw-violation slacks with L1/L2 penalties
    (campc_acados_opt.py:363-374) — far softer than the T-RO quadratics."""
    from sicnav_tpu.mpc.ocp import MPCConfig, OCP, Slacks

    cfg_a = MPCConfig(num_hums=2, num_walls=1, slack_mode="acados")
    cfg_t = MPCConfig(num_hums=2, num_walls=1)
    assert cfg_a.slack_sc == 1.0
    oa, ot = OCP(cfg_a), OCP(cfg_t)
    zero = jnp.zeros(())
    zH = jnp.zeros((2,))
    s = Slacks(coll=jnp.array([0.05, 0.0]), stat=zero, bound=zero,
               maxvel=zH, ksi=zH, acc=zero, kkt_ineq=zH, kkt_eq=zH,
               preds=zH)
    # acados: (K+1) * (1e4 * 0.05^2 + 10 * 0.05) = 5 * 25.5
    np.testing.assert_allclose(float(oa.slack_cost(s)), 5 * 25.5, rtol=1e-5)
    # same raw violation under tro (s = viol / 1e-3 = 50)
    s_t = s._replace(coll=jnp.array([50.0, 0.0]))
    assert float(ot.slack_cost(s_t)) > 1e4 * float(oa.slack_cost(s))


@pytest.mark.slow
def test_v_signed_alignment_wrap():
    """The signed-speed extraction must be robust to float wobble on either
    side of theta == heading (jnp.mod(x, 2pi) maps -eps to 2pi - eps)."""
    from sicnav_tpu.env import crowd_sim
    from sicnav_tpu.env.types import EnvConfig
    from sicnav_tpu.mpc import campc
    from sicnav_tpu.mpc.ocp import MPCConfig, OCP

    env_cfg = EnvConfig(scenario="circle_crossing", human_policy="orca",
                        human_num=2, max_humans=2,
                        robot_kinematics="unicycle")
    state = crowd_sim.reset_device(jax.random.PRNGKey(0), env_cfg)
    ocp = OCP(MPCConfig(num_hums=2))
    for eps in (0.0, 1e-7, -1e-7):
        th = 0.8 + eps
        st = state._replace(
            r_theta=jnp.float32(th),
            r_vel=0.5 * jnp.array([np.cos(0.8), np.sin(0.8)], jnp.float32))
        params = campc.build_params(ocp, st, env_cfg)
        assert float(params.x0_rob[3]) > 0.49, eps   # forward, not reversed
    # genuinely reversing: velocity opposite heading
    st = state._replace(
        r_theta=jnp.float32(0.8),
        r_vel=-0.5 * jnp.array([np.cos(0.8), np.sin(0.8)], jnp.float32))
    params = campc.build_params(ocp, st, env_cfg)
    assert float(params.x0_rob[3]) < -0.49


@pytest.mark.slow
def test_ipm_early_exit_matches_full_run():
    """early_exit_tol converts the fixed-trip scan into a while_loop that
    stops at convergence: same optimum, fewer iterations, iters telemetry."""
    f = lambda z: (z[0] - 2.0) ** 2 + z[1] ** 2
    ce = lambda z: jnp.array([z[0] + z[1] - 1.0])
    ci = lambda z: jnp.array([z[0] - 5.0])
    z0 = jnp.array([2.0, -1.0])
    # 1e-4/1e-2: f32 tolerances above the codegen-dependent rounding floor
    # (see IPMSettings.early_exit_tol notes); the iterate is converged to
    # O(mu) well before these fire
    z_full, info_full = ipm.solve(f, ce, ci, z0, ipm.IPMSettings(n_iter=60))
    z_ee, info_ee = ipm.solve(f, ce, ci, z0,
                              ipm.IPMSettings(n_iter=60, early_exit_tol=1e-4,
                                              early_exit_comp_tol=1e-2))
    np.testing.assert_allclose(np.asarray(z_ee), np.asarray(z_full), atol=1e-3)
    assert int(info_ee.iters) < 60
    assert int(info_full.iters) == 60
    # trace requests keep the fixed-trip scan (early exit silently off)
    z_tr, _, trace = ipm.solve(f, ce, ci, z0,
                               ipm.IPMSettings(n_iter=20, early_exit_tol=1e-4, early_exit_comp_tol=1e-2),
                               return_trace=True)
    assert trace[0].shape[0] == 20
    # vmapped batch: while_loop still runs under vmap, solutions match
    z0s = jnp.stack([z0, jnp.array([0.0, 0.0]), jnp.array([-3.0, 4.0])])
    sv = ipm.IPMSettings(n_iter=60, early_exit_tol=1e-4, early_exit_comp_tol=1e-2)
    zs, infos = jax.vmap(lambda z: ipm.solve(f, ce, ci, z, sv))(z0s)
    np.testing.assert_allclose(np.asarray(zs),
                               np.tile(np.asarray(z_full), (3, 1)), atol=1e-3)


@pytest.mark.slow
def test_brake_horizon_prefix_margin():
    """exact_plan_margin with horizon>0 ignores late-horizon contact: a plan
    driving straight at a distant stationary human has negative full-horizon
    margin but positive imminent-prefix margin."""
    ocp2 = OCP(MPC)
    state = CS.reset_host(ENV, case=1)
    params = campc_mod_build(ocp2, state)
    # stationary human dead ahead of the robot, ~1.1 m away
    r = np.asarray(params.x0_rob)
    ahead = r[:2] + 1.1 * np.array([np.cos(r[2]), np.sin(r[2])])
    params = params._replace(
        hums0=params.hums0.at[0, :2].set(jnp.asarray(ahead, jnp.float32))
        .at[0, 2:4].set(0.0).at[0, 4:6].set(jnp.asarray(ahead, jnp.float32)),
        v_max_prefs=params.v_max_prefs.at[0].set(1e-3))
    u_rob = jnp.tile(jnp.array([1.0, 0.0]), (MPC.K, 1))  # full speed ahead
    m_full = float(C.exact_plan_margin(ocp2, params, u_rob, horizon=0))
    m_pre = float(C.exact_plan_margin(ocp2, params, u_rob, horizon=2))
    assert m_full < 0.0          # contact within the full horizon
    assert m_pre > 0.0           # but not within the first 2 stages
    assert m_pre > m_full


def campc_mod_build(ocp2, state):
    return C.build_params(ocp2, state, ENV)


def test_door_yield_update():
    """door_yield_update (cfg.door_yield): direction-filtered latched pocket.

    Scenario: hallway bottleneck, robot approaching the door (y=0) from
    below. The protocol must (a) NOT fire while the robot is moving, even
    with a deeper transiting human; (b) fire only after door_yield_stall
    consecutive stalled steps near the door, yielding to a pocket set back
    on the robot's side away from the blocker; (c) stay latched while the
    mouth holds an oncoming transiting human, release when it clears;
    (d) give no priority to a human PARKED at its final goal in the mouth;
    (e) give no priority to a SAME-direction follower in the mouth."""
    env = EnvConfig(scenario="hallway_bottleneck", human_policy="orca_plus",
                    human_num=2, max_humans=2, starts_moving=0,
                    robot_kinematics="unicycle")
    cfg = MPCConfig(num_hums=2, num_walls=env.wall_slots,
                    priviledged_info=True, door_yield=True,
                    door_yield_stall=4)
    state = CS.reset_host(env, case=0)
    center = np.array([float(state.door.x_mid),
                       0.5 * (float(state.door.y_min) + float(state.door.y_max))])
    assert np.allclose(center, [0.0, 0.0], atol=1e-6)

    # robot stalled just below the mouth, heading up; transiting human
    # deeper in the mouth (left of center, moving on)
    stalled = state._replace(
        r_pos=jnp.array([0.0, -0.45]), r_goal=jnp.array([0.0, 3.0]),
        r_vel=jnp.zeros(2), h_mask=jnp.array([True, True]),
        h_pos=jnp.array([[-0.15, 0.2], [0.8, 2.0]]))
    est_moving = jnp.array([[-0.15, -2.0], [0.8, 2.5]])

    # (a)+(b): needs door_yield_stall consecutive stalled steps to trigger
    stall, latch = jnp.int32(0), jnp.array(False)
    fired_at = None
    for k in range(cfg.door_yield_stall + 1):
        use_pocket, pocket, stall, latch = C.door_yield_update(
            stalled, est_moving, cfg, stall, latch)
        if bool(use_pocket) and fired_at is None:
            fired_at = k
    assert fired_at == cfg.door_yield_stall - 1
    p = np.asarray(pocket)
    assert p[1] < -0.5                       # set back on the robot's side
    assert p[0] > 0.3                        # away from the blocker (left)
    assert abs(p[0]) <= 1.0 - 0.3            # inside the hallway walls

    # moving robot: the stall counter resets, no trigger
    moving = stalled._replace(r_vel=jnp.array([0.0, 0.8]))
    up, _, stall_m, _ = C.door_yield_update(
        moving, est_moving, cfg, jnp.int32(10), jnp.array(False))
    assert not bool(up) and int(stall_m) == 0

    # (c) latch holds while a transiting human occupies the mouth, even
    # with the robot moving (retreating to the pocket) ...
    up2, _, stall2, latch2 = C.door_yield_update(
        moving, est_moving, cfg, jnp.int32(0), jnp.array(True))
    assert bool(up2) and bool(latch2)
    # ... and releases once the mouth clears
    clear = moving._replace(h_pos=jnp.array([[-0.9, 1.5], [0.8, 2.0]]))
    up3, _, _, latch3 = C.door_yield_update(
        clear, est_moving, cfg, jnp.int32(0), jnp.array(True))
    assert not bool(up3) and not bool(latch3)

    # (d) human parked at a final goal in the mouth: no trigger ever
    est_parked = jnp.array([[-0.15, 0.2], [0.8, 2.5]])
    stall, latch = jnp.int32(0), jnp.array(False)
    for _ in range(3 * cfg.door_yield_stall):
        up4, _, stall, latch = C.door_yield_update(
            stalled, est_parked, cfg, stall, latch)
        assert not bool(up4)

    # (e) same-direction follower in the mouth (intent continues up, the
    # robot's own crossing direction): no priority, robot tails it
    est_follow = jnp.array([[-0.15, 2.0], [0.8, 2.5]])
    stall, latch = jnp.int32(0), jnp.array(False)
    for _ in range(3 * cfg.door_yield_stall):
        up6, _, stall, latch = C.door_yield_update(
            stalled, est_follow, cfg, stall, latch)
        assert not bool(up6)
    # pre-emptive mode (door_yield_stall=0): oncoming deeper human fires
    # immediately, follower still never does
    cfg0 = dataclasses.replace(cfg, door_yield_stall=0)
    up7, _, _, _ = C.door_yield_update(
        stalled, est_moving, cfg0, jnp.int32(0), jnp.array(False))
    assert bool(up7)
    up8, _, _, _ = C.door_yield_update(
        stalled, est_follow, cfg0, jnp.int32(0), jnp.array(False))
    assert not bool(up8)

    # robot through the pass band: disengaged even with traffic
    through = stalled._replace(r_pos=jnp.array([0.0, 0.5]))
    up5, _, _, latch5 = C.door_yield_update(
        through, est_moving, cfg, jnp.int32(10), jnp.array(True))
    assert not bool(up5) and not bool(latch5)

    # (f) latch TIMEOUT: a yield that has not cleared the mouth by
    # _YIELD_HOLD_MAX releases into a cooldown (counter = -_YIELD_COOLDOWN)
    # during which the trigger is suppressed even under full stall ...
    up9, _, s9, l9 = C.door_yield_update(
        moving, est_moving, cfg, jnp.int32(C._YIELD_HOLD_MAX - 1),
        jnp.array(True))
    assert not bool(up9) and not bool(l9)
    assert int(s9) == -C._YIELD_COOLDOWN
    stall, latch = s9, l9
    for _ in range(C._YIELD_COOLDOWN - 1):
        upc, _, stall, latch = C.door_yield_update(
            stalled, est_moving, cfg0, stall, latch)  # pre-emptive cfg
        assert not bool(upc)
    # ... and re-arms once the cooldown has elapsed
    upr, _, _, _ = C.door_yield_update(stalled, est_moving, cfg0, stall, latch)
    assert bool(upr)


@pytest.mark.slow
def test_cost_weights_runtime_parametric():
    """Q/R/termQ diagonals are per-solve runtime parameters (CostWeights in
    MPCParams, matching the reference's parametric weights,
    mpc_env_new.py:136-159): (a) a weight change alters the cost through
    ONE compiled program (no retrace); (b) the defaults reproduce the
    static-config cost exactly."""
    from sicnav_tpu.mpc.ocp import CostWeights  # noqa: F401
    ocp2 = OCP(MPC)
    state = CS.reset_host(ENV, case=1)
    params = C.build_params(ocp2, state, ENV)
    rng = np.random.default_rng(3)
    z = jnp.asarray(rng.normal(size=MPC.n_z), jnp.float32)

    traces = []

    @jax.jit
    def cost(z, params):
        traces.append(None)
        return ocp2.cost(z, params)

    c0 = float(cost(z, params))
    w1 = MPC.default_weights()._replace(term_q_coeff=jnp.float32(200.0),
                                        r_om=jnp.float32(0.7))
    c1 = float(cost(z, params._replace(cost_w=w1)))
    assert len(traces) == 1, "weight change retraced the program"
    assert c1 != c0
    # defaults == static config semantics
    cfg2 = dataclasses.replace(MPC, term_q_coeff=200.0, r_om=0.7)
    params2 = C.build_params(OCP(cfg2), state, ENV)
    np.testing.assert_allclose(
        float(OCP(cfg2).cost(z, params2)), c1, rtol=1e-6)


def test_yield_pocket_layout_derived():
    """_yield_geometry derives the waiting pocket from DoorParams + the
    REAL wall segments: (a) bottleneck reproduces the round-3 tuned pocket
    (+-0.58, -0.90); (b) on hallway_static (angled jambs) the pocket keeps
    the MPC wall-row clearance from every wall; (c) when no lateral
    candidate clears (walls converging at the door), it falls back to
    backing off in-lane."""
    from sicnav_tpu.ops.geometry import point_to_segment_dist

    env = EnvConfig(scenario="hallway_bottleneck", human_policy="orca_plus",
                    human_num=2, max_humans=2, starts_moving=0,
                    robot_kinematics="unicycle")
    cfg = MPCConfig(num_hums=2, num_walls=env.wall_slots, door_yield=True,
                    wall_margin=0.10)
    state = CS.reset_host(env, case=0)
    state = state._replace(r_pos=jnp.array([0.0, -0.45]),
                           r_goal=jnp.array([0.0, 3.0]))
    p = np.asarray(C._yield_geometry(state, cfg, jnp.float32(1.0),
                                     jnp.float32(1.0)))
    np.testing.assert_allclose(p, [0.58, -0.90], atol=1e-6)

    # (b) hallway_static: pocket must clear every active wall by the
    # MPC's own wall-row radius
    env_s = EnvConfig(scenario="hallway_static", human_policy="orca_plus",
                      human_num=2, max_humans=2, starts_moving=0,
                      robot_kinematics="unicycle")
    cfg_s = MPCConfig(num_hums=2, num_walls=env_s.wall_slots,
                      door_yield=True, wall_margin=0.05)
    st = CS.reset_host(env_s, case=0)
    st = st._replace(r_pos=jnp.array([0.0, -0.45]),
                     r_goal=jnp.array([0.0, 3.0]))
    for side in (1.0, -1.0):
        pk = np.asarray(C._yield_geometry(st, cfg_s, jnp.float32(1.0),
                                          jnp.float32(side)))
        d = np.asarray(point_to_segment_dist(
            st.walls[:, 0], st.walls[:, 1], jnp.asarray(pk)[None]))
        d = np.where(np.asarray(st.wall_mask), d, np.inf)
        stat_buf = 0.05  # max_speed*dt < rob_radius branch
        comb = float(st.r_radius) + stat_buf + cfg_s.wall_margin
        assert d.min() >= comb - 1e-6, (pk, d.min(), comb)

    # (c) converging walls: squeeze every lateral candidate -> in-lane
    # back-off fallback
    tight = st._replace(
        walls=jnp.zeros_like(st.walls)
        .at[0].set(jnp.array([[-0.55, -3.0], [-0.55, 3.0]]))
        .at[1].set(jnp.array([[0.55, -3.0], [0.55, 3.0]])),
        wall_mask=jnp.zeros_like(st.wall_mask).at[:2].set(True))
    pk = np.asarray(C._yield_geometry(tight, cfg_s, jnp.float32(1.0),
                                      jnp.float32(1.0)))
    assert abs(pk[0]) < 1e-6            # in-lane
    assert pk[1] < -1.2                 # backed off 1.5x the setback


@pytest.mark.slow
def test_z_from_robot_plan_kkt_consistent(ocp, setup):
    """z_from_robot_plan packs an arbitrary robot maneuver with exact
    lower-level human responses: the unpacked robot plan is the input, and
    the embedded-KKT equality residuals are near zero (the humans' primals
    and duals solve their ORCA problems along the plan)."""
    _, params = setup
    u_rob = C._brake_profile(ocp, params)
    z = WS.z_from_robot_plan(ocp, params, u_rob)
    u_out, _, _, _ = ocp.unpack(z)
    np.testing.assert_allclose(np.asarray(u_out), np.asarray(u_rob),
                               rtol=1e-6)
    eq = np.asarray(ocp.eq_residuals(z, params))
    assert np.max(np.abs(eq)) < 5e-2, np.max(np.abs(eq))


@pytest.mark.slow
def test_build_starts_shapes_and_selected(ocp, setup):
    """_build_starts stacks cfg.multi_start KKT-consistent guesses; row 0
    is exactly the single-start cascade guess (_select_guess), so
    multi_start=1 reduces to the reference-shaped behavior."""
    state, _ = setup
    cfg4 = dataclasses.replace(MPC, multi_start=4)
    ocp4 = OCP(cfg4)
    params = C.build_params(ocp4, state, ENV)
    carry = C.init_carry(ocp4)
    z_sel, starts = C._build_starts(ocp4, carry, params)
    assert starts.shape == (4, cfg4.n_z)
    np.testing.assert_array_equal(np.asarray(starts[0]), np.asarray(z_sel))
    np.testing.assert_allclose(
        np.asarray(z_sel), np.asarray(C._select_guess(ocp4, carry, params)),
        rtol=1e-6)
    # brake start row: robot controls are the decelerating profile
    u_brake, _, _, _ = ocp4.unpack(starts[2])
    np.testing.assert_allclose(np.asarray(u_brake),
                               np.asarray(C._brake_profile(ocp4, params)),
                               rtol=1e-6)
    assert np.all(np.isfinite(np.asarray(starts)))


@pytest.mark.slow
def test_multi_start_campc_runs_and_improves_worst_case():
    """The vmapped multi-start control step returns a finite action and its
    adopted plan is exact-rollout-realistic whenever ANY start's solution
    is (the selection picks the best feasible-realistic candidate — the
    round-4 cascade fix for stale-single-guess collisions)."""
    env = EnvConfig(scenario="circle_crossing", human_policy="orca",
                    human_num=2, max_humans=2, starts_moving=0,
                    robot_kinematics="unicycle")
    cfg = MPCConfig(num_hums=2, num_walls=1, priviledged_info=True,
                    multi_start=4)
    ocp4 = OCP(cfg)
    settings = ipm.IPMSettings(n_iter=6)
    state = CS.reset_host(env, case=2)
    carry = C.init_carry(ocp4)
    for _ in range(3):
        (a, carry, aux) = C.campc_action(ocp4, state, carry, env, settings,
                                         aux=True)
        assert np.all(np.isfinite(np.asarray(a)))
        state, _, _ = CS.step(state, jnp.asarray(a), env)
    # the adopted plan's exact margin is recorded; a realistic adoption
    # implies positive margin
    if not bool(aux.use_guess):
        assert float(aux.exact_margin) > 0.0


@pytest.mark.slow
def test_hard_wall_stages_rows():
    """hard_wall_stages removes the slack shift from the stage-1..n wall
    rows (SLACKED/HARD sorting, campc_acados_opt.py:264-374): with a big
    stat slack, the slacked config's rows go feasible while the hard
    config's stage-1..n rows keep the RAW violation; stage 0 (measured
    state) stays slacked in both; infer_slacks sizes the stat slack from
    the slacked rows only."""
    env = ENV
    cfg_s = MPCConfig(num_hums=2, num_walls=2, priviledged_info=True)
    cfg_h = dataclasses.replace(cfg_s, hard_wall_stages=2)
    state = CS.reset_host(env, case=1)
    # a wall right under the robot so every stage violates
    wall = jnp.array([[state.r_pos[0] - 2.0, state.r_pos[1]],
                      [state.r_pos[0] + 2.0, state.r_pos[1]]])
    state = state._replace(
        walls=jnp.zeros_like(state.walls).at[0].set(wall),
        wall_mask=jnp.zeros_like(state.wall_mask).at[0].set(True))

    ocp_s, ocp_h = OCP(cfg_s), OCP(cfg_h)
    params_s = C.build_params(ocp_s, state, env)
    params_h = C.build_params(ocp_h, state, env)

    u_rob, u_hums, lam, slacks = ocp_s.unpack(jnp.zeros(cfg_s.n_z))
    big = slacks._replace(stat=jnp.asarray(1e4, jnp.float32))
    z_big = ocp_s.pack(u_rob, u_hums, lam, big)

    W, K1 = cfg_s.num_walls, cfg_s.K + 1
    rows_s = ocp_s.ineq_residuals(z_big, params_s)
    rows_h = ocp_h.ineq_residuals(z_big, params_h)
    stat_lo = (cfg_s.K + 1) * cfg_s.num_hums
    stat_s = np.asarray(rows_s[stat_lo:stat_lo + W * K1]).reshape(W, K1)
    stat_h = np.asarray(rows_h[stat_lo:stat_lo + W * K1]).reshape(W, K1)
    # slacked config: every active row shifted feasible by the big slack
    assert np.all(stat_s[0] < 0)
    # hard config: stages 1..2 keep the raw violation, others shifted
    assert np.all(stat_h[0, 1:3] > 0)
    assert stat_h[0, 0] < 0 and np.all(stat_h[0, 3:] < 0)

    # infer_slacks: stat slack sized from slacked rows only — with a wall
    # violated ONLY inside the hard window, the hard config's slack is 0
    z0 = jnp.zeros(cfg_s.n_z)
    g = ocp_h._ineq_groups(z0, params_h)
    mask = np.asarray(ocp_h._stat_soft_mask())
    raw = np.asarray(g["stat"][0])
    z_inf = ocp_h.infer_slacks(z0, params_h)
    _, _, _, s_inf = ocp_h.unpack(z_inf)
    want = max(float(np.max(raw * mask)), 0.0) / cfg_h.slack_sc
    np.testing.assert_allclose(float(s_inf.stat), want, rtol=1e-5)


def test_keep_best_feasible_iterate():
    """keep_best_feasible (reference cascade step 1, campc.py:669-681:
    max-iters solves fall back to the callback's last feasible iterate):
    default OFF is bit-identical to before; ON returns a feasible iterate
    whenever one was visited, even if the final iterate is infeasible or
    costlier."""
    # min (x-2)^2 s.t. x <= 1: the path crosses feasible iterates
    f = lambda z: (z[0] - 2.0) ** 2
    ce = lambda z: jnp.zeros((0,), z.dtype)
    ci = lambda z: jnp.array([z[0] - 1.0])
    z_off, _ = ipm.solve(f, ce, ci, jnp.array([0.0]),
                         ipm.IPMSettings(n_iter=25))
    z_on, info_on = ipm.solve(f, ce, ci, jnp.array([0.0]),
                              ipm.IPMSettings(n_iter=25,
                                              keep_best_feasible=True))
    # both converge; the tracker must not degrade a healthy solve
    np.testing.assert_allclose(float(z_on[0]), 1.0, atol=1e-3)
    np.testing.assert_allclose(float(z_off[0]), float(z_on[0]), atol=1e-3)
    assert float(info_on.ineq_viol) < 1e-3

    # adversarial: 1 iteration from a feasible start — the single step
    # overshoots into infeasibility; the tracker returns the feasible z0
    st1 = ipm.IPMSettings(n_iter=1, delta_init=1e-8, alphas=(1.0,),
                          precondition=False)
    z0 = jnp.array([0.0])
    z_raw, info_raw = ipm.solve(f, ce, ci, z0, st1)
    z_kb, info_kb = ipm.solve(
        f, ce, ci, z0,
        ipm.IPMSettings(n_iter=1, delta_init=1e-8, alphas=(1.0,),
                        precondition=False, keep_best_feasible=True))
    if float(info_raw.ineq_viol) > 1e-3:     # the overshoot materialized
        assert float(info_kb.ineq_viol) <= 1e-3
    # early-exit variant also supports the tracker
    z_ee, info_ee = ipm.solve(
        f, ce, ci, jnp.array([0.0]),
        ipm.IPMSettings(n_iter=25, keep_best_feasible=True,
                        early_exit_tol=1e-4))
    np.testing.assert_allclose(float(z_ee[0]), 1.0, atol=1e-3)
