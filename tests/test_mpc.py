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


def test_ipm_dynamic_budget():
    """n_iter_dyn: a traced iteration budget equals the static scan result
    at the same count, is honored exactly (info.iters), and one compiled
    program serves different budgets (the adaptive-effort contract)."""
    f = lambda z: (z[0] - 2.0) ** 2 + z[1] ** 2
    ce = lambda z: jnp.array([z[0] + z[1] - 1.5])
    ci = lambda z: jnp.array([z[0] - 1.0])
    z0 = jnp.array([0.0, 0.0])
    st = ipm.IPMSettings(n_iter=20)
    z_static, info_s = ipm.solve(f, ce, ci, z0, st)
    solve_dyn = jax.jit(lambda n: ipm.solve(f, ce, ci, z0, st, n_iter_dyn=n))
    z_dyn, info_d = solve_dyn(jnp.int32(20))
    np.testing.assert_allclose(np.asarray(z_dyn), np.asarray(z_static),
                               atol=1e-5)
    assert int(info_d.iters) == 20
    # same compiled fn, escalated budget: more iterations actually run and
    # the iterate is at least as feasible-optimal
    z_hi, info_hi = solve_dyn(jnp.int32(35))
    assert int(info_hi.iters) == 35
    np.testing.assert_allclose(float(z_hi[0]), 1.0, atol=1e-3)


def test_ipm_dynamic_budget_with_early_exit():
    """n_iter_dyn composes with the KKT early exit: the exit can fire
    before the dynamic cap, and the cap still bounds the loop."""
    f = lambda z: (z[0] - 2.0) ** 2
    ce = lambda z: jnp.zeros((0,), z.dtype)
    ci = lambda z: jnp.array([z[0] - 1.0])
    st = ipm.IPMSettings(n_iter=50, early_exit_tol=1e-3)
    z, info = ipm.solve(f, ce, ci, jnp.array([0.0]), st,
                        n_iter_dyn=jnp.int32(40))
    np.testing.assert_allclose(float(z[0]), 1.0, atol=1e-3)
    assert int(info.iters) <= 40


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


