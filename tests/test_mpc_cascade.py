"""CAMPC cascade-behavior tests: failure fallbacks, slack modes, early
exit, braking, door-yield, multi-start, wall rows, best-feasible iterate.

Split from test_mpc.py so each module's XLA:CPU compile count stays under
the LLVM-JIT arena limit (see tests/conftest.py + TESTING.md): ~24 heavy
nested-AD compiles in one process segfault the JIT; two modules in the
per-module slow-tier loop stay green."""
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
    # cfg.door_yield_hold_max releases into a cooldown
    # (counter = -cfg.door_yield_cooldown)
    # during which the trigger is suppressed even under full stall ...
    up9, _, s9, l9 = C.door_yield_update(
        moving, est_moving, cfg, jnp.int32(cfg.door_yield_hold_max - 1),
        jnp.array(True))
    assert not bool(up9) and not bool(l9)
    assert int(s9) == -cfg.door_yield_cooldown
    stall, latch = s9, l9
    for _ in range(cfg.door_yield_cooldown - 1):
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


def test_evasive_brake_steers_away_from_head_on():
    """A human dead ahead, closing head-on inside braking distance: the
    max-clearance brake fan must (a) rank every candidate by the worst of
    human/wall clearance, (b) beat-or-match the straight stop-in-place
    member, and (c) pick a non-zero turn rate when the lanes are open."""
    state = CS.reset_host(ENV, case=1)
    # robot at origin heading +x at full speed; one human 1 m ahead
    # closing at 1 m/s; second human parked far away
    state = state._replace(
        r_pos=jnp.array([0.0, 0.0]), r_theta=jnp.array(0.0),
        r_vel=jnp.array([0.95, 0.0]),
        h_pos=jnp.array([[1.0, 0.0], [8.0, 8.0]]),
        h_vel=jnp.array([[-1.0, 0.0], [0.0, 0.0]]),
        h_goal=jnp.array([[-5.0, 0.0], [8.0, 8.0]]),
        h_final_goal=jnp.array([[-5.0, 0.0], [8.0, 8.0]]))
    ocp_ = OCP(MPC)
    params = C.build_params(ocp_, state, ENV)
    act = jax.jit(lambda p: C._evasive_brake_action(ocp_, p))(params)
    assert act.shape == (2,)
    assert bool(jnp.all(jnp.isfinite(act)))
    # the straight member decelerates from v0; first-step speed matches
    v0 = ocp_.rob_v_prev(params.x0_rob)
    v_exp = float(jnp.maximum(v0 + MPC.max_l_dcc * MPC.dt, 0.0))
    np.testing.assert_allclose(float(act[0]), v_exp, atol=1e-5)
    # margins: the chosen omega must be at least as clear as straight
    ks = jnp.arange(1, MPC.K + 1, dtype=jnp.float32)
    v = jnp.maximum(v0 + MPC.max_l_dcc * MPC.dt * ks, 0.0)

    def margin_of(om):
        u = jnp.stack([v, jnp.full_like(v, om)], -1)
        return float(C.exact_plan_margin(ocp_, params, u))

    m_straight = margin_of(0.0)
    m_chosen = margin_of(float(act[1]))
    assert m_chosen >= m_straight - 1e-6
    assert float(act[1]) != 0.0  # head-on with open lanes: steer
    # RA-L 8-state capsule config: same fan, same (v, om) plan convention
    cfg8 = dataclasses.replace(MPC, robot_nx=8, robot_capsule=True,
                               slack_mode="acados", term_q_coeff=75.0)
    ocp8 = OCP(cfg8)
    params8 = C.build_params(ocp8, state, ENV)
    act8 = jax.jit(lambda p: C._evasive_brake_action(ocp8, p))(params8)
    assert act8.shape == (2,)
    assert bool(jnp.all(jnp.isfinite(act8)))


@pytest.mark.slow
def test_campc_evasive_brake_step_runs():
    """Full campc_action compiles and runs with evasive_brake=True (the
    lax.cond brake branch traces the 5-candidate fan)."""
    cfg = dataclasses.replace(MPC, evasive_brake=True)
    ocp_ = OCP(cfg)
    state = CS.reset_host(ENV, case=1)
    carry = C.init_carry(ocp_)
    act, carry2 = C.campc_action(ocp_, state, carry, ENV,
                                 ipm.IPMSettings(n_iter=4))
    assert act.shape == (2,)
    assert bool(jnp.all(jnp.isfinite(act)))


@pytest.mark.slow
def test_campc_adaptive_effort():
    """cfg.adaptive_effort: on the happy path (previous solve accepted)
    the escalated-budget program matches the plain one numerically (same
    iteration count, while-loop vs scan path only); after a rejected solve
    the step still runs with the extra budget and yields a finite action."""
    cfg = dataclasses.replace(MPC, adaptive_effort=6)
    ocp_a = OCP(cfg)
    ocp_0 = OCP(MPC)
    state = CS.reset_host(ENV, case=1)
    st = ipm.IPMSettings(n_iter=4)
    act_a, carry_a = C.campc_action(ocp_a, state, C.init_carry(ocp_a), ENV, st)
    act_0, _ = C.campc_action(ocp_0, state, C.init_carry(ocp_0), ENV, st)
    # atol matches the documented f32 XLA reduction-order variance floor
    # (~3.1e-5 across backends, IPMSettings tolerance guidance) — the
    # while_loop and scan paths may differ by reduction order alone
    np.testing.assert_allclose(np.asarray(act_a), np.asarray(act_0),
                               atol=1e-4)
    # failure-escalated step: previous solve rejected -> extra iterations
    failed = carry_a._replace(prev_ok=jnp.array(False))
    act_f, _ = C.campc_action(ocp_a, state, failed, ENV, st)
    assert act_f.shape == (2,)
    assert bool(jnp.all(jnp.isfinite(act_f)))


def test_min_wall_clearance():
    """_min_wall_clearance: masked walls are ignored; distance is to the
    nearest active segment minus the robot radius."""
    state = CS.reset_host(ENV, case=1)
    ocp_ = OCP(MPC)
    params = C.build_params(ocp_, state, ENV)
    # one active wall: vertical segment x=1 from y=-1..1; one masked
    walls = jnp.array([[[1.0, -1.0], [1.0, 1.0]],
                       [[0.0, 0.0], [0.0, 0.1]]])
    mask = jnp.array([True, False])
    p2 = params._replace(walls=walls, wall_mask=mask,
                         rob_radius=jnp.float32(0.3))
    Xr = jnp.zeros((3, ocp_.cfg.robot_nx))  # robot parked at origin
    c = float(C._min_wall_clearance(p2, Xr))
    np.testing.assert_allclose(c, 1.0 - 0.3, atol=1e-6)
    # all walls masked -> inf
    p3 = p2._replace(wall_mask=jnp.array([False, False]))
    assert float(C._min_wall_clearance(p3, Xr)) == float("inf")
