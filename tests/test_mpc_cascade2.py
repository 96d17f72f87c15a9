"""CAMPC cascade-behavior tests, part 2: wall-aware realism,
accept/brake margin gates, best-margin rescue.

Split from test_mpc_cascade.py in round 5: that module's slow tier had
crept back up to 15 heavy nested-AD compiles and resumed segfaulting the
XLA:CPU LLVM JIT at the last test (the arena-limit class tests/conftest.py
and TESTING.md document; test_mpc.py -> test_mpc_cascade.py was the same
split one round earlier). Same fixtures, fresh process in the per-module
slow-tier loop."""
import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

from sicnav_tpu.env.types import EnvConfig
from sicnav_tpu.env import crowd_sim as CS
from sicnav_tpu.mpc.ocp import MPCConfig, OCP
from sicnav_tpu.mpc import campc as C, ipm

ENV = EnvConfig(scenario="circle_crossing", human_policy="orca", human_num=2,
                max_humans=2, starts_moving=0, robot_kinematics="unicycle")
MPC = MPCConfig(num_hums=2, num_walls=1, priviledged_info=True)


@pytest.mark.slow
def test_campc_wall_aware_realism_step_runs():
    """campc_action compiles and runs with wall_aware_realism=True in both
    single-start and multi-start modes."""
    for ms in (1, 2):
        cfg = dataclasses.replace(MPC, wall_aware_realism=True,
                                  multi_start=ms)
        ocp_ = OCP(cfg)
        state = CS.reset_host(ENV, case=1)
        act, _ = C.campc_action(ocp_, state, C.init_carry(ocp_), ENV,
                                ipm.IPMSettings(n_iter=4))
        assert act.shape == (2,)
        assert bool(jnp.all(jnp.isfinite(act)))


@pytest.mark.slow
def test_accept_brake_margin_gate_semantics():
    """accept_margin / brake_margin cascade semantics (MPCConfig:171-180):

    - accept_margin unsatisfiable -> the solve is refused (carry.prev_ok
      False: the guess was adopted) even when the solver succeeds;
    - additionally unsatisfiable brake_margin -> the adopted guess is ALSO
      refused and the e-brake fires (from rest: commanded speed 0);
    - defaults (both 0, reference semantics) on the same easy state adopt
      the solve (prev_ok True, forward motion).
    """
    state = CS.reset_host(ENV, case=1)
    st = ipm.IPMSettings(n_iter=6)

    # (a) defaults: solve adopted
    ocp0 = OCP(MPC)
    act0, carry0 = C.campc_action(ocp0, state, C.init_carry(ocp0), ENV, st)
    assert bool(carry0.prev_ok), "easy open-field solve should be adopted"

    # (b) accept_margin no plan can clear: guess adopted instead of solve,
    # and with brake_margin=0 the (finite, clear) guess still executes
    cfg_a = dataclasses.replace(MPC, accept_margin=999.0)
    ocp_a = OCP(cfg_a)
    act_a, carry_a = C.campc_action(ocp_a, state, C.init_carry(ocp_a), ENV,
                                    st)
    assert not bool(carry_a.prev_ok), \
        "unsatisfiable accept_margin must refuse the solve"
    assert bool(jnp.all(jnp.isfinite(act_a)))

    # (c) brake_margin also unsatisfiable: e-brake from rest = speed 0
    cfg_b = dataclasses.replace(MPC, accept_margin=999.0, brake_margin=999.0)
    ocp_b = OCP(cfg_b)
    act_b, carry_b = C.campc_action(ocp_b, state, C.init_carry(ocp_b), ENV,
                                    st)
    assert not bool(carry_b.prev_ok)
    np.testing.assert_allclose(float(act_b[0]), 0.0, atol=1e-6)


@pytest.mark.slow
def test_rescue_best_margin_replaces_brake():
    """cfg.rescue_best_margin (multi-start): when every solve is refused
    (unsatisfiable accept_margin) AND the adopted guess fails its brake
    gate (a shifted previous plan that drives full-speed into a frozen
    two-human plug -> negative exact margin), the best-exact-margin start
    executes instead of the e-brake; without the flag the same state
    e-brakes (speed 0 from rest)."""
    from sicnav_tpu.mpc import warmstart as WS2
    base = CS.reset_host(ENV, case=1)
    # robot at origin facing +x; frozen human plug 0.78 m ahead
    # (v_pref 0 pins them in the exact lower-level rollout); comb radius
    # = 0.3 + 0.3 + 0.02 buffer, so a parked robot keeps ~0.16 m margin
    # while the full-speed plan goes deeply negative
    state = base._replace(
        r_pos=jnp.zeros(2), r_vel=jnp.zeros(2),
        r_theta=jnp.float32(0.0), r_goal=jnp.array([4.0, 0.0]),
        h_pos=jnp.array([[0.78, 0.22], [0.78, -0.22]]),
        h_vel=jnp.zeros((2, 2)),
        h_goal=jnp.array([[0.78, 0.22], [0.78, -0.22]]),
        h_final_goal=jnp.array([[0.78, 0.22], [0.78, -0.22]]),
        h_v_pref=jnp.zeros(2), h_mask=jnp.array([True, True]))
    st = ipm.IPMSettings(n_iter=6)

    def doomed_carry(ocp_, params):
        # previous "solution": drive at v_pref straight into the plug;
        # consistent pred_* so _select_guess takes the shift path
        u_full = jnp.tile(jnp.array([[1.0, 0.0]], jnp.float32),
                          (ocp_.cfg.K, 1))
        z_doom = WS2.z_from_robot_plan(ocp_, params, u_full)
        return C.init_carry(ocp_)._replace(
            z_prev=z_doom, has_prev=jnp.array(True),
            prev_ok=jnp.array(True),
            pred_rob=C._rob_pose(ocp_, params.x0_rob),
            pred_hums=params.hums0[:, :2])

    # without rescue: brake (from rest -> commanded speed 0)
    cfg0 = dataclasses.replace(MPC, multi_start=4, accept_margin=999.0)
    ocp0 = OCP(cfg0)
    p0 = C.build_params(ocp0, state, ENV)
    act0, _, aux0 = C.campc_action(ocp0, state, doomed_carry(ocp0, p0),
                                   ENV, st, aux=True)
    assert bool(aux0.use_guess)
    assert bool(aux0.braked) and not bool(aux0.rescued)
    np.testing.assert_allclose(float(act0[0]), 0.0, atol=1e-6)

    # with rescue: the best exact-margin solved start executes instead
    cfg1 = dataclasses.replace(cfg0, rescue_best_margin=True)
    ocp1 = OCP(cfg1)
    p1 = C.build_params(ocp1, state, ENV)
    act1, _, aux1 = C.campc_action(ocp1, state, doomed_carry(ocp1, p1),
                                   ENV, st, aux=True)
    assert bool(aux1.rescued) and not bool(aux1.braked)
    assert bool(jnp.all(jnp.isfinite(act1)))
