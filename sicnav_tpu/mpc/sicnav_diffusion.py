"""SICNav-Diffusion: JMID forecasts fused into the CAMPC loop.

Functional equivalent of sicnav_diffusion/policy/sicnav_acados.py's predict
path (:1629-1734): maintain per-human history buffers, run the JMID
forecaster (diffusion sampling + KDE top-k), convert the ranked samples
into the MPC's human-goal model (weighted sample average — the
``human_goal_cvmm=false, human_pred_MID*`` configuration), and solve the
bilevel MPC. One control step is one jitted program; the <100 ms/step
budget comes from the diffusion scan + the batched IPM sharing the chip.

Human-goal model: static KDE-weighted sample goals by default (measured
best, BENCH_EXTRA round-2 A/B) or the reference's stateful joint
sample-weight dynamics (mpc_env_new.get_ORCA_human_dynamics_eqn:380-520,
``goal_dynamics=True``); the hums-close-to-preds soft constraint
(:1454-1528) bounds the embedded ORCA solutions to the sample cloud. The
full RA-L robot configuration — 8-state sin/cos+accel model, capsule
collision, Acados slack penalties (mpc_env_new.py:620-660, 971) — is the
DEFAULT, matching the reference's exercised configuration and the
measured best (``ral=False`` selects the T-RO 4-state circle model).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from sicnav_tpu.diffusion import forecaster as FC
from sicnav_tpu.diffusion.mid import JMIDModel
from sicnav_tpu.env.types import EnvConfig, SimState
from sicnav_tpu.mpc import campc as C
from sicnav_tpu.mpc import ipm
from sicnav_tpu.mpc.ocp import OCP


class SICNavDiffCarry(NamedTuple):
    mpc: C.CAMPCCarry
    forecaster: FC.ForecasterState
    key: jnp.ndarray


def init_carry(ocp: OCP, max_humans: int, fcfg: FC.ForecasterConfig,
               seed: int = 0) -> SICNavDiffCarry:
    return SICNavDiffCarry(
        mpc=C.init_carry(ocp),
        forecaster=FC.init_state(max_humans, fcfg),
        key=jax.random.PRNGKey(seed))


def weighted_goals(forecasts, log_weights, step: int = 1):
    """Human goals = log-weight-averaged forecast sample positions at t+step
    (sicnav_acados.predict:1653-1680 weighted-samples goal model).

    forecasts: (H, k, T+1, 2); log_weights: (H, k). Returns (H, 2)."""
    w = jax.nn.softmax(log_weights, axis=-1)
    return jnp.sum(w[..., None] * forecasts[:, :, step, :], axis=1)


@functools.partial(jax.jit, static_argnames=("ocp", "env_cfg", "model",
                                             "fcfg", "settings", "debug",
                                             "aux"))
def sicnav_diffusion_action(ocp: OCP, model: JMIDModel, mid_params,
                            state: SimState, carry: SICNavDiffCarry,
                            env_cfg: EnvConfig, fcfg: FC.ForecasterConfig,
                            settings: ipm.IPMSettings = ipm.IPMSettings(),
                            debug: bool = False, aux: bool = False):
    """One SICNav-Diffusion control step. Returns (action (v, r), carry');
    with ``debug=True`` also the ``introspection.SolveDebug`` pytree (the
    named-violation / iteration-table introspection the reference surfaces
    after failed solves, sicnav_acados.py:978-993, 1526-1596)."""
    key, k_fc = jax.random.split(carry.key)
    fstate = FC.update_state_hists(carry.forecaster, state, fcfg)
    forecasts, log_w = FC.predict_ret_best(model, mid_params, fstate, state,
                                           k_fc, fcfg)
    goals = weighted_goals(forecasts, log_w)

    # MID sample grid for the OCP: (S, H, K+2, 2); pad the forecast horizon
    # with its last step if the MPC horizon reaches past it
    K = ocp.cfg.K
    fc = jnp.transpose(forecasts, (1, 0, 2, 3))       # (S, H, T+1, 2)
    T = fc.shape[2]
    if T < K + 2:
        fc = jnp.concatenate(
            [fc, jnp.repeat(fc[:, :, -1:], K + 2 - T, axis=2)], axis=2)
    mid_samples = fc[:, :, :K + 2]
    mid_logw0 = log_w[0]                              # joint weights

    # feed the MPC a state whose human goals come from the forecaster;
    # the door-yield transit test keeps the RAW observed h_goal (the same
    # observable interface the reference policy receives,
    # sicnav_acados.predict:1629-1680): the t+1 forecast goal moves ~0 for
    # a door-BLOCKED human, which would misread it as parked
    mpc_view = state._replace(h_goal=goals)
    h_intent = state.h_goal if ocp.cfg.door_yield else None
    if aux:
        action, mpc_carry, step_aux = C.campc_action(
            ocp, mpc_view, carry.mpc, env_cfg, settings,
            mid_samples=mid_samples, mid_logw0=mid_logw0, aux=True,
            h_intent=h_intent)
        return action, SICNavDiffCarry(mpc=mpc_carry, forecaster=fstate,
                                       key=key), step_aux
    if debug:
        action, mpc_carry, dbg = C.campc_action(
            ocp, mpc_view, carry.mpc, env_cfg, settings,
            mid_samples=mid_samples, mid_logw0=mid_logw0, debug=True,
            h_intent=h_intent)
        return action, SICNavDiffCarry(mpc=mpc_carry, forecaster=fstate,
                                       key=key), dbg
    action, mpc_carry = C.campc_action(ocp, mpc_view, carry.mpc, env_cfg,
                                       settings, mid_samples=mid_samples,
                                       mid_logw0=mid_logw0,
                                       h_intent=h_intent)
    return action, SICNavDiffCarry(mpc=mpc_carry, forecaster=fstate, key=key)


def make_policy(env_cfg: EnvConfig, model: JMIDModel, mid_params,
                mpc_cfg=None, fcfg: FC.ForecasterConfig = None,
                settings: ipm.IPMSettings = None,
                goal_dynamics: bool = False, close_to_preds: bool = True,
                ral: bool = True, door_yield: bool = True,
                mpc_overrides: dict = None):
    """Build (ocp, policy_fn): policy_fn(state, carry) -> (action, carry).

    ``goal_dynamics``: evolve human goals through the horizon via the
    stateful MID-sample weight dynamics (mpc_env_new.py:380-520); the
    measured-best default is OFF — static weighted-sample goals at t+1
    (A/B grid in BENCH_EXTRA.md: static goals + close-to-preds + top-10
    of 48 samples beats both the stateful mode and plain SICNav-p at the
    bottleneck). ``close_to_preds``: the sample-spread soft constraint
    (mpc_env_new.py:1454-1528). ``ral`` (default True — the reference's
    exercised configuration AND the measured best: 72% vs 64% success /
    10% vs 35% collision-episodes on the 100-case bottleneck suite):
    the full RA-L robot configuration — 8-state sin/cos+accel model
    (mpc_env_new.py:620-660) + capsule collision (:971) + Acados L1/L2
    slack penalties; the momentum-blended warmstart pref-vel
    (orca_casadi_new.py:729-775) stays opt-in via
    MPCConfig.momentum_warmstart. ``door_yield`` (default True — the
    round-3 timeout fix; self-gates on scenarios with a door, so
    circle/square rows are untouched): the direction-filtered latched
    door-yield protocol (campc.door_yield_update; 30 s 100-case
    bottleneck A/B: success 74->82%, wall-ep 18->7% at equal
    collisions)."""
    from sicnav_tpu.mpc.ocp import MPCConfig
    if fcfg is None:
        # measured-best sampling budget (BENCH_EXTRA round-2 A/B):
        # 48 raw samples -> KDE top-10, 68.8 ms p50 on one v5e chip
        fcfg = FC.ForecasterConfig(num_samples=48, num_ret_samples=10,
                                   dt=env_cfg.dt)
    if mpc_cfg is None:
        # MID-driven human model: evolving weighted-sample goals + the
        # close-to-preds constraint (privileged view: goals from forecasts)
        mpc_cfg = MPCConfig(num_hums=env_cfg.max_humans,
                            num_walls=env_cfg.wall_slots,
                            dt=env_cfg.dt, priviledged_info=True,
                            human_pred_mid=goal_dynamics,
                            close_to_preds=close_to_preds,
                            num_mid_samples=fcfg.num_ret_samples,
                            robot_nx=8 if ral else 4,
                            robot_capsule=ral,
                            # RA-L terminal weight (policy.config:89) and
                            # the Acados exporter's L1/L2 slack penalties
                            term_q_coeff=75.0 if ral else 100.0,
                            slack_mode="acados" if ral else "tro",
                            # capsule-conditional wall clearance (round-3
                            # margin grid, BENCH_EXTRA): +0.05 m helps the
                            # capsule robot on every axis (500-case: succ
                            # 68.4->70.6%, wall-ep 16->13%) but HURTS the
                            # 4-state circle (100-case: succ -12 pts)
                            wall_margin=0.10 if ral else 0.05,
                            door_yield=door_yield)
    if mpc_overrides:
        import dataclasses
        mpc_cfg = dataclasses.replace(mpc_cfg, **mpc_overrides)
    if settings is None:
        # MID-conditioned per-crowd-size caps (campc_acados_opt.py:411-439)
        settings = ipm.realtime_settings(mpc_cfg.num_hums, with_mid=True)
    ocp = OCP(mpc_cfg)

    def policy_fn(state, carry):
        return sicnav_diffusion_action(ocp, model, mid_params, state, carry,
                                       env_cfg, fcfg, settings)

    return ocp, policy_fn
