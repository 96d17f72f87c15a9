"""Solver-failure introspection: named constraint violations + per-iteration
solve traces.

Parity with the reference's two debug systems:
- CAMPC ``DO_DEBUG`` records every IPOPT iterate and dumps per-constraint
  violation tables into ``debug_material.pkl`` (sicnav/policy/campc.py:
  648-681, 861-979);
- SICNavAcados rebuilds the stage/terminal constraint functions and prints
  the argmax-violated constraint BY NAME after failed solves
  (sicnav_diffusion/policy/sicnav_acados.py:978-993, 1526-1596).

Here the constraint classes are already grouped (ocp._ineq_groups), so the
named report is a pytree a jitted solve can return; formatting happens on
host. ``simple_test.py --debug_pickle`` persists the per-step reports.
"""

from __future__ import annotations

import functools
from typing import Dict, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from sicnav_tpu.mpc import ipm
from sicnav_tpu.mpc.ocp import OCP, MPCParams, SLACK_SCALING


class GroupViolation(NamedTuple):
    max_viol: jnp.ndarray   # () max over the group's rows (0 if satisfied)
    arg_flat: jnp.ndarray   # () int32 flat index of the worst row


class IterTrace(NamedTuple):
    """Per-IPM-iteration table (campc.py:648-681 iterate log analog)."""
    obj: jnp.ndarray        # (n_iter,)
    merit: jnp.ndarray
    alpha: jnp.ndarray
    mu: jnp.ndarray
    delta: jnp.ndarray
    eq_viol: jnp.ndarray
    ineq_viol: jnp.ndarray
    kkt_stat: jnp.ndarray   # gradient-scaled dual infeasibility |r_d|/(1+|g|)
    kkt_comp: jnp.ndarray   # gradient-scaled complementarity max(s*lam)/(1+|g|)


def constraint_report(ocp: OCP, z, params: MPCParams) -> Dict[str, GroupViolation]:
    """Named per-class violations of the RAW (un-slack-shifted) constraints
    at z. Keys mirror the reference's constraint-class names."""
    g = ocp._ineq_groups(z, params)
    report = {}
    for name, rows in g.items():
        flat = jnp.maximum(rows.reshape(-1), 0.0)
        report[name] = GroupViolation(jnp.max(flat),
                                      jnp.argmax(flat).astype(jnp.int32))
    if ocp.cfg.kkt:
        res = ocp.eq_residuals(z, params).reshape(
            ocp.cfg.K_orca, ocp.cfg.num_hums, 3 + ocp.cfg.n_lam)
        stat = jnp.abs(res[:, :, :3]).reshape(-1)
        comp = jnp.abs(res[:, :, 3:]).reshape(-1)
        report["kkt_stationarity"] = GroupViolation(
            jnp.max(stat), jnp.argmax(stat).astype(jnp.int32))
        report["kkt_complementarity"] = GroupViolation(
            jnp.max(comp), jnp.argmax(comp).astype(jnp.int32))
    return report


def argmax_violated(report: Dict[str, GroupViolation]):
    """Host-side: (name, value, flat_index) of the worst constraint class
    (sicnav_acados.py:978-993 'argmax violated' print)."""
    name, gv = max(report.items(), key=lambda kv: float(kv[1].max_viol))
    return name, float(gv.max_viol), int(gv.arg_flat)


def describe_row(ocp: OCP, name: str, flat_idx: int) -> str:
    """Decode a group's flat row index into (stage, human/wall/row) text."""
    cfg = ocp.cfg
    K, Ko, H, W = cfg.K, cfg.K_orca, cfg.num_hums, cfg.num_walls
    shapes = {
        "coll": (K + 1, H), "stat": (W, K + 1), "bound": (2 * K * 2,),
        "acc": (K, 3), "maxvel": (K, H), "ksi": (K, H),
        "kkt": (Ko, H, 2 * cfg.n_lam), "preds": (K, H),
        "kkt_stationarity": (Ko, H, 3),
        "kkt_complementarity": (Ko, H, cfg.n_lam),
    }
    if name not in shapes:
        return f"{name}[{flat_idx}]"
    idx = np.unravel_index(flat_idx, shapes[name])
    labels = {
        "coll": ("k", "hum"), "stat": ("wall", "k"), "bound": ("row",),
        "acc": ("k", "row"), "maxvel": ("k", "hum"), "ksi": ("k", "hum"),
        "kkt": ("k", "hum", "row"), "preds": ("k", "hum"),
        "kkt_stationarity": ("k", "hum", "grad_row"),
        "kkt_complementarity": ("k", "hum", "lam_row"),
    }
    parts = ", ".join(f"{l}={i}" for l, i in zip(labels[name], idx))
    return f"{name}({parts})"


class SolveDebug(NamedTuple):
    """Everything the reference pickles per solve (campc.py:861-979),
    as one pytree a jitted control step can return."""
    trace: IterTrace
    info: ipm.IPMInfo
    viol_sol: Dict[str, GroupViolation]    # at the raw IPM solution
    viol_used: Dict[str, GroupViolation]   # at the adopted plan
    used_guess: jnp.ndarray                # bool: cascade fell back
    sol_cost: jnp.ndarray
    guess_cost: jnp.ndarray
    slack_max: jnp.ndarray                 # max slack value of adopted plan
    # render overlays (the reference's policy.all_opt_x / guess arrays the
    # video mode reads, crowd_sim_plus.py:1475-1489)
    plan: jnp.ndarray                      # (K+1, 2) adopted robot plan
    guess_plan: jnp.ndarray                # (K+1, 2) warmstart-guess plan
    human_plans: jnp.ndarray               # (H, K+1, 2) predicted humans


@functools.partial(jax.jit, static_argnames=("ocp", "settings"))
def solve_with_debug(ocp: OCP, params: MPCParams, z_guess,
                     settings: ipm.IPMSettings):
    """One instrumented NLP solve: (z_sol, info, SolveDebug minus cascade
    fields). For ad-hoc frozen-instance audits."""
    f_fn = lambda z: ocp.cost(z, params)
    ce_fn = lambda z: ocp.eq_residuals(z, params)
    ci_fn = lambda z: ocp.ineq_residuals(z, params)
    z_sol, info, raw = ipm.solve(f_fn, ce_fn, ci_fn, z_guess, settings,
                                 return_trace=True)
    trace = IterTrace(*raw)
    return z_sol, info, trace


def debug_solve_report(ocp: OCP, params: MPCParams, z_guess,
                       settings: ipm.IPMSettings) -> dict:
    """Host-side one-stop audit of a frozen problem instance: runs the
    instrumented solve and returns plain-numpy tables + the worst-constraint
    name (the ROADMAP line-search question answers come from this)."""
    z_sol, info, trace = solve_with_debug(ocp, params, z_guess, settings)
    rep_guess = jax.jit(constraint_report, static_argnums=0)(ocp, z_guess, params)
    rep_sol = jax.jit(constraint_report, static_argnums=0)(ocp, z_sol, params)
    name, val, flat = argmax_violated(rep_sol)
    return {
        "iterations": {k: np.asarray(v) for k, v in trace._asdict().items()},
        "info": {k: float(v) for k, v in info._asdict().items()},
        "viol_guess": {k: float(v.max_viol) for k, v in rep_guess.items()},
        "viol_sol": {k: float(v.max_viol) for k, v in rep_sol.items()},
        "worst": {"name": name, "value": val,
                  "row": describe_row(ocp, name, flat)},
        "z_sol": np.asarray(z_sol),
    }
