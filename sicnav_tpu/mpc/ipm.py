"""Batched fixed-iteration primal-dual interior-point NLP solver.

TPU-native replacement for IPOPT + HSL MA57 (reference campc.py:430-467) and
for Acados SQP + HPIPM: a Newton-KKT interior-point method with slacked
inequalities, adaptive mu, Levenberg damping and fraction-to-boundary line
search — expressed as a fixed-trip-count ``lax.scan`` of dense batched
linear algebra so that thousands of MPC problems solve in parallel on the
MXU (one (n + m_eq)^2 factorization per iteration per problem).

Problem form:  min f(z)  s.t.  c_E(z) = 0,  c_I(z) <= 0.

The reference relies on IPOPT's globalization to survive the MPCC
complementarity degeneracy; here the same role is played by the LM damping
adaptation + the reference's own constraint jitter + the feasible ORCA
warmstart (campc.py:569-610).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class IPMSettings:
    n_iter: int = 30
    mu_init: float = 1e-1
    mu_min: float = 1e-9
    sigma: float = 0.2          # centering: mu <- sigma * s.T lam / m
    mu_schedule: str = "adaptive"   # "adaptive" | "geometric"
    tau: float = 0.995          # fraction-to-boundary
    s_min: float = 1e-8
    lam_init: float = 0.1
    delta_init: float = 1e-4    # LM damping
    delta_max: float = 1e4
    delta_min: float = 1e-8
    reg_eq: float = 1e-8        # dual regularization of the eq block
    alphas: tuple = (1.0, 0.5, 0.25, 0.1, 0.03, 0.01, 0.003)
    # second-order correction (IPOPT 3.2's SOC): when the full Newton step
    # is curvature-limited, re-solve the SAME factorized KKT system with
    # the equality residual evaluated at the trial point
    # (c_soc = alpha c_E(z) + c_E(z + alpha dz)) and offer the corrected
    # step as an extra line-search candidate. One extra back-substitution
    # + one constraint evaluation per iteration; no re-factorization.
    soc: bool = False
    # early exit (real-time latency lever): when > 0 and no per-iteration
    # trace is requested, the fixed-trip scan becomes a lax.while_loop that
    # stops once the current iterate's KKT error converges (the
    # per-instance adaptive version of the reference's hand-tuned
    # per-crowd-size Acados iteration caps, "To run at 10 Hz",
    # campc_acados_opt.py:411-439). Gating on the KKT residual rather than
    # on an accepted step matters: at the optimum the merit line search
    # returns alpha = 0 forever, so a step-based test never fires, while
    # alpha = 0 stalls at NON-optimal points keep a large residual and
    # correctly run to n_iter.
    #
    # HPIPM-style SEPARATE tolerances: early_exit_tol bounds gradient-scaled
    # stationarity + primal eq/ineq feasibility; early_exit_comp_tol bounds
    # scaled complementarity. They must differ because the adaptive schedule
    # computes mu FROM the current complementarity (mu = sigma*mean(s lam)),
    # so once the line search reaches the barrier optimum, mu and comp
    # freeze in a fixed ratio — measured plateau ~3.6e-4 scaled — and a
    # single tight tolerance on comp would never fire even though
    # stationarity is at 1e-7 and the objective is converged to O(mu).
    #
    # Tolerance floor: the converged kkt_stat plateau is f32-rounding-
    # limited and VARIES with XLA codegen (measured 1.4e-7 on plain CPU vs
    # 3.1e-5 with --xla_force_host_platform_device_count=8 — different
    # reduction orders). Use early_exit_tol >= 1e-4 in f32 or the exit may
    # never fire on some backends (the n_iter cap still bounds the loop).
    early_exit_tol: float = 0.0
    early_exit_comp_tol: float = 1e-3
    exact_hessian: bool = True
    precondition: bool = True   # diagonal z-space scaling from the initial
                                # Hessian (tames the 1e6-range slack-penalty
                                # curvature in f32)
    # best-feasible-iterate fallback (reference cascade step 1: when IPOPT
    # hits max-iters, the solution callback's last feasible iterate with
    # inf_pr < 1e-3 is used instead of the final one, campc.py:669-681,
    # 794-827). Tracks the lowest-cost iterate whose eq/ineq violations
    # are under feas_tol and returns it whenever the final iterate is
    # infeasible or costlier. Returned duals always belong to the FINAL
    # iterate. Off by default to keep measured closed-loop baselines
    # pinned; opt in per solve.
    keep_best_feasible: bool = False
    feas_tol: float = 1e-3


def realtime_settings(num_hums: int, with_mid: bool = False,
                      base: IPMSettings = None) -> IPMSettings:
    """Per-crowd-size iteration caps, mirroring the reference's Acados
    real-time tuning ("To run at 10 Hz", campc_acados_opt.py:411-439):
    smaller crowds afford more solver iterations per control period.

    The reference caps (SQP iters x QP iters) map onto total interior-point
    iterations here; MID-conditioned problems get the slightly tighter
    with-samples table."""
    import dataclasses
    if base is None:
        base = IPMSettings()
    if with_mid:
        # round-3 fused iteration A/B (BENCH_EXTRA): 100-case bottleneck
        # quality is flat 15/20/30 iters (success 66/70/68%, coll-ep
        # 4/6/3.6%) — same flatness as the no-MID frontier. 15 iters cuts
        # the fused execution ~30 ms, the margin that brings the streaming
        # 10 Hz replay loop inside its deadline.
        table = {1: 24, 2: 20, 3: 15}
        n = table.get(num_hums, 12)
    else:
        # round-3 iteration frontier (BENCH_EXTRA): closed-loop quality is
        # FLAT from 10 to 40 iters on the 100-case bottleneck (success
        # 64-71%, coll-ep 4-6%), with 15 iters the measured sweet spot at
        # ~70 ms p50 vs ~118 ms at the old 40-iter cap. Keep modest
        # headroom for smaller crowds (cheaper iterations).
        table = {1: 24, 2: 20, 3: 15}
        n = table.get(num_hums, 12)
    return dataclasses.replace(base, n_iter=n)


class IPMState(NamedTuple):
    z: jnp.ndarray
    y: jnp.ndarray       # eq multipliers
    lam: jnp.ndarray     # ineq multipliers  (> 0)
    s: jnp.ndarray       # ineq slacks       (> 0)
    delta: jnp.ndarray   # LM damping
    merit: jnp.ndarray


class IPMInfo(NamedTuple):
    obj: jnp.ndarray
    eq_viol: jnp.ndarray     # max |c_E|
    ineq_viol: jnp.ndarray   # max(0, c_I) max
    comp: jnp.ndarray        # mean s*lam
    iters: jnp.ndarray = jnp.int32(0)  # iterations actually run


def _merit(f_val, c_e, c_i, s, mu, nu):
    barrier = -mu * jnp.sum(jnp.log(jnp.maximum(s, 1e-20)))
    infeas = jnp.sum(jnp.abs(c_e)) + jnp.sum(jnp.abs(c_i + s))
    return f_val + barrier + nu * infeas


def solve(f_fn: Callable, ceq_fn: Callable, cineq_fn: Callable,
          z0: jnp.ndarray, settings: IPMSettings = IPMSettings(),
          return_trace: bool = False, return_duals: bool = False,
          n_iter_dyn=None):
    """Solve one NLP. All fns map z -> value(s). Returns (z, IPMInfo).

    vmap over a batch axis of z0 (with closures over batched params via
    partial application) to solve many problems at once.

    ``n_iter_dyn``: optional TRACED iteration budget that overrides the
    static ``settings.n_iter`` cap — the per-solve adaptive-effort lever
    (a runtime value, so escalating effort after a failed control step
    reuses the compiled program; the reference's analog is the hand-tuned
    per-crowd Acados caps, campc_acados_opt.py:411-439, which are fixed
    at codegen time). Incompatible with ``return_trace`` (traces need the
    fixed-trip scan), and silently ignoring it would let a debug trace of
    an adaptive-effort run diverge from the production solve on escalated
    steps — so the combination is an explicit error; debug callers must
    bake the escalated budget into ``settings.n_iter`` instead.
    """
    if return_trace and n_iter_dyn is not None:
        raise ValueError(
            "n_iter_dyn is unsupported with return_trace=True: the traced "
            "path runs a fixed-trip scan of settings.n_iter iterations and "
            "would not reflect the escalated budget. Pass "
            "settings=replace(settings, n_iter=<escalated>) to trace an "
            "adaptive-effort solve.")
    st = settings
    n = z0.shape[0]

    if st.precondition:
        # diagonal scaling so all variables see O(1) curvature; solve in
        # y = z / D, return D * y
        h_diag = jnp.diagonal(jax.hessian(f_fn)(z0))
        D = 1.0 / jnp.sqrt(jnp.clip(jnp.abs(h_diag), 1.0, 1e10))
        f_raw, ce_raw, ci_raw = f_fn, ceq_fn, cineq_fn
        f_fn = lambda y: f_raw(D * y)
        ceq_fn = lambda y: ce_raw(D * y)
        cineq_fn = lambda y: ci_raw(D * y)
        z0 = z0 / D
    else:
        D = None

    c_e0 = ceq_fn(z0)
    c_i0 = cineq_fn(z0)
    m_e = c_e0.shape[0]
    m_i = c_i0.shape[0]
    dtype = z0.dtype

    grad_f = jax.grad(f_fn)
    jac_e = jax.jacfwd(ceq_fn) if m_e else None
    jac_i = jax.jacfwd(cineq_fn)

    def lagrangian(z, y, lam):
        val = f_fn(z)
        if m_e:
            val = val + jnp.dot(y, ceq_fn(z))
        val = val + jnp.dot(lam, cineq_fn(z))
        return val

    hess_l = jax.hessian(lagrangian) if st.exact_hessian else jax.hessian(f_fn)

    s0 = jnp.maximum(-c_i0, 1e-2).astype(dtype)
    # complementarity-consistent multiplier init: s_i * lam_i = mu_init
    lam0 = jnp.clip(st.mu_init / s0, 1e-6, 1e3).astype(dtype)
    y0 = jnp.zeros((m_e,), dtype)

    if st.mu_schedule == "geometric":
        # fixed geometric decay from mu_init to mu_min over n_iter
        # (predictable for fixed-trip-count real-time iterations)
        mu_decay = (st.mu_min / st.mu_init) ** (1.0 / max(st.n_iter - 1, 1))
    else:
        mu_decay = None

    def step(state: IPMState, it):
        z, y, lam, s, delta, _ = state

        f_val = f_fn(z)
        g = grad_f(z)
        c_i = cineq_fn(z)
        J_i = jac_i(z)
        if m_e:
            c_e = ceq_fn(z)
            J_e = jac_e(z)
        else:
            c_e = jnp.zeros((0,), dtype)
            J_e = jnp.zeros((0, n), dtype)

        if st.mu_schedule == "geometric":
            mu = jnp.maximum(st.mu_init * mu_decay ** it, st.mu_min)
        else:
            mu = jnp.maximum(st.sigma * jnp.dot(s, lam) / m_i, st.mu_min)

        if st.exact_hessian:
            W = hess_l(z, y, lam)
        else:
            W = hess_l(z)
        # symmetrize + damp
        W = 0.5 * (W + W.T) + delta * jnp.eye(n, dtype=dtype)

        D = lam / jnp.maximum(s, st.s_min)
        r_d = g + J_e.T @ y + J_i.T @ lam
        # scaled KKT error of the CURRENT iterate (IPOPT eq. (5) style):
        # f32 cancellation in r_d is ~1e-7 x gradient magnitude, so the
        # 1e6-range slack-penalty gradients force a relative measure
        kkt_scale = 1.0 + jnp.max(jnp.abs(g), initial=0.0)
        kkt_stat = jnp.max(jnp.abs(r_d), initial=0.0) / kkt_scale
        kkt_comp = jnp.max(s * lam, initial=0.0) / kkt_scale
        corr = (mu / jnp.maximum(s, st.s_min) - lam) + D * (c_i + s)

        H_red = W + (J_i.T * D) @ J_i
        rhs_z = -(r_d + J_i.T @ corr)
        if m_e:
            M = jnp.block([
                [H_red, J_e.T],
                [J_e, -st.reg_eq * jnp.eye(m_e, dtype=dtype)]])
            rhs = jnp.concatenate([rhs_z, -c_e])
            lu, piv = jax.scipy.linalg.lu_factor(M)
            sol = jax.scipy.linalg.lu_solve((lu, piv), rhs)
            dz = sol[:n]
            dy = sol[n:]
        else:
            dz = jnp.linalg.solve(H_red, rhs_z)
            dy = y
        ds = -(c_i + s) - J_i @ dz
        dlam = (mu / jnp.maximum(s, st.s_min) - lam) - D * ds

        # NaN/Inf guard: a singular KKT system (extreme warmstarts near the
        # slack-penalty cliffs) yields non-finite directions; zero the step
        # so the iterate is preserved (0 * nan would poison z otherwise)
        step_ok = (jnp.all(jnp.isfinite(dz)) & jnp.all(jnp.isfinite(ds)) &
                   jnp.all(jnp.isfinite(dlam)) & jnp.all(jnp.isfinite(dy)))
        dz = jnp.where(step_ok, dz, 0.0)
        ds = jnp.where(step_ok, ds, 0.0)
        dlam = jnp.where(step_ok, dlam, 0.0)
        dy = jnp.where(step_ok, dy, 0.0) if m_e else dy

        # fraction-to-boundary step limits
        neg_s = ds < 0
        a_p = jnp.min(jnp.where(neg_s, -st.tau * s / jnp.where(neg_s, ds, -1.0), 1.0))
        neg_l = dlam < 0
        a_d = jnp.min(jnp.where(neg_l, -st.tau * lam / jnp.where(neg_l, dlam, -1.0), 1.0))
        a_p = jnp.clip(a_p, 0.0, 1.0)
        a_d = jnp.clip(a_d, 0.0, 1.0)

        nu = 10.0 * (jnp.max(jnp.abs(lam), initial=0.0) +
                     jnp.max(jnp.abs(y), initial=0.0)) + 10.0
        merit_now = _merit(f_val, c_e, c_i, s, mu, nu)

        def try_alpha(alpha):
            z_t = z + alpha * a_p * dz
            s_t = jnp.maximum(s + alpha * a_p * ds, st.s_min)
            c_e_t = ceq_fn(z_t) if m_e else c_e
            c_i_t = cineq_fn(z_t)
            return _merit(f_fn(z_t), c_e_t, c_i_t, s_t, mu, nu)

        alphas = jnp.array(st.alphas, dtype)
        merits = jax.vmap(try_alpha)(alphas)
        merits = jnp.where(jnp.isfinite(merits), merits, jnp.inf)
        best = jnp.argmin(merits)
        improved = merits[best] < merit_now
        alpha = jnp.where(improved, alphas[best], 0.0)

        step_z = alpha * a_p * dz
        step_s = alpha * a_p * ds
        step_lam = alpha * a_d * dlam
        step_y = alpha * a_d * dy if m_e else dy
        merit_best = merits[best]

        if st.soc and m_e:
            # second-order correction: same factorization, equality
            # residual re-evaluated at the trial point
            c_e_t = ceq_fn(z + a_p * dz)
            rhs_soc = jnp.concatenate([rhs_z, -(a_p * c_e + c_e_t)])
            sol2 = jax.scipy.linalg.lu_solve((lu, piv), rhs_soc)
            dz2 = sol2[:n]
            dy2 = sol2[n:]
            ds2 = -(c_i + s) - J_i @ dz2
            dlam2 = (mu / jnp.maximum(s, st.s_min) - lam) - D * ds2
            ok2 = (jnp.all(jnp.isfinite(dz2)) & jnp.all(jnp.isfinite(ds2)) &
                   jnp.all(jnp.isfinite(dlam2)) & jnp.all(jnp.isfinite(dy2)))
            dz2 = jnp.where(ok2, dz2, 0.0)
            ds2 = jnp.where(ok2, ds2, 0.0)
            dlam2 = jnp.where(ok2, dlam2, 0.0)
            dy2 = jnp.where(ok2, dy2, 0.0)
            neg2 = ds2 < 0
            a_p2 = jnp.clip(jnp.min(jnp.where(
                neg2, -st.tau * s / jnp.where(neg2, ds2, -1.0), 1.0)),
                0.0, 1.0)
            negl2 = dlam2 < 0
            a_d2 = jnp.clip(jnp.min(jnp.where(
                negl2, -st.tau * lam / jnp.where(negl2, dlam2, -1.0), 1.0)),
                0.0, 1.0)
            z_s = z + a_p2 * dz2
            s_s = jnp.maximum(s + a_p2 * ds2, st.s_min)
            merit_soc = _merit(f_fn(z_s), ceq_fn(z_s), cineq_fn(z_s), s_s,
                               mu, nu)
            merit_soc = jnp.where(jnp.isfinite(merit_soc) & ok2, merit_soc,
                                  jnp.inf)
            use_soc = merit_soc < jnp.minimum(merit_best, merit_now)
            step_z = jnp.where(use_soc, a_p2 * dz2, step_z)
            step_s = jnp.where(use_soc, a_p2 * ds2, step_s)
            step_lam = jnp.where(use_soc, a_d2 * dlam2, step_lam)
            step_y = jnp.where(use_soc, a_d2 * dy2, step_y)
            improved = improved | use_soc
            merit_best = jnp.minimum(merit_best, merit_soc)
            alpha = jnp.where(use_soc, a_p2, alpha)

        z_new = z + step_z
        s_new = jnp.maximum(s + step_s, st.s_min)
        lam_new = jnp.maximum(lam + step_lam, 1e-12)
        y_new = y + step_y if m_e else y

        # LM damping adaptation (a non-finite step counts as a failure)
        delta_new = jnp.where(improved & step_ok,
                              jnp.maximum(delta / 3.0, st.delta_min),
                              jnp.minimum(delta * 10.0, st.delta_max))

        new_state = IPMState(z_new, y_new, lam_new, s_new, delta_new,
                             merit_best)
        trace = (f_val, merit_best, alpha, mu, delta,
                 jnp.max(jnp.abs(c_e), initial=0.0),
                 jnp.max(jnp.maximum(c_i, 0.0), initial=0.0),
                 kkt_stat, kkt_comp)
        return new_state, trace

    init = IPMState(z0, y0, lam0, s0,
                    jnp.asarray(st.delta_init, dtype),
                    jnp.asarray(jnp.inf, dtype))
    best0 = (z0, jnp.asarray(jnp.inf, dtype), jnp.asarray(False))

    def track_best(state, best, tr):
        # best-feasible-iterate tracker (keep_best_feasible): the trace's
        # f/eq/ineq are evaluated at the PRE-step iterate state.z
        z_b, f_b, has_b = best
        f_val, _, _, _, _, eq_v, ineq_v, _, _ = tr
        feas = (eq_v < st.feas_tol) & (ineq_v < st.feas_tol)
        better = feas & ((~has_b) | (f_val < f_b))
        return (jnp.where(better, state.z, z_b),
                jnp.where(better, f_val, f_b), has_b | feas)

    if (st.early_exit_tol > 0.0 or n_iter_dyn is not None) \
            and not return_trace:
        tol = st.early_exit_tol
        limit = (jnp.int32(st.n_iter) if n_iter_dyn is None
                 else jnp.asarray(n_iter_dyn, jnp.int32))

        def cond_fn(carry):
            state, best, it, done = carry
            return (it < limit) & ~done

        def body_fn(carry):
            state, best, it, _ = carry
            new_state, tr = step(state, it)
            if st.keep_best_feasible:
                best = track_best(state, best, tr)
            if tol > 0.0:
                _, _, _, _, _, eq_v, ineq_v, kkt_stat, kkt_comp = tr
                done = ((kkt_stat < tol) & (eq_v < tol) & (ineq_v < tol) &
                        (kkt_comp < st.early_exit_comp_tol))
            else:
                done = jnp.asarray(False)
            return new_state, best, it + 1, done

        final, best, n_used, _ = jax.lax.while_loop(
            cond_fn, body_fn, (init, best0, jnp.int32(0), jnp.asarray(False)))
        trace = None
    else:
        def scan_body(carry, it):
            state, best = carry
            new_state, tr = step(state, it)
            if st.keep_best_feasible:
                best = track_best(state, best, tr)
            return (new_state, best), tr

        (final, best), trace = jax.lax.scan(scan_body, (init, best0),
                                            jnp.arange(st.n_iter))
        n_used = jnp.int32(st.n_iter)

    z_fin = final.z
    if st.keep_best_feasible:
        z_b, f_b, has_b = best
        c_e_f = ceq_fn(z_fin) if m_e else jnp.zeros((0,), dtype)
        c_i_f = cineq_fn(z_fin)
        fin_feas = ((jnp.max(jnp.abs(c_e_f), initial=0.0) < st.feas_tol) &
                    (jnp.max(jnp.maximum(c_i_f, 0.0), initial=0.0)
                     < st.feas_tol))
        use_best = has_b & ~(fin_feas & (f_fn(z_fin) <= f_b))
        z_fin = jnp.where(use_best, z_b, z_fin)

    c_e = ceq_fn(z_fin) if m_e else jnp.zeros((0,), dtype)
    c_i = cineq_fn(z_fin)
    info = IPMInfo(
        obj=f_fn(z_fin),
        eq_viol=jnp.max(jnp.abs(c_e), initial=0.0),
        ineq_viol=jnp.max(jnp.maximum(c_i, 0.0), initial=0.0),
        comp=jnp.dot(final.s, final.lam) / m_i,
        iters=n_used)
    z_out = z_fin * D if D is not None else z_fin
    if return_trace and return_duals:
        return z_out, info, trace, (final.y, final.lam, final.s)
    if return_trace:
        return z_out, info, trace
    if return_duals:
        return z_out, info, (final.y, final.lam, final.s)
    return z_out, info
