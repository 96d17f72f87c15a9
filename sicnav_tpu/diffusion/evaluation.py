"""Prediction metrics: ADE / FDE (min-of-k & most-likely), KDE-NLL,
scene-level SADE / SFDE.

Port of sicnav_diffusion/JMID/MID/evaluation/evaluation.py (compute_ade:11,
compute_fde:31, compute_kde_nll:191, scene metrics inside
compute_batch_statistics:456) as batched JAX reductions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp



def ade(pred, gt, mask=None):
    """pred: (S, T, 2) samples; gt: (T, 2). Returns per-sample ADE (S,)."""
    err = jnp.linalg.norm(pred - gt[None], axis=-1)           # (S, T)
    if mask is not None:
        w = mask.astype(err.dtype)
        return jnp.sum(err * w[None], axis=-1) / jnp.maximum(jnp.sum(w), 1.0)
    return jnp.mean(err, axis=-1)


def fde(pred, gt, mask=None):
    """Final displacement error per sample (S,)."""
    if mask is not None:
        last = jnp.maximum(jnp.sum(mask.astype(jnp.int32)) - 1, 0)
    else:
        last = pred.shape[-2] - 1
    return jnp.linalg.norm(pred[:, last] - gt[last][None], axis=-1)


def min_ade_fde(pred, gt, mask=None):
    """Best-of-k ADE / FDE (reference min_ade/min_fde)."""
    return jnp.min(ade(pred, gt, mask)), jnp.min(fde(pred, gt, mask))


def kde_nll(pred, gt):
    """Per-timestep Gaussian-KDE negative log likelihood of the ground truth
    under the sample distribution (compute_kde_nll:191-233), averaged over
    T. Exact parity with the reference's scipy.gaussian_kde path: Scott's
    factor n^(-1/(d+4)), unregularized sample covariance, per-timestep
    logpdf clipped at -20 BEFORE averaging, and NaN when any timestep's
    covariance is singular (scipy raises LinAlgError -> reference sets
    kde_ll = nan).

    pred: (S, T, 2); gt: (T, 2)."""
    S, T, _ = pred.shape
    preds = jnp.transpose(pred, (1, 0, 2))                    # (T, S, 2)
    bw = S ** (-1.0 / 6.0)                                    # Scott, d=2
    mean = jnp.mean(preds, axis=1, keepdims=True)
    diff = preds - mean
    cov = jnp.einsum("tsd,tse->tde", diff, diff) / (S - 1)
    cov = bw ** 2 * cov
    det = cov[:, 0, 0] * cov[:, 1, 1] - cov[:, 0, 1] * cov[:, 1, 0]
    singular = jnp.any(det <= 0.0)
    cov_safe = jnp.where(singular, jnp.eye(2)[None], cov)
    cov_inv = jnp.linalg.inv(cov_safe)
    logdet = jnp.linalg.slogdet(cov_safe)[1]
    d = gt[:, None, :] - preds                                # (T, S, 2)
    mahal = jnp.einsum("tsd,tde,tse->ts", d, cov_inv, d)
    log_kernel = -0.5 * mahal - 0.5 * (2 * jnp.log(2 * jnp.pi) + logdet)[:, None]
    ll = jax.scipy.special.logsumexp(log_kernel, axis=1) - jnp.log(S)
    ll = jnp.clip(ll, -20.0, None)  # per-timestep pdf lower bound (:225)
    return jnp.where(singular, jnp.nan, -jnp.mean(ll))


def most_likely_ade_fde(pred, gt, agent_mask=None, step_mask=None,
                        joint: bool = True):
    """Most-likely-sample ADE/FDE (mid.py:202-235 "most likely" variant):
    rank samples by KDE likelihood and score the top one.

    pred: (S, A, T, 2); gt: (A, T, 2); agent_mask (A,): padded/invalid
    agents are excluded from both the joint-KDE sample ranking and the
    reported means; step_mask (A, T): per-step future observation masks.
    Returns (ade, fde) averaged over valid agents."""
    from sicnav_tpu.diffusion.kde import most_likely_samples
    A, T = gt.shape[0], gt.shape[1]
    if agent_mask is None:
        agent_mask = jnp.ones((A,), bool)
    # Zeroing an invalid agent's coordinates makes it rank-neutral in the
    # joint KDE: its dims have zero sample variance, so after the 1e-6
    # covariance regularization they whiten to a constant that cancels in
    # the per-group logsumexp normalization.
    am = agent_mask[None, :, None, None]
    top, _ = most_likely_samples(jnp.where(am, pred, 0.0), 1, joint=joint)
    best = top[:, 0]                                       # (A, T, 2)
    err = jnp.linalg.norm(best - gt, axis=-1)              # (A, T)
    if step_mask is None:
        step_mask = jnp.ones((A, T), bool)
    sm = step_mask.astype(err.dtype)
    cnt = jnp.maximum(jnp.sum(sm, axis=-1), 1.0)
    per_ade = jnp.sum(err * sm, axis=-1) / cnt             # (A,)
    last = jnp.maximum(jnp.sum(step_mask.astype(jnp.int32), -1) - 1, 0)
    per_fde = jnp.take_along_axis(err, last[:, None], axis=-1)[:, 0]
    w = agent_mask.astype(err.dtype)
    wsum = jnp.maximum(jnp.sum(w), 1.0)
    return jnp.sum(per_ade * w) / wsum, jnp.sum(per_fde * w) / wsum


def horizon_fraction_ade(pred, gt, mask=None, fractions=(0.25, 0.5, 0.75)):
    """Min-of-k ADE truncated at fractions of the horizon (the reference's
    is_eval_hst breakdown: eval_ade_{one,two,three}_fourth, mid.py:382-394).

    pred: (S, T, 2); gt: (T, 2). Returns tuple of scalars, one per
    fraction."""
    T = pred.shape[-2]
    outs = []
    for f in fractions:
        n = max(int(round(T * f)), 1)
        m = None if mask is None else mask[:n]
        outs.append(jnp.min(ade(pred[:, :n], gt[:n], m)))
    return tuple(outs)


def obstacle_violations(pred, walls, wall_mask, radius: float = 0.0):
    """Fraction of predicted trajectories that penetrate a static obstacle
    (reference compute_obs_violations, evaluation.py:235 — there a dilated
    raster map; here the sim's line-segment walls, violation = any predicted
    point within ``radius`` of an active wall).

    pred: (S, T, 2); walls: (W, 2, 2); wall_mask: (W,). Returns scalar in
    [0, 1]."""
    from sicnav_tpu.ops.geometry import point_to_segment_dist
    S, T, _ = pred.shape
    pts = pred.reshape(S * T, 2)

    def min_wall_dist(q):
        d = point_to_segment_dist(walls[:, 0], walls[:, 1], q[None])
        return jnp.min(jnp.where(wall_mask, d, jnp.inf))

    d = jax.vmap(min_wall_dist)(pts).reshape(S, T)
    viol = jnp.any(d < radius, axis=-1)
    return jnp.mean(viol.astype(jnp.float32))


def scene_ade_fde(pred, gt, agent_mask, step_mask=None):
    """Scene-consistent SADE/SFDE: errors averaged over agents per joint
    sample BEFORE taking the min over samples (mid.py:202-235 semantics).

    pred: (S, A, T, 2); gt: (A, T, 2); agent_mask: (A,); step_mask
    (optional, (A, T)): per-step future observation masks — partially
    observed agents contribute their observed steps only (the reference's
    NaN-masked metrics, evaluation.py:11-60)."""
    err = jnp.linalg.norm(pred - gt[None], axis=-1)           # (S, A, T)
    w = agent_mask.astype(err.dtype)
    if step_mask is None:
        per_agent_ade = jnp.mean(err, axis=-1)                # (S, A)
        per_agent_fde = err[..., -1]
    else:
        sm = step_mask.astype(err.dtype)                      # (A, T)
        cnt = jnp.maximum(jnp.sum(sm, axis=-1), 1.0)          # (A,)
        per_agent_ade = jnp.sum(err * sm[None], axis=-1) / cnt[None]
        last = jnp.maximum(jnp.sum(step_mask.astype(jnp.int32), -1) - 1, 0)
        per_agent_fde = jnp.take_along_axis(
            err, last[None, :, None], axis=-1)[..., 0]
    sade = jnp.sum(per_agent_ade * w[None], axis=-1) / \
        jnp.maximum(jnp.sum(w), 1.0)
    sfde = jnp.sum(per_agent_fde * w[None], axis=-1) / jnp.maximum(jnp.sum(w), 1.0)
    best = jnp.argmin(sade)
    return sade[best], sfde[best]
