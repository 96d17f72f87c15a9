"""KDE-based most-likely sample ranking.

Pure-linear-algebra port of mid_sim_wrapper.get_most_likely_samples:14-169:
a Gaussian KDE over the joint (humans x xy) sample space per future timestep
(log-spaced bandwidths over the horizon, Cholesky whitening, logsumexp
likelihoods), normalized into importance weights, summed over the horizon,
then top-k selection. Joint (JMID) and independent (iMID) variants.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _kde_loglik(preds, bandwidth):
    """preds: (G, S, D) groups of S samples in D dims; bandwidth: (G,) or ().
    Returns log-likelihood of each sample under the KDE of its group: (G, S)."""
    G, S, D = preds.shape
    n = jnp.float32(S)
    bw = jnp.broadcast_to(jnp.asarray(bandwidth, jnp.float32), (G,))

    mean = jnp.mean(preds, axis=1, keepdims=True)
    diff = preds - mean
    cov = jnp.einsum("gsd,gse->gde", diff, diff) / (n - 1)
    scale_cov_inv = bw[:, None, None] ** -2 * cov
    scale_cov_inv = scale_cov_inv + jnp.eye(D) * 1e-6
    scale_cov = jnp.linalg.inv(scale_cov_inv)
    L = jnp.linalg.cholesky(scale_cov)
    L_inv = jnp.linalg.inv(L)

    diffs = preds[:, :, None, :] - preds[:, None, :, :]       # (G, S, S, D)
    white = jnp.einsum("gste,gde->gstd", diffs, L_inv) / bw[:, None, None, None]
    log_exp = -0.5 * jnp.sum(white ** 2, axis=-1)             # (G, S, S)
    log_det = 2.0 * jnp.sum(jnp.log(jnp.maximum(
        jnp.diagonal(L, axis1=-2, axis2=-1), 1e-20)), axis=-1)  # (G,)
    Z = (0.5 * D * jnp.log(2 * jnp.pi) + 0.5 * log_det[:, None] + jnp.log(n))
    return jax.scipy.special.logsumexp(log_exp - Z[..., None], axis=-1)


def most_likely_samples(forecasts, num_ret_samples: int, joint: bool = True):
    """Rank forecast samples by KDE likelihood and return the top k.

    Args:
      forecasts: (S, H, T, 2) — samples x humans x horizon x xy.
      num_ret_samples: k.
      joint: JMID (scene-consistent) or iMID (per-human) ranking.

    Returns:
      (top_forecasts (H, k, T, 2), log_weights (H, k)).
    """
    S, H, T, _ = forecasts.shape
    if joint:
        preds = jnp.transpose(forecasts, (2, 0, 1, 3)).reshape(T, S, H * 2)
        bw = jnp.exp(jnp.linspace(np.log(0.01), np.log(0.1), T))
        ll = _kde_loglik(preds, bw)                            # (T, S)
        ll = ll - jax.scipy.special.logsumexp(ll, axis=1, keepdims=True)
        lik = jnp.sum(ll, axis=0)                              # (S,)
        order = jnp.argsort(lik)
        top = order[-num_ret_samples:]
        top_fc = jnp.transpose(forecasts[top], (1, 0, 2, 3))   # (H, k, T, 2)
        lw = lik[top]
        lw = lw - jax.scipy.special.logsumexp(lw)
        return top_fc, jnp.broadcast_to(lw[None, :], (H, num_ret_samples))
    else:
        preds = jnp.transpose(forecasts, (1, 2, 0, 3)).reshape(H * T, S, 2)
        ll = _kde_loglik(preds, 0.05)                          # (H*T, S)
        ll = ll - jax.scipy.special.logsumexp(ll, axis=1, keepdims=True)
        lik = jnp.sum(ll.reshape(H, T, S), axis=1)             # (H, S)
        order = jnp.argsort(lik, axis=-1)
        top = order[:, -num_ret_samples:]                      # (H, k)
        fc_swap = jnp.transpose(forecasts, (1, 0, 2, 3))       # (H, S, T, 2)
        top_fc = jnp.take_along_axis(fc_swap, top[:, :, None, None], axis=1)
        lw = jnp.take_along_axis(lik, top, axis=1)
        lw = lw - jax.scipy.special.logsumexp(lw, axis=1, keepdims=True)
        return top_fc, lw
