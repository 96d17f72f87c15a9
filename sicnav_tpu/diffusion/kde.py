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
    Returns log-likelihood of each sample under the KDE of its group: (G, S).

    Delegates to the fused implementation (ops/kde_pallas.py): the whitened
    pairwise distances come from one S x S Gram matmul instead of
    materializing the (G, S, S, D) difference tensor, with a Pallas TPU
    kernel for the pairwise+logsumexp pass."""
    from sicnav_tpu.ops.kde_pallas import kde_loglik_fused
    return kde_loglik_fused(preds, bandwidth)


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
