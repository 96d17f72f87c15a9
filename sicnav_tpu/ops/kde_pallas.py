"""Pallas TPU kernel: pairwise whitened-distance KDE log-likelihood.

The sample-ranking KDE (diffusion/kde.py, reference mid_sim_wrapper:39-141)
materializes the (G, S, S, D) pairwise-difference tensor before reducing.
This kernel fuses the whitening matmul, the pairwise squared distances and
the logsumexp into one VMEM-resident pass per group: for whitened samples
Y = X L^-T / bw, the pairwise sq-distances are
||y_i||^2 + ||y_j||^2 - 2 y_i.y_j — one S x S matmul on the MXU plus
row reductions, never materializing (S, S, D).

Falls back transparently to the jnp path on non-TPU backends.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _kde_kernel(y_ref, z_ref, mask_ref, out_ref):
    """One group per grid step. y: (1, S_pad, D_pad) whitened samples;
    z: (1, 1, 1) log-normalizer; mask: (1, S_pad, 1) valid-sample mask;
    out: (1, S_pad, 1) log-likelihoods."""
    y = y_ref[0]                                        # (S_pad, D_pad)
    sq = jnp.sum(y * y, axis=-1, keepdims=True)         # (S_pad, 1)
    gram = jax.lax.dot_general(y, y, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)
    d2 = sq + sq.T - 2.0 * gram                         # (S_pad, S_pad)
    log_exp = -0.5 * jnp.maximum(d2, 0.0) - z_ref[0, 0, 0]
    valid = mask_ref[0, :, 0] > 0.0
    log_exp = jnp.where(valid[None, :], log_exp, -jnp.inf)
    m = jnp.max(log_exp, axis=1, keepdims=True)
    s = jnp.sum(jnp.exp(log_exp - m), axis=1, keepdims=True)
    out_ref[0] = m + jnp.log(s)


@functools.partial(jax.jit, static_argnames=())
def _kde_loglik_pallas_impl(y_white, log_Z):
    G, S, D = y_white.shape
    S_pad = _round_up(S, 8)
    D_pad = _round_up(D, 128)
    y_p = jnp.zeros((G, S_pad, D_pad), jnp.float32)
    y_p = y_p.at[:, :S, :D].set(y_white.astype(jnp.float32))
    mask = jnp.zeros((G, S_pad, 1), jnp.float32).at[:, :S, 0].set(1.0)
    z = log_Z.reshape(G, 1, 1).astype(jnp.float32)

    out = pl.pallas_call(
        _kde_kernel,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((1, S_pad, D_pad), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda g: (g, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, S_pad, 1), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, S_pad, 1), lambda g: (g, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G, S_pad, 1), jnp.float32),
    )(y_p, z, mask)
    return out[:, :S, 0]


def kde_loglik_fused(preds, bandwidth):
    """Drop-in for diffusion.kde._kde_loglik: (G, S, D) samples ->
    (G, S) KDE log-likelihood of each sample under its group.

    Whitening (Cholesky of the scaled covariance) stays in XLA linalg; the
    O(G S^2 D) pairwise part runs in the fused Pallas kernel on TPU.
    """
    G, S, D = preds.shape
    n = jnp.float32(S)
    bw = jnp.broadcast_to(jnp.asarray(bandwidth, jnp.float32), (G,))

    mean = jnp.mean(preds, axis=1, keepdims=True)
    diff = preds - mean
    cov = jnp.einsum("gsd,gse->gde", diff, diff) / (n - 1)
    scale_cov_inv = bw[:, None, None] ** -2 * cov + jnp.eye(D) * 1e-6
    scale_cov = jnp.linalg.inv(scale_cov_inv)
    L = jnp.linalg.cholesky(scale_cov)
    L_inv = jnp.linalg.inv(L)
    log_det = 2.0 * jnp.sum(jnp.log(jnp.maximum(
        jnp.diagonal(L, axis1=-2, axis2=-1), 1e-20)), axis=-1)
    log_Z = 0.5 * D * jnp.log(2 * jnp.pi) + 0.5 * log_det + jnp.log(n)

    y_white = jnp.einsum("gsd,ged->gse", preds, L_inv) / bw[:, None, None]

    # Pallas path currently opt-in: the Mosaic lowering of this kernel
    # over-allocates scoped VMEM on v5e (43 MB for a 256x128 block);
    # the fused XLA path below is the production path meanwhile.
    import os
    if (_HAS_PALLAS and jax.default_backend() == "tpu"
            and os.environ.get("SICNAV_TPU_PALLAS_KDE") == "1"):
        return _kde_loglik_pallas_impl(y_white, log_Z)
    # reference path (identical math)
    sq = jnp.sum(y_white * y_white, axis=-1)
    gram = jnp.einsum("gsd,gtd->gst", y_white, y_white)
    d2 = sq[:, :, None] + sq[:, None, :] - 2.0 * gram
    log_exp = -0.5 * jnp.maximum(d2, 0.0) - log_Z[:, None, None]
    return jax.scipy.special.logsumexp(log_exp, axis=-1)
