"""Parity of the Pallas KDE kernel against the pure-XLA path.

On the CPU test mesh the kernel runs in Pallas interpret mode; on TPU the
same comparison was verified compiled (max abs err 3e-5 at production
shapes, 6e-4 at S=D=128+). The math under test is the fused-Gram pairwise
whitened-distance logsumexp of diffusion/kde.py (reference
mid_sim_wrapper:39-141's scipy gaussian_kde ranking).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sicnav_tpu.ops import kde_pallas as K


def _xla_path(y_white, log_Z):
    sq = jnp.sum(y_white * y_white, axis=-1)
    gram = jnp.einsum("gsd,gtd->gst", y_white, y_white)
    d2 = sq[:, :, None] + sq[:, None, :] - 2.0 * gram
    log_exp = -0.5 * jnp.maximum(d2, 0.0) - log_Z[:, None, None]
    return jax.scipy.special.logsumexp(log_exp, axis=-1)


@pytest.mark.parametrize("G,S,D", [(1, 7, 2), (3, 20, 24), (5, 33, 12)])
def test_pallas_kernel_matches_xla(G, S, D):
    rng = np.random.default_rng(G * 100 + S)
    y = jnp.asarray(rng.normal(size=(G, S, D)) * 3, jnp.float32)
    z = jnp.asarray(rng.uniform(1, 5, (G,)), jnp.float32)
    got = K._kde_loglik_pallas_impl(y, z, interpret=True)
    want = _xla_path(y, z)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_fused_entrypoint_consistent():
    # kde_loglik_fused dispatches to XLA on CPU; check it agrees with an
    # interpret-mode run of the kernel after identical whitening.
    rng = np.random.default_rng(7)
    G, S, D = 4, 24, 16
    preds = jnp.asarray(rng.normal(size=(G, S, D)), jnp.float32)
    bw = jnp.asarray(rng.uniform(0.3, 1.2, (G,)), jnp.float32)
    ref = K.kde_loglik_fused(preds, bw)

    n = jnp.float32(S)
    mean = jnp.mean(preds, axis=1, keepdims=True)
    diff = preds - mean
    cov = jnp.einsum("gsd,gse->gde", diff, diff) / (n - 1)
    sci = bw[:, None, None] ** -2 * cov + jnp.eye(D) * 1e-6
    L = jnp.linalg.cholesky(jnp.linalg.inv(sci))
    L_inv = jnp.linalg.inv(L)
    log_det = 2.0 * jnp.sum(jnp.log(jnp.maximum(
        jnp.diagonal(L, axis1=-2, axis2=-1), 1e-20)), axis=-1)
    log_Z = 0.5 * D * jnp.log(2 * jnp.pi) + 0.5 * log_det + jnp.log(n)
    y_white = jnp.einsum("gsd,ged->gse", preds, L_inv) / bw[:, None, None]
    got = K._kde_loglik_pallas_impl(y_white, log_Z, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
