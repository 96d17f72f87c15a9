"""Trajectron++ CVAE machinery tests: GMM2D pdf parity with scipy, discrete
latent semantics, unicycle dynamics limits, map encoder, and end-to-end CVAE
training/prediction on synthetic scenes."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
import optax

from sicnav_tpu.diffusion import trajectron as TJ
from sicnav_tpu.diffusion.models import ModelConfig
from tests.test_diffusion import _synthetic_batches


def test_gmm2d_log_prob_scipy_parity():
    from scipy.stats import multivariate_normal
    rng = np.random.default_rng(0)
    N = 3
    log_pis = rng.normal(size=(N,))
    mus = rng.normal(size=(N, 2))
    log_sigmas = rng.normal(scale=0.3, size=(N, 2))
    corrs = rng.uniform(-0.8, 0.8, size=(N,))
    g = TJ.make_gmm2d(jnp.asarray(log_pis), jnp.asarray(mus),
                      jnp.asarray(log_sigmas), jnp.asarray(corrs))
    x = rng.normal(size=(2,))
    pis = np.exp(log_pis - np.logaddexp.reduce(log_pis))
    pdf = 0.0
    for i in range(N):
        s = np.exp(log_sigmas[i])
        cov = np.array([[s[0] ** 2, corrs[i] * s[0] * s[1]],
                        [corrs[i] * s[0] * s[1], s[1] ** 2]])
        pdf += pis[i] * multivariate_normal.pdf(x, mus[i], cov)
    np.testing.assert_allclose(float(TJ.gmm2d_log_prob(g, jnp.asarray(x))),
                               np.log(pdf), rtol=1e-5)


def test_gmm2d_from_cov_roundtrip():
    rng = np.random.default_rng(1)
    mus = rng.normal(size=(4, 2))
    A_ = rng.normal(size=(4, 2, 2))
    covs = A_ @ np.swapaxes(A_, -1, -2) + 0.1 * np.eye(2)
    g = TJ.gmm2d_from_cov(jnp.zeros((4, 1)), jnp.asarray(mus[:, None]),
                          jnp.asarray(covs[:, None]))
    # mode of a single-component mixture is its mean
    np.testing.assert_allclose(np.asarray(TJ.gmm2d_mode(g)), mus, atol=1e-6)
    # sampling mean approaches mu
    keys = jax.random.split(jax.random.PRNGKey(0), 2000)
    samp = jax.vmap(lambda k: TJ.gmm2d_rsample(g, k))(keys)
    np.testing.assert_allclose(np.asarray(samp).mean(0), mus, atol=0.15)


def test_discrete_latent():
    logits = TJ.latent_logits(jnp.asarray(np.random.default_rng(2).normal(
        size=(5, 2 * 3))), 2, 3, logit_clip=2.0)
    assert logits.shape == (5, 2, 3)
    np.testing.assert_allclose(np.asarray(jnp.mean(logits, -1)), 0, atol=2.0)
    # KL of identical dists is 0 -> floored at kl_min
    kl = TJ.kl_q_p(logits, logits, kl_min=0.07)
    np.testing.assert_allclose(float(kl), 0.07 * 2, rtol=1e-5)
    assert float(TJ.kl_q_p(logits, logits, kl_min=0.0)) < 1e-6

    combos = TJ.all_one_hot_combinations(2, 3)
    assert combos.shape == (9, 6)
    assert (combos.sum(-1) == 2).all()

    z, nc = TJ.sample_p(logits, jax.random.PRNGKey(0), 4, "full")
    assert z.shape == (4 * 9, 5, 6) and nc == 9
    z, nc = TJ.sample_p(logits, jax.random.PRNGKey(0), 4, "most_likely")
    assert z.shape == (4, 5, 6) and nc == 1
    z, nc = TJ.sample_p(logits, jax.random.PRNGKey(0), 4, "sample")
    assert z.shape == (4, 5, 6) and nc == 1
    # mutual information of a deterministic conditional = entropy of marginal
    mi = TJ.mutual_inf(jnp.asarray([[[10.0, -10.0]], [[-10.0, 10.0]]]))
    np.testing.assert_allclose(float(mi), np.log(2), atol=1e-3)


def test_unicycle_dynamics():
    dt = 0.25
    # straight-line branch: dphi=0 -> 2nd-order position update
    x = jnp.asarray([0.0, 0.0, 0.0, 1.0])
    u = jnp.asarray([0.0, 2.0])
    x1 = TJ.unicycle_dynamic(x, u, dt)
    np.testing.assert_allclose(
        np.asarray(x1), [1 * dt + 0.5 * 2 * dt ** 2, 0, 0, 1 + 2 * dt],
        atol=1e-6)
    # turning branch approaches the straight limit as dphi -> threshold
    u_turn = jnp.asarray([0.011, 2.0])
    x2 = TJ.unicycle_dynamic(x, u_turn, dt)
    np.testing.assert_allclose(np.asarray(x2)[:2], np.asarray(x1)[:2],
                               atol=1e-3)
    # integrate_samples: constant speed straight line
    controls = jnp.zeros((6, 2))
    pos = TJ.unicycle_integrate(controls, jnp.asarray([0.0, 0.0]),
                                jnp.asarray([1.0, 0.0]), dt)
    np.testing.assert_allclose(np.asarray(pos)[:, 0],
                               dt * np.arange(1, 7), atol=1e-6)
    np.testing.assert_allclose(np.asarray(pos)[:, 1], 0, atol=1e-6)
    # batched leading dims
    pos_b = TJ.unicycle_integrate(jnp.zeros((3, 6, 2)),
                                  jnp.zeros((3, 2)), jnp.ones((3, 2)), dt)
    assert pos_b.shape == (3, 6, 2)


@pytest.mark.slow
def test_cnn_map_encoder():
    enc = TJ.CNNMapEncoder(output_size=32)
    x = jnp.ones((2, 50, 50, 3))
    params = enc.init(jax.random.PRNGKey(0), x)
    out = enc.apply(params, x)
    assert out.shape == (2, 32)


@pytest.mark.slow
def test_cvae_trains_and_predicts():
    cfg = ModelConfig(context_dim=16, enc_rnn_dim=8, tf_layer=1,
                      history_len=6, horizon=8)
    model = TJ.CVAETrajectron(cfg, latent_k=5, dec_rnn_dim=16)
    batches = _synthetic_batches(n_scenes=3)
    key = jax.random.PRNGKey(0)
    params = model.init({"params": key, "dropout": key}, batches[0], key)

    tx = optax.adam(3e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, b, k):
        loss, g = jax.value_and_grad(
            lambda p: model.apply(p, b, k, rngs={"dropout": k}))(params)
        up, opt = tx.update(g, opt)
        return optax.apply_updates(params, up), opt, loss

    losses = []
    for i in range(30):
        b = batches[i % len(batches)]
        key, k = jax.random.split(key)
        params, opt, loss = step(params, opt, b, k)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-5:]) < np.mean(losses[:5])

    out, nc = model.apply(params, batches[0], key, 3,
                          method=TJ.CVAETrajectron.predict)
    A = batches[0].hist.shape[0]
    assert out.shape == (3, A, 8, 2) and nc == 1
    out_full, nc = model.apply(params, batches[0], key, 2, "full", False,
                               method=TJ.CVAETrajectron.predict)
    assert out_full.shape == (2 * 5, A, 8, 2) and nc == 5
    assert np.isfinite(np.asarray(out_full)).all()


def test_npair_loss_disdis():
    """DisDis NPairLoss (mgcvae.py:1391-1394): same-class embeddings that
    cluster tightly while classes separate give a LOWER loss than the same
    labels on anti-clustered embeddings; no same-class pair -> exactly 0;
    invalid agents are excluded from pairs and negatives."""
    import numpy as np
    rng = np.random.default_rng(0)
    target = jnp.array([0, 0, 1, 1])
    valid = jnp.ones(4, bool)
    base = rng.normal(size=(2, 8)).astype(np.float32) * 3
    clustered = jnp.asarray(np.concatenate(
        [base[0] + rng.normal(0, .01, (2, 8)),
         base[1] + rng.normal(0, .01, (2, 8))]).astype(np.float32))
    # anti-clustered: each class contains one member of each mode
    anti = jnp.asarray(np.stack(
        [base[0], base[1], base[0] + 0.01, base[1] + 0.01]).astype(np.float32))
    lo = float(TJ.npair_loss(clustered, target, valid))
    hi = float(TJ.npair_loss(anti, target, valid))
    assert lo < hi, (lo, hi)

    # all-distinct classes: no pairs -> 0
    none = float(TJ.npair_loss(clustered, jnp.array([0, 1, 2, 3]), valid))
    assert none == 0.0

    # masking: invalidating one class's second member removes its pair
    v2 = jnp.array([True, True, True, False])
    only_c0 = float(TJ.npair_loss(clustered, target, v2))
    assert only_c0 != lo

    # gradient flows
    g = jax.grad(lambda e: TJ.npair_loss(e, target, valid))(clustered)
    assert np.isfinite(np.asarray(g)).all() and np.abs(np.asarray(g)).max() > 0
