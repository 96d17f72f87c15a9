"""Trajectron++ CVAE machinery: discrete latent, GMM2D, map encoder,
unicycle dynamics, and a compact CVAE trajectory model.

Reference: sicnav_diffusion/JMID/MID/models/encoders/
- components/discrete_latent.py (DiscreteLatent: mean-zero clipped logits,
  K^N one-hot enumeration, KL with a floor)
- components/gmm2d.py (GMM2D: bivariate-normal mixture via the analytic
  Cholesky of [[sx^2, r sx sy], [r sx sy, sy^2]])
- components/map_encoder.py (CNNMapEncoder)
- dynamics/unicycle.py (Unicycle.dynamic:22-76, integrate_samples:77-103)
- mgcvae.py (q_z_xy:962, p_z_x:987, p_y_xz GRU decoder:1035-1170,
  train_loss ELBO:1327-1433)

These are dead code in the exercised MID path (mgcvae.get_latent:1320-1325
returns only the context x), ported for component-inventory completeness as
functional JAX: distributions are NamedTuples of arrays + pure functions,
the decoder loop is a lax.scan, and the K^N latent enumeration replaces
torch's repeat tricks with a vmap over components.
"""

from __future__ import annotations

import itertools
from typing import NamedTuple, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from sicnav_tpu.diffusion.models import (
    LSTMEncoder, ModelConfig, TrajectronEncoder, integrate_velocity_samples,
    standardize_history,
)

# ---------------------------------------------------------------------------
# GMM2D (components/gmm2d.py)


class GMM2D(NamedTuple):
    """Mixture of bivariate normals. Shapes: log_pis (..., N),
    mus/log_sigmas (..., N, 2), corrs (..., N)."""
    log_pis: jnp.ndarray
    mus: jnp.ndarray
    log_sigmas: jnp.ndarray
    corrs: jnp.ndarray


def make_gmm2d(log_pis, mus, log_sigmas, corrs) -> GMM2D:
    """Normalizes mixture logits; mus/log_sigmas may arrive flattened
    (..., N*2) as in the reference's reshape_to_components."""
    n = log_pis.shape[-1]
    mus = mus.reshape(mus.shape[:-1] + (n, 2)) if mus.shape[-1] != 2 else mus
    log_sigmas = (log_sigmas.reshape(log_sigmas.shape[:-1] + (n, 2))
                  if log_sigmas.shape[-1] != 2 else log_sigmas)
    log_pis = jnp.clip(log_pis, -1e5, None)
    log_pis = log_pis - jax.scipy.special.logsumexp(log_pis, -1, keepdims=True)
    return GMM2D(log_pis, mus, log_sigmas, corrs)


def gmm2d_from_cov(log_pis, mus, cov_mats) -> GMM2D:
    """from_log_pis_mus_cov_mats (gmm2d.py:77-84)."""
    s1 = jnp.clip(cov_mats[..., 0, 0], 1e-8, None)
    s2 = jnp.clip(cov_mats[..., 1, 1], 1e-8, None)
    sigmas = jnp.stack([jnp.sqrt(s1), jnp.sqrt(s2)], -1)
    corrs = cov_mats[..., 0, 1] / jnp.prod(sigmas, -1)
    return make_gmm2d(log_pis, mus, jnp.log(sigmas), corrs)


def gmm2d_log_prob(g: GMM2D, value) -> jnp.ndarray:
    """Bivariate-normal mixture log pdf (gmm2d.py:119-155)."""
    sigmas = jnp.exp(g.log_sigmas)
    omr2 = jnp.clip(1.0 - g.corrs ** 2, 1e-5, 1.0)
    dx = value[..., None, :] - g.mus                              # (..., N, 2)
    expn = (jnp.sum((dx / sigmas) ** 2, -1)
            - 2 * g.corrs * jnp.prod(dx, -1) / jnp.prod(sigmas, -1))
    comp = -0.5 * (2 * np.log(2 * np.pi) + jnp.log(omr2)
                   + 2 * jnp.sum(g.log_sigmas, -1) + expn / omr2)
    return jax.scipy.special.logsumexp(g.log_pis + comp, -1)


def _gmm2d_chol(g: GMM2D) -> jnp.ndarray:
    sigmas = jnp.exp(g.log_sigmas)
    omr2 = jnp.clip(1.0 - g.corrs ** 2, 1e-5, 1.0)
    zero = jnp.zeros_like(g.corrs)
    row0 = jnp.stack([sigmas[..., 0], zero], -1)
    row1 = jnp.stack([sigmas[..., 1] * g.corrs,
                      sigmas[..., 1] * jnp.sqrt(omr2)], -1)
    return jnp.stack([row0, row1], -2)                            # (..., N, 2, 2)


def gmm2d_rsample(g: GMM2D, key) -> jnp.ndarray:
    """mu + L z with a categorical component pick (gmm2d.py:86-110)."""
    k_n, k_c = jax.random.split(key)
    z = jax.random.normal(k_n, g.mus.shape)
    samples = g.mus + jnp.einsum("...nij,...nj->...ni", _gmm2d_chol(g), z)
    comp = jax.random.categorical(k_c, g.log_pis)                 # (...,)
    sel = jax.nn.one_hot(comp, g.log_pis.shape[-1])[..., None]
    return jnp.sum(samples * sel, -2)


def gmm2d_mode(g: GMM2D) -> jnp.ndarray:
    """Mean of the most-probable component (the gmm_mode branch of
    p_y_xz, mgcvae.py:1100-1103)."""
    comp = jnp.argmax(g.log_pis, -1)
    sel = jax.nn.one_hot(comp, g.log_pis.shape[-1])[..., None]
    return jnp.sum(g.mus * sel, -2)


# ---------------------------------------------------------------------------
# Discrete latent (components/discrete_latent.py)


def latent_logits(h, N: int, K: int, logit_clip: Optional[float] = None):
    """dist_from_h (discrete_latent.py:29-41): (..., N*K) -> mean-zero
    (optionally clipped) per-factor logits (..., N, K)."""
    logits = h.reshape(h.shape[:-1] + (N, K))
    logits = logits - jnp.mean(logits, -1, keepdims=True)
    if logit_clip is not None:
        logits = jnp.clip(logits, -logit_clip, logit_clip)
    return logits


def all_one_hot_combinations(N: int, K: int) -> np.ndarray:
    """(K^N, N*K) enumeration of every joint one-hot assignment
    (discrete_latent.py:all_one_hot_combinations)."""
    out = np.zeros((K ** N, N * K), np.float32)
    for i, combo in enumerate(itertools.product(range(K), repeat=N)):
        for n, k in enumerate(combo):
            out[i, n * K + k] = 1.0
    return out


def _log_softmax(logits):
    return logits - jax.scipy.special.logsumexp(logits, -1, keepdims=True)


def kl_q_p(q_logits, p_logits, kl_min: float = 0.07) -> jnp.ndarray:
    """Categorical KL(q||p) summed over factors, batch-mean floored at
    kl_min (discrete_latent.py:kl_q_p:100-117)."""
    lq, lp = _log_softmax(q_logits), _log_softmax(p_logits)
    kl = jnp.sum(jnp.exp(lq) * (lq - lp), -1)          # (..., N)
    kl_mean = jnp.mean(kl.reshape(-1, kl.shape[-1]), 0)
    return jnp.sum(jnp.clip(kl_mean, kl_min, None) if kl_min > 0 else kl_mean)


def mutual_inf(logits) -> jnp.ndarray:
    """Monte-Carlo mutual information H(mean p) - mean H(p)
    (mid.py mutual_inf_mc)."""
    lp = _log_softmax(logits)
    p = jnp.exp(lp)
    p_mean = jnp.mean(p.reshape(-1, *p.shape[-2:]), 0)
    h_y = -jnp.sum(p_mean * jnp.log(p_mean + 1e-12), -1)
    h_cond = -jnp.sum(p * lp, -1)
    return jnp.sum(h_y - jnp.mean(h_cond.reshape(-1, h_cond.shape[-1]), 0))


def sample_p(p_logits, key, num_samples: int, mode: str = "full"):
    """sample_p (discrete_latent.py:54-98). Returns (z, num_components)
    with z: (num_samples*num_components, B, N*K).

    mode='full': enumerate all K^N assignments per sample; 'most_likely':
    the argmax one-hot; 'sample': draw from p."""
    B, N, K = p_logits.shape
    if mode == "full":
        combos = jnp.asarray(all_one_hot_combinations(N, K))      # (K^N, N*K)
        z = jnp.broadcast_to(combos[None, :, None, :],
                             (num_samples, K ** N, B, N * K))
        return z.reshape(num_samples * K ** N, B, N * K), K ** N
    if mode == "most_likely":
        z = jax.nn.one_hot(jnp.argmax(p_logits, -1), K).reshape(B, N * K)
        return jnp.broadcast_to(z[None], (num_samples, B, N * K)), 1
    keys = jax.random.split(key, num_samples)
    z = jax.vmap(lambda k: jax.nn.one_hot(
        jax.random.categorical(k, p_logits), K).reshape(B, N * K))(keys)
    return z, 1


# ---------------------------------------------------------------------------
# Map encoder (components/map_encoder.py)


def npair_loss(x, target, valid, tao: float = 1.0, l2_reg: float = 0.02):
    """DisDis N-pair loss (mgcvae.py:1391-1394 + components/n_pair_loss.py;
    Sohn 2016): pull together the context embeddings of agents whose
    most-likely latent class matches, push apart across classes.

    TPU-first determinization: the reference draws ONE random
    (anchor, positive) per class on the host and uses the other classes'
    positives as negatives — dynamic shapes and host RNG. Here the SAME
    objective is computed over ALL valid same-class (i, j) pairs with
    every cross-class k as a negative, masked and averaged — a
    deterministic, static-shape superset of the reference's sampled
    estimator (its expectation over draws). The reference's l2 term is
    computed on the L2-NORMALIZED embeddings (n_pair_loss.py:30-44), so
    it is the constant 2*l2_reg; reproduced for value parity.

    x: (A, D) embeddings; target: (A,) int class ids; valid: (A,) bool.
    """
    e = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)
    s = e @ e.T                                            # (A, A)
    vv = valid[:, None] & valid[None, :]
    eye = jnp.eye(x.shape[0], dtype=bool)
    same = (target[:, None] == target[None, :]) & vv & ~eye
    diff = (target[:, None] != target[None, :]) & vv
    # pair (i, j) same-class: logits over negatives k != class(i):
    # a_i . (n_k - p_j) = s_ik - s_ij
    z = (s[:, None, :] - s[:, :, None]) / tao              # (i, j, k)
    ex = jnp.where(diff[:, None, :], jnp.exp(z), 0.0)
    pair_loss = jnp.log1p(jnp.sum(ex, axis=-1))            # (i, j)
    n_pairs = jnp.sum(same)
    loss = jnp.sum(jnp.where(same, pair_loss, 0.0)) / jnp.maximum(n_pairs, 1)
    l2 = 2.0 * l2_reg                                      # see docstring
    return jnp.where(n_pairs > 0, loss + l2, 0.0)


class CNNMapEncoder(nn.Module):
    """Conv stack + dense over a local map patch; leaky-relu(0.2) between
    convs exactly as map_encoder.py:30-35."""
    hidden_channels: Sequence[int] = (10, 20, 10, 1)
    masks: Sequence[int] = (5, 5, 5, 3)
    strides: Sequence[int] = (2, 2, 1, 1)
    output_size: int = 32

    @nn.compact
    def __call__(self, x):
        # x: (B, H, W, C) — NHWC, the TPU-native conv layout (the reference
        # uses NCHW torch convs).
        for ch, m, s in zip(self.hidden_channels, self.masks, self.strides):
            x = nn.leaky_relu(
                nn.Conv(ch, (m, m), strides=(s, s), padding="VALID")(x), 0.2)
        return nn.Dense(self.output_size)(x.reshape(x.shape[0], -1))


# ---------------------------------------------------------------------------
# Unicycle dynamics (dynamics/unicycle.py)


def unicycle_dynamic(x, u, dt: float):
    """One exact unicycle step (unicycle.py:22-76). x = [px, py, phi, v],
    u = [dphi, a]; the |dphi|<=1e-2 branch switches to the straight-line
    2nd-order expansion — here as a branchless where with a safe divisor."""
    px, py, phi, v = x[..., 0], x[..., 1], x[..., 2], x[..., 3]
    dphi_raw, a = u[..., 0], u[..., 1]
    straight = jnp.abs(dphi_raw) <= 1e-2
    dphi = jnp.where(straight, 1.0, dphi_raw)

    phi_n = phi + dphi * dt
    dsin = (jnp.sin(phi_n) - jnp.sin(phi)) / dphi
    dcos = (jnp.cos(phi_n) - jnp.cos(phi)) / dphi
    turn = jnp.stack([
        px + (a / dphi) * dcos + v * dsin + (a / dphi) * jnp.sin(phi_n) * dt,
        py - v * dcos + (a / dphi) * dsin - (a / dphi) * jnp.cos(phi_n) * dt,
        phi + dphi * dt,
        v + a * dt,
    ], -1)
    line = jnp.stack([
        px + v * jnp.cos(phi) * dt + 0.5 * a * jnp.cos(phi) * dt ** 2,
        py + v * jnp.sin(phi) * dt + 0.5 * a * jnp.sin(phi) * dt ** 2,
        phi,
        v + a * dt,
    ], -1)
    return jnp.where(straight[..., None], line, turn)


def unicycle_integrate(controls, p0, v0, dt: float, phi_correction=0.0):
    """integrate_samples (unicycle.py:77-103): roll [dphi, a] controls from
    (p0, v0); initial heading atan2(v0) + a learned correction (the
    reference's tanh(p0_model(...)) — passed in here as a value). Returns
    positions (..., T, 2)."""
    phi0 = jnp.arctan2(v0[..., 1], v0[..., 0]) + phi_correction
    x0 = jnp.concatenate(
        [p0, phi0[..., None], jnp.linalg.norm(v0, axis=-1)[..., None]], -1)

    def body(x, u_t):
        x_n = unicycle_dynamic(x, u_t, dt)
        return x_n, x_n[..., 0:2]

    _, pos = jax.lax.scan(body, x0, jnp.moveaxis(controls, -2, 0))
    return jnp.moveaxis(pos, 0, -2)


# ---------------------------------------------------------------------------
# Compact CVAE model (mgcvae.py): encoder -> discrete latent -> GRU decoder
# emitting per-step GMM2D over 2-d velocity, single-integrator integration.


class CVAETrajectron(nn.Module):
    """MultimodalGenerativeCVAE re-designed as one Flax module.

    - x context: the shared TrajectronEncoder (history + edges).
    - y_e: future encoder LSTM (encode_node_future:882-922; the reference's
      is bidirectional with a learned initial state — here forward-only,
      the variational posterior stays a valid amortization either way).
    - q(z|x,y), p(z|x): single dense heads to N*K mean-zero logits
      (q_z_xy:962-985, p_z_x:987-1007 with default MLP dims None).
    - p(y|x,z): GRU over the horizon, input [z, x, a_prev]; GMM2D params
      projected per step (p_y_xz:1035-1170). Train enumerates all K^N
      latent classes weighted by q — the exact discrete ELBO the reference
      evaluates via sample_q + num_components=K^N.
    """
    cfg: ModelConfig
    latent_n: int = 1
    latent_k: int = 25
    dec_rnn_dim: int = 128
    kl_min: float = 0.07
    kl_weight: float = 1.0
    logit_clip: float = 5.0
    # DisDis NPairLoss weight (trajectron_hypers.py:93 npl_rate = 0.8;
    # mgcvae.train_loss:1391-1400 adds npl_rate * NPairLoss(x, argmax p))
    npl_rate: float = 0.8

    def setup(self):
        self.encoder = TrajectronEncoder(self.cfg)
        self.future_enc = LSTMEncoder(32, name="node_future_encoder")
        self.q_head = nn.Dense(self.latent_n * self.latent_k, name="q_z_xy")
        self.p_head = nn.Dense(self.latent_n * self.latent_k, name="p_z_x")
        self.state_action = nn.Dense(2, name="decoder_state_action")
        self.dec_init = nn.Dense(self.dec_rnn_dim, name="decoder_initial_h")
        self.dec_cell = nn.GRUCell(self.dec_rnn_dim, name="decoder_rnn_cell")
        self.proj_log_pis = nn.Dense(1, name="proj_to_GMM_log_pis")
        self.proj_mus = nn.Dense(2, name="proj_to_GMM_mus")
        self.proj_log_sigmas = nn.Dense(2, name="proj_to_GMM_log_sigmas")
        self.proj_corrs = nn.Dense(1, name="proj_to_GMM_corrs")

    def encode_x(self, batch, deterministic=True):
        A = batch.hist.shape[0]
        cur_pos = batch.hist[:, -1, 0:2]
        hist_st = standardize_history(batch.hist, cur_pos)
        neigh = jnp.broadcast_to(batch.hist[None], (A,) + batch.hist.shape)
        neigh_st = standardize_history(
            neigh, jnp.broadcast_to(cur_pos[:, None, :], (A, A, 2)))
        return self.encoder(hist_st, batch.hist_mask, neigh_st,
                            batch.neighbor_mask, deterministic=deterministic)

    def encode_future(self, batch):
        # future encoder consumes the velocity futures
        return self.future_enc(batch.fut_vel, batch.fut_mask)

    def _decode(self, z, x, a0, T):
        """GRU rollout; works over arbitrary leading batch dims (latent
        classes / samples folded in by broadcasting). The loop is a short
        unrolled python loop — flax submodules can't be called under
        lax.scan from a setup-bound method, and T is small."""
        zx = jnp.concatenate([z, x], -1)
        state = self.dec_init(zx)
        inp = jnp.concatenate([zx, a0], -1)
        mus, log_sigmas, corrs = [], [], []
        for _ in range(T):
            state, h = self.dec_cell(state, inp)
            mu = self.proj_mus(h)
            mus.append(mu)
            log_sigmas.append(self.proj_log_sigmas(h))
            corrs.append(jnp.tanh(self.proj_corrs(h))[..., 0])
            # mean action feeds the next input (p_y_xz's a_t rollout)
            inp = jnp.concatenate([zx, mu], -1)
        return (jnp.stack(mus, -2), jnp.stack(log_sigmas, -2),
                jnp.stack(corrs, -1))

    def train_loss(self, batch, key):
        """Exact discrete ELBO + DisDis NPairLoss (train_loss:1327-1433:
        loss = -ELBO + npl_rate * NPairLoss(x, argmax p(z|x)))."""
        T = self.cfg.horizon
        x = self.encode_x(batch, deterministic=True)
        y_e = self.encode_future(batch)
        q_logits = latent_logits(self.q_head(jnp.concatenate([x, y_e], -1)),
                                 self.latent_n, self.latent_k, self.logit_clip)
        p_logits = latent_logits(self.p_head(x), self.latent_n, self.latent_k)

        a0 = self.state_action(batch.hist[:, -1])
        combos = jnp.asarray(all_one_hot_combinations(self.latent_n,
                                                      self.latent_k))
        C, A = combos.shape[0], x.shape[0]
        z_all = jnp.broadcast_to(combos[:, None, :], (C, A, combos.shape[1]))
        x_all = jnp.broadcast_to(x[None], (C, A, x.shape[-1]))
        a0_all = jnp.broadcast_to(a0[None], (C, A, a0.shape[-1]))
        mus, log_sigmas, corrs = self._decode(z_all, x_all, a0_all, T)
        # mixture over latent classes weighted by q (decoder:1212-1264).
        # NOTE: exact only for N=1, where classes == K components.
        lq = _log_softmax(q_logits).reshape(A, -1)                # (A, C) N=1
        g = make_gmm2d(jnp.broadcast_to(lq[:, None, :], (A, T, C)),
                       jnp.moveaxis(mus, 0, -2),                  # (A, T, C, 2)
                       jnp.moveaxis(log_sigmas, 0, -2),
                       jnp.moveaxis(corrs, 0, -1))
        log_p = gmm2d_log_prob(g, batch.fut_vel)                  # (A, T)
        keep = (batch.fut_mask & batch.agent_mask[:, None]).astype(log_p.dtype)
        log_likelihood = jnp.sum(log_p * keep) / jnp.maximum(jnp.sum(keep), 1.0)
        kl = kl_q_p(q_logits, p_logits, self.kl_min)
        mi_p = mutual_inf(p_logits)
        elbo = log_likelihood - self.kl_weight * kl + 1.0 * mi_p
        # DisDis: discriminate context embeddings by most-likely latent
        # class (mgcvae.py:1385-1391 eye_mat[argmax p] -> NPairLoss(x, .))
        x_target = jnp.argmax(p_logits.reshape(A, -1), axis=-1)
        npl = npair_loss(x, x_target, batch.agent_mask)
        return -elbo + self.npl_rate * npl

    def __call__(self, batch, key):
        return self.train_loss(batch, key)

    def predict(self, batch, key, num_samples: int, z_mode: str = "most_likely",
                gmm_mode: bool = True, dt: float = 0.25):
        """predict (mgcvae.py:1505-1598): sample z from p(z|x), decode, and
        integrate velocity to positions. Returns (S, A, T, 2)."""
        T = self.cfg.horizon
        x = self.encode_x(batch)
        p_logits = latent_logits(self.p_head(x), self.latent_n, self.latent_k)
        z, n_comp = sample_p(p_logits, key, num_samples, z_mode)
        a0 = self.state_action(batch.hist[:, -1])
        S = z.shape[0]
        x_all = jnp.broadcast_to(x[None], (S,) + x.shape)
        a0_all = jnp.broadcast_to(a0[None], (S,) + a0.shape)
        mus, log_sigmas, corrs = self._decode(z, x_all, a0_all, T)
        g = make_gmm2d(jnp.zeros(corrs.shape + (1,)), mus[..., None, :],
                       log_sigmas[..., None, :], corrs[..., None])
        vel = gmm2d_mode(g) if gmm_mode else gmm2d_rsample(g, key)
        p0 = batch.hist[:, -1, 0:2]
        return integrate_velocity_samples(vel, p0[None], dt), n_comp
