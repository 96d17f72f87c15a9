"""MID/JMID model wrapper + training loop.

Functional equivalent of sicnav_diffusion/JMID/MID/mid.py (_build:1134-1208,
train:106-251, validation:252, eval:352+, checkpointing:1501): a Flax
encoder+denoiser pair trained with Adam + per-epoch exponential LR decay
(gamma=0.98) and grad clipping, epsilon-MSE diffusion loss with joint-scene
attention masks and NaN-agent loss masks, early stopping on validation ADE,
orbax checkpoints.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from sicnav_tpu.diffusion import diffusion as DF
from sicnav_tpu.diffusion import evaluation as EV
from sicnav_tpu.diffusion.data import SceneBatch
from sicnav_tpu.diffusion.models import (
    JointTransformerConcatLinear, ModelConfig, TrajectronEncoder,
    TransformerConcatLinear, integrate_velocity_samples, make_denoiser,
    standardize_history,
)


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Defaults = configs/ddim_jp_sim.yaml."""
    joint: bool = True             # JMID vs iMID
    lr: float = 1e-4
    lr_decay: float = 0.98         # ExponentialLR gamma (mid.py:1208)
    epochs: int = 90
    batch_size: int = 8            # scenes per step (reference uses 1)
    grad_clip: float = 1.0
    num_diffusion_steps: int = 100
    early_stop_patience: int = 10
    eval_samples: int = 20
    eval_stride: int = 2
    seed: int = 0


class JMIDModel(nn.Module):
    """Encoder + denoiser; one scene (A agents) per call."""
    cfg: ModelConfig
    joint: bool = True

    def setup(self):
        self.encoder = TrajectronEncoder(self.cfg)
        # cfg.diffnet selects among the reference's denoiser family
        # (diffusion.py:67-690 via config.diffnet, mid.py:1273); default is
        # the exercised TransformerConcatLinear / JointPrediction... pair.
        self.denoiser, self.denoiser_joint = make_denoiser(self.cfg, self.joint)

    def encode(self, batch: SceneBatch, deterministic=True):
        """Per-agent context vectors (A, 2*enc_rnn_dim)."""
        A = batch.hist.shape[0]
        cur_pos = batch.hist[:, -1, 0:2]
        hist_st = standardize_history(batch.hist, cur_pos)
        # neighbor histories standardized relative to the TARGET's current pos
        neigh = jnp.broadcast_to(batch.hist[None], (A,) + batch.hist.shape)
        target_pos = jnp.broadcast_to(cur_pos[:, None, :], (A, A, 2))
        neigh_st = standardize_history(neigh, target_pos)
        if self.cfg.num_node_types > 1:
            # per-node-type dispatch (encoders/trajectron.py:318): each
            # agent is routed by ITS class code; every neighbor slot a
            # carries agent a's class
            types = jnp.asarray(batch.types(), jnp.int32)
            neigh_types = jnp.broadcast_to(types[None], (A, A))
            return self.encoder(hist_st, batch.hist_mask, neigh_st,
                                batch.neighbor_mask,
                                deterministic=deterministic,
                                node_type=types, neigh_type=neigh_types)
        return self.encoder(hist_st, batch.hist_mask, neigh_st,
                            batch.neighbor_mask, deterministic=deterministic)

    def scene_attn_mask(self, batch: SceneBatch):
        """(A*T, A*T) attention mask: tokens attend within the scene's valid
        agents (preprocessing.generate_mask:35-90 block-diagonal)."""
        A = batch.agent_mask.shape[0]
        T = self.cfg.horizon
        ok = batch.agent_mask
        m = ok[:, None] & ok[None, :]                   # (A, A)
        return jnp.kron(m.astype(jnp.int32),
                        jnp.ones((T, T), jnp.int32)).astype(bool)

    def denoise(self, x, beta, context, batch: SceneBatch, deterministic=True):
        if self.denoiser_joint:
            return self.denoiser(x, beta, context, self.scene_attn_mask(batch),
                                 deterministic=deterministic)
        return self.denoiser(x, beta, context, deterministic=deterministic)

    def __call__(self, batch: SceneBatch, key):
        """Training loss for one scene."""
        context = self.encode(batch, deterministic=False)
        sched = DF.make_schedule(100)
        loss_mask = ~(batch.fut_mask & batch.agent_mask[:, None])
        return DF.diffusion_loss(
            lambda x, b, c: self.denoise(x, b, c, batch, deterministic=False),
            sched, key, batch.fut_vel, context, loss_mask=loss_mask)

    def sample(self, batch: SceneBatch, key, n_samples, sampling="ddim",
               stride=2, dt=0.25):
        """Forecast positions: (n_samples, A, T, 2)."""
        context = self.encode(batch)
        sched = DF.make_schedule(100)
        if self.denoiser_joint:
            # tile the scene mask across samples by vmapping per sample
            def net(x, beta, ctx):
                S = x.shape[0] // batch.agent_mask.shape[0]
                A = batch.agent_mask.shape[0]
                xs = x.reshape(S, A, *x.shape[1:])
                bs = beta.reshape(S, A)
                cs = ctx.reshape(S, A, -1)
                out = jax.vmap(lambda xx, bb, cc: self.denoise(xx, bb, cc, batch))(
                    xs, bs, cs)
                return out.reshape(x.shape[0], *out.shape[2:])
        else:
            def net(x, beta, ctx):
                return self.denoise(x, beta, ctx, batch)
        vel = DF.sample(net, sched, key, n_samples, context,
                        self.cfg.horizon, sampling=sampling, stride=stride)
        p0 = batch.hist[:, -1, 0:2]
        return integrate_velocity_samples(vel, p0[None], dt)


def make_train_state(model: JMIDModel, sample_batch: SceneBatch,
                     tc: TrainConfig, steps_per_epoch: int):
    key = jax.random.PRNGKey(tc.seed)
    params = model.init({"params": key, "dropout": key},
                        jax.tree.map(jnp.asarray, sample_batch), key)
    sched = optax.exponential_decay(tc.lr, steps_per_epoch, tc.lr_decay,
                                    staircase=True)
    tx = optax.chain(optax.clip_by_global_norm(tc.grad_clip),
                     optax.adam(sched))
    opt_state = tx.init(params)
    return params, tx, opt_state


@functools.partial(jax.jit, static_argnames=("model", "tx"))
def train_step(model: JMIDModel, tx, params, opt_state, batch: SceneBatch,
               key):
    """One step over a leading scene-batch axis."""
    keys = jax.random.split(key, batch.hist.shape[0])

    def loss_fn(p):
        losses = jax.vmap(
            lambda b, k: model.apply(p, b, k, rngs={"dropout": k}))(batch, keys)
        return jnp.mean(losses)

    loss, grads = jax.value_and_grad(loss_fn)(params)
    updates, opt_state = tx.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, loss


@functools.partial(jax.jit, static_argnames=("model", "n_samples"))
def eval_scene(model: JMIDModel, params, batch: SceneBatch, key,
               n_samples: int = 20):
    """Min-of-k ADE/FDE + scene SADE/SFDE on one scene. Partially observed
    futures are masked per step (evaluation.py:11-60 NaN-mask semantics),
    not dropped: an agent counts if it has ANY observed future step."""
    pred_vel_pos = model.apply(params, batch, key, n_samples,
                               method=JMIDModel.sample)
    # ground-truth future positions from future velocities
    p0 = batch.hist[:, -1, 0:2]
    gt = integrate_velocity_samples(batch.fut_vel[None], p0[None], 0.25)[0]
    amask = batch.agent_mask & batch.fut_mask.any(axis=-1)

    def per_agent(a):
        return EV.min_ade_fde(pred_vel_pos[:, a], gt[a], batch.fut_mask[a])

    ades, fdes = jax.vmap(per_agent)(jnp.arange(gt.shape[0]))
    w = amask.astype(jnp.float32)
    ade = jnp.sum(ades * w) / jnp.maximum(w.sum(), 1.0)
    fde = jnp.sum(fdes * w) / jnp.maximum(w.sum(), 1.0)
    sade, sfde = EV.scene_ade_fde(pred_vel_pos, gt, amask, batch.fut_mask)
    return ade, fde, sade, sfde


@functools.partial(jax.jit, static_argnames=("model", "n_samples"))
def eval_scene_per_agent(model: JMIDModel, params, batch: SceneBatch, key,
                         n_samples: int = 20):
    """Per-agent min-of-k (ade (A,), fde (A,), valid (A,)) — the
    aggregation-free form of eval_scene, for per-node-type breakdowns
    (the reference evaluates JRDB multi-class models per node type)."""
    pred_vel_pos = model.apply(params, batch, key, n_samples,
                               method=JMIDModel.sample)
    p0 = batch.hist[:, -1, 0:2]
    gt = integrate_velocity_samples(batch.fut_vel[None], p0[None], 0.25)[0]
    amask = batch.agent_mask & batch.fut_mask.any(axis=-1)

    def per_agent(a):
        return EV.min_ade_fde(pred_vel_pos[:, a], gt[a], batch.fut_mask[a])

    ades, fdes = jax.vmap(per_agent)(jnp.arange(gt.shape[0]))
    return ades, fdes, amask


@functools.partial(jax.jit, static_argnames=("model", "n_samples"))
def eval_scene_full(model: JMIDModel, params, batch: SceneBatch, key,
                    n_samples: int = 20):
    """Full metric sweep per scene (eval_not_sicnav parity, mid.py:352+):
    min-of-k ADE/FDE, SADE/SFDE, most-likely ADE/FDE, KDE-NLL and the
    per-horizon-fraction ADE breakdown (is_eval_hst, mid.py:382-394)."""
    pred = model.apply(params, batch, key, n_samples,
                       method=JMIDModel.sample)                 # (S, A, T, 2)
    p0 = batch.hist[:, -1, 0:2]
    gt = integrate_velocity_samples(batch.fut_vel[None], p0[None], 0.25)[0]
    amask = batch.agent_mask & batch.fut_mask.any(axis=-1)
    w = amask.astype(jnp.float32)
    wsum = jnp.maximum(w.sum(), 1.0)

    def per_agent(a):
        m = batch.fut_mask[a]
        a_min, f_min = EV.min_ade_fde(pred[:, a], gt[a], m)
        fr = EV.horizon_fraction_ade(pred[:, a], gt[a], m)
        nll = EV.kde_nll(pred[:, a], gt[a])
        return a_min, f_min, fr[0], fr[1], fr[2], nll

    a_min, f_min, fr1, fr2, fr3, nll = jax.vmap(per_agent)(
        jnp.arange(gt.shape[0]))
    sade, sfde = EV.scene_ade_fde(pred, gt, amask, batch.fut_mask)
    ml_ade, ml_fde = EV.most_likely_ade_fde(pred, gt, agent_mask=amask,
                                            step_mask=batch.fut_mask)
    avg = lambda x: jnp.sum(x * w) / wsum
    return {
        "ade": avg(a_min), "fde": avg(f_min),
        "sade": sade, "sfde": sfde,
        "ml_ade": ml_ade, "ml_fde": ml_fde,
        "kde_nll": avg(nll),
        "ade_one_fourth": avg(fr1), "ade_two_fourth": avg(fr2),
        "ade_three_fourth": avg(fr3),
    }


def fit(model: JMIDModel, train_batches, val_batches, tc: TrainConfig,
        log_every: int = 50, checkpoint_dir: Optional[str] = None,
        log_dir: Optional[str] = None, tensorboard: bool = False):
    """Full training loop with early stopping. ``train_batches`` is a list of
    stacked SceneBatch (leading scene axis). ``log_dir`` streams per-epoch
    loss/val-ADE as JSONL (+ TB event files with ``tensorboard=True``),
    replacing the reference trainer's tensorboardX writer (mid.py:14)."""
    logger = None
    if log_dir is not None:
        from sicnav_tpu.utils.metrics import MetricsLogger
        logger = MetricsLogger(log_dir, "jmid", tensorboard=tensorboard)
    steps_per_epoch = max(len(train_batches), 1)
    params, tx, opt_state = make_train_state(model, jax.tree.map(
        lambda x: x[0], train_batches[0]), tc, steps_per_epoch)
    key = jax.random.PRNGKey(tc.seed + 1)

    best_ade = np.inf
    best_params = params
    patience = 0
    history = []
    for epoch in range(tc.epochs):
        ep_loss = []
        for i, batch in enumerate(train_batches):
            key, k = jax.random.split(key)
            params, opt_state, loss = train_step(model, tx, params, opt_state,
                                                 jax.tree.map(jnp.asarray, batch), k)
            ep_loss.append(float(loss))
        # validation ADE
        ades = []
        for batch in val_batches:
            key, k = jax.random.split(key)
            scenes = jax.tree.map(jnp.asarray, batch)
            a, f, sa, sf = jax.vmap(
                lambda b: eval_scene(model, params, b, k, tc.eval_samples))(scenes)
            ades.append(float(jnp.mean(a)))
        val_ade = float(np.mean(ades)) if ades else np.inf
        history.append({"epoch": epoch, "loss": float(np.mean(ep_loss)),
                        "val_ade": val_ade})
        if logger is not None:
            logger.log(epoch, loss=float(np.mean(ep_loss)), val_ade=val_ade)
        if val_ade < best_ade:
            best_ade = val_ade
            best_params = params
            patience = 0
            # persist best-so-far on every improvement (the reference's
            # _save_model_if_best, mid.py:1511) so long runs cut by a
            # wall-clock cap still leave a valid best checkpoint
            if checkpoint_dir is not None:
                save_checkpoint(checkpoint_dir, best_params)
        else:
            patience += 1
            if patience >= tc.early_stop_patience:
                break
    if checkpoint_dir is not None:
        save_checkpoint(checkpoint_dir, best_params)
    if logger is not None:
        logger.close()
    return best_params, history


def save_checkpoint(path, params):
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, params, force=True)
    ckptr.wait_until_finished()
    ckptr.close()


def load_checkpoint(path, like_params):
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path, like_params)
