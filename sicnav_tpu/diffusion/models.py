"""Flax models for JMID/iMID: Trajectron-style encoder + transformer denoisers.

Re-designed from the reference PyTorch stack:
- encoder (sicnav_diffusion/JMID/MID/models/encoders/mgcvae.py): node-history
  LSTM (dim 128) + sum-combined neighbor-edge LSTM (dim 128) + additive
  attention over edge types -> 256-d context. As in the reference's MID use,
  the CVAE discrete latent is NOT part of the conditioning
  (mgcvae.get_latent:1266-1325 returns only x).
- denoisers (models/diffusion.py:112-209): ConcatSquashLinear in/out layers
  conditioned on [beta, sin beta, cos beta, context], a post-norm
  transformer over horizon tokens (iMID) or over agents x horizon tokens
  with block-diagonal scene masks (JMID).

Fixed shapes with masks throughout: a batch is (B, A, T, D) padded agents.
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# standardization (process_data.py:19-25 + preprocessing.get_node_timestep_data:
# position std <- attention radius, relative to the node's current position)
ATTENTION_RADIUS = 3.0
STATE_STD = np.array([ATTENTION_RADIUS, ATTENTION_RADIUS, 2.0, 2.0, 1.0, 1.0],
                     np.float32)


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    context_dim: int = 256          # encoder_dim in the yaml configs
    enc_rnn_dim: int = 128          # history / edge LSTM size
    tf_layer: int = 3
    n_heads: int = 4
    state_dim: int = 6              # pos, vel, acc
    pred_dim: int = 2               # velocity
    history_len: int = 6            # max_ht + 1 frames of history (incl now)
    horizon: int = 8
    dropout: float = 0.1
    rnn_dropout: float = 0.25       # 1 - dropout_keep_prob
    # denoiser selection, named as the reference's config.diffnet values
    # (mid.py:1273 getattr(diffusion, config.diffnet)); "" = default for the
    # joint/marginal mode.
    diffnet: str = ""
    residual: bool = False          # TrajNet's residual flag (diffusion.py:70)
    # per-node-type dispatch: the reference instantiates one MGCVAE per
    # node type and routes each node through its class's weights
    # (encoders/trajectron.py:318 + model_registrar). The TPU-first
    # equivalent is ONE batched encoder conditioned on a learned class
    # embedding (injected into every history/edge frame and FiLM-added to
    # the context) — class routing without ragged per-class batches.
    # 1 = single-class (no embedding params; old checkpoints load as-is).
    num_node_types: int = 1


class _MaskedLSTMCell(nn.Module):
    """LSTM cell that holds its state through padding frames."""
    hidden: int

    @nn.compact
    def __call__(self, carry, xs):
        x_t, m_t = xs
        new_carry, y = nn.OptimizedLSTMCell(self.hidden)(carry, x_t)
        carry = jax.tree.map(
            lambda n, o: jnp.where(m_t[:, None], n, o), new_carry, carry)
        return carry, y


class LSTMEncoder(nn.Module):
    """LSTM over (T, D) sequences with a first-valid-index mask; returns the
    hidden state after the last (current) frame
    (run_lstm_on_variable_length_seqs equivalent)."""
    hidden: int

    @nn.compact
    def __call__(self, seq, valid_mask):
        # seq: (..., T, D); valid_mask: (..., T) — True where the frame exists
        B_shape = seq.shape[:-2]
        T = seq.shape[-2]
        flat = seq.reshape((-1, T, seq.shape[-1]))
        vmask = valid_mask.reshape((-1, T))

        ScanCell = nn.scan(_MaskedLSTMCell, variable_broadcast="params",
                           split_rngs={"params": False, "dropout": False},
                           in_axes=1, out_axes=1)
        cell = ScanCell(self.hidden)
        carry = nn.OptimizedLSTMCell(self.hidden, parent=None).initialize_carry(
            jax.random.PRNGKey(0), flat[:, 0].shape)
        carry, _ = cell(carry, (flat, vmask))
        out = carry[1]
        return out.reshape(B_shape + (self.hidden,))


class AdditiveAttention(nn.Module):
    """Bahdanau additive attention (components/additive_attention.py)."""
    hidden: int

    @nn.compact
    def __call__(self, keys, query, mask=None):
        # keys: (..., N, D_k), query: (..., D_q)
        w1 = nn.Dense(self.hidden, use_bias=False)
        w2 = nn.Dense(self.hidden, use_bias=False)
        v = nn.Dense(1, use_bias=False)
        scores = v(jnp.tanh(w1(keys) + w2(query)[..., None, :]))[..., 0]
        if mask is not None:
            scores = jnp.where(mask, scores, -1e9)
        attn = jax.nn.softmax(scores, axis=-1)
        return jnp.sum(attn[..., None] * keys, axis=-2), attn


class TrajectronEncoder(nn.Module):
    """History + edge encoder producing the diffusion conditioning context.

    Inputs (per target agent):
      hist: (..., T_h, 6) standardized state history
      hist_mask: (..., T_h)
      neigh_hist: (..., N, T_h, 6) standardized neighbor histories
      neigh_mask: (..., N) which neighbor slots exist
    Output: (..., 2 * enc_rnn_dim) context.
    """
    cfg: ModelConfig

    @nn.compact
    def __call__(self, hist, hist_mask, neigh_hist, neigh_mask,
                 deterministic: bool = True, node_type=None,
                 neigh_type=None):
        cfg = self.cfg
        if cfg.num_node_types > 1:
            # class-conditioned dispatch (one batched encoder instead of
            # the reference's per-node-type MGCVAE copies,
            # encoders/trajectron.py:318): a learned class embedding is
            # appended to every history/edge input frame so the LSTM
            # kernels see the class from step one, and FiLM-added to the
            # final context so the denoiser conditioning carries it too
            if node_type is None:
                node_type = jnp.zeros(hist.shape[:-2], jnp.int32)
            emb = nn.Embed(cfg.num_node_types, 16, name="class_embed")(
                node_type)
            emb_t = jnp.broadcast_to(emb[..., None, :],
                                     hist.shape[:-1] + (16,))
            hist = jnp.concatenate([hist, emb_t], axis=-1)
            # edge-type conditioning: neighbors carry THEIR class into the
            # summed edge states (the reference keys edge encoders by the
            # (node, neighbor)-type pair)
            if neigh_type is None:
                neigh_type = jnp.zeros(neigh_hist.shape[:-2], jnp.int32)
            n_emb = nn.Embed(cfg.num_node_types, 16, name="edge_class_embed")(
                neigh_type)
            n_emb_t = jnp.broadcast_to(n_emb[..., None, :],
                                       neigh_hist.shape[:-1] + (16,))
            neigh_hist = jnp.concatenate([neigh_hist, n_emb_t], axis=-1)
        else:
            emb = None
        # node history encoder
        h_enc = LSTMEncoder(cfg.enc_rnn_dim, name="history_lstm")(
            hist, hist_mask)
        h_enc = nn.Dropout(cfg.rnn_dropout, deterministic=deterministic)(h_enc)

        # edge: sum-combine neighbor states over the slot axis, gated by mask
        combined = jnp.sum(jnp.where(neigh_mask[..., None, None],
                                     neigh_hist, 0.0), axis=-3)
        joint = jnp.concatenate([combined, hist], axis=-1)
        e_enc = LSTMEncoder(cfg.enc_rnn_dim, name="edge_lstm")(
            joint, hist_mask)
        # dynamic-edge mask: zero influence when no neighbors at all
        has_neigh = jnp.any(neigh_mask, axis=-1)
        e_enc = e_enc * has_neigh[..., None]
        e_enc = nn.Dropout(cfg.rnn_dropout, deterministic=deterministic)(e_enc)

        # edge influence: additive attention over edge types (one type here,
        # structure kept for parity with edge_influence_combine='attention')
        e_infl, _ = AdditiveAttention(cfg.enc_rnn_dim, name="edge_attention")(
            e_enc[..., None, :], h_enc)
        e_infl = nn.Dropout(cfg.rnn_dropout, deterministic=deterministic)(e_infl)

        ctx = jnp.concatenate([e_infl, h_enc], axis=-1)
        if emb is not None:
            # FiLM-style class shift on the context so the denoiser's
            # conditioning carries the class even when histories coincide
            ctx = ctx + nn.Dense(ctx.shape[-1], name="class_film")(emb)
        return ctx


class ConcatSquashLinear(nn.Module):
    """out = W x * sigmoid(W_g ctx) + W_b ctx (models/common.py)."""
    out_dim: int

    @nn.compact
    def __call__(self, ctx, x):
        lin = nn.Dense(self.out_dim, name="layer")(x)
        gate = jax.nn.sigmoid(nn.Dense(self.out_dim, name="hyper_gate")(ctx))
        bias = nn.Dense(self.out_dim, use_bias=False, name="hyper_bias")(ctx)
        return lin * gate + bias


def positional_encoding(T, d_model, dtype=jnp.float32):
    pos = np.arange(T)[:, None]
    div = np.exp(np.arange(0, d_model, 2) * (-np.log(10000.0) / d_model))
    pe = np.zeros((T, d_model), np.float32)
    pe[:, 0::2] = np.sin(pos * div)
    pe[:, 1::2] = np.cos(pos * div)
    return jnp.asarray(pe, dtype)


class TransformerEncoderLayer(nn.Module):
    """Post-norm encoder layer (torch nn.TransformerEncoderLayer default)."""
    d_model: int
    n_heads: int
    d_ff: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, mask=None, deterministic=True):
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.n_heads, qkv_features=self.d_model,
            dropout_rate=self.dropout, deterministic=deterministic)(
            x, x, mask=mask)
        x = nn.LayerNorm()(x + nn.Dropout(self.dropout, deterministic=deterministic)(attn))
        ff = nn.Dense(self.d_ff)(x)
        ff = nn.relu(ff)
        ff = nn.Dropout(self.dropout, deterministic=deterministic)(ff)
        ff = nn.Dense(self.d_model)(ff)
        x = nn.LayerNorm()(x + nn.Dropout(self.dropout, deterministic=deterministic)(ff))
        return x


class TransformerConcatLinear(nn.Module):
    """iMID denoiser (diffusion.py:112-150): per-agent, tokens = horizon."""
    cfg: ModelConfig

    @nn.compact
    def __call__(self, x, beta, context, deterministic=True):
        # x: (B, T, 2); beta: (B,); context: (B, F)
        cfg = self.cfg
        d = 2 * cfg.context_dim
        b = beta[:, None, None]
        time_emb = jnp.concatenate([b, jnp.sin(b), jnp.cos(b)], axis=-1)
        ctx = jnp.concatenate([time_emb, context[:, None, :]], axis=-1)

        h = ConcatSquashLinear(d, name="concat1")(ctx, x)
        h = h + positional_encoding(h.shape[1], d)[None]
        for i in range(cfg.tf_layer):
            h = TransformerEncoderLayer(d, cfg.n_heads, 4 * cfg.context_dim,
                                        cfg.dropout, name=f"tf_{i}")(
                h, deterministic=deterministic)
        h = ConcatSquashLinear(cfg.context_dim, name="concat3")(ctx, h)
        h = ConcatSquashLinear(cfg.context_dim // 2, name="concat4")(ctx, h)
        return ConcatSquashLinear(cfg.pred_dim, name="linear")(ctx, h)


class JointTransformerConcatLinear(nn.Module):
    """JMID denoiser (diffusion.py:153-209): attention runs across all
    (agent x horizon) tokens of a scene with a block-diagonal mask."""
    cfg: ModelConfig

    @nn.compact
    def __call__(self, x, beta, context, scene_mask, deterministic=True):
        # x: (A, T, 2); beta: (A,); context: (A, F)
        # scene_mask: (A*T, A*T) bool attention mask (True = attend)
        cfg = self.cfg
        d = 2 * cfg.context_dim
        A, T, _ = x.shape
        b = beta[:, None, None]
        time_emb = jnp.concatenate([b, jnp.sin(b), jnp.cos(b)], axis=-1)
        ctx = jnp.concatenate([time_emb, context[:, None, :]], axis=-1)

        h = ConcatSquashLinear(d, name="concat1")(ctx, x)
        h = h + positional_encoding(T, d)[None]
        h = h.reshape(1, A * T, d)
        mask = scene_mask[None, None]                  # (1, 1, A*T, A*T)
        for i in range(cfg.tf_layer):
            h = TransformerEncoderLayer(d, cfg.n_heads, 4 * cfg.context_dim,
                                        cfg.dropout, name=f"tf_{i}")(
                h, mask=mask, deterministic=deterministic)
        h = h.reshape(A, T, d)
        h = ConcatSquashLinear(cfg.context_dim, name="concat3")(ctx, h)
        h = ConcatSquashLinear(cfg.context_dim // 2, name="concat4")(ctx, h)
        return ConcatSquashLinear(cfg.pred_dim, name="linear")(ctx, h)


class TrajNet(nn.Module):
    """ConcatSquash MLP denoiser (diffusion.py:67-109): per-point
    2->128->256->512->256->128->2 with leaky-relu between layers, optional
    input residual. Tokens never mix — purely pointwise over the horizon."""
    cfg: ModelConfig

    @nn.compact
    def __call__(self, x, beta, context, deterministic=True):
        # x: (B, T, 2); beta: (B,); context: (B, F)
        b = beta[:, None, None]
        time_emb = jnp.concatenate([b, jnp.sin(b), jnp.cos(b)], axis=-1)
        ctx = jnp.concatenate([time_emb, context[:, None, :]], axis=-1)
        h = x
        widths = (128, 256, 512, 256, 128, self.cfg.pred_dim)
        for i, w in enumerate(widths):
            h = ConcatSquashLinear(w, name=f"csl_{i}")(ctx, h)
            if i < len(widths) - 1:
                h = nn.leaky_relu(h)
        return x + h if self.cfg.residual else h


class TransformerLinear(nn.Module):
    """128-d transformer denoiser with a prepended context token
    (diffusion.py:377-411): ctx and horizon points are lifted to 128, the
    context rides as token 0 and is dropped before the output head."""
    cfg: ModelConfig

    @nn.compact
    def __call__(self, x, beta, context, deterministic=True):
        b = beta[:, None, None]
        time_emb = jnp.concatenate([b, jnp.sin(b), jnp.cos(b)], axis=-1)
        ctx = jnp.concatenate([time_emb, context[:, None, :]], axis=-1)
        ctx128 = nn.Dense(128, name="ctx_up")(ctx)         # (B, 1, 128)
        emb = nn.Dense(128, name="y_up")(x)                # (B, T, 128)
        h = jnp.concatenate([ctx128, emb], axis=1)         # (B, T+1, 128)
        h = h + positional_encoding(h.shape[1], 128)[None]
        for i in range(3):
            h = TransformerEncoderLayer(128, 2, 512, self.cfg.dropout,
                                        name=f"tf_{i}")(
                h, deterministic=deterministic)
        return nn.Dense(self.cfg.pred_dim, name="linear")(h[:, 1:])


class _FlatMLP(nn.Module):
    """Shared body of SmallMLP/BigMLP (diffusion.py:616-690): the whole
    horizon is flattened with [context, t] into one vector and mapped back."""
    cfg: ModelConfig
    widths: tuple

    @nn.compact
    def __call__(self, x, beta, context, deterministic=True):
        B, T, D = x.shape
        h = jnp.concatenate(
            [x.reshape(B, T * D), context.reshape(B, -1), beta[:, None]],
            axis=-1)
        for i, w in enumerate(self.widths):
            h = nn.leaky_relu(nn.Dense(w, name=f"layer_{i}")(h))
        h = nn.Dense(T * D, name="out")(h)
        return h.reshape(B, T, D)


class SmallMLP(nn.Module):
    """diffusion.py:616-646."""
    cfg: ModelConfig

    @nn.compact
    def __call__(self, x, beta, context, deterministic=True):
        return _FlatMLP(self.cfg, (512, 512, 512), name="mlp")(
            x, beta, context, deterministic)


class BigMLP(nn.Module):
    """diffusion.py:648-690."""
    cfg: ModelConfig

    @nn.compact
    def __call__(self, x, beta, context, deterministic=True):
        return _FlatMLP(self.cfg, (512,) + (1024,) * 9 + (512,), name="mlp")(
            x, beta, context, deterministic)


class LinearDecoder(nn.Module):
    """Plain latent->horizon decoder (diffusion.py:414-439):
    32->64->128->256->512->256->128->horizon with leaky-relu between."""
    out_dim: int = 12

    @nn.compact
    def __call__(self, code):
        widths = (64, 128, 256, 512, 256, 128)
        h = code
        for i, w in enumerate(widths):
            h = nn.leaky_relu(nn.Dense(w, name=f"layer_{i}")(h))
        return nn.Dense(self.out_dim, name="out")(h)


class JointInstanceTransformerConcatLinear(nn.Module):
    """Agent-token JMID denoisers (diffusion.py:211-375, v1/v2/v3): each
    agent's whole embedded horizon is flattened into ONE token of width
    2*context_dim*horizon and attention runs across agents. v2 adds an MLP
    before the transformer, v3 one before and after. The reference runs
    these unmasked on one scene per batch; here padded agents are masked
    out via the scene mask's agent diagonal."""
    cfg: ModelConfig
    variant: int = 1

    @nn.compact
    def __call__(self, x, beta, context, scene_mask, deterministic=True):
        cfg = self.cfg
        d = 2 * cfg.context_dim
        A, T, _ = x.shape
        b = beta[:, None, None]
        time_emb = jnp.concatenate([b, jnp.sin(b), jnp.cos(b)], axis=-1)
        ctx = jnp.concatenate([time_emb, context[:, None, :]], axis=-1)

        h = ConcatSquashLinear(d, name="concat1")(ctx, x)   # (A, T, d)
        h = h + positional_encoding(T, d)[None]
        flat = h.reshape(1, A, T * d)                       # agents as tokens
        if self.variant >= 2:
            m = nn.relu(nn.Dense(T * d, name="mlp1_fc1")(flat))
            flat = nn.Dense(T * d, name="mlp1_fc2")(m)
        amask = scene_mask[::T, ::T]                        # (A, A) agent mask
        mask = amask[None, None]
        for i in range(cfg.tf_layer):
            flat = TransformerEncoderLayer(T * d, cfg.n_heads,
                                           4 * cfg.context_dim, cfg.dropout,
                                           name=f"tf_{i}")(
                flat, mask=mask, deterministic=deterministic)
        if self.variant >= 3:
            m = nn.relu(nn.Dense(T * d, name="mlp2_fc1")(flat))
            flat = nn.Dense(T * d, name="mlp2_fc2")(m)
        h = flat.reshape(A, T, d)
        h = ConcatSquashLinear(cfg.context_dim, name="concat3")(ctx, h)
        h = ConcatSquashLinear(cfg.context_dim // 2, name="concat4")(ctx, h)
        return ConcatSquashLinear(cfg.pred_dim, name="linear")(ctx, h)


# config.diffnet name -> (constructor, joint?) — the reference resolves these
# via getattr(diffusion, config.diffnet) (mid.py:1273).
DIFFNETS = {
    "TransformerConcatLinear": (lambda cfg: TransformerConcatLinear(cfg), False),
    "TrajNet": (lambda cfg: TrajNet(cfg), False),
    "TransformerLinear": (lambda cfg: TransformerLinear(cfg), False),
    "SmallMLP": (lambda cfg: SmallMLP(cfg), False),
    "BigMLP": (lambda cfg: BigMLP(cfg), False),
    "JointPredictionTransformerConcatLinear":
        (lambda cfg: JointTransformerConcatLinear(cfg), True),
    "JointPredictionInstanceTransformerConcatLinear":
        (lambda cfg: JointInstanceTransformerConcatLinear(cfg, variant=1), True),
    "JointPredictionInstanceTransformerConcatLinearv2":
        (lambda cfg: JointInstanceTransformerConcatLinear(cfg, variant=2), True),
    "JointPredictionInstanceTransformerConcatLinearv3":
        (lambda cfg: JointInstanceTransformerConcatLinear(cfg, variant=3), True),
}


def make_denoiser(cfg: ModelConfig, joint: bool):
    """Resolve cfg.diffnet (or the mode default) to (module, is_joint)."""
    name = cfg.diffnet or ("JointPredictionTransformerConcatLinear" if joint
                           else "TransformerConcatLinear")
    ctor, is_joint = DIFFNETS[name]
    return ctor(cfg), is_joint


def standardize_history(hist_raw, current_pos):
    """(..., T, 6) raw [pos, vel, acc] -> standardized: positions relative to
    ``current_pos`` over attention radius; vel/2; acc/1."""
    mean = jnp.concatenate([current_pos, jnp.zeros_like(current_pos),
                            jnp.zeros_like(current_pos)], axis=-1)
    return (hist_raw - mean[..., None, :]) / STATE_STD


def integrate_velocity_samples(vel, p0, dt):
    """Single-integrator sample integration (dynamics/single_integrator.py
    integrate_samples): positions = p0 + cumsum(vel) * dt."""
    return p0[..., None, :] + jnp.cumsum(vel, axis=-2) * dt
