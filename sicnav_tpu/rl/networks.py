"""SARL / RGL value networks in Flax.

Ports of RL_nav/SB3_models/SARL.py (SARLNetwork: per-human MLP embedding +
global-state attention pooling + joint MLP, value_calculation:135) and
RGL.py (RGLNetwork: relational GCN with embedded-gaussian similarity,
:25-232), with the same input transformation (un-rotated robocentric
features, SARL.py input_transformation:239-269) and masked attention /
adjacency for padded human slots — the reference pads with dummy humans
instead (crowd_sim_plus.py:781).
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class SARLConfig:
    """[sarl] of RL_nav/configs/sarl_policy.config."""
    mlp1_dims: Sequence[int] = (150, 100)
    mlp2_dims: Sequence[int] = (100, 50)
    attention_dims: Sequence[int] = (100, 100, 1)
    mlp3_dims: Sequence[int] = (150, 100, 100, 1)
    with_global_state: bool = True
    self_state_dim: int = 6
    human_state_dim: int = 7


@dataclasses.dataclass(frozen=True)
class RGLConfig:
    """[rgl] of RL_nav/configs/rgl_policy.config."""
    num_layer: int = 2
    X_dim: int = 32
    wr_dims: Sequence[int] = (64, 32)
    wh_dims: Sequence[int] = (64, 32)
    final_state_dim: int = 32
    gcn2_w1_dim: int = 32
    planning_dims: Sequence[int] = (150, 100, 100, 1)
    similarity_function: str = "embedded_gaussian"
    layerwise_graph: bool = True
    skip_connection: bool = False
    self_state_dim: int = 6
    human_state_dim: int = 7


class MLP(nn.Module):
    dims: Sequence[int]
    last_relu: bool = False

    @nn.compact
    def __call__(self, x):
        for i, d in enumerate(self.dims):
            x = nn.Dense(d)(x)
            if i < len(self.dims) - 1 or self.last_relu:
                x = nn.relu(x)
        return x


def input_transformation(robot_state, human_states):
    """Robocentric (un-rotated) features (SARL.py:239-269).

    robot_state: (..., 9) [px,py,vx,vy,r,gx,gy,v_pref,theta]
    human_states: (..., H, 5) [px,py,vx,vy,r]
    Returns (..., H, 13): [dx,dy,v_pref,radius,vx,vy,
                           px1,py1,vx1,vy1,radius1,da,radius_sum].
    """
    r = robot_state[..., None, :]
    dx = r[..., 5] - r[..., 0]
    dy = r[..., 6] - r[..., 1]
    v_pref = r[..., 7]
    vx, vy = r[..., 2], r[..., 3]
    radius = r[..., 4]
    px1 = human_states[..., 0] - r[..., 0]
    py1 = human_states[..., 1] - r[..., 1]
    vx1, vy1 = human_states[..., 2], human_states[..., 3]
    radius1 = human_states[..., 4]
    da = jnp.sqrt(px1 ** 2 + py1 ** 2)
    radius_sum = radius + radius1
    rf = jnp.stack([dx, dy, v_pref, radius, vx, vy], axis=-1)      # (...,1,6)
    rf = jnp.broadcast_to(rf, human_states.shape[:-1] + (6,))
    hf = jnp.stack([px1, py1, vx1, vy1, radius1, da, radius_sum], axis=-1)
    return jnp.concatenate([rf, hf], axis=-1)


class SARLNetwork(nn.Module):
    """V(robot_state, human_states) with attention pooling."""
    cfg: SARLConfig = SARLConfig()

    @nn.compact
    def __call__(self, robot_state, human_states, human_mask):
        # robot_state (..., 9); human_states (..., H, 5); human_mask (..., H)
        state = input_transformation(robot_state, human_states)  # (..., H, 13)
        self_state = state[..., 0, :self.cfg.self_state_dim]

        e = MLP(self.cfg.mlp1_dims, last_relu=True, name="mlp1")(state)
        h = MLP(self.cfg.mlp2_dims, name="mlp2")(e)

        if self.cfg.with_global_state:
            w = human_mask[..., None].astype(e.dtype)
            global_state = jnp.sum(e * w, axis=-2, keepdims=True) / \
                jnp.maximum(jnp.sum(w, axis=-2, keepdims=True), 1.0)
            global_state = jnp.broadcast_to(global_state, e.shape)
            attn_in = jnp.concatenate([e, global_state], axis=-1)
        else:
            attn_in = e
        scores = MLP(self.cfg.attention_dims, name="attention")(attn_in)[..., 0]
        scores = scores - jnp.min(
            jnp.where(human_mask, scores, jnp.inf), axis=-1, keepdims=True)
        scores = jnp.clip(scores, None, 50.0)
        scores = jnp.where(human_mask, scores, -1e9)
        weights = jax.nn.softmax(scores, axis=-1)
        pooled = jnp.sum(weights[..., None] * h, axis=-2)

        joint = jnp.concatenate([self_state, pooled], axis=-1)
        return MLP(self.cfg.mlp3_dims, name="mlp3")(joint)[..., 0]


class RGLNetwork(nn.Module):
    """Relational GCN value network."""
    cfg: RGLConfig = RGLConfig()

    def _similarity(self, X, w_a, mask):
        cfg = self.cfg
        if cfg.similarity_function == "embedded_gaussian":
            A = jnp.einsum("...id,de,...je->...ij", X, w_a, X)
        elif cfg.similarity_function == "gaussian":
            A = jnp.einsum("...id,...jd->...ij", X, X)
        else:
            raise NotImplementedError(cfg.similarity_function)
        A = jnp.where(mask[..., None, :], A, -1e9)
        return jax.nn.softmax(A, axis=-1)

    @nn.compact
    def __call__(self, robot_state, human_states, human_mask):
        cfg = self.cfg
        state = input_transformation(robot_state, human_states)
        self_state = state[..., 0, :cfg.self_state_dim]
        hum_feats = state[..., cfg.self_state_dim:]

        r_emb = MLP(cfg.wr_dims, last_relu=True, name="w_r")(self_state)
        h_emb = MLP(cfg.wh_dims, last_relu=True, name="w_h")(hum_feats)
        X = jnp.concatenate([r_emb[..., None, :], h_emb], axis=-2)
        node_mask = jnp.concatenate(
            [jnp.ones_like(human_mask[..., :1]), human_mask], axis=-1)

        # the reference draws these Parameters from a unit normal
        # (RGL.py:100-108); scaled here by 1/sqrt(dim) for stable training
        # without torch's implicit lr dynamics
        w_init = nn.initializers.normal(1.0 / np.sqrt(cfg.X_dim))
        w_a = self.param("w_a", w_init, (cfg.X_dim, cfg.X_dim))
        w1_shape = (cfg.X_dim, cfg.gcn2_w1_dim if cfg.num_layer == 2
                    else cfg.final_state_dim)
        w1 = self.param("w1", w_init, w1_shape)

        A = self._similarity(X, w_a, node_mask)
        h1 = nn.relu(A @ X @ w1)
        if cfg.skip_connection:
            h1 = h1 + X
        if cfg.num_layer == 2:
            w2 = self.param("w2", w_init,
                            (cfg.gcn2_w1_dim, cfg.final_state_dim))
            A2 = self._similarity(h1, w_a, node_mask) if cfg.layerwise_graph else A
            h2 = nn.relu(A2 @ h1 @ w2)
            if cfg.skip_connection:
                h2 = h2 + h1
            feat = h2[..., 0, :]
        else:
            feat = h1[..., 0, :]
        return MLP(cfg.planning_dims, name="value_net")(feat)[..., 0]
