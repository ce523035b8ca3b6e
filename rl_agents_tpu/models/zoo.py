"""Model zoo: MLP, dueling, convolutional and entity-attention Q-networks.

Rebuild of the reference torch zoo (rl_agents/agents/common/models.py:50-441)
in flax.linen. The same config-dict-driven construction is preserved
(``model_factory`` + ``size_model_config``), so the reference's agent JSON
configs (e.g. HighwayEnv ego_attention.json) instantiate the same
architectures. Compute maps onto the MXU: attention is fused einsum-softmax,
dtype is configurable (bfloat16 for TPU throughput, float32 default).

Architecture notes preserved from the reference:
* DuelingNetwork: value + advantage heads over a shared base
  (models.py:79-104), Q = V + A - mean(A)
* EgoAttention (models.py:157-194): multi-head attention of the ego entity
  over all entities, residual (combine(att) + ego)/2
* Ego/AttentionNetwork (models.py:237-367): presence mask derived from a
  feature column; masked entities get -1e9 attention scores
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from rl_agents_tpu.envs.base import Box, Discrete


def activation_factory(activation_type: str) -> Callable:
    if activation_type == "RELU":
        return nn.relu
    elif activation_type == "TANH":
        return jnp.tanh
    elif activation_type == "GELU":
        return nn.gelu
    raise ValueError(f"Unknown activation_type: {activation_type}")


_XAVIER = nn.initializers.xavier_uniform()
_ZEROS = nn.initializers.zeros_init()


def _dense(features: int, dtype, use_bias: bool = True, name: str | None = None):
    return nn.Dense(features, use_bias=use_bias, kernel_init=_XAVIER, bias_init=_ZEROS,
                    dtype=dtype, name=name)


class MultiLayerPerceptron(nn.Module):
    """(reference: models.py:50-76)"""

    layers: Sequence[int] = (64, 64)
    activation: str = "RELU"
    reshape: bool = True
    out: Optional[int] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        act = activation_factory(self.activation)
        if self.reshape:
            x = x.reshape(x.shape[0], -1)
        for size in self.layers:
            x = act(_dense(size, self.dtype)(x))
        if self.out:
            x = _dense(self.out, self.dtype)(x)
        return x


class DuelingNetwork(nn.Module):
    """(reference: models.py:79-104)"""

    out: int = 2
    base_layers: Sequence[int] = (64, 64)
    value_layers: Sequence[int] = ()
    advantage_layers: Sequence[int] = ()
    activation: str = "RELU"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        base = MultiLayerPerceptron(layers=self.base_layers, activation=self.activation,
                                    dtype=self.dtype, name="base")(x)
        value = MultiLayerPerceptron(layers=self.value_layers, out=1,
                                     activation=self.activation, dtype=self.dtype,
                                     name="value")(base)
        advantage = MultiLayerPerceptron(layers=self.advantage_layers, out=self.out,
                                         activation=self.activation, dtype=self.dtype,
                                         name="advantage")(base)
        return value + advantage - advantage.mean(axis=1, keepdims=True)


class ConvolutionalNetwork(nn.Module):
    """Three stride-2 convs + MLP head (reference: models.py:107-154). Input NCHW
    like the reference; internally NHWC for TPU-friendly conv layouts."""

    out: int = 2
    head_layers: Sequence[int] = ()
    activation: str = "RELU"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        act = activation_factory(self.activation)
        x = jnp.transpose(x, (0, 2, 3, 1))  # NCHW -> NHWC
        for features in (16, 32, 64):
            x = act(nn.Conv(features, kernel_size=(2, 2), strides=(2, 2), padding="VALID",
                            kernel_init=_XAVIER, dtype=self.dtype)(x))
        return MultiLayerPerceptron(layers=self.head_layers, out=self.out,
                                    activation=self.activation, dtype=self.dtype,
                                    name="head")(x)


def attention(query, key, value, mask=None):
    """Scaled dot-product attention (reference: models.py:370-388).

    query: [B, H, Nq, F], key/value: [B, H, N, F], mask: [B, H, Nq(or 1), N]
    where True marks *masked-out* (absent) entities, as in the reference.
    """
    d_k = query.shape[-1]
    scores = jnp.einsum("bhqf,bhkf->bhqk", query, key) / jnp.sqrt(d_k).astype(query.dtype)
    if mask is not None:
        scores = jnp.where(mask, jnp.asarray(-1e9, scores.dtype), scores)
    p_attn = jax.nn.softmax(scores, axis=-1)
    output = jnp.einsum("bhqk,bhkf->bhqf", p_attn, value)
    return output, p_attn


class EgoAttention(nn.Module):
    """(reference: models.py:157-194)"""

    feature_size: int = 64
    heads: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, ego, others, mask=None):
        B = others.shape[0]
        F, H = self.feature_size, self.heads
        fph = F // H
        input_all = jnp.concatenate([ego.reshape(B, 1, F), others], axis=1)
        n_entities = input_all.shape[1]
        key_all = _dense(F, self.dtype, use_bias=False, name="key_all")(input_all)
        value_all = _dense(F, self.dtype, use_bias=False, name="value_all")(input_all)
        query_ego = _dense(F, self.dtype, use_bias=False, name="query_ego")(ego.reshape(B, 1, F))
        # [B, H, entities, fph]
        key_all = key_all.reshape(B, n_entities, H, fph).transpose(0, 2, 1, 3)
        value_all = value_all.reshape(B, n_entities, H, fph).transpose(0, 2, 1, 3)
        query_ego = query_ego.reshape(B, 1, H, fph).transpose(0, 2, 1, 3)
        if mask is not None:
            mask = mask.reshape(B, 1, 1, n_entities)
        value, attention_matrix = attention(query_ego, key_all, value_all, mask)
        combined = _dense(F, self.dtype, use_bias=False, name="attention_combine")(
            value.transpose(0, 2, 1, 3).reshape(B, F))
        result = (combined + ego.reshape(B, F)) / 2
        return result, attention_matrix


class SelfAttention(nn.Module):
    """(reference: models.py:197-234)"""

    feature_size: int = 64
    heads: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, ego, others, mask=None):
        B = others.shape[0]
        F, H = self.feature_size, self.heads
        fph = F // H
        input_all = jnp.concatenate([ego.reshape(B, 1, F), others], axis=1)
        n_entities = input_all.shape[1]
        key_all = _dense(F, self.dtype, use_bias=False, name="key_all")(input_all)
        value_all = _dense(F, self.dtype, use_bias=False, name="value_all")(input_all)
        query_all = _dense(F, self.dtype, use_bias=False, name="query_all")(input_all)
        key_all = key_all.reshape(B, n_entities, H, fph).transpose(0, 2, 1, 3)
        value_all = value_all.reshape(B, n_entities, H, fph).transpose(0, 2, 1, 3)
        query_all = query_all.reshape(B, n_entities, H, fph).transpose(0, 2, 1, 3)
        if mask is not None:
            mask = mask.reshape(B, 1, 1, n_entities)
        value, attention_matrix = attention(query_all, key_all, value_all, mask)
        combined = _dense(F, self.dtype, use_bias=False, name="attention_combine")(
            value.transpose(0, 2, 1, 3).reshape(B, n_entities, F))
        result = (combined + input_all) / 2
        return result, attention_matrix


class EgoAttentionNetwork(nn.Module):
    """Entity-embedding + ego attention + output head (reference: models.py:237-312)."""

    out: int = 2
    presence_feature_idx: int = 0
    embedding_layers: Sequence[int] = (128, 128, 128)
    others_embedding_layers: Sequence[int] = (128, 128, 128)
    output_layers: Sequence[int] = (128, 128, 128)
    feature_size: int = 128
    heads: int = 4
    use_self_attention: bool = False
    dtype: Any = jnp.float32

    def setup(self):
        self.ego_embedding = MultiLayerPerceptron(
            layers=self.embedding_layers, reshape=False, dtype=self.dtype)
        self.others_embedding = MultiLayerPerceptron(
            layers=self.others_embedding_layers, reshape=False, dtype=self.dtype)
        if self.use_self_attention:
            self.self_attention_layer = SelfAttention(
                feature_size=self.feature_size, heads=self.heads, dtype=self.dtype)
        self.attention_layer = EgoAttention(
            feature_size=self.feature_size, heads=self.heads, dtype=self.dtype)
        self.output_layer = MultiLayerPerceptron(
            layers=self.output_layers, out=self.out, reshape=False, dtype=self.dtype)

    def split_input(self, x, mask=None):
        ego = x[:, 0:1, :]
        others = x[:, 1:, :]
        if mask is None:
            mask = x[:, :, self.presence_feature_idx] < 0.5  # [B, entities]
        return ego, others, mask

    def forward_attention(self, x):
        ego, others, mask = self.split_input(x)
        ego, others = self.ego_embedding(ego), self.others_embedding(others)
        if self.use_self_attention:
            self_att, _ = self.self_attention_layer(ego, others, mask)
            ego, others = self_att[:, 0:1, :], self_att[:, 1:, :]
        return self.attention_layer(ego, others, mask)

    def __call__(self, x):
        ego_embedded_att, _ = self.forward_attention(x)
        return self.output_layer(ego_embedded_att)

    def get_attention_matrix(self, x):
        _, attention_matrix = self.forward_attention(x)
        return attention_matrix


class AttentionNetwork(nn.Module):
    """Self-attention over all entities, ego output head (reference: models.py:315-367)."""

    out: int = 2
    presence_feature_idx: int = 0
    embedding_layers: Sequence[int] = (128, 128, 128)
    output_layers: Sequence[int] = (128, 128, 128)
    feature_size: int = 128
    heads: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        ego = x[:, 0:1, :]
        others = x[:, 1:, :]
        mask = x[:, :, self.presence_feature_idx] < 0.5
        embedded = MultiLayerPerceptron(layers=self.embedding_layers, reshape=False,
                                        dtype=self.dtype, name="embedding")(x)
        att, _ = SelfAttention(feature_size=self.feature_size, heads=self.heads,
                               dtype=self.dtype)(embedded[:, 0:1, :], embedded[:, 1:, :], mask)
        return MultiLayerPerceptron(layers=self.output_layers, out=self.out, reshape=False,
                                    dtype=self.dtype, name="output")(att[:, 0, :])


def trainable_parameters(params) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))


def size_model_config(env, model_config: dict):
    """Fill in/out sizes from env spaces (reference: models.py:404-428)."""
    obs_space = env.observation_space
    if hasattr(obs_space, "spaces"):  # multi-agent tuple: size from one agent's view
        obs_space = obs_space.spaces[0]
    if isinstance(obs_space, (Box,)) or hasattr(obs_space, "shape"):
        obs_shape = obs_space.shape
    else:
        obs_shape = (1,)
    if model_config.get("type") == "ConvolutionalNetwork":
        model_config["in_channels"] = int(obs_shape[0])
        model_config["in_height"] = int(obs_shape[1])
        model_config["in_width"] = int(obs_shape[2])
    else:
        model_config.setdefault("in", int(np.prod(obs_shape)))
    action_space = env.action_space
    if hasattr(action_space, "spaces"):  # multi-agent: one agent's action set
        action_space = action_space.spaces[0]
    if isinstance(action_space, Discrete) or hasattr(action_space, "n"):
        model_config.setdefault("out", int(action_space.n))


def _layers(config, key, default):
    return tuple(config.get(key, default))


def model_factory(config: dict) -> nn.Module:
    """Config-dict driven construction (reference: models.py:431-441). Accepts
    both this framework's flat keys and the reference's nested config shapes."""
    mtype = config.get("type", "MultiLayerPerceptron")
    dtype = jnp.bfloat16 if config.get("dtype") == "bfloat16" else jnp.float32
    if mtype == "MultiLayerPerceptron":
        return MultiLayerPerceptron(
            layers=_layers(config, "layers", (64, 64)),
            activation=config.get("activation", "RELU"),
            reshape=bool(config.get("reshape", True)),
            out=config.get("out"), dtype=dtype)
    elif mtype == "DuelingNetwork":
        base = config.get("base_module", {})
        return DuelingNetwork(
            out=config["out"],
            base_layers=_layers(base, "layers", (64, 64)),
            value_layers=_layers(config.get("value", {}), "layers", ()),
            advantage_layers=_layers(config.get("advantage", {}), "layers", ()),
            activation=config.get("activation", "RELU"), dtype=dtype)
    elif mtype == "ConvolutionalNetwork":
        return ConvolutionalNetwork(
            out=config["out"],
            head_layers=_layers(config.get("head_mlp", {}), "layers", ()),
            activation=config.get("activation", "RELU"), dtype=dtype)
    elif mtype == "EgoAttentionNetwork":
        att = config.get("attention_layer", {})
        emb = _layers(config.get("embedding_layer", {}), "layers", (128, 128, 128))
        # when unspecified, match the ego embedding width: the attention
        # concatenates ego/others embeddings, so a partial override like
        # ExitEnv/agents/DQNAgent.json (embedding_layer only) would
        # otherwise mix 64- and 128-wide rows (the reference's rec_update
        # merge keeps others at (128,128,128) and crashes on the torch.cat;
        # see docs/migration.md "EgoAttention embedding defaults"). Reference
        # checkpoints for such configs therefore cannot exist, but warn so
        # the shape divergence from the reference default is never silent.
        others = _layers(config.get("others_embedding_layer", {}), "layers", emb)
        if "others_embedding_layer" not in config and others != (128, 128, 128):
            import logging
            logging.getLogger(__name__).warning(
                "EgoAttentionNetwork: others_embedding defaults to the ego "
                "embedding widths %s (reference default is (128, 128, 128), "
                "which cannot feed a feature_size-%s attention); set "
                "others_embedding_layer explicitly to silence this.",
                others, att.get("feature_size", 128))
        return EgoAttentionNetwork(
            out=config["out"],
            presence_feature_idx=config.get("presence_feature_idx", 0),
            embedding_layers=emb,
            others_embedding_layers=others,
            output_layers=_layers(config.get("output_layer", {}), "layers", (128, 128, 128)),
            feature_size=att.get("feature_size", 128),
            heads=att.get("heads", 4),
            use_self_attention=bool(config.get("self_attention_layer")), dtype=dtype)
    elif mtype == "AttentionNetwork":
        att = config.get("attention_layer", {})
        return AttentionNetwork(
            out=config["out"],
            presence_feature_idx=config.get("presence_feature_idx", 0),
            embedding_layers=_layers(config.get("embedding_layer", {}), "layers", (128, 128, 128)),
            output_layers=_layers(config.get("output_layer", {}), "layers", (128, 128, 128)),
            feature_size=att.get("feature_size", 128),
            heads=att.get("heads", 4), dtype=dtype)
    raise ValueError(f"Unknown model type: {mtype}")
