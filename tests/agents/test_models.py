import jax
import jax.numpy as jnp
import numpy as np

from rl_agents_tpu.models import (
    ConvolutionalNetwork,
    DuelingNetwork,
    EgoAttentionNetwork,
    MultiLayerPerceptron,
    model_factory,
    size_model_config,
    trainable_parameters,
)
from rl_agents_tpu.envs.cartpole import make as make_cartpole


def test_mlp_shapes():
    model = MultiLayerPerceptron(layers=(32, 32), out=4)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 6)))
    y = model.apply(params, jnp.ones((7, 6)))
    assert y.shape == (7, 4)
    assert trainable_parameters(params) == 6 * 32 + 32 + 32 * 32 + 32 + 32 * 4 + 4


def test_dueling_identity():
    model = DuelingNetwork(out=3, base_layers=(16,))
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4)))
    q = model.apply(params, jnp.ones((5, 4)))
    assert q.shape == (5, 3)
    # Q - V must be mean-zero advantage
    base_mean = np.asarray(q).mean(axis=1)
    assert np.isfinite(base_mean).all()


def test_conv_network():
    model = ConvolutionalNetwork(out=5, head_layers=(32,))
    x = jnp.zeros((2, 3, 24, 24))  # NCHW like the reference
    params = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(params, x)
    assert y.shape == (2, 5)


def test_ego_attention_network_masking():
    """Absent entities (presence feature < 0.5) must not change the output
    (reference: models.py:294-308 presence masking)."""
    model = EgoAttentionNetwork(out=3, embedding_layers=(32,), others_embedding_layers=(32,),
                                output_layers=(32,), feature_size=32, heads=2)
    B, E, F = 2, 5, 7
    rng = np.random.default_rng(0)
    x = rng.random((B, E, F)).astype(np.float32)
    x[:, :, 0] = 1.0          # all present
    x[:, 3:, 0] = 0.0         # entities 3,4 absent
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    y1 = model.apply(params, jnp.asarray(x))
    x2 = x.copy()
    x2[:, 3:, 1:] = 999.0     # perturb absent entities' features
    y2 = model.apply(params, jnp.asarray(x2))
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-5)
    assert y1.shape == (B, 3)

    att = model.apply(params, jnp.asarray(x), method=model.get_attention_matrix)
    # attention over absent entities must be ~0
    np.testing.assert_allclose(np.asarray(att)[:, :, :, 3:], 0.0, atol=1e-6)


def test_model_factory_reference_config():
    """The reference's nested config shapes build the same architectures."""
    env = make_cartpole({})
    config = {"type": "DuelingNetwork",
              "base_module": {"layers": [64, 64]},
              "value": {"layers": []},
              "advantage": {"layers": []}}
    size_model_config(env, config)
    assert config["out"] == 2 and config["in"] == 4
    model = model_factory(config)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4)))
    assert model.apply(params, jnp.zeros((3, 4))).shape == (3, 2)

    ego_config = {
        "type": "EgoAttentionNetwork",
        "out": 5,
        "embedding_layer": {"layers": [64, 64]},
        "others_embedding_layer": {"layers": [64, 64]},
        "attention_layer": {"feature_size": 64, "heads": 2},
        "output_layer": {"layers": [64]},
    }
    model = model_factory(ego_config)
    x = jnp.zeros((1, 8, 7))
    params = model.init(jax.random.PRNGKey(0), x)
    assert model.apply(params, x).shape == (1, 5)
