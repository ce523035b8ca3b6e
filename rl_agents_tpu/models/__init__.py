from rl_agents_tpu.models.zoo import (
    AttentionNetwork,
    ConvolutionalNetwork,
    DuelingNetwork,
    EgoAttention,
    EgoAttentionNetwork,
    MultiLayerPerceptron,
    SelfAttention,
    activation_factory,
    attention,
    model_factory,
    size_model_config,
    trainable_parameters,
)

__all__ = [
    "AttentionNetwork",
    "ConvolutionalNetwork",
    "DuelingNetwork",
    "EgoAttention",
    "EgoAttentionNetwork",
    "MultiLayerPerceptron",
    "SelfAttention",
    "activation_factory",
    "attention",
    "model_factory",
    "size_model_config",
    "trainable_parameters",
]
