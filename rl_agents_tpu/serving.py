"""Ahead-of-time policy export for deployment and serving.

The reference's only deployment artifact is a pickled torch module inside a
``.tar`` (reference: deep_q_network/pytorch.py:82-93), which needs the whole
framework (and its class definitions) at load time. The TPU-native analog is
``jax.export``: the trained greedy policy — parameters baked in as constants
— is serialized as a self-contained StableHLO artifact that any process can
deserialize and call with zero framework code, on any JAX backend (TPU
serving pods included), with the batch dimension left symbolic so one
artifact serves any request size.
"""
from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp
from jax import export as jax_export


def export_q_policy(agent, platforms=None):
    """Export a value-based agent's greedy policy as a ``jax.export.Exported``.

    The artifact computes ``obs[batch, *obs_shape] -> (action[batch],
    q_values[batch, A])`` with ``batch`` symbolic. Works for any agent with
    ``model`` / ``train_state.params`` (DQN family).
    """
    model, params = agent.model, agent.train_state.params
    obs_shape = tuple(agent.env.observation_space.shape or (1,))

    @jax.jit
    def policy(obs):
        q = model.apply(params, obs)
        return jnp.argmax(q, axis=-1), q

    (batch,) = jax_export.symbolic_shape("batch")
    spec = jax.ShapeDtypeStruct((batch, *obs_shape), jnp.float32)
    kwargs = {"platforms": platforms} if platforms else {}
    return jax_export.export(policy, **kwargs)(spec)


def save_policy(agent, path, platforms=None) -> Path:
    """Serialize the agent's greedy policy to ``path`` (one artifact file)."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_bytes(export_q_policy(agent, platforms=platforms).serialize())
    return path


def register_pytree_serialization(*trees):
    """Register every NamedTuple node type appearing in the given pytrees for
    ``jax.export`` artifact serialization (idempotent; name = qualified class
    path). Needed when exporting programs whose inputs are framework pytrees,
    e.g. a planner taking env-state batches."""
    seen = set()

    def walk(obj):
        if isinstance(obj, tuple) and hasattr(obj, "_fields"):
            cls = type(obj)
            if cls not in seen:
                seen.add(cls)
                name = f"{cls.__module__}.{cls.__name__}"
                try:
                    jax_export.register_namedtuple_serialization(
                        cls, serialized_name=name)
                except ValueError as e:
                    # Idempotent re-registration under the SAME name is fine;
                    # a conflicting earlier registration under a different
                    # name would make the later export silently wrong — reraise.
                    # (jax's message quotes the previous serialized_name in
                    # backticks: "... was with serialized_name `x.NT`.")
                    if f"`{name}`" not in str(e):
                        raise
            for value in obj:
                walk(value)
        elif isinstance(obj, (list, tuple)):
            for value in obj:
                walk(value)
        elif isinstance(obj, dict):
            for value in obj.values():
                walk(value)

    for tree in trees:
        walk(tree)


def load_policy(path):
    """Deserialize a policy artifact into a callable
    ``obs -> (action, q_values)`` — no agent, model or env needed."""
    exported = jax_export.deserialize(Path(path).read_bytes())

    def policy(obs):
        return exported.call(jnp.asarray(obs, jnp.float32))

    policy.exported = exported
    return policy
