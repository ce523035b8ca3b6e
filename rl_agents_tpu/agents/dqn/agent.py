"""Deep Q-Network agent with a fully jitted update path.

Rebuild of the reference DQN (deep_q_network/abstract.py:10-170 and
pytorch.py:14-104): ``record`` pushes to replay, samples a minibatch, takes a
Bellman-residual SGD step with elementwise gradient clipping to [-1, 1]
(pytorch.py:32-38), and syncs the target network on a cadence; ``act`` runs
the exploration policy over Q(s). Double-DQN target by default
(pytorch.py:56-69). Defaults mirror abstract.py:21-35 (DuelingNetwork,
ADAM 5e-4, l2 loss, memory 50k, batch 100, gamma .99, target_update 1).

The minibatch forward/backward is one jitted program; params/targets/opt
state live in device memory. Checkpointing serialises the pytrees with
flax.serialization (the reference saves torch state_dicts, pytorch.py:82-93).
"""
from __future__ import annotations

import pickle
from pathlib import Path
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import serialization

from rl_agents_tpu.agents.base import AbstractStochasticAgent
from rl_agents_tpu.ops.onehot import select_action_values
from rl_agents_tpu.agents.dqn.exploration import exploration_factory
from rl_agents_tpu.agents.dqn.replay import Batch, ReplayMemory
from rl_agents_tpu.models.optimizers import loss_function_factory, optimizer_factory
from rl_agents_tpu.models.zoo import model_factory, size_model_config, trainable_parameters


class TrainState(NamedTuple):
    params: dict
    target_params: dict
    opt_state: tuple


def make_train_step(model, optimizer, loss_fn, gamma: float, double: bool):
    """Build the jitted DQN update: loss -> grads -> clip [-1,1] -> optimizer."""

    def bellman_residual(params, target_params, batch: Batch, target_value=None):
        q = model.apply(params, batch.state)
        q_sa = select_action_values(q, batch.action)
        if target_value is None:
            if double:
                best_actions = jnp.argmax(model.apply(params, batch.next_state), axis=1)
                q_next = model.apply(target_params, batch.next_state)
                best_values = select_action_values(q_next, best_actions)
            else:
                best_values = jnp.max(model.apply(target_params, batch.next_state), axis=1)
            next_values = jnp.where(batch.terminal, 0.0, best_values)
            target_value = batch.reward + gamma * next_values
        return loss_fn(q_sa, jax.lax.stop_gradient(target_value)), target_value

    @jax.jit
    def train_step(state: TrainState, batch: Batch):
        (loss, _), grads = jax.value_and_grad(
            lambda p: bellman_residual(p, state.target_params, batch), has_aux=True)(state.params)
        grads = jax.tree.map(lambda g: jnp.clip(g, -1.0, 1.0), grads)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, state.target_params, opt_state), loss

    return train_step, jax.jit(lambda p, t, b: bellman_residual(p, t, b)[0])


class DQNAgent(AbstractStochasticAgent):
    batched = False

    def __init__(self, env, config=None):
        super().__init__(config)
        self.env = env
        action_space = env.action_space
        obs_space = env.observation_space
        if hasattr(action_space, "spaces"):  # multi-agent: per-ego spaces
            action_space = action_space.spaces[0]
            obs_space = obs_space.spaces[0]
        assert hasattr(action_space, "n"), "Only compatible with Discrete action spaces."
        size_model_config(self.env, self.config["model"])
        self.model = model_factory(self.config["model"])
        obs_shape = obs_space.shape or (1,)

        self.key = jax.random.PRNGKey(0)
        self.key, sub = jax.random.split(self.key)
        dummy = jnp.zeros((1,) + tuple(obs_shape), jnp.float32)
        params = self.model.init(sub, dummy)
        self.optimizer = optimizer_factory(self.config["optimizer"]["type"],
                                           lr=self.config["optimizer"].get("lr", 5e-4),
                                           weight_decay=self.config["optimizer"].get("weight_decay", 0.0))
        self.train_state = TrainState(params, params, self.optimizer.init(params))
        self.loss_function = loss_function_factory(self.config["loss_function"])
        self.train_step, self.compute_loss = make_train_step(
            self.model, self.optimizer, self.loss_function,
            self.config["gamma"], self.config["double"])
        self._apply = jax.jit(self.model.apply)

        self.memory = ReplayMemory(self.config["memory_capacity"], obs_shape,
                                   n_steps=self.config.get("n_steps", 1),
                                   gamma=self.config["gamma"])
        self.exploration_policy = exploration_factory(self.config["exploration"],
                                                      self.env.action_space)
        self.training = True
        self.previous_state = None
        self.steps = 0

    @classmethod
    def default_config(cls):
        return dict(model=dict(type="DuelingNetwork"),
                    optimizer=dict(type="ADAM", lr=5e-4, weight_decay=0, k=5),
                    loss_function="l2",
                    memory_capacity=50000,
                    batch_size=100,
                    gamma=0.99,
                    exploration=dict(method="EpsilonGreedy"),
                    target_update=1,
                    double=True)

    # ------------------------------------------------------------------
    # Interaction (reference: abstract.py:37-83)
    # ------------------------------------------------------------------
    def record(self, state, action, reward, next_state, done, info):
        if not self.training:
            return
        if isinstance(state, tuple) and isinstance(action, tuple):  # multi-agent
            for s, a, ns in zip(state, action, next_state):
                self.memory.push(s, a, reward, ns, done, info)
        else:
            self.memory.push(state, action, reward, next_state, done, info)
        batch = self.sample_minibatch()
        if batch is not None:
            self.train_state, loss = self.train_step(self.train_state, batch)
            if self.writer and self.steps % 100 == 0:
                self.writer.add_scalar("agent/loss", float(loss), self.steps)
            self.update_target_network()

    def act(self, state, step_exploration_time=True):
        self.previous_state = state
        if step_exploration_time:
            self.exploration_policy.step_time()
        if isinstance(state, tuple):
            return tuple(self.act(s, step_exploration_time=False) for s in state)
        values = self.get_state_action_values(state)
        self.exploration_policy.update(values)
        return self.exploration_policy.sample()

    def sample_minibatch(self):
        if len(self.memory) < self.config["batch_size"]:
            return None
        self.key, sub = jax.random.split(self.key)
        return self.memory.sample(sub, self.config["batch_size"])

    def update_target_network(self):
        self.steps += 1
        if self.steps % self.config["target_update"] == 0:
            self.train_state = self.train_state._replace(
                target_params=self.train_state.params)

    # ------------------------------------------------------------------
    # Value queries (reference: abstract.py:108-140)
    # ------------------------------------------------------------------
    def get_batch_state_values(self, states):
        q = self.get_batch_state_action_values(states)
        return np.max(q, axis=1), np.argmax(q, axis=1)

    def get_batch_state_action_values(self, states):
        states = jnp.asarray(np.asarray(states), jnp.float32)
        return np.asarray(self._apply(self.train_state.params, states))

    def get_state_value(self, state):
        values, actions = self.get_batch_state_values(np.asarray(state)[None])
        return values[0], actions[0]

    def get_state_action_values(self, state):
        return self.get_batch_state_action_values(np.asarray(state)[None])[0]

    def action_distribution(self, state):
        self.previous_state = state
        values = self.get_state_action_values(state)
        self.exploration_policy.update(values)
        return self.exploration_policy.get_distribution()

    # ------------------------------------------------------------------
    # Lifecycle
    # ------------------------------------------------------------------
    def seed(self, seed=None):
        if seed is not None:
            self.key = jax.random.PRNGKey(seed)
        return self.exploration_policy.seed(seed)

    def reset(self):
        pass

    def set_time(self, time):
        self.exploration_policy.set_time(time)

    def set_writer(self, writer):
        super().set_writer(writer)
        try:
            self.exploration_policy.set_writer(writer)
            writer.add_scalar("agent/trainable_parameters",
                             trainable_parameters(self.train_state.params), 0)
        except AttributeError:
            pass

    def explore(self, enable: bool):
        """Force pure exploration (the harness enables this on the first
        collection batch; reference: evaluation.py:266-267 sets
        final_temperature=1 in the worker config)."""
        if enable:
            self._saved_exploration = dict(self.config["exploration"])
            self.config["exploration"]["final_temperature"] = 1
        elif getattr(self, "_saved_exploration", None) is not None:
            self.config["exploration"] = self._saved_exploration
            self._saved_exploration = None
        self.exploration_policy = exploration_factory(self.config["exploration"],
                                                      self.env.action_space)

    def eval(self):
        self.training = False
        self.config["exploration"]["method"] = "Greedy"
        self.exploration_policy = exploration_factory(self.config["exploration"],
                                                      self.env.action_space)

    def train(self):
        self.training = True

    # ------------------------------------------------------------------
    # Fused whole-run training (config key "fused": true)
    # ------------------------------------------------------------------
    def train_fused(self, env_handle, num_episodes, writer=None):
        """Run the whole training as ONE fused on-device actor-learner
        (parallel/actor_learner.py): E vectorised envs act, write a device
        replay ring and take one SGD step per env-batch step — the
        reference's per-step record loop (abstract.py:37-63) without a
        single host round-trip, replacing its worker-pool collection
        (evaluation.py:196-290). The learned params/target/optimizer state
        are synced back into the agent afterwards so act/eval/save/export
        behave as if training had run through ``record``.

        The step budget matches the episode-count contract:
        ``num_episodes * max_episode_steps`` env transitions across
        ``fused_envs`` parallel envs."""
        from rl_agents_tpu.parallel.actor_learner import make_actor_learner

        functional = env_handle.functional
        expl = dict(self.exploration_policy.config)
        num_envs = int(self.config.get("fused_envs", 32))
        max_steps = int(getattr(functional, "max_episode_steps", 200) or 200)
        total = max(num_episodes * max_steps // num_envs, 1)
        segment = min(max(total // 10, 1), 1000)

        init_fn, segment_fn = make_actor_learner(
            functional, self.model, self.optimizer,
            num_envs=num_envs,
            capacity=int(self.config["memory_capacity"]),
            batch_size=int(self.config["batch_size"]),
            gamma=float(self.config["gamma"]),
            double=bool(self.config["double"]),
            target_update=int(self.config["target_update"]),
            eps_init=float(expl.get("temperature", 1.0)),
            eps_final=float(expl.get("final_temperature", 0.1)),
            eps_tau=float(expl.get("tau", 5000)),
            n_steps=int(self.config.get("n_steps", 1)),
            # throughput knobs (parallel/actor_learner.py): SGD updates per
            # collected env batch and time-slice minibatch sampling
            updates_per_step=int(self.config.get("updates_per_step", 1)),
            sample_mode=str(self.config.get("sample_mode", "uniform")))
        self.key, sub = jax.random.split(self.key)
        state = init_fn(sub)
        done_steps = 0
        while done_steps < total:
            steps = min(segment, total - done_steps)
            state, mean_reward = segment_fn(state, steps=steps)
            done_steps += steps
            if writer is not None:
                writer.add_scalar("episode/ema_return",
                                  float(state.completed_return),
                                  done_steps * num_envs)
                writer.add_scalar("agent/mean_reward", float(mean_reward),
                                  done_steps * num_envs)
        self.train_state = TrainState(params=state.params,
                                      target_params=state.target_params,
                                      opt_state=state.opt_state)
        self.exploration_policy.set_time(int(state.time))
        self.steps = int(state.time)
        return float(state.completed_return)

    def save(self, filename):
        filename = Path(filename)
        filename.parent.mkdir(parents=True, exist_ok=True)
        if self.config.get("checkpoint_format") == "orbax":
            # sharded array checkpoint (multi-host safe, atomic); the tar
            # name from the reference cadence becomes a directory
            from rl_agents_tpu.trainer.checkpoint import save_pytree

            save_pytree(filename.with_suffix(".orbax"),
                        self.train_state._asdict())
            return filename.with_suffix(".orbax")
        state = {
            "params": serialization.to_bytes(self.train_state.params),
            "target_params": serialization.to_bytes(self.train_state.target_params),
            "opt_state": serialization.to_bytes(self.train_state.opt_state),
        }
        with open(filename, "wb") as f:
            pickle.dump(state, f)
        return filename

    def load(self, filename):
        filename = Path(filename)
        if self.config.get("checkpoint_format") == "orbax" \
                or filename.suffix == ".orbax":
            from rl_agents_tpu.trainer.checkpoint import load_pytree

            restored = load_pytree(filename.with_suffix(".orbax"),
                                   template=self.train_state._asdict())
            self.train_state = TrainState(**restored)
            return filename
        with open(filename, "rb") as f:
            state = pickle.load(f)
        self.train_state = TrainState(
            params=serialization.from_bytes(self.train_state.params, state["params"]),
            target_params=serialization.from_bytes(self.train_state.target_params,
                                                   state["target_params"]),
            opt_state=serialization.from_bytes(self.train_state.opt_state, state["opt_state"]),
        )
        return filename

    def initialize_model(self):
        self.key, sub = jax.random.split(self.key)
        obs_shape = self.env.observation_space.shape or (1,)
        dummy = jnp.zeros((1,) + tuple(obs_shape), jnp.float32)
        params = self.model.init(sub, dummy)
        self.train_state = TrainState(params, self.train_state.target_params,
                                      self.optimizer.init(params))
