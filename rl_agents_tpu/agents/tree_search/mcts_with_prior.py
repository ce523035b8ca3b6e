"""MCTS guided by another agent's policy as prior and rollout policy.

Rebuild of the reference (tree_search/mcts_with_prior.py:9-71): an MCTS whose
expansion priors and rollout action distribution come from a stochastic
sub-agent (a DQN by default), its distribution renormalised over available
actions. Here the prior is a pure jnp function obs -> probs (the sub-agent's
Q-network under a Boltzmann distribution), evaluated *inside* the planner
program — the network forward joins the planning graph instead of crossing a
host boundary per node.
"""
from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp

from rl_agents_tpu.agents.tree_search.mcts import MCTSAgent, MCTSTree, _masked_random_argmax
from rl_agents_tpu.envs.base import FunctionalEnv
from rl_agents_tpu.factory import agent_factory


@partial(jax.jit, static_argnames=("env", "prior_fn", "num_actions", "episodes", "horizon"))
def mcts_prior_plan(env: FunctionalEnv, params, state0, obs0, key, prior_params,
                    prior_fn: Callable, num_actions: int, episodes: int, horizon: int,
                    gamma: float, temperature: float):
    """MCTS with state-dependent priors: like mcts_plan but expansion priors
    and rollout distributions come from ``prior_fn(obs) -> probs``."""
    A = num_actions
    N = 1 + episodes * A
    gamma = jnp.float32(gamma)
    tree = MCTSTree(
        parent=jnp.full((N,), -1, jnp.int32),
        children=jnp.full((N, A), -1, jnp.int32),
        count=jnp.zeros((N,), jnp.int32),
        value=jnp.zeros((N,)),
        prior=jnp.ones((N,)),
        used=jnp.ones((), jnp.int32),
    )

    def episode_fn(_, carry):
        tree, key = carry
        key, kdesc, kroll = jax.random.split(key, 3)

        def cond(c):
            node, state, obs, depth, total, terminal, k = c
            return (tree.children[node, 0] >= 0) & (depth < horizon) & ~terminal

        def body(c):
            node, state, obs, depth, total, terminal, k = c
            ch = tree.children[node]
            valid = ch >= 0
            chs = jnp.maximum(ch, 0)
            n_children = jnp.sum(valid).astype(jnp.float32)
            scores = tree.value[chs] + temperature * n_children * tree.prior[chs] / (
                tree.count[chs].astype(jnp.float32) + 1.0)
            k, ka, ks = jax.random.split(k, 3)
            action = _masked_random_argmax(ka, scores, valid)
            out = env.step(params, state, action, ks)
            total = total + gamma ** depth.astype(jnp.float32) * out.reward
            return (ch[action], out.state, out.obs, depth + 1, total,
                    terminal | out.terminated, k)

        node, state, obs, depth, total, terminal, _ = jax.lax.while_loop(
            cond, body, (jnp.zeros((), jnp.int32), state0, obs0,
                         jnp.zeros((), jnp.int32), jnp.zeros(()),
                         jnp.zeros((), bool), kdesc))

        # expansion with learned priors at the reached observation
        probs = prior_fn(prior_params, obs)
        is_leaf = tree.children[node, 0] < 0
        do_expand = is_leaf & (depth < horizon) & (~terminal | (node == 0))
        base = tree.used
        child_ids = base + jnp.arange(A, dtype=jnp.int32)
        tree = tree._replace(
            children=tree.children.at[node].set(
                jnp.where(do_expand, child_ids, tree.children[node])),
            parent=jnp.where(do_expand, tree.parent.at[child_ids].set(node), tree.parent),
            prior=jnp.where(do_expand, tree.prior.at[child_ids].set(probs), tree.prior),
            used=tree.used + jnp.where(do_expand, A, 0))

        # rollout following the learned policy
        def rollout_body(c, _):
            state, obs, h, total, terminal, k = c
            k, ka, ks = jax.random.split(k, 3)
            action = jax.random.categorical(ka, jnp.log(jnp.maximum(prior_fn(prior_params, obs), 1e-12)))
            out = env.step(params, state, action, ks)
            live = (h < horizon) & ~terminal
            total = total + jnp.where(live, gamma ** h.astype(jnp.float32) * out.reward, 0.0)
            state = jax.tree.map(lambda old, new: jnp.where(live, new, old), state, out.state)
            obs = jax.tree.map(lambda old, new: jnp.where(live, new, old), obs, out.obs)
            return (state, obs, h + 1, total, terminal | (live & out.terminated), k), None

        (_, _, _, rolled, _, _), _ = jax.lax.scan(
            rollout_body, (state, obs, depth, total, terminal, kroll), None, length=horizon)
        total = jnp.where(terminal, total, rolled)

        def up_cond(c):
            n, _, _ = c
            return n >= 0

        def up_body(c):
            n, count, value = c
            count = count.at[n].add(1)
            value = value.at[n].add((total - value[n]) / count[n].astype(jnp.float32))
            return tree.parent[n], count, value

        _, count, value = jax.lax.while_loop(up_cond, up_body, (node, tree.count, tree.value))
        return tree._replace(count=count, value=value), key

    tree, key = jax.lax.fori_loop(0, episodes, episode_fn, (tree, key))

    def plan_body(carry, _):
        node, live = carry
        ch = tree.children[node]
        valid = ch >= 0
        chs = jnp.maximum(ch, 0)
        counts = jnp.where(valid, tree.count[chs], -1)
        tie = valid & (counts == jnp.max(counts))
        action = jnp.argmax(jnp.where(tie, tree.value[chs], -jnp.inf))
        emit = live & jnp.any(valid)
        return (jnp.where(emit, ch[action], node), emit), jnp.where(emit, action, -1)

    (_, _), actions = jax.lax.scan(
        plan_body, (jnp.zeros((), jnp.int32), jnp.asarray(True)), None, length=horizon)
    return actions, jnp.sum(actions >= 0), tree


class MCTSWithPriorPolicyAgent(MCTSAgent):
    """(reference: mcts_with_prior.py:9-71)"""

    @classmethod
    def default_config(cls):
        config = super().default_config()
        config.update({
            "prior_agent": {
                "__class__": "DQNAgent",
                "exploration": {"method": "Boltzmann"},
            },
        })
        return config

    def make_planner(self):
        super().make_planner()
        self.prior_agent = agent_factory(self.env, self.config["prior_agent"])
        if "model_save" in self.config["prior_agent"]:
            self.prior_agent.load(self.config["prior_agent"]["model_save"])
        self._temperature = self.config["prior_agent"].get("exploration", {}).get(
            "temperature", 0.5)
        if hasattr(self.prior_agent, "model") and hasattr(self.prior_agent, "train_state"):
            # parametric prior (DQN): evaluated per node inside the jitted
            # planner (reference: mcts_with_prior.py:47-53 calls the prior
            # at every expansion)
            model = self.prior_agent.model
            temperature = self._temperature
            obs_dim = int(jnp.prod(jnp.asarray(self.env.observation_space.shape or (1,))))

            def prior_fn(params, obs):
                q = model.apply(params, jnp.ravel(jnp.asarray(obs, jnp.float32))[None, :obs_dim])
                return jax.nn.softmax(q[0] / temperature)

            self._prior_fn = prior_fn
            self._tabular_prior = False
        else:
            from rl_agents_tpu.envs.base import Discrete

            obs_space = getattr(self.env, "observation_space", None)
            self._index_obs = isinstance(obs_space, Discrete) or (
                hasattr(obs_space, "n") and not getattr(obs_space, "shape", None))
            if self._index_obs:
                # finite-MDP observations ARE state indices, so the jitted
                # planner evaluates the prior's Boltzmann table at EVERY
                # simulated node — exact per-node semantics, matching the
                # reference's per-node host calls (mcts_with_prior.py:47-53)
                def prior_fn(table, obs):
                    S = table.shape[0]
                    oh = jnp.arange(S) == jnp.asarray(obs, jnp.int32)
                    return jnp.sum(jnp.where(oh[:, None], table, 0.0), axis=0)

                self._prior_fn = prior_fn
            else:
                # non-index observations (e.g. the highway TTC-MDP view,
                # HighwayEnv/MCTSWithPriorPolicyAgent/vi_prior.json): the
                # prior's Q-table indexes MDP states, not the kinematics
                # observations the planner simulates, so the fused program
                # applies the ROOT-state action distribution (refreshed each
                # plan) at every node — a documented approximation of the
                # reference's per-node host calls.
                self._prior_fn = lambda params, obs: params
            self._tabular_prior = True

    @property
    def _prior_params(self):
        if self._tabular_prior:
            return self._root_prior
        return self.prior_agent.train_state.params

    @staticmethod
    def _boltzmann_rows(q, temperature):
        """Row-wise Boltzmann with a non-finite guard: any row containing a
        non-finite Q (which would softmax to NaN inside the jitted planner)
        falls back to uniform."""
        import numpy as np

        q = np.atleast_2d(np.asarray(q, np.float32))
        z = q / max(temperature, 1e-6)
        z = z - z.max(axis=1, keepdims=True)
        e = np.exp(z)
        probs = e / e.sum(axis=1, keepdims=True)
        ok = np.all(np.isfinite(q), axis=1, keepdims=True)
        return np.where(ok, probs, 1.0 / q.shape[1]).astype(np.float32)

    def _refresh_root_prior(self, observation):
        import numpy as np

        pa = self.prior_agent
        root_action = pa.act(observation)  # re-derives tabular views at the root
        A = self.num_actions
        if getattr(self, "_index_obs", False) \
                and hasattr(pa, "state_action_value"):
            # full [S, A] Boltzmann table — evaluated per node by _prior_fn
            table = self._boltzmann_rows(pa.state_action_value,
                                         self._temperature)
            self._root_prior = jnp.asarray(table[:, :A])
            return
        if hasattr(pa, "state_action_value") and hasattr(pa, "mdp") \
                and hasattr(pa.mdp, "state"):
            q = np.asarray(pa.state_action_value[int(pa.mdp.state)], np.float32)
            probs = self._boltzmann_rows(q, self._temperature)[0]
        else:
            probs = np.full((A,), 0.1 / max(A - 1, 1), np.float32)
            probs[int(root_action)] = 0.9
        self._root_prior = jnp.asarray(probs[:A])

    def planner_plan(self, env, observation):
        functional = env.functional
        if self._tabular_prior:
            self.num_actions = functional.action_space.n
            self._refresh_root_prior(observation)
        obs0 = jax.tree.map(jnp.asarray, env.obs if env.obs is not None else observation)
        actions, length, tree = mcts_prior_plan(
            functional, env.params, env.state, obs0, self.next_key(),
            self._prior_params, self._prior_fn,
            num_actions=functional.action_space.n,
            episodes=int(self.config["episodes"]), horizon=int(self.config["horizon"]),
            gamma=float(self.config["gamma"]), temperature=float(self.config["temperature"]))
        self.last_plan_data = tree
        return self.get_plan_list(actions, length)

    def record(self, state, action, reward, next_state, done, info):
        pass

    def save(self, filename):
        return self.prior_agent.save(filename)

    def load(self, filename):
        return self.prior_agent.load(filename)
