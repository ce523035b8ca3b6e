"""MDP-GapE: best-arm-identification planning for stochastic MDPs, array-encoded.

Rebuild of the reference planner (tree_search/mdp_gape.py:11-344):
decision/chance node alternation with bounded next-state slots
(mdp_gape.py:267-286); per-(s,a,s') reward KL confidence bounds
(mdp_gape.py:200-212); chance-node backups solve the constrained
max-expectation problem for optimistic/pessimistic next-state distributions
(mdp_gape.py:288-305, the jnp solver from utils/math.py); root action chosen
by UGapE — best arm = min gap, challenger = max UCB, sample the more
uncertain (mdp_gape.py:238-249); stop when
``challenger.U - best.L < accuracy`` (mdp_gape.py:94-110).

The BAI exploration threshold (the reference ``eval``s
"3*log(1+log(count)) + horizon*log(actions) + log(1/(1-confidence))",
mdp_gape.py:33-36) is computed structurally in-graph.
"""
from __future__ import annotations

from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from rl_agents_tpu.agents.tree_search.common import allocation
from rl_agents_tpu.agents.tree_search.olop import OLOPAgent, parse_threshold
from rl_agents_tpu.envs.base import FunctionalEnv
from rl_agents_tpu.ops.hashing import obs_key
from rl_agents_tpu.ops.onehot import onehot, select_row
from rl_agents_tpu.utils.math import kl_upper_bound, max_expectation_under_constraint


class GapETree(NamedTuple):
    # decision nodes: reward stats of the (s,a,s') transition they represent
    d_parent: Any      # [Nd] i32 chance parent
    d_depth: Any       # [Nd] i32
    d_count: Any       # [Nd] i32
    d_cum_reward: Any  # [Nd]
    d_mu_ucb: Any      # [Nd]
    d_mu_lcb: Any      # [Nd]
    d_value_upper: Any  # [Nd]
    d_value_lower: Any  # [Nd]
    d_children: Any    # [Nd, A] i32 chance ids
    d_done: Any        # [Nd] bool
    # chance nodes
    c_parent: Any      # [Nc] i32
    c_depth: Any       # [Nc] i32
    c_count: Any       # [Nc] i32
    c_value_upper: Any  # [Nc]
    c_value_lower: Any  # [Nc]
    c_child_keys: Any  # [Nc, W] uint32
    c_children: Any    # [Nc, W] i32 decision ids
    c_n_children: Any  # [Nc] i32
    d_used: Any
    c_used: Any


@partial(jax.jit, static_argnames=("env", "num_actions", "episodes", "horizon", "width"))
def mdp_gape_plan(env: FunctionalEnv, params, state0, key, num_actions: int,
                  episodes: int, horizon: int, gamma: float, accuracy: float,
                  confidence: float, transition_threshold_coeff: float,
                  width: int = 2):
    A, W, H = num_actions, width, horizon
    Nd = 2 + episodes * H
    Nc = 1 + Nd * A
    gamma = jnp.float32(gamma)

    def init_upper(depth):
        return (1 - gamma ** (H - depth).astype(jnp.float32)) / (1 - gamma)

    def reward_threshold(count):
        """BAI threshold (mdp_gape.py:33-36), in-graph."""
        c = jnp.maximum(count.astype(jnp.float32), 1.0)
        return (3.0 * jnp.log(1.0 + jnp.log(c)) + H * np.log(A)
                + jnp.log(1.0 / (1.0 - confidence)))

    tree = GapETree(
        d_parent=jnp.full((Nd,), -1, jnp.int32),
        d_depth=jnp.zeros((Nd,), jnp.int32),
        d_count=jnp.zeros((Nd,), jnp.int32),
        d_cum_reward=jnp.zeros((Nd,)),
        d_mu_ucb=jnp.ones((Nd,)),
        d_mu_lcb=jnp.zeros((Nd,)),
        d_value_upper=jnp.full((Nd,), init_upper(jnp.zeros((), jnp.int32))),
        d_value_lower=jnp.zeros((Nd,)),
        d_children=jnp.full((Nd, A), -1, jnp.int32),
        d_done=jnp.zeros((Nd,), bool),
        c_parent=jnp.full((Nc,), -1, jnp.int32),
        c_depth=jnp.zeros((Nc,), jnp.int32),
        c_count=jnp.zeros((Nc,), jnp.int32),
        c_value_upper=jnp.full((Nc,), init_upper(jnp.zeros((), jnp.int32))),
        c_value_lower=jnp.zeros((Nc,)),
        c_child_keys=jnp.zeros((Nc, W), jnp.uint32),
        c_children=jnp.full((Nc, W), -1, jnp.int32),
        c_n_children=jnp.zeros((Nc,), jnp.int32),
        d_used=jnp.ones((), jnp.int32),
        c_used=jnp.zeros((), jnp.int32),
    )

    def expand_decision(tree, node):
        """Create A chance children (mdp_gape.py:162-170). All arena access
        in this planner is one-hot masked (ops/onehot.py): per-lane scalar
        indexing under a tree-batch vmap is the TPU pathology."""
        oh_n = onehot(node, Nd)
        ch0 = select_row(tree.d_children, oh_n)
        is_leaf = ch0[0] < 0
        base = tree.c_used
        ids = base + jnp.arange(A, dtype=jnp.int32)
        iota_c = jnp.arange(Nc, dtype=jnp.int32)
        oh_blk = (iota_c >= base) & (iota_c < base + A) & is_leaf
        d = select_row(tree.d_depth, oh_n)
        return tree._replace(
            d_children=jnp.where(oh_n[:, None] & is_leaf, ids[None, :],
                                 tree.d_children),
            c_parent=jnp.where(oh_blk, node, tree.c_parent),
            c_depth=jnp.where(oh_blk, d, tree.c_depth),
            c_value_upper=jnp.where(oh_blk, init_upper(d), tree.c_value_upper),
            c_used=tree.c_used + jnp.where(is_leaf, A, 0))

    def placeholder_stats(tree, chance):
        """Stats of the W next-state slots; unfilled slots are placeholders
        (count 0, mu in [0,1], vacuous value bounds)."""
        oh_c = onehot(chance, Nc)
        ch = select_row(tree.c_children, oh_c)
        filled = ch >= 0
        ch_oh = (ch[:, None] == jnp.arange(Nd, dtype=jnp.int32)[None, :]) \
            & filled[:, None]                                        # [W, Nd]
        sel = lambda arr, fill: jnp.where(
            filled, jnp.sum(jnp.where(ch_oh, arr[None, :], jnp.zeros((), arr.dtype)),
                            axis=1), fill)
        d_next = select_row(tree.c_depth, oh_c) + 1
        counts = sel(tree.d_count, 0)
        mu_ucb = sel(tree.d_mu_ucb, 1.0)
        mu_lcb = sel(tree.d_mu_lcb, 0.0)
        v_up = sel(tree.d_value_upper, init_upper(d_next))
        v_lo = sel(tree.d_value_lower, 0.0)
        return counts, mu_ucb, mu_lcb, v_up, v_lo

    def backup_chance(tree, chance):
        """Constrained-expectation Bellman backup (mdp_gape.py:288-305)."""
        counts, mu_ucb, mu_lcb, v_up, v_lo = placeholder_stats(tree, chance)
        oh_c = onehot(chance, Nc)
        total = jnp.maximum(select_row(tree.c_count, oh_c).astype(jnp.float32), 1.0)
        p_hat = counts.astype(jnp.float32) / total
        threshold = transition_threshold_coeff * jnp.log(jnp.float32(episodes)) / total
        u_next = mu_ucb + gamma * v_up
        l_next = mu_lcb + gamma * v_lo
        p_plus = max_expectation_under_constraint(u_next, p_hat, threshold)
        p_minus = max_expectation_under_constraint(-l_next, p_hat, threshold)
        return tree._replace(
            c_value_upper=jnp.where(oh_c, p_plus @ u_next, tree.c_value_upper),
            c_value_lower=jnp.where(oh_c, p_minus @ l_next, tree.c_value_lower))

    def backup_decision(tree, node):
        """V = max_a Q over chance children; leaves at horizon get 0
        (mdp_gape.py:214-226)."""
        oh_n = onehot(node, Nd)
        ch = select_row(tree.d_children, oh_n)
        valid = ch >= 0
        has = jnp.any(valid)
        ch_oh = (ch[:, None] == jnp.arange(Nc, dtype=jnp.int32)[None, :]) \
            & valid[:, None]
        c_up = jnp.sum(jnp.where(ch_oh, tree.c_value_upper[None, :], 0.0), axis=1)
        c_lo = jnp.sum(jnp.where(ch_oh, tree.c_value_lower[None, :], 0.0), axis=1)
        up = jnp.max(jnp.where(valid, c_up, -jnp.inf))
        lo = jnp.max(jnp.where(valid, c_lo, -jnp.inf))
        return tree._replace(
            d_value_upper=jnp.where(oh_n, jnp.where(has, up, 0.0), tree.d_value_upper),
            d_value_lower=jnp.where(oh_n, jnp.where(has, lo, 0.0), tree.d_value_lower))

    def root_gaps(tree):
        """UGapE quantities at the root (mdp_gape.py:228-249)."""
        ch0 = tree.d_children[0]
        valid = ch0 >= 0
        ch_oh = (ch0[:, None] == jnp.arange(Nc, dtype=jnp.int32)[None, :]) \
            & valid[:, None]
        up = jnp.where(valid,
                       jnp.sum(jnp.where(ch_oh, tree.c_value_upper[None, :], 0.0),
                               axis=1), -jnp.inf)
        lo = jnp.where(valid,
                       jnp.sum(jnp.where(ch_oh, tree.c_value_lower[None, :], 0.0),
                               axis=1), jnp.inf)
        # gap_k = max_{j != k} up_j - lo_k
        up_sorted = jnp.sort(up)[::-1]
        best_other = jnp.where(up == up_sorted[0],
                               jnp.where(jnp.sum(up == up_sorted[0]) > 1, up_sorted[0], up_sorted[1]),
                               up_sorted[0])
        gaps = jnp.where(valid, best_other - lo, jnp.inf)
        best = jnp.argmin(gaps)
        up_masked = jnp.where(valid & (jnp.arange(A) != best), up, -jnp.inf)
        challenger = jnp.argmax(up_masked)
        uncertainty_best = up[best] - lo[best]
        uncertainty_chal = up[challenger] - lo[challenger]
        selected = jnp.where(uncertainty_best >= uncertainty_chal, best, challenger)
        delta = up[challenger] - lo[best]
        return selected, best, challenger, delta

    def episode_fn(carry):
        tree, key, episode, done_flag = carry
        key, kep = jax.random.split(key)
        tree = expand_decision(tree, jnp.zeros((), jnp.int32))

        def step_h(c, h):
            tree, node, state, k = c
            tree = expand_decision(tree, node)
            k, ka, ks = jax.random.split(k, 3)
            # sampling rule (mdp_gape.py:183-198)
            selected, _, _, _ = root_gaps(tree)
            oh_n = onehot(node, Nd)
            ch = select_row(tree.d_children, oh_n)
            valid = ch >= 0
            ch_oh = (ch[:, None] == jnp.arange(Nc, dtype=jnp.int32)[None, :]) \
                & valid[:, None]
            ups = jnp.where(valid,
                            jnp.sum(jnp.where(ch_oh, tree.c_value_upper[None, :], 0.0),
                                    axis=1), -jnp.inf)
            ties = valid & (ups == jnp.max(ups))
            optimistic = jax.random.categorical(ka, jnp.where(ties, 0.0, -jnp.inf))
            action = jnp.where(node == 0, selected, optimistic)

            chance = jnp.sum(jnp.where(jnp.arange(A) == action, ch, 0))
            out = env.step(params, state, action, ks)

            # next-state slot by obs key (mdp_gape.py:272-286)
            okey = obs_key(out.obs)
            oh_c = onehot(chance, Nc)
            keys_row = select_row(tree.c_child_keys, oh_c)
            children_row = select_row(tree.c_children, oh_c)
            n = select_row(tree.c_n_children, oh_c)
            slots = jnp.arange(W)
            match = (keys_row == okey) & (slots < n)
            exists = jnp.any(match)
            insert = (~exists) & (n < W)
            slot = jnp.where(exists, jnp.argmax(match), jnp.minimum(n, W - 1))
            new_id = tree.d_used
            oh_w = onehot(slot, W)
            existing_child = jnp.sum(jnp.where(oh_w, children_row, 0))
            child = jnp.where(insert, new_id, jnp.maximum(existing_child, 0))
            d_next = select_row(tree.c_depth, oh_c) + 1
            oh_cw = oh_c[:, None] & oh_w[None, :]
            oh_new_d = onehot(new_id, Nd)
            tree = tree._replace(
                c_child_keys=jnp.where(oh_cw & insert, okey, tree.c_child_keys),
                c_children=jnp.where(oh_cw & insert, new_id, tree.c_children),
                c_n_children=tree.c_n_children + (oh_c & insert).astype(jnp.int32),
                d_parent=jnp.where(oh_new_d & insert, chance, tree.d_parent),
                d_depth=jnp.where(oh_new_d & insert, d_next, tree.d_depth),
                d_value_upper=jnp.where(oh_new_d & insert, init_upper(d_next),
                                        tree.d_value_upper),
                d_used=tree.d_used + insert.astype(jnp.int32))

            # statistics updates (mdp_gape.py:85-87, OLOPNode.update semantics)
            oh_child = onehot(child, Nd)
            done = out.terminated | jnp.any(oh_child & tree.d_done)
            reward = jnp.where(done, 0.0, out.reward.astype(jnp.float32))
            cum = select_row(tree.d_cum_reward, oh_child) + reward
            cnt = select_row(tree.d_count, oh_child) + 1
            thr = reward_threshold(cnt)
            tree = tree._replace(
                c_count=tree.c_count + oh_c.astype(jnp.int32),
                d_count=jnp.where(oh_child, cnt, tree.d_count),
                d_cum_reward=jnp.where(oh_child, cum, tree.d_cum_reward),
                d_done=tree.d_done | (oh_child & done),
                d_mu_ucb=jnp.where(oh_child,
                                   kl_upper_bound(cum, cnt.astype(jnp.float32), thr),
                                   tree.d_mu_ucb),
                d_mu_lcb=jnp.where(oh_child,
                                   kl_upper_bound(cum, cnt.astype(jnp.float32), thr,
                                                  lower=True),
                                   tree.d_mu_lcb))
            return (tree, child, out.state, k), child

        (tree, leaf, _, _), _ = jax.lax.scan(
            step_h, (tree, jnp.zeros((), jnp.int32), state0, kep), jnp.arange(H))

        # backup to root (mdp_gape.py:214-226, 288-305)
        def up_cond(c):
            n, _ = c
            return n >= 0

        def up_body(c):
            n, tree = c
            tree = backup_decision(tree, n)
            chance = select_row(tree.d_parent, onehot(n, Nd))

            def via_chance(args):
                chance, tree = args
                tree = backup_chance(tree, chance)
                return select_row(tree.c_parent, onehot(chance, Nc)), tree

            nxt, tree = jax.lax.cond(chance >= 0, via_chance,
                                     lambda a: (jnp.int32(-1), a[1]), (chance, tree))
            return nxt, tree

        _, tree = jax.lax.while_loop(up_cond, up_body, (leaf, tree))

        _, best, challenger, delta = root_gaps(tree)
        stop = delta < accuracy
        return tree, key, episode + 1, stop

    def loop_cond(carry):
        tree, key, episode, done_flag = carry
        return (~done_flag) & (episode <= episodes)

    tree, key, episodes_used, _ = jax.lax.while_loop(
        loop_cond, episode_fn, (tree, key, jnp.zeros((), jnp.int32),
                                jnp.zeros((), bool)))

    _, best, _, _ = root_gaps(tree)
    return best, episodes_used, tree


class MDPGapEAgent(OLOPAgent):
    """(reference: mdp_gape.py:316-344)"""

    @classmethod
    def default_config(cls):
        cfg = super().default_config()
        cfg.update({
            "accuracy": 1.0,
            "confidence": 0.9,
            "continuation_type": "uniform",
            "horizon_from_accuracy": False,
            "max_next_states_count": 1,
            "upper_bound": {
                "type": "kullback-leibler",
                "time": "global",
                "transition_threshold": "0.1*np.log(time)",
            },
        })
        return cfg

    def make_planner(self):
        if self.config.get("horizon_from_accuracy"):
            self.config["horizon"] = int(np.ceil(
                np.log(self.config["accuracy"] * (1 - self.config["gamma"]) / 2)
                / np.log(self.config["gamma"])))
            self.config["episodes"] = self.config["budget"] // self.config["horizon"]
            assert self.config["episodes"] > 1
        else:
            budget = max(self.env.action_space.n, self.config["budget"])
            self.config["episodes"], self.config["horizon"] = allocation(
                budget, self.config["gamma"])

    def planner_plan(self, env, observation):
        functional = env.functional
        best, episodes_used, tree = mdp_gape_plan(
            functional, env.params, env.state, self.next_key(),
            num_actions=functional.action_space.n,
            episodes=int(self.config["episodes"]), horizon=int(self.config["horizon"]),
            gamma=float(self.config["gamma"]), accuracy=float(self.config["accuracy"]),
            confidence=float(self.config["confidence"]),
            transition_threshold_coeff=parse_threshold(
                self.config["upper_bound"].get("transition_threshold", 0.1)),
            width=max(int(self.config["max_next_states_count"]), 1))
        self.last_plan_data = tree
        self.budget_used = int(episodes_used) * int(self.config["horizon"])
        return [int(best)]
