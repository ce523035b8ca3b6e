"""Reference-exact OLOP/KL-OLOP: bit-identical planning at a fixed seed.

Parity twin of olop.py (the performance planner), extending the BASELINE.md
bit-exact bar to the open-loop family. The reference's draw consumption per
episode (reference: olop.py:63-92 run):

1. ``state.seed(np_random.randint(2**30))`` — one bounded-integer draw per
   episode whose value seeds the env fork (a no-op for deterministic envs,
   but the draw itself advances the stream and must be replayed);
2. with ``continuation_type: "uniform"``: one ``choice(A)`` per leaf
   expansion (reference: olop.py:80-82); with ``"zeros"`` (the default) the
   continuation is action 0 — no draw;
3. UCB descent, node updates, and backups are draw-free: descent is
   ``max(children, key=value_upper)`` (first-max, reference: olop.py:84-85),
   the reward bound is the KL-UCB Newton solve (utils/exact.py
   ``kl_upper_bound_exact``), and the B-value backup is
   ``mu_ucb + gamma * max(children)`` (reference: olop.py:182-193).

Note the reference's OLOP cannot run unmodified on current gymnasium/numpy
(4-tuple unpack of a 5-tuple step at olop.py:87; ``np_random.randint`` on a
Generator at olop.py:73; ``np.infty``): the parity tests shim exactly those
three plumbing breaks (SURVEY §7 hard-part 4 — algorithmic behavior, not
broken plumbing, is the spec) and assert bit-exact statistics against the
shimmed reference.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from rl_agents_tpu.envs.base import FunctionalEnv
from rl_agents_tpu.utils.exact import exact_mul, kl_upper_bound_exact
from rl_agents_tpu.utils.pcg64 import pcg64_choice, pcg64_integers


class OLOPParityArena(NamedTuple):
    children: jnp.ndarray  # [N, A] i32, -1 = absent
    parent: jnp.ndarray    # [N] i32
    depth: jnp.ndarray     # [N] i32
    cum: jnp.ndarray       # [N] f64 cumulative reward
    count: jnp.ndarray     # [N] i32
    mu: jnp.ndarray        # [N] f64 KL-UCB of the mean reward
    vu: jnp.ndarray        # [N] f64 sequence B-value
    done: jnp.ndarray      # [N] bool
    used: jnp.ndarray      # [] i32


def _tree_where(flag, a, b):
    return jax.tree.map(lambda x, y: jnp.where(flag, x, y), a, b)


@partial(jax.jit, static_argnames=("env", "num_actions", "episodes", "horizon",
                                   "gamma", "continuation_uniform",
                                   "plan_capacity"))
def olop_plan_parity(env: FunctionalEnv, params, state0, stream, inc,
                     num_actions: int, episodes: int, horizon: int,
                     gamma: float, continuation_uniform: bool = False,
                     plan_capacity: int = 16):
    """Plan exactly as the reference KL-OLOP at a fixed seed.

    ``stream, inc = pcg64_init(seed)`` mirrors ``planner.seed(seed)``.
    Returns ``(actions, length, arena, stream)``.
    """
    A, H = num_actions, horizon
    N = 1 + episodes * H * A + A  # worst case: one expansion per step + scratch
    f64 = jnp.float64
    # host-side constants with the reference's exact python-float arithmetic
    threshold = f64(float(4 * np.log(episodes)))  # eval("4*np.log(time)"), global time
    vu_init = jnp.asarray(
        [(1 - gamma ** (H + 1 - d)) / (1 - gamma) for d in range(H + 1)], f64)
    key0 = jax.random.PRNGKey(0)  # deterministic envs ignore the step key
    seed_bound = jnp.uint32(2 ** 30)

    arena = OLOPParityArena(
        children=jnp.full((N, A), -1, jnp.int32),
        parent=jnp.full((N,), -1, jnp.int32),
        depth=jnp.zeros((N,), jnp.int32),
        cum=jnp.zeros((N,), f64),
        count=jnp.zeros((N,), jnp.int32),
        mu=jnp.ones((N,), f64),  # KL type inits mu_ucb = 1 (reference: olop.py:117)
        vu=jnp.full((N,), vu_init[0], f64),
        done=jnp.zeros((N,), bool),
        used=jnp.ones((), jnp.int32),
    )

    def episode(_, carry):
        arena, stream = carry
        # the reference seeds each env fork from the planner stream
        # (reference: olop.py:73); deterministic envs ignore the value but
        # the draw advances the stream
        stream, _seed = pcg64_integers(stream, inc, seed_bound)

        def h_body(h, c):
            arena, stream, node, est = c
            has = arena.children[node, 0] >= 0

            # ---- expansion at leaves (reference: olop.py:78-82, 168-178) --
            do_expand = ~has
            base = jnp.where(do_expand, arena.used, N - A)
            slots = base + jnp.arange(A, dtype=jnp.int32)
            d_child = arena.depth[node] + 1
            arena = arena._replace(
                children=arena.children.at[node].set(
                    jnp.where(do_expand, slots, arena.children[node])),
                parent=arena.parent.at[slots].set(node),
                depth=arena.depth.at[slots].set(d_child),
                cum=arena.cum.at[slots].set(0.0),
                count=arena.count.at[slots].set(0),
                mu=arena.mu.at[slots].set(1.0),
                vu=arena.vu.at[slots].set(vu_init[d_child]),
                done=arena.done.at[slots].set(False),
                used=arena.used + jnp.where(do_expand, A, 0),
            )
            ch = arena.children[node]

            # ---- action selection -----------------------------------------
            if continuation_uniform:
                # choice over the fresh children only when expanding
                stream2, draw = pcg64_choice(
                    stream, inc,
                    jnp.where(do_expand, jnp.uint32(A), jnp.uint32(1)))
                stream = _tree_where(do_expand, stream2, stream)
                leaf_action = draw.astype(jnp.int32)
            else:
                leaf_action = jnp.zeros((), jnp.int32)
            ucb_action = jnp.argmax(arena.vu[ch]).astype(jnp.int32)  # first max
            action = jnp.where(do_expand, leaf_action, ucb_action)

            # ---- transition + node update (reference: olop.py:87-90,135-163)
            outs = env.step(params, est, action, key0)
            node = ch[action]
            done_new = arena.done[node] | outs.terminated
            r_eff = jnp.where(done_new, f64(0.0), outs.reward.astype(f64))
            cum2 = arena.cum[node] + r_eff
            count2 = arena.count[node] + 1
            mu2 = kl_upper_bound_exact(cum2, count2, threshold)
            arena = arena._replace(
                cum=arena.cum.at[node].set(cum2),
                count=arena.count.at[node].set(count2),
                mu=arena.mu.at[node].set(mu2),
                done=arena.done.at[node].set(done_new),
            )
            return arena, stream, node, outs.state

        arena, stream, node, _ = jax.lax.fori_loop(
            0, H, h_body, (arena, stream, jnp.zeros((), jnp.int32), state0))

        # ---- backup to root (reference: olop.py:180-193) -----------------
        # the final node is a depth-H leaf: value_upper = mu_ucb
        arena = arena._replace(vu=arena.vu.at[node].set(arena.mu[node]))

        def b_cond(c):
            n, _ = c
            return arena.parent[n] >= 0

        def b_body(c):
            n, vu = c
            p = arena.parent[n]
            ch = arena.children[p]
            val = arena.mu[p] + exact_mul(f64(gamma), jnp.max(vu[ch]))
            return p, vu.at[p].set(val)

        # walk parents up to the root (the leaf itself is already set)
        _, vu = jax.lax.while_loop(b_cond, b_body, (node, arena.vu))
        return arena._replace(vu=vu), stream

    arena, stream = jax.lax.fori_loop(0, episodes, episode, (arena, stream))

    # ---- plan extraction (reference: olop.py:129-133 selection_rule) ------
    def plan_body(carry, _):
        node, live = carry
        ch = arena.children[node]
        has = ch[0] >= 0
        counts = arena.count[ch]
        ties = counts == jnp.max(counts)
        vals = jnp.where(ties, arena.vu[ch], -jnp.inf)
        action = jnp.argmax(vals).astype(jnp.int32)  # first max among ties
        emit = live & has
        return (jnp.where(emit, ch[action], node), emit), jnp.where(emit, action, -1)

    (_, _), actions = jax.lax.scan(
        plan_body, (jnp.zeros((), jnp.int32), jnp.asarray(True)), None,
        length=plan_capacity)
    length = jnp.sum(actions >= 0)
    return actions, length, arena, stream
