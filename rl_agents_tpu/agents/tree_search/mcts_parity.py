"""Reference-exact MCTS: bit-identical planning at a fixed seed.

The performance planners (mcts.py / mcts_fused.py) use jax-native keys; this
module is the parity twin (BASELINE.md north star: bit-exact trajectories vs
the reference at a fixed seed, extended beyond OPD to an RNG-dependent
planner). It replays the reference's episode loop draw-for-draw on a device
PCG64 stream (utils/pcg64.py, numpy-bit-exact):

- descent tie-breaks: ``random_argmax`` = ``all_argmax`` float-equality ties
  broken by ``np_random.choice(indices)`` — a buffered-Lemire bounded integer
  that consumes NO draw when the argmax is unique
  (reference: mcts.py:220-233 sampling_rule, abstract.py:295-311);
- rollout actions: ``np_random.choice(actions, 1, p=probs)`` — cdf
  searchsorted over ONE ``Generator.random()`` double per rollout step
  (reference: mcts.py:160-177 evaluate);
- leaf expansion / value backup consume no RNG
  (reference: mcts.py:237-265 expand/update_branch).

All node statistics are float64 with the reference's exact operation order,
so float comparisons (tie sets, argmaxes) resolve identically. Run under
``jax.experimental.enable_x64`` — and drive the reference on the SAME
functional env (EnvHandle) in the same x64 mode so both sides see identical
reward values.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from rl_agents_tpu.envs.base import FunctionalEnv
from rl_agents_tpu.utils.exact import mul_add_exact as _mul_add_exact
from rl_agents_tpu.utils.pcg64 import pcg64_choice, pcg64_double


class ParityArena(NamedTuple):
    children: jnp.ndarray  # [N, A] i32, -1 = absent
    parent: jnp.ndarray    # [N] i32
    prior: jnp.ndarray     # [N] f64
    value: jnp.ndarray     # [N] f64
    count: jnp.ndarray     # [N] i32
    used: jnp.ndarray      # [] i32


def _stream_where(flag, a, b):
    return jax.tree.map(lambda x, y: jnp.where(flag, x, y), a, b)


@partial(jax.jit, static_argnames=("env", "num_actions", "episodes", "horizon",
                                   "gamma", "temperature", "plan_capacity"))
def mcts_plan_parity(env: FunctionalEnv, params, state0, stream, inc,
                     num_actions: int, episodes: int, horizon: int,
                     gamma: float, temperature: float, plan_capacity: int = 16):
    """Plan exactly as the reference MCTS at a fixed seed.

    ``stream, inc = pcg64_init(seed)`` mirrors ``planner.seed(seed)``
    (gymnasium np_random -> Generator(PCG64(seed))). Returns
    ``(actions, length, arena, stream, totals)`` where actions is the
    reference ``get_plan()`` selection-rule descent (count-max ties broken by
    value first-max — no RNG; reference: mcts.py:212-218, abstract.py:143-156)
    and totals is the per-episode trajectory return (the argument of each
    ``update_branch`` call), for draw-by-draw comparison in tests.
    """
    A = num_actions
    N = 1 + episodes * A + A  # + A scratch slots for masked non-expansions
    # host-side constants with the reference's exact python-float arithmetic
    gamma_pows = jnp.asarray([gamma ** d for d in range(horizon)], jnp.float64)
    p = np.ones(A) / A
    cdf = p.cumsum()
    cdf /= cdf[-1]
    rollout_cdf = jnp.asarray(cdf, jnp.float64)
    ta = temperature * A  # temperature * len(parent.children), python float
    key0 = jax.random.PRNGKey(0)  # deterministic envs ignore the step key

    arena = ParityArena(
        children=jnp.full((N, A), -1, jnp.int32),
        parent=jnp.full((N,), -1, jnp.int32),
        prior=jnp.ones((N,), jnp.float64),
        value=jnp.zeros((N,), jnp.float64),
        count=jnp.zeros((N,), jnp.int32),
        used=jnp.ones((), jnp.int32),
    )

    def episode(i, carry):
        arena, stream, totals = carry

        # ---- descent (reference: mcts.py:143-149) ---------------------
        def d_cond(c):
            node, depth, total, terminal, est, stream = c
            return (depth < horizon) & (arena.children[node, 0] >= 0) & ~terminal

        def d_body(c):
            node, depth, total, terminal, est, stream = c
            ch = arena.children[node]
            sv = arena.value[ch] + (ta * arena.prior[ch]) / (
                arena.count[ch] + 1).astype(jnp.float64)
            ties = sv == jnp.max(sv)
            k = jnp.sum(ties).astype(jnp.uint32)
            stream, idx = pcg64_choice(stream, inc, k)
            pos = jnp.cumsum(ties.astype(jnp.int32)) - 1
            action = jnp.argmax(ties & (pos == idx.astype(jnp.int32))).astype(jnp.int32)
            outs = env.step(params, est, action, key0)
            total = _mul_add_exact(total, gamma_pows[depth], outs.reward.astype(jnp.float64))
            return (ch[action], depth + 1, total, outs.terminated,
                    outs.state, stream)

        node0 = jnp.zeros((), jnp.int32)
        node, depth, total, terminal, est, stream = jax.lax.while_loop(
            d_cond, d_body,
            (node0, jnp.zeros((), jnp.int32), jnp.zeros((), jnp.float64),
             jnp.zeros((), bool), state0, stream))

        # ---- expansion (reference: mcts.py:151-154, 237-246) ----------
        do_expand = ((arena.children[node, 0] < 0) & (depth < horizon)
                     & (~terminal | (node == 0)))
        base = jnp.where(do_expand, arena.used, N - A)
        slots = base + jnp.arange(A, dtype=jnp.int32)
        arena = arena._replace(
            children=arena.children.at[node].set(
                jnp.where(do_expand, slots, arena.children[node])),
            parent=arena.parent.at[slots].set(node),
            prior=arena.prior.at[slots].set(1.0 / A),
            value=arena.value.at[slots].set(0.0),
            count=arena.count.at[slots].set(0),
            used=arena.used + jnp.where(do_expand, A, 0),
        )

        # ---- rollout (reference: mcts.py:160-177) ---------------------
        def r_body(h, c):
            total, est, stopped, stream = c
            active = (h >= depth) & ~stopped
            stream2, u = pcg64_double(stream, inc)
            stream = _stream_where(active, stream2, stream)
            action = jnp.sum(rollout_cdf <= u).astype(jnp.int32)
            outs = env.step(params, est, action, key0)
            total = jnp.where(
                active,
                _mul_add_exact(total, gamma_pows[h], outs.reward.astype(jnp.float64)),
                total)
            est = _stream_where(active, outs.state, est)
            stopped = stopped | (active & (outs.terminated | outs.truncated))
            return total, est, stopped, stream

        total, _, _, stream = jax.lax.fori_loop(
            0, horizon, r_body, (total, est, terminal, stream))

        # ---- backup (reference: mcts.py:248-265) ----------------------
        def b_cond(c):
            n, _, _ = c
            return n >= 0

        def b_body(c):
            n, value, count = c
            cnt = count[n] + 1
            val = _mul_add_exact(value[n], 1.0 / cnt.astype(jnp.float64), total - value[n])
            return arena.parent[n], value.at[n].set(val), count.at[n].set(cnt)

        _, value, count = jax.lax.while_loop(
            b_cond, b_body, (node, arena.value, arena.count))
        return (arena._replace(value=value, count=count), stream,
                totals.at[i].set(total))

    arena, stream, totals = jax.lax.fori_loop(
        0, episodes, episode,
        (arena, stream, jnp.zeros((episodes,), jnp.float64)))

    # ---- plan extraction (reference selection_rule; no RNG) -----------
    def plan_body(carry, _):
        node, live = carry
        ch = arena.children[node]
        has = ch[0] >= 0
        counts = arena.count[ch]
        ties = counts == jnp.max(counts)
        vals = jnp.where(ties, arena.value[ch], -jnp.inf)
        action = jnp.argmax(vals).astype(jnp.int32)  # first max among ties
        emit = live & has
        return (jnp.where(emit, ch[action], node), emit), jnp.where(emit, action, -1)

    (_, _), actions = jax.lax.scan(
        plan_body, (jnp.zeros((), jnp.int32), jnp.asarray(True)), None,
        length=plan_capacity)
    length = jnp.sum(actions >= 0)
    return actions, length, arena, stream, totals
