"""Budgeted greedy policy: Pareto frontiers and optimal mixtures, vmapped.

Rebuild of the reference (budgeted_ftq/greedy_policy.py:16-123). The reference
computes one scipy qhull convex hull *per state* in a multiprocessing pool
(bftq.py:227-231, 244-250); here the top frontier is an Andrew-monotone-chain
upper hull over the sorted (Qc, Qr) points as a fixed-capacity lax.scan, and
the constrained mixture is a masked searchsorted — both vmap over all states
in one device program.

Frontier semantics preserved: filter points dominated by the max-Qr point
(greedy_policy.py:55-59), take the top face of the convex hull from the
min-Qc end to the max-Qr point (greedy_policy.py:86-102); mixtures
interpolate the two frontier points bracketing the budget
(greedy_policy.py:16-36), with not_solvable/too_much_budget saturation.
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp


class Frontier(NamedTuple):
    """Top frontier points sorted by qc ascending, mask-padded."""

    qc: Any       # [P]
    qr: Any       # [P]
    action: Any   # [P] int
    budget: Any   # [P] beta generating the point
    valid: Any    # [P] bool
    count: Any    # [] int


class Mixture(NamedTuple):
    action_inf: Any
    action_sup: Any
    budget_inf: Any
    budget_sup: Any
    qr_inf: Any
    qr_sup: Any
    qc_inf: Any
    qc_sup: Any
    probability_sup: Any


def pareto_frontier(qr, qc, actions, budgets):
    """Top frontier of the (qc, qr) cloud at one state.

    qr/qc/actions/budgets: [P] flattened over (budget x action) points.

    Dense hull membership instead of a stack-based monotone chain: under a
    state-batch vmap the chain's per-lane stack reads/writes inside a
    while-inside-scan are the TPU pathology (ops/onehot.py; measured 35x
    on this kernel). A point is on the strict upper hull iff no valid pair
    covers it — an O(P^3) elementwise reduction XLA fuses without
    materialising, trivially parallel over states. Equivalence with the
    chain is tested point-for-point on random clouds
    (tests/agents/test_bftq.py)."""
    P = qr.shape[0]
    # filter points dominated by the max-qr point (first max on ties)
    max_idx = jnp.argmax(qr)
    keep = qc <= qc[max_idx]

    # sort by (qc, qr) ascending, invalid pushed to the end
    sort_key = jnp.where(keep, qc, jnp.inf)
    order = jnp.lexsort((qr, sort_key))
    qc_s, qr_s = qc[order], qr[order]
    valid_s = keep[order]

    # covered[i]: some valid pair (a, b) spans i with i strictly below the
    # chord, or exactly on it strictly between the endpoints (drops
    # collinear interiors, like the chain's cross >= 0 pop rule)
    pair_valid = valid_s[:, None, None] & valid_s[None, :, None]     # [a, b, 1]
    qc_a, qr_a = qc_s[:, None, None], qr_s[:, None, None]
    qc_b, qr_b = qc_s[None, :, None], qr_s[None, :, None]
    qc_i, qr_i = qc_s[None, None, :], qr_s[None, None, :]
    cross2 = (qc_b - qc_a) * (qr_i - qr_a) - (qr_b - qr_a) * (qc_i - qc_a)
    spans = (qc_a <= qc_i) & (qc_i <= qc_b)
    strict = (qc_a < qc_i) & (qc_i < qc_b)
    covered = jnp.any(pair_valid & ((spans & (cross2 < 0)) | (strict & (cross2 == 0))),
                      axis=(0, 1))
    # vertical runs (equal qc): keep only the best-qr point (last in sort order)
    same_qc = qc_s[:, None] == qc_s[None, :]
    better = (qr_s[:, None] > qr_s[None, :]) |         ((qr_s[:, None] == qr_s[None, :])
         & (jnp.arange(P)[:, None] > jnp.arange(P)[None, :]))
    vert_dominated = jnp.any(same_qc & better & valid_s[:, None], axis=0)
    on_hull = valid_s & ~covered & ~vert_dominated

    # compact: stable sort pushes non-hull points to the end, preserving the
    # qc order of hull points (jnp.argsort is stable)
    rank = jnp.argsort(~on_hull)
    count = jnp.sum(on_hull)
    pos = jnp.arange(P)
    hull_valid = pos < count
    # pad the tail with the last hull point (one-hot select, no per-lane gather)
    last_rank = jnp.sum(jnp.where(pos == jnp.maximum(count - 1, 0), rank, 0))
    src = order[jnp.where(hull_valid, rank, last_rank)]
    return Frontier(
        qc=qc[src], qr=qr[src], action=actions[src], budget=budgets[src],
        valid=hull_valid, count=count)


def _pareto_frontier_chain(qr, qc, actions, budgets):
    """Top frontier of the (qc, qr) cloud at one state.

    qr/qc/actions/budgets: [P] flattened over (budget x action) points.
    """
    P = qr.shape[0]
    # filter points dominated by the max-qr point (first max on ties)
    max_idx = jnp.argmax(qr)
    keep = qc <= qc[max_idx]

    # sort by (qc, qr) ascending, invalid pushed to the end
    sort_key = jnp.where(keep, qc, jnp.inf)
    order = jnp.lexsort((qr, sort_key))
    qc_s, qr_s = qc[order], qr[order]
    valid_s = keep[order]

    # Andrew monotone chain upper hull over the sorted valid prefix
    def cross(stack, o, a, b_qc, b_qr):
        oa_qc, oa_qr = qc_s[a] - qc_s[o], qr_s[a] - qr_s[o]
        ob_qc, ob_qr = b_qc - qc_s[o], b_qr - qr_s[o]
        return oa_qc * ob_qr - oa_qr * ob_qc

    def push(carry, j):
        stack, top = carry

        def pop_cond(c):
            s, t = c
            return (t >= 2) & valid_s[j] & (cross(s, s[t - 2], s[t - 1], qc_s[j], qr_s[j]) >= 0)

        stack, top = jax.lax.while_loop(pop_cond, lambda c: (c[0], c[1] - 1), (stack, top))
        stack = jnp.where(valid_s[j], stack.at[top].set(j), stack)
        top = top + valid_s[j].astype(jnp.int32)
        return (stack, top), None

    stack0 = jnp.zeros((P,), jnp.int32)
    (stack, top), _ = jax.lax.scan(push, (stack0, jnp.zeros((), jnp.int32)), jnp.arange(P))

    # gather frontier entries, padded with the last valid point
    pos = jnp.arange(P)
    hull_valid = pos < top
    hull_idx = stack[jnp.minimum(pos, jnp.maximum(top - 1, 0))]
    src = order[hull_idx]
    return Frontier(
        qc=jnp.where(hull_valid, qc[src], qc[src]),
        qr=qr[src], action=actions[src], budget=budgets[src],
        valid=hull_valid, count=top)


def optimal_mixture(frontier: Frontier, beta):
    """Mixture of the two frontier points bracketing ``beta``
    (reference: greedy_policy.py:16-36)."""
    n = frontier.count
    qc = jnp.where(frontier.valid, frontier.qc, jnp.inf)
    # k = first index with qc > beta  <=>  count of qc <= beta
    k = jnp.searchsorted(qc, beta, side="right")
    regular = (k >= 1) & (k < n)
    not_solvable = k < 1  # beta below the cheapest frontier point
    last = jnp.maximum(n - 1, 0)
    inf_idx = jnp.clip(jnp.where(regular, k - 1, jnp.where(not_solvable, 0, last)), 0, last)
    sup_idx = jnp.clip(jnp.where(regular, k, jnp.where(not_solvable, 0, last)), 0, last)
    denom = frontier.qc[sup_idx] - frontier.qc[inf_idx]
    p = jnp.where(regular,
                  (beta - frontier.qc[inf_idx]) / jnp.where(denom != 0, denom, 1.0),
                  jnp.where(not_solvable, 0.0, 1.0))
    return Mixture(
        action_inf=frontier.action[inf_idx], action_sup=frontier.action[sup_idx],
        budget_inf=frontier.budget[inf_idx], budget_sup=frontier.budget[sup_idx],
        qr_inf=frontier.qr[inf_idx], qr_sup=frontier.qr[sup_idx],
        qc_inf=frontier.qc[inf_idx], qc_sup=frontier.qc[sup_idx],
        probability_sup=p)


def frontier_values(qvalues, betas_disc, clamp_qc=None):
    """Split a [B, 2A] grid of Q-values into flattened frontier inputs.

    Returns qr, qc, actions, budgets each of shape [B*A]
    (reference point construction: greedy_policy.py:56-57)."""
    B, twoA = qvalues.shape
    A = twoA // 2
    qr = qvalues[:, :A].reshape(-1)
    qc = qvalues[:, A:].reshape(-1)
    if clamp_qc is not None:
        qc = jnp.clip(qc, clamp_qc[0], clamp_qc[1])
    actions = jnp.tile(jnp.arange(A), B)
    budgets = jnp.repeat(betas_disc, A)
    return qr, qc, actions, budgets


@jax.jit
def batch_mixtures(qvalues, betas_disc, betas):
    """All-states pipeline: [S, B, 2A] Q grids + per-state budget -> Mixture batch."""

    def one(qgrid, beta):
        qr, qc, actions, budgets = frontier_values(qgrid, betas_disc)
        return optimal_mixture(pareto_frontier(qr, qc, actions, budgets), beta)

    return jax.vmap(one)(qvalues, betas)
