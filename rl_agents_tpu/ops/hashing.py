"""Observation hashing and open-addressing node tables.

The reference's graph/stochastic planners key nodes by ``str(observation)``
dicts and sha1 prefixes (graph_based.py:110-116, mcts_dpw.py:171-182,
graph_based_stochastic.py:207-219). The array equivalent: observations are
quantised and mixed into uint32 keys, and a linear-probing hash table in
device arrays maps keys to node slots — get-or-insert is a bounded
``while_loop``, usable inside jitted planner programs.
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

_MIX_PRIME = jnp.uint32(2654435761)  # Knuth multiplicative hashing
_EMPTY = jnp.uint32(0)


def obs_key(obs, precision: float = 1e-4) -> jnp.ndarray:
    """Hash an observation pytree to a uint32 key (0 is reserved).

    Multiply-sum universal hashing + murmur-style avalanche: one dense
    multiply, one reduction, five scalar mixes — O(1) sequential depth.
    (The previous per-element fold was a ``lax.scan`` over every observation
    scalar — ~75 sequential micro-ops per key on the highway obs, and the
    dominant cost of the graph planners' expansion rounds on TPU, where each
    tiny sequential step pays the loop-overhead floor.)"""
    leaves = jax.tree.leaves(obs)
    flat = jnp.concatenate([jnp.ravel(x).astype(jnp.float32) for x in leaves])
    q = jnp.round(flat / precision).astype(jnp.int32).astype(jnp.uint32)
    n = q.shape[0]
    # fixed odd position multipliers (Weyl sequence): sum_i q_i * c_i mod 2^32
    # is an almost-universal family
    c = (jnp.arange(1, n + 1, dtype=jnp.uint32) * _MIX_PRIME) | jnp.uint32(1)
    h = jnp.sum(q * c, dtype=jnp.uint32)
    # murmur3 fmix32 avalanche
    h = h ^ (h >> 16)
    h = h * jnp.uint32(0x85EBCA6B)
    h = h ^ (h >> 13)
    h = h * jnp.uint32(0xC2B2AE35)
    h = h ^ (h >> 16)
    return jnp.maximum(h, jnp.uint32(1))  # avoid the empty sentinel


class HashTable(NamedTuple):
    keys: Any    # [T] uint32, 0 = empty
    values: Any  # [T] i32 node ids
    count: Any   # [] i32 number of entries


def table_init(capacity: int) -> HashTable:
    """capacity should be ~2x the expected entries (power of two)."""
    return HashTable(keys=jnp.zeros((capacity,), jnp.uint32),
                     values=jnp.full((capacity,), -1, jnp.int32),
                     count=jnp.zeros((), jnp.int32))


def _probe_slot(table: HashTable, key):
    """First slot in linear-probe order holding ``key`` or empty — computed
    DENSELY: probe rank per slot + one argmin, no while_loop. The loop
    version costs a per-lane scalar gather per probe step under vmap (the
    TPU pathology, see ops/onehot.py); this is O(T) full-array streams that
    vectorize across a tree batch."""
    T = table.keys.shape[0]
    start = (key % jnp.uint32(T)).astype(jnp.int32)
    rank = (jnp.arange(T, dtype=jnp.int32) - start) % T  # probe order position
    candidate = (table.keys == key) | (table.keys == _EMPTY)
    first_rank = jnp.min(jnp.where(candidate, rank, T))
    slot = (start + first_rank) % T
    found = first_rank < T  # False only when the table is full of other keys
    slot_key = jnp.sum(jnp.where(jnp.arange(T) == slot, table.keys, jnp.uint32(0)))
    return slot, slot_key, found


def table_lookup_or_insert(table: HashTable, key, new_value):
    """Find ``key``; insert with ``new_value`` if absent.

    Returns (table, value, is_new). Linear-probing semantics, dense
    formulation. When the table is full and the key is absent, returns
    (-1, False).
    """
    T = table.keys.shape[0]
    slot, slot_key, found = _probe_slot(table, key)
    exists = found & (slot_key == key)
    can_insert = found & (slot_key == _EMPTY)
    onehot = jnp.arange(T) == slot
    keys = jnp.where(onehot & can_insert, key, table.keys)
    values = jnp.where(onehot & can_insert, new_value, table.values)
    count = table.count + can_insert.astype(jnp.int32)
    existing = jnp.sum(jnp.where(onehot, table.values, 0))
    value = jnp.where(exists, existing, jnp.where(can_insert, new_value, -1))
    return HashTable(keys, values, count), value, can_insert


def table_lookup(table: HashTable, key):
    """Find ``key``; returns -1 if absent."""
    T = table.keys.shape[0]
    slot, slot_key, found = _probe_slot(table, key)
    existing = jnp.sum(jnp.where(jnp.arange(T) == slot, table.values, 0))
    return jnp.where(found & (slot_key == key), existing, -1)
