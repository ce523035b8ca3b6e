"""Device-side PCG64: numpy's default bitgenerator as a pure-jnp kernel.

The reference's RNG protocol is gymnasium ``np_random`` =
``np.random.Generator(np.random.PCG64(seed_seq))`` (reference:
agents/common/seeding.py:18-35, gymnasium.utils.seeding), and planner
tie-breaks consume it via ``np_random.choice(all_argmax(...))``
(reference: tree_search/abstract.py:295-311). jax's native threefry stream
cannot reproduce those draws, so bit-exact trajectory parity at a fixed seed
(BASELINE.md north star) needs PCG64 itself on device.

This module implements the full pipeline in jnp with no x64 requirement:

- 128-bit LCG state kept as 8 little-endian 16-bit digits in a uint32[8]
  vector, so every partial product fits in uint32 (16x16 -> 32 school
  multiplication with carry propagation, statically unrolled);
- the PCG XSL-RR output function (hi64 ^ lo64, rotated right by the top
  6 state bits), producing uint64 draws as (hi32, lo32) pairs;
- Lemire's bounded-integer rejection sampling exactly as numpy's
  ``Generator.integers`` uses it (``bounded_lemire_uint64``), which is what
  ``Generator.choice(n)`` consumes — one 64x64->128 widening multiply with
  a data-dependent (but a.s. terminating) rejection loop;
- seeding imported from numpy on the host (``np.random.PCG64(seed).state``),
  so numpy's SeedSequence entropy expansion is reused rather than cloned.

Everything is vmappable: a batch of parity streams is just a leading axis on
the state vector. Golden tests compare raw draws and bounded draws against
numpy itself (tests/agents/test_pcg64.py).
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

# PCG64's default 128-bit multiplier, as 8 little-endian 16-bit digits.
_PCG_MULT = 0x2360ED051FC65DA44385DF649FCCF645

_U32 = jnp.uint32
_MASK16 = jnp.uint32(0xFFFF)


def _int_to_digits(x: int) -> np.ndarray:
    return np.array([(x >> (16 * i)) & 0xFFFF for i in range(8)], np.uint32)


def _digits_to_int(d) -> int:
    return sum(int(v) << (16 * i) for i, v in enumerate(np.asarray(d)))


MULT_DIGITS = jnp.asarray(_int_to_digits(_PCG_MULT))


class PCG64Stream(NamedTuple):
    """Full numpy-compatible PCG64 stream state: the 128-bit LCG state as
    16-bit digits, plus the 32-bit draw buffer that numpy keeps in its
    ``pcg64_state`` struct (``has_uint32``/``uinteger``) and that PERSISTS
    across ``Generator.integers`` calls — next32 returns the low half of a
    64-bit draw and buffers the high half for the next call."""

    digits: Any    # uint32[8], 16-bit little-endian digits of the 128-bit state
    buf: Any       # uint32[], buffered high word
    has_buf: Any   # bool[]


def pcg64_init(seed: int):
    """Host-side seeding via numpy (SeedSequence expansion reused verbatim).

    Returns ``(stream, inc)`` matching ``np.random.PCG64(seed).state``
    exactly, including the (empty at init) 32-bit buffer.
    """
    full = np.random.PCG64(seed).state
    st = full["state"]
    stream = PCG64Stream(
        digits=jnp.asarray(_int_to_digits(st["state"])),
        buf=jnp.uint32(full["uinteger"]),
        has_buf=jnp.asarray(bool(full["has_uint32"])),
    )
    return stream, jnp.asarray(_int_to_digits(st["inc"]))


def _mul_add_128(a, b, c):
    """(a * b + c) mod 2**128 on 16-bit digit vectors, exact in uint32."""
    out = list(jnp.split(c.astype(_U32), 8))
    out = [x[0] for x in out]
    for i in range(8):
        carry = jnp.uint32(0)
        for j in range(8 - i):
            t = out[i + j] + a[i] * b[j] + carry
            out[i + j] = t & _MASK16
            carry = t >> 16
    return jnp.stack(out)


def _raw64(digits, inc):
    """One PCG64 draw on the bare digit state: step the LCG, then XSL-RR.

    Returns ``(new_digits, (hi32, lo32))`` where (hi32, lo32) is the uint64
    draw split into two uint32 words (hi * 2**32 + lo).
    """
    new_state = _mul_add_128(MULT_DIGITS, digits, inc)
    d = new_state
    # 64-bit halves as uint32 words
    lo_lo = d[0] | (d[1] << 16)
    lo_hi = d[2] | (d[3] << 16)
    hi_lo = d[4] | (d[5] << 16)
    hi_hi = d[6] | (d[7] << 16)
    x_lo = lo_lo ^ hi_lo
    x_hi = lo_hi ^ hi_hi
    rot = (d[7] >> 10) & jnp.uint32(0x3F)  # state >> 122: top 6 bits

    # rotr64((x_hi, x_lo), rot), branch-free for rot in [0, 64)
    r = rot & jnp.uint32(31)
    swap = rot >= 32
    a_hi = jnp.where(swap, x_lo, x_hi)
    a_lo = jnp.where(swap, x_hi, x_lo)
    # rotate the 64-bit pair right by r (< 32); (x << 32) guarded for r == 0
    inv = (jnp.uint32(32) - r) & jnp.uint32(31)
    carry_mask = jnp.where(r == 0, jnp.uint32(0), jnp.uint32(0xFFFFFFFF))
    out_lo = (a_lo >> r) | ((a_hi << inv) & carry_mask)
    out_hi = (a_hi >> r) | ((a_lo << inv) & carry_mask)
    return new_state, (out_hi, out_lo)


def pcg64_next64(stream: PCG64Stream, inc):
    """``next_uint64``: a raw 64-bit draw. Does NOT touch the 32-bit buffer
    (numpy's pcg64_next64 bypasses it the same way)."""
    digits, out = _raw64(stream.digits, inc)
    return stream._replace(digits=digits), out


def pcg64_next32(stream: PCG64Stream, inc):
    """``next_uint32`` with numpy's persistent buffering (pcg64.h
    pcg64_next32): return the buffered high word if present, else draw 64
    bits, return the LOW word and buffer the high word."""
    digits, (hi, lo) = _raw64(stream.digits, inc)
    use_buf = stream.has_buf
    x = jnp.where(use_buf, stream.buf, lo)
    new = PCG64Stream(
        digits=jnp.where(use_buf, stream.digits, digits),
        buf=jnp.where(use_buf, stream.buf, hi),
        has_buf=~use_buf,
    )
    return new, x


def _mul_64_64_hi_lo(x_hi, x_lo, m_hi, m_lo):
    """64x64 -> 128 widening multiply on uint32 words via 16-bit digits."""
    a = jnp.stack([x_lo & _MASK16, x_lo >> 16, x_hi & _MASK16, x_hi >> 16,
                   jnp.uint32(0), jnp.uint32(0), jnp.uint32(0), jnp.uint32(0)])
    b = jnp.stack([m_lo & _MASK16, m_lo >> 16, m_hi & _MASK16, m_hi >> 16,
                   jnp.uint32(0), jnp.uint32(0), jnp.uint32(0), jnp.uint32(0)])
    d = _mul_add_128(a, b, jnp.zeros(8, _U32))
    lo_lo = d[0] | (d[1] << 16)
    lo_hi = d[2] | (d[3] << 16)
    hi_lo = d[4] | (d[5] << 16)
    hi_hi = d[6] | (d[7] << 16)
    return (hi_hi, hi_lo), (lo_hi, lo_lo)


def _mul_32_32(x32, n32):
    """32x32 -> 64 widening multiply: returns (hi32, lo32)."""
    (_, _), (hi, lo) = _mul_64_64_hi_lo(jnp.uint32(0), x32, jnp.uint32(0), n32)
    return hi, lo


def pcg64_integers(stream: PCG64Stream, inc, n: jnp.ndarray):
    """numpy ``Generator.integers(0, n)`` for ranges that fit in 32 bits —
    *buffered 32-bit Lemire* (numpy _bounded_integers.pyx
    ``random_bounded_uint64_fill`` for rng <= 0xFFFFFFFF, i.e.
    ``buffered_bounded_lemire_uint32`` over ``pcg64_next32`` draws):

        m = (uint64) next32 * n;  leftover = (uint32) m
        reject while leftover < (2**32 - n) % n;  result = m >> 32

    The 32-bit buffer persists across calls via the stream state. n == 1
    consumes no draw (numpy's rng == 0 early-out).
    Returns ``(new_stream, value_uint32)``.
    """
    n = n.astype(_U32)

    def no_draw(_):
        return stream, jnp.uint32(0)

    def draw(_):
        threshold = ((jnp.uint32(0xFFFFFFFF) % n) + 1) % n  # (2**32 - n) % n
        st, x = pcg64_next32(stream, inc)
        res, leftover = _mul_32_32(x, n)

        def cond(c):
            _, _, leftover = c
            return leftover < threshold

        def body(c):
            st, _, _ = c
            st, x = pcg64_next32(st, inc)
            res, leftover = _mul_32_32(x, n)
            return st, res, leftover

        st, res, _ = jax.lax.while_loop(cond, body, (st, res, leftover))
        return st, res

    return jax.lax.cond(n <= 1, no_draw, draw, None)


def pcg64_choice(state, inc, n):
    """``Generator.choice(n)`` == ``integers(0, n)`` (numpy _generator.pyx
    choice -> integers for replace=True, p=None)."""
    return pcg64_integers(state, inc, n)


def pcg64_double(stream: PCG64Stream, inc):
    """numpy ``Generator.random()``: one raw 64-bit draw, top 53 bits scaled
    (numpy distributions.c ``next_double``: ``(next_uint64 >> 11) * 2**-53``).
    Bypasses the 32-bit buffer exactly like ``next_uint64`` does. This is what
    ``Generator.choice(a, size, p=...)`` consumes — one double per sample
    (numpy _generator.pyx: ``cdf.searchsorted(self.random(shape), 'right')``).

    Requires x64 mode (the value is a float64 by construction); the parity
    planners run under ``jax.experimental.enable_x64``.
    """
    stream, (hi, lo) = pcg64_next64(stream, inc)
    # (hi * 2**32 + lo) >> 11 == hi * 2**21 + (lo >> 11); both terms < 2**53
    # so the float64 sum is exact.
    hi53 = hi.astype(jnp.float64) * jnp.float64(2097152.0)
    lo53 = (lo >> jnp.uint32(11)).astype(jnp.float64)
    return stream, (hi53 + lo53) * jnp.float64(1.0 / 9007199254740992.0)


class ParityStream:
    """Host-facing wrapper holding a device PCG64 stream, API-compatible with
    the subset of ``np.random.Generator`` the reference planners consume."""

    def __init__(self, seed: int):
        self.stream, self.inc = pcg64_init(seed)

    def integers(self, n: int) -> int:
        self.stream, v = pcg64_integers(self.stream, self.inc, jnp.uint32(n))
        return int(v)

    def choice(self, items):
        items = list(items)
        return items[self.integers(len(items))]
