"""Golden tests: the device PCG64 stream vs numpy's own bitgenerator.

The reference's RNG protocol is np.random.Generator(PCG64) (reference:
agents/common/seeding.py:18-35); these tests pin our jnp reimplementation to
numpy bit-for-bit — raw 64-bit draws, Lemire bounded integers (what
Generator.integers/choice consume), and the host-facing ParityStream wrapper.
"""
import jax
import jax.numpy as jnp
import numpy as np

from rl_agents_tpu.utils.pcg64 import (
    ParityStream,
    pcg64_choice,
    pcg64_init,
    pcg64_integers,
    pcg64_next64,
)


def _np_raw(seed, n):
    return np.random.PCG64(seed).random_raw(n)


def test_raw_draw_parity():
    for seed in (0, 1, 42, 123456789):
        state, inc = pcg64_init(seed)
        expect = _np_raw(seed, 8)
        for i in range(8):
            state, (hi, lo) = pcg64_next64(state, inc)
            got = (int(hi) << 32) | int(lo)
            assert got == int(expect[i]), (seed, i, hex(got), hex(int(expect[i])))


def test_raw_draw_parity_jitted_scan():
    seed = 7
    state, inc = pcg64_init(seed)

    @jax.jit
    def draw_n(state, inc):
        def body(st, _):
            st, (hi, lo) = pcg64_next64(st, inc)
            return st, (hi, lo)
        _, (his, los) = jax.lax.scan(body, state, None, length=16)
        return his, los

    his, los = draw_n(state, inc)
    got = (np.asarray(his, np.uint64) << np.uint64(32)) | np.asarray(los, np.uint64)
    np.testing.assert_array_equal(got, _np_raw(seed, 16))


def test_lemire_bounded_parity():
    """integers(0, n) parity incl. the rejection path, many n and seeds."""
    for seed in (0, 3, 2024):
        gen = np.random.Generator(np.random.PCG64(seed))
        state, inc = pcg64_init(seed)
        for n in [2, 3, 5, 7, 10, 6, 3, 2, 100, 33, 2, 9]:
            want = int(gen.integers(0, n))
            state, got = pcg64_integers(state, inc, jnp.uint32(n))
            assert int(got) == want, (seed, n, int(got), want)


def test_choice_parity():
    """Generator.choice(arr) == integers(0, len) draw (the tie-break op,
    reference abstract.py:304-311)."""
    seed = 11
    gen = np.random.Generator(np.random.PCG64(seed))
    state, inc = pcg64_init(seed)
    for k in [4, 2, 7, 3, 3, 5]:
        want = int(gen.choice(np.arange(k)))
        state, got = pcg64_choice(state, inc, jnp.uint32(k))
        assert int(got) == want


def test_parity_stream_wrapper():
    seed = 5
    gen = np.random.Generator(np.random.PCG64(seed))
    ps = ParityStream(seed)
    items = ["a", "b", "c", "d"]
    for _ in range(6):
        assert ps.choice(items) == items[int(gen.integers(0, 4))]


def test_batched_streams_vmap():
    """A batch of parity streams is a leading axis — each lane matches its
    own numpy stream."""
    seeds = [0, 1, 2, 3]
    states, incs = zip(*[pcg64_init(s) for s in seeds])
    states = jax.tree.map(lambda *xs: jnp.stack(xs), *states)
    incs = jnp.stack(incs)

    @jax.jit
    def draw(states, incs):
        return jax.vmap(pcg64_next64)(states, incs)

    _, (his, los) = draw(states, incs)
    got = (np.asarray(his, np.uint64) << np.uint64(32)) | np.asarray(los, np.uint64)
    want = np.array([_np_raw(s, 1)[0] for s in seeds])
    np.testing.assert_array_equal(got, want)
