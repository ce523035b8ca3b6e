"""Property tests for the one-hot arena ops — exact equivalence with
advanced indexing on random inputs (these now carry every planner's arena
access, so the equivalence must hold for every dtype/shape combination in
use)."""
import jax
import jax.numpy as jnp
import numpy as np

from rl_agents_tpu.ops.onehot import (
    gather_rows,
    gather_rows_tree,
    onehot,
    row_onehot,
    scatter_rows,
    select_row,
    set_row,
)

N, B = 13, 7


def _arrays(rng):
    return {
        "f32": jnp.asarray(rng.standard_normal((N, B)), jnp.float32),
        "i32": jnp.asarray(rng.integers(-5, 5, (N, B)), jnp.int32),
        "bool": jnp.asarray(rng.integers(0, 2, (N, B)).astype(bool)),
        "f32_3d": jnp.asarray(rng.standard_normal((N, B, 3)), jnp.float32),
    }


def test_gather_rows_matches_advanced_indexing():
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, N, B), jnp.int32)
    oh = row_onehot(idx, N)
    iota = jnp.arange(B)
    for name, arr in _arrays(rng).items():
        expected = np.asarray(arr)[np.asarray(idx), np.asarray(iota)]
        np.testing.assert_array_equal(np.asarray(gather_rows(arr, oh)),
                                      expected, err_msg=name)


def test_scatter_rows_matches_advanced_indexing():
    rng = np.random.default_rng(1)
    idx = jnp.asarray(rng.integers(0, N, B), jnp.int32)
    oh = row_onehot(idx, N)
    arr = jnp.asarray(rng.standard_normal((N, B)), jnp.float32)
    val = jnp.asarray(rng.standard_normal(B), jnp.float32)
    expected = np.asarray(arr).copy()
    expected[np.asarray(idx), np.arange(B)] = np.asarray(val)
    np.testing.assert_array_equal(np.asarray(scatter_rows(arr, oh, val)), expected)


def test_gather_rows_tree():
    rng = np.random.default_rng(2)
    idx = jnp.asarray(rng.integers(0, N, B), jnp.int32)
    oh = row_onehot(idx, N)
    tree = _arrays(rng)
    out = gather_rows_tree(tree, oh)
    for name, arr in tree.items():
        expected = np.asarray(arr)[np.asarray(idx), np.arange(B)]
        np.testing.assert_array_equal(np.asarray(out[name]), expected)


def test_scalar_variants_match_and_vmap():
    """select_row/set_row == arr[idx] / arr.at[idx].set, standalone AND under
    vmap (the path every single-tree planner takes to the batched form)."""
    rng = np.random.default_rng(3)
    arr = jnp.asarray(rng.standard_normal((B, N, 4)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, N, B), jnp.int32)
    val = jnp.asarray(rng.standard_normal((B, 4)), jnp.float32)

    # scalar (single-tree) form
    got = select_row(arr[0], onehot(idx[0], N))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(arr)[0, int(idx[0])])
    got_set = set_row(arr[0], onehot(idx[0], N), val[0])
    expected = np.asarray(arr)[0].copy()
    expected[int(idx[0])] = np.asarray(val)[0]
    np.testing.assert_array_equal(np.asarray(got_set), expected)

    # vmapped over the batch axis — what a tree-batch planner executes
    got_b = jax.vmap(lambda a, i: select_row(a, onehot(i, N)))(arr, idx)
    expected_b = np.asarray(arr)[np.arange(B), np.asarray(idx)]
    np.testing.assert_array_equal(np.asarray(got_b), expected_b)

    got_sb = jax.vmap(lambda a, i, v: set_row(a, onehot(i, N), v))(arr, idx, val)
    expected_sb = np.asarray(arr).copy()
    expected_sb[np.arange(B), np.asarray(idx)] = np.asarray(val)
    np.testing.assert_array_equal(np.asarray(got_sb), expected_sb)


def test_bool_and_int_select():
    rng = np.random.default_rng(4)
    for dtype, gen in [(bool, lambda: rng.integers(0, 2, (N,)).astype(bool)),
                       (np.int32, lambda: rng.integers(-9, 9, (N,)))]:
        arr = jnp.asarray(gen())
        for i in range(N):
            got = select_row(arr, onehot(jnp.int32(i), N))
            assert np.asarray(got) == np.asarray(arr)[i], (dtype, i)


def test_select_action_values_matches_take_along_axis():
    """The DQN-family Q-select (docs/onehot.md: take_along_axis was 70% of a
    bf16 EgoAttention update) is exact vs the gather form, incl. leading
    batch dims and under grad."""
    import jax

    from rl_agents_tpu.ops.onehot import select_action_values

    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (64, 5))
    a = jax.random.randint(key, (64,), 0, 5)
    expect = jnp.take_along_axis(q, a[:, None], axis=1)[:, 0]
    np.testing.assert_array_equal(np.asarray(select_action_values(q, a)),
                                  np.asarray(expect))
    # leading batch dims broadcast through the ellipsis contract
    q3 = jax.random.normal(key, (4, 8, 3))
    a3 = jax.random.randint(key, (4, 8), 0, 3)
    expect3 = jnp.take_along_axis(q3, a3[..., None], axis=-1)[..., 0]
    np.testing.assert_array_equal(np.asarray(select_action_values(q3, a3)),
                                  np.asarray(expect3))
    # gradient flows only into the selected entries
    g = jax.grad(lambda qq: jnp.sum(select_action_values(qq, a)))(q)
    onehot_mask = (a[:, None] == jnp.arange(5)).astype(jnp.float32)
    np.testing.assert_array_equal(np.asarray(g), np.asarray(onehot_mask))
