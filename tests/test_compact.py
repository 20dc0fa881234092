"""Stream compaction properties (SURVEY.md §4.2: compaction preserves the
multiset of alive rays)."""

import jax
import jax.numpy as jnp
import numpy as np

from pathtracer_tpu.ops.compact import compact, compaction_indices, partition, sort_by_key_u8


def test_compaction_indices():
    keep = jnp.array([True, False, True, True, False])
    dest, count = compaction_indices(keep)
    assert int(count) == 3
    np.testing.assert_array_equal(np.asarray(dest)[np.asarray(keep)], [0, 1, 2])


def test_compact_preserves_multiset_and_order():
    rng = np.random.default_rng(0)
    vals = rng.normal(size=(257, 3)).astype(np.float32)
    keep = rng.random(257) < 0.4
    out, count = jax.jit(compact)(jnp.asarray(keep), jnp.asarray(vals))
    out = np.asarray(out)
    assert int(count) == keep.sum()
    np.testing.assert_array_equal(out[: int(count)], vals[keep])
    assert (out[int(count) :] == 0).all()


def test_compact_pytree():
    keep = jnp.array([False, True, True])
    tree = {"a": jnp.arange(3), "b": jnp.arange(6).reshape(3, 2)}
    out, count = compact(keep, tree)
    assert int(count) == 2
    np.testing.assert_array_equal(np.asarray(out["a"][:2]), [1, 2])
    np.testing.assert_array_equal(np.asarray(out["b"][:2]), [[2, 3], [4, 5]])


def test_partition_is_permutation():
    rng = np.random.default_rng(1)
    vals = rng.integers(0, 1000, size=501)
    keep = rng.random(501) < 0.7
    out, count = jax.jit(partition)(jnp.asarray(keep), jnp.asarray(vals))
    out = np.asarray(out)
    assert sorted(out.tolist()) == sorted(vals.tolist())  # multiset preserved
    np.testing.assert_array_equal(out[: int(count)], vals[keep])
    np.testing.assert_array_equal(out[int(count) :], vals[~keep])


def test_compact_grad_transparent():
    """d(sum of kept)/d(values) is the keep mask — compaction must be a
    grad-transparent gather."""
    keep = jnp.array([True, False, True, False])

    def f(v):
        out, count = compact(keep, v)
        return out.sum()

    g = jax.grad(f)(jnp.ones(4))
    np.testing.assert_array_equal(np.asarray(g), [1, 0, 1, 0])


def test_sort_by_key():
    key = jnp.array([2, 0, 1, 0, 2], jnp.uint8)
    vals = jnp.arange(5)
    out, order = sort_by_key_u8(key, vals)
    np.testing.assert_array_equal(np.asarray(out), [1, 3, 2, 0, 4])  # stable
