"""Pallas mesh kernels (ops/mesh_pallas.py) vs the dense XLA sweep:
bit-identical (t, argmin index) and min-t, including the argmin tie rule
(first min wins) and the degenerate-triangle guard."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pathtracer_tpu.ops.intersect import mt_chunk_t
from pathtracer_tpu.ops.mesh_pallas import (
    MESH_PALLAS_MAX_TRIS,
    mesh_min_pallas,
    mesh_nearest_pallas,
    mesh_pallas_wanted,
)


def _rand_scene(n, t, seed=0):
    rng = np.random.RandomState(seed)
    tris = (rng.rand(t, 3, 3).astype(np.float32) * 4 - 2)
    # a couple of degenerate triangles exercise the 1e-12 guard
    tris[1] = tris[1][0]
    o = rng.rand(n, 3).astype(np.float32) * 6 - 3
    d = rng.rand(n, 3).astype(np.float32) - 0.5
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(tris), jnp.asarray(o), jnp.asarray(d)


# On real TPU hardware the kernel is BIT-identical to the dense sweep
# (verified on v5e r5: t, index, and miss pattern all exactly equal at
# N=262k / T up to 5120).  CPU interpret mode compiles the kernel body
# with XLA:CPU whose fma contraction rounds a few ulp differently from
# the eager reference — so here the t comparison carries a tiny rtol
# while the DISCRETE outputs (miss pattern, winner index) stay exact.
# (Grazing hits amplify the one-fma difference through the 1/det factor
# — observed up to ~5e-5 relative on XLA:CPU.)
_CPU_RTOL = 1e-3


def _assert_matches(bt, bi, bt_ref, bi_ref):
    bt, bt_ref = np.asarray(bt), np.asarray(bt_ref)
    miss, miss_ref = bt >= 1e29, bt_ref >= 1e29
    np.testing.assert_array_equal(miss, miss_ref)
    both = ~miss
    np.testing.assert_allclose(bt[both], bt_ref[both], rtol=_CPU_RTOL)
    if bi is not None:
        np.testing.assert_array_equal(
            np.asarray(bi)[both], np.asarray(bi_ref)[both]
        )


@pytest.mark.parametrize("t_count", [64, 130])
def test_nearest_matches_dense(t_count):
    tris, o, d = _rand_scene(512, t_count)
    t_mat = mt_chunk_t(
        o, d, tris[:, 0], tris[:, 1] - tris[:, 0], tris[:, 2] - tris[:, 0],
        1e-4,
    )
    bt_ref = jnp.min(t_mat, axis=-1)
    bi_ref = jnp.argmin(t_mat, axis=-1).astype(jnp.int32)
    bt, bi = mesh_nearest_pallas(tris, o, d, 1e-4, interpret=True)
    _assert_matches(bt, bi, bt_ref, bi_ref)


def test_min_matches_dense():
    tris, o, d = _rand_scene(512, 96, seed=3)
    t_mat = mt_chunk_t(
        o, d, tris[:, 0], tris[:, 1] - tris[:, 0], tris[:, 2] - tris[:, 0],
        1e-4,
    )
    bt = mesh_min_pallas(tris, o, d, 1e-4, interpret=True)
    _assert_matches(bt, None, jnp.min(t_mat, axis=-1), None)


def test_tie_rule_first_min_wins():
    """Two identical triangles: the kernel must report the LOWER index,
    exactly like argmin."""
    tri = np.array(
        [[[-1, -1, 2], [1, -1, 2], [0, 1, 2]]], np.float32
    )
    tris = jnp.asarray(np.concatenate([tri, tri], axis=0))
    o = jnp.zeros((256, 3), jnp.float32)
    d = jnp.asarray(np.tile([0.0, 0.0, 1.0], (256, 1)).astype(np.float32))
    bt, bi = mesh_nearest_pallas(tris, o, d, 1e-4, interpret=True)
    assert np.allclose(np.asarray(bt), 2.0)
    np.testing.assert_array_equal(np.asarray(bi), 0)


def test_eligibility_gate():
    assert not mesh_pallas_wanted(MESH_PALLAS_MAX_TRIS + 1)
    if jax.default_backend() != "tpu":
        assert not mesh_pallas_wanted(64)
