"""Multi-device tests on the 8-way virtual CPU mesh (SURVEY.md §4.5):
sharded render == single-device render, layout round-trips, ray counts."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pathtracer_tpu.config import RenderConfig
from pathtracer_tpu.parallel.mesh import make_mesh
from pathtracer_tpu.parallel.sharded import (
    gather_image,
    make_accum,
    render_sharded,
)
from pathtracer_tpu.render.integrator import render


@pytest.fixture(scope="module")
def mesh():
    assert jax.device_count() == 8, "conftest must provide 8 virtual devices"
    return make_mesh()


def test_gather_image_layout(mesh):
    n_dev = 8
    n = 32
    # accum row d*(N/D)+j  holds pixel d + D*j
    acc = np.zeros((n, 3), np.float32)
    for d in range(n_dev):
        for j in range(n // n_dev):
            acc[d * (n // n_dev) + j] = d + n_dev * j
    img = np.asarray(gather_image(jnp.asarray(acc), mesh))
    np.testing.assert_allclose(img[:, 0], np.arange(n))


def test_make_accum_divisibility(mesh):
    with pytest.raises(ValueError):
        make_accum(30, mesh)
    a = make_accum(64, mesh)
    assert a.shape == (64, 3)


def test_sharded_equals_single_device(cornell_scene, mesh):
    """The money test: 8-device strided wavefront render reproduces the
    single-device image exactly (same sample set, per-pixel sums)."""
    sc = dataclasses.replace(
        cornell_scene,
        camera=dataclasses.replace(cornell_scene.camera, resolution=(32, 32)),
    )
    cfg = RenderConfig(wavefront=True, max_depth=5, iters_per_launch=8,
                       wavefront_capacity=1 << 10)
    img1, acc1, st1 = render(sc, 16, cfg)
    img8, acc8, st8 = render_sharded(sc, 16, cfg, mesh=mesh)
    assert st1["rays_traced"] == st8["rays_traced"]
    np.testing.assert_allclose(
        np.asarray(img1), np.asarray(img8), rtol=2e-4, atol=2e-4
    )
    flat1 = np.asarray(acc1)
    flat8 = np.asarray(gather_image(acc8, mesh))
    np.testing.assert_allclose(flat1, flat8, rtol=2e-4, atol=2e-4)


def test_sharded_deterministic(cornell_scene, mesh):
    sc = dataclasses.replace(
        cornell_scene,
        camera=dataclasses.replace(cornell_scene.camera, resolution=(16, 16)),
    )
    cfg = RenderConfig(wavefront=True, max_depth=4, iters_per_launch=4,
                       wavefront_capacity=1 << 8)
    _, a1, _ = render_sharded(sc, 4, cfg, mesh=mesh)
    _, a2, _ = render_sharded(sc, 4, cfg, mesh=mesh)
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
