"""BSDF layer tests: sampler moments, reflection/refraction laws, Fresnel
values, energy conservation (SURVEY.md §4.1-4.2)."""

import jax
import jax.numpy as jnp
import numpy as np

from pathtracer_tpu.ops.bsdf import (
    cosine_hemisphere,
    fresnel_dielectric,
    reflect,
    refract,
    uniform_sphere,
)


def _u(key, n):
    return jax.random.uniform(jax.random.PRNGKey(key), (n,))


def test_cosine_hemisphere_moments():
    n = 200_000
    xi1, xi2 = _u(0, n), _u(1, n)
    normal = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (n, 1))
    d = np.asarray(cosine_hemisphere(normal, xi1, xi2))
    # all in upper hemisphere, unit length
    assert (d[:, 2] > -1e-6).all()
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-5)
    # cosine-weighted pdf: E[cos(theta)] = 2/3
    np.testing.assert_allclose(d[:, 2].mean(), 2.0 / 3.0, atol=5e-3)
    # azimuthal symmetry
    np.testing.assert_allclose(d[:, 0].mean(), 0.0, atol=5e-3)
    np.testing.assert_allclose(d[:, 1].mean(), 0.0, atol=5e-3)


def test_cosine_hemisphere_arbitrary_normal():
    n = 50_000
    normal = jnp.tile(jnp.array([[1.0, 1.0, 1.0]]) / np.sqrt(3.0), (n, 1))
    d = np.asarray(cosine_hemisphere(normal, _u(2, n), _u(3, n)))
    cos = d @ np.asarray(normal[0])
    assert (cos > -1e-6).all()
    np.testing.assert_allclose(cos.mean(), 2.0 / 3.0, atol=5e-3)


def test_uniform_sphere_moments():
    n = 200_000
    d = np.asarray(uniform_sphere(_u(4, n), _u(5, n)))
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-5)
    np.testing.assert_allclose(d.mean(axis=0), [0, 0, 0], atol=6e-3)
    # uniform on sphere: E[z^2] = 1/3
    np.testing.assert_allclose((d**2).mean(axis=0), [1 / 3] * 3, atol=6e-3)


def test_reflect_law():
    inc = jnp.array([[1.0, -1.0, 0.0]]) / np.sqrt(2.0)
    n = jnp.array([[0.0, 1.0, 0.0]])
    out = np.asarray(reflect(inc, n))
    np.testing.assert_allclose(out, np.array([[1.0, 1.0, 0.0]]) / np.sqrt(2.0), atol=1e-6)


def test_refract_snell():
    # air -> glass (eta = 1/1.5) at 45 degrees
    inc = jnp.array([[np.sin(np.pi / 4), -np.cos(np.pi / 4), 0.0]], dtype=jnp.float32)
    n = jnp.array([[0.0, 1.0, 0.0]])
    eta = jnp.array([1.0 / 1.5])
    d, valid = refract(inc, n, eta)
    assert bool(valid[0])
    sin_t = float(d[0, 0])
    np.testing.assert_allclose(sin_t, np.sin(np.pi / 4) / 1.5, atol=1e-6)
    assert float(d[0, 1]) < 0  # continues downward


def test_total_internal_reflection():
    # glass -> air beyond critical angle (~41.8 deg for 1.5)
    ang = np.radians(60.0)
    inc = jnp.array([[np.sin(ang), -np.cos(ang), 0.0]], dtype=jnp.float32)
    n = jnp.array([[0.0, 1.0, 0.0]])
    d, valid = refract(inc, n, jnp.array([1.5]))
    assert not bool(valid[0])
    r = fresnel_dielectric(jnp.array([np.cos(ang)], jnp.float32), jnp.array([1.5]), jnp.array([1.0]))
    np.testing.assert_allclose(float(r[0]), 1.0)


def test_fresnel_normal_incidence():
    # R0 = ((n1-n2)/(n1+n2))^2 = 0.04 for 1.0 -> 1.5
    r = fresnel_dielectric(jnp.array([1.0]), jnp.array([1.0]), jnp.array([1.5]))
    np.testing.assert_allclose(float(r[0]), 0.04, atol=1e-6)
    # grazing incidence -> 1
    r = fresnel_dielectric(jnp.array([0.0]), jnp.array([1.0]), jnp.array([1.5]))
    np.testing.assert_allclose(float(r[0]), 1.0, atol=1e-6)


def test_sample_bsdf_energy_conservation(cornell_scene):
    """Throughput multiplier never exceeds 1 per channel for the cornell
    materials (non-emissive surfaces reflect at most what they receive)."""
    from pathtracer_tpu.ops.bsdf import gather_materials, sample_bsdf

    mats = cornell_scene.materials
    n = 4096
    mid = jax.random.randint(jax.random.PRNGKey(0), (n,), 0, mats.count)
    m = gather_materials(mats, mid)
    normal = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (n, 1))
    inc = jnp.tile(jnp.array([[0.6, 0.0, -0.8]]), (n, 1))
    pos = jnp.zeros((n, 3))
    u = jax.random.uniform(jax.random.PRNGKey(1), (n, 3))
    s = sample_bsdf(m, pos, normal, inc, u)
    assert (np.asarray(s.throughput_mult) <= 1.0 + 1e-6).all()
    assert (np.asarray(s.throughput_mult) >= 0.0).all()
    # sampled directions are unit length
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(s.direction), axis=-1), 1.0, atol=1e-4
    )
