"""Camera raycaster tests: reference basis conventions
(raytraceKernel.cu:40-75), jitter bounds, DoF behavior."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from pathtracer_tpu.ops.camera import all_pixel_indices, derive_fov, generate_camera_rays
from pathtracer_tpu.scene.structs import Camera


def _camera(res=(9, 9), eye=(0, 0, 10), view=(0, 0, -1), up=(0, 1, 0), fovy=45.0,
            aperture=0.0, focal=0.0):
    return Camera(
        resolution=res,
        position=jnp.asarray(eye, jnp.float32),
        view=jnp.asarray(view, jnp.float32),
        up=jnp.asarray(up, jnp.float32),
        fov=jnp.asarray(derive_fov(fovy, res[0], res[1]), jnp.float32),
        aperture=jnp.asarray(aperture, jnp.float32),
        focal_distance=jnp.asarray(focal, jnp.float32),
    )


def test_center_pixel_along_view():
    cam = _camera()
    idx = all_pixel_indices(cam)
    rays = generate_camera_rays(cam, idx, jax.random.PRNGKey(0), jitter=False)
    center = 4 + 4 * 9
    np.testing.assert_allclose(np.asarray(rays.direction[center]), [0, 0, -1], atol=1e-6)
    np.testing.assert_allclose(np.asarray(rays.origin[center]), [0, 0, 10], atol=1e-6)


def test_image_orientation():
    """Row 0 is the TOP of the image (the reference's negated fovy,
    raytraceKernel.cu:60) and column 0 is camera-left (+x of A=view x up
    for the default orientation)."""
    cam = _camera()
    idx = all_pixel_indices(cam)
    d = np.asarray(
        generate_camera_rays(cam, idx, jax.random.PRNGKey(0), jitter=False).direction
    ).reshape(9, 9, 3)
    assert d[0, 4, 1] > 0  # top row looks up
    assert d[8, 4, 1] < 0  # bottom row looks down
    # A = view x up = (0,0,-1)x(0,1,0) = (1,0,0): sx=0 => -H => -x
    assert d[4, 0, 0] < 0
    assert d[4, 8, 0] > 0


def test_fov_edges():
    cam = _camera(res=(101, 101), fovy=45.0)
    idx = all_pixel_indices(cam)
    d = np.asarray(
        generate_camera_rays(cam, idx, jax.random.PRNGKey(0), jitter=False).direction
    ).reshape(101, 101, 3)
    # center column, top row: angle from view axis == fovy
    top = d[0, 50]
    ang = np.degrees(np.arctan2(top[1], -top[2]))
    np.testing.assert_allclose(ang, 45.0, atol=1e-3)


def test_jitter_stays_within_pixel():
    cam = _camera(res=(33, 33))
    idx = all_pixel_indices(cam)
    d0 = np.asarray(
        generate_camera_rays(cam, idx, jax.random.PRNGKey(0), jitter=False).direction
    )
    dj = np.asarray(
        generate_camera_rays(cam, idx, jax.random.PRNGKey(0), jitter=True).direction
    )
    # jittered rays differ but only slightly (sub-pixel)
    assert not np.allclose(d0, dj)
    assert np.abs(d0 - dj).max() < 0.05


def test_jitter_varies_by_key():
    cam = _camera(res=(17, 17))
    idx = all_pixel_indices(cam)
    a = np.asarray(generate_camera_rays(cam, idx, jax.random.PRNGKey(1)).direction)
    b = np.asarray(generate_camera_rays(cam, idx, jax.random.PRNGKey(2)).direction)
    assert not np.allclose(a, b)


def test_dof_pinhole_equivalence_and_spread():
    pin = _camera(res=(17, 17))
    lens = _camera(res=(17, 17), aperture=0.5, focal=10.0)
    idx = all_pixel_indices(pin)
    key = jax.random.PRNGKey(3)
    rp = generate_camera_rays(pin, idx, key, jitter=False)
    rl = generate_camera_rays(lens, idx, key, jitter=False)
    # aperture>0: origins spread over the lens disk
    spread = np.asarray(rl.origin) - np.asarray(rp.origin)
    assert np.abs(spread).max() <= 0.5 + 1e-5
    assert np.abs(spread).max() > 0.05
    # both pass through the same focal point (center pixel)
    c = 8 + 8 * 17
    fp_pin = np.asarray(rp.origin[c] + 10.0 * rp.direction[c])
    t = (10.0 - float(rl.origin[c][2] - pin.position[2]) - 10.0)  # z from origin
    # solve for the lens ray's point at the focal plane z = 0
    oz = float(rl.origin[c][2])
    dz = float(rl.direction[c][2])
    s = (fp_pin[2] - oz) / dz
    fp_lens = np.asarray(rl.origin[c]) + s * np.asarray(rl.direction[c])
    np.testing.assert_allclose(fp_lens, fp_pin, atol=1e-4)


def test_per_ray_keys_match_shapes():
    cam = _camera(res=(8, 4))
    idx = all_pixel_indices(cam)
    keys = jax.vmap(lambda s: jax.random.fold_in(jax.random.PRNGKey(0), s))(idx)
    r = generate_camera_rays(cam, idx, None, jitter=True, per_ray_keys=keys)
    assert r.origin.shape == (32, 3)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(r.direction), axis=-1), 1.0, atol=1e-5
    )
