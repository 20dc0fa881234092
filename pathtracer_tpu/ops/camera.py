"""Batched camera ray generation.

TPU-native replacement for the per-thread pinhole raycast
(``src/raytraceKernel.cu:40-75``): instead of one CUDA thread computing one
ray, we generate the whole ``[N]`` wavefront of rays as a single vectorized
op.  Conventions match the reference:

* camera basis ``A = view x up``, ``B = A x view`` (raytraceKernel.cu:56-57)
* image-plane half-extents ``H = A * |view| * tan(fovx deg) / |A|`` and
  ``V = B * |view| * tan(-fovy deg) / |B|`` — note the **negated** fovy,
  which makes pixel row 0 the top of the image (raytraceKernel.cu:59-60)
* normalized pixel coords ``sx = x / (w - 1)``, ``sy = y / (h - 1)``
  (raytraceKernel.cu:62-63)
* fovx derived from fovy and aspect via ``atan(tan(fovy) * w / h)``
  (``src/scene.cpp:202-205``) — see :func:`derive_fov`.

Extensions over the reference basecode (assignment-required / elective
features, README.md:45-70): jittered supersampled AA (one uniform jitter
per pixel per iteration) and thin-lens depth of field.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from pathtracer_tpu.scene.structs import Camera, Rays


def derive_fov(fovy_deg: float, width: int, height: int):
    """(fovx, fovy) in degrees, fovx from fovy + aspect (scene.cpp:202-205)."""
    yscaled = math.tan(math.radians(fovy_deg))
    xscaled = yscaled * width / height
    fovx = math.degrees(math.atan(xscaled))
    return (fovx, float(fovy_deg))


def _normalize(v, axis=-1):
    return v / jnp.linalg.norm(v, axis=axis, keepdims=True).clip(1e-12)


def generate_camera_rays(
    camera: Camera,
    pixel_index: jax.Array,
    key: jax.Array,
    jitter: bool = True,
    per_ray_keys: jax.Array | None = None,
    per_ray_uniforms: jax.Array | None = None,
) -> Rays:
    """Generate one primary ray per entry of ``pixel_index``.

    ``pixel_index`` is a flat ``[N] int32`` array of pixel ids
    (``index = x + y * width``, same layout as raytraceKernel.cu:125-128);
    passing an arbitrary subset/permutation supports sharded and wavefront
    regeneration schedules.  ``key`` drives the AA jitter and the lens
    sample; with ``jitter=False`` rays go through pixel centers of the
    reference's (w-1)/(h-1) grid (exact basecode parity).

    ``per_ray_keys`` ([N, 2] uint32, one PRNG key per lane) replaces
    ``key`` for wavefront regeneration, where each lane's randomness must
    be a pure function of its global sample index.
    """
    w, h = camera.width, camera.height
    x = (pixel_index % w).astype(jnp.float32)
    y = (pixel_index // w).astype(jnp.float32)

    if per_ray_uniforms is not None:
        jxy = per_ray_uniforms[:, 0:2] - 0.5
        lens_u = per_ray_uniforms[:, 2:4]
    elif per_ray_keys is not None:
        u4 = jax.vmap(lambda k: jax.random.uniform(k, (4,)))(per_ray_keys)
        jxy = u4[:, 0:2] - 0.5
        lens_u = u4[:, 2:4]
    else:
        k_jit, k_lens = jax.random.split(key)
        jxy = jax.random.uniform(k_jit, (pixel_index.shape[0], 2)) - 0.5
        lens_u = jax.random.uniform(k_lens, (pixel_index.shape[0], 2))
    if jitter:
        # jittered supersampling: uniform in the pixel footprint. The
        # reference grid maps x in [0, w-1] -> sx in [0, 1]; a unit jitter
        # in x is 1/(w-1) in sx, i.e. exactly one pixel pitch.
        x = x + jxy[:, 0]
        y = y + jxy[:, 1]

    sx = x / (w - 1)
    sy = y / (h - 1)

    eye = camera.position
    view = camera.view
    a = jnp.cross(view, camera.up)
    b = jnp.cross(a, view)
    view_len = jnp.linalg.norm(view)
    fov_rad = jnp.deg2rad(camera.fov)
    half_x = _normalize(a) * view_len * jnp.tan(fov_rad[0])
    half_y = _normalize(b) * view_len * jnp.tan(-fov_rad[1])

    mid = eye + view
    point = (
        mid[None, :]
        + (2.0 * sx - 1.0)[:, None] * half_x[None, :]
        + (2.0 * sy - 1.0)[:, None] * half_y[None, :]
    )
    direction = _normalize(point - eye[None, :])
    origin = jnp.broadcast_to(eye[None, :], direction.shape)

    # Thin-lens depth of field (elective feature): sample the aperture disk,
    # keep the focal-plane point fixed. aperture == 0 reduces to pinhole.
    focal = jnp.where(camera.focal_distance > 0, camera.focal_distance, view_len)
    r = jnp.sqrt(lens_u[:, 0]) * camera.aperture
    theta = 2.0 * jnp.pi * lens_u[:, 1]
    lens_offset = (
        (r * jnp.cos(theta))[:, None] * _normalize(a)[None, :]
        + (r * jnp.sin(theta))[:, None] * _normalize(b)[None, :]
    )
    # distance along the ray to the plane at `focal` along the view axis
    cos_to_view = direction @ _normalize(view)
    focus_point = origin + direction * (focal / cos_to_view)[:, None]
    origin_dof = origin + lens_offset
    dir_dof = _normalize(focus_point - origin_dof)

    use_dof = camera.aperture > 0
    origin = jnp.where(use_dof, origin_dof, origin)
    direction = jnp.where(use_dof, dir_dof, direction)
    return Rays(origin=origin, direction=direction)


def all_pixel_indices(camera: Camera) -> jax.Array:
    return jnp.arange(camera.width * camera.height, dtype=jnp.int32)
