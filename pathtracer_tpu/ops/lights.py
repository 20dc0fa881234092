"""Area-light sampling for next-event estimation (NEE).

Realizes SURVEY.md §2 component 7, the reference's light-sampling library
(``src/intersections.h:220-286``): ``getRandomPointOnCube`` picks a cube
face with probability proportional to its area then a uniform point on it
(intersections.h:228-258); we keep that exact strategy, vectorized.  For
spheres the reference ships a crude ±z disk lift (intersections.h:265-286,
not area-uniform); we use the correct uniform-area sphere sampling and
note the deviation (the reference's version was a placeholder for the
course).

Light selection across geoms is area-weighted, so the area pdf of a
sampled point is simply ``1 / total_light_area`` — the G-term estimator
in the integrators stays one fused expression.

Everything is differentiable w.r.t. the light transforms: NEE is what
gives the renderer *continuous* gradients w.r.t. object/camera geometry
(the cos·cos/r² form factor), which a pure BSDF+emittance tracer cannot
provide pathwise (its radiance is a.e. piecewise-constant in geometry —
render/diff.py docstring).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pathtracer_tpu.ops.transforms import transform_normal, transform_point
from pathtracer_tpu.scene.structs import CUBE, SPHERE, Geoms, Materials, pytree_dataclass


@pytree_dataclass
class LightSample:
    """A point sampled on scene lights, per ray."""

    position: jax.Array  # [N, 3] world point on the light surface
    normal: jax.Array  # [N, 3] world light-surface normal
    emitted: jax.Array  # [N, 3] color * emittance of the sampled light
    pdf_area: jax.Array  # [N] area-measure pdf (1 / total light area)
    valid: jax.Array  # [N] bool — any light in the scene


def geom_surface_areas(geoms: Geoms) -> jax.Array:
    """World-space surface area per geom ``[G]``.

    Cube: exact under TRS (rotation preserves area).  Sphere: exact for
    uniform scale; Knud Thomsen's ellipsoid approximation (max 1.06%
    error) otherwise.
    """
    # per-axis world scale = column norms of the linear part
    lin = geoms.transform[:, :3, :3]  # [G, 3, 3]
    s = jnp.linalg.norm(lin, axis=1)  # [G, 3] column norms
    sx, sy, sz = s[:, 0], s[:, 1], s[:, 2]
    cube_area = 2.0 * (sx * sy + sy * sz + sz * sx)  # unit cube side 1
    # sphere radius 0.5: semi-axes a,b,c = s/2
    p = 1.6075
    a, b, c = sx / 2, sy / 2, sz / 2
    ellipsoid = 4.0 * jnp.pi * (
        ((a * b) ** p + (b * c) ** p + (c * a) ** p) / 3.0
    ) ** (1.0 / p)
    return jnp.where(geoms.type == SPHERE, ellipsoid, cube_area)


def light_areas(geoms: Geoms, materials: Materials) -> jax.Array:
    """[G] surface area for emissive geoms, 0 for the rest."""
    emissive = materials.emittance[geoms.material_id] > 0.0
    return jnp.where(emissive, geom_surface_areas(geoms), 0.0)


def _sample_unit_cube_surface(u: jax.Array, face_areas: jax.Array):
    """Area-weighted point+normal on the unit cube surface, object space.

    ``u``: [N, 3] uniforms (face choice, 2 surface coords).
    ``face_areas``: [N, 3] world areas of the (x, y, z)-normal face PAIRS —
    the reference's russian-roulette face pick weighted by side area
    (intersections.h:228-258), done in world measure so non-uniform scales
    stay area-correct."""
    total = jnp.sum(face_areas, axis=-1, keepdims=True)
    cdf = jnp.cumsum(face_areas, axis=-1) / jnp.maximum(total, 1e-20)
    pick = u[:, 0:1]
    axis = (pick > cdf[:, 0:1]).astype(jnp.int32) + (pick > cdf[:, 1:2]).astype(
        jnp.int32
    )  # 0,1,2 -> face normal axis
    axis = axis[:, 0]
    side = jnp.where(u[:, 1] < 0.5, -0.5, 0.5)  # which of the pair
    # reuse u1 within its half for the first coord (stretch back to [0,1))
    c1 = jnp.where(u[:, 1] < 0.5, u[:, 1] * 2.0, (u[:, 1] - 0.5) * 2.0) - 0.5
    c2 = u[:, 2] - 0.5
    onehot = jax.nn.one_hot(axis, 3, dtype=u.dtype)  # [N, 3]
    # place (side, c1, c2) into (axis, next, nextnext) slots
    nxt = jax.nn.one_hot((axis + 1) % 3, 3, dtype=u.dtype)
    nxt2 = jax.nn.one_hot((axis + 2) % 3, 3, dtype=u.dtype)
    p = onehot * side[:, None] + nxt * c1[:, None] + nxt2 * c2[:, None]
    n = onehot * jnp.sign(side)[:, None]
    return p, n


def _sample_unit_sphere_surface(u: jax.Array):
    """Uniform point+normal on the radius-0.5 sphere, object space."""
    z = 1.0 - 2.0 * u[:, 1]
    r = jnp.sqrt(jnp.clip(1.0 - z * z, 0.0))
    phi = 2.0 * jnp.pi * u[:, 2]
    n = jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)
    return 0.5 * n, n


def sample_lights(
    geoms: Geoms, materials: Materials, u: jax.Array
) -> LightSample:
    """Sample one light point per ray.  ``u``: [N, 4] uniforms
    (light choice, face/z, coord1, coord2).

    Light selection is area-weighted over all emissive geoms, so
    ``pdf_area = 1 / sum(light areas)`` for every sample."""
    n = u.shape[0]
    areas = light_areas(geoms, materials)  # [G]
    total_area = jnp.sum(areas)
    valid = total_area > 0.0

    # inverse-CDF light pick (area-weighted), detached choice
    cdf = jnp.cumsum(areas) / jnp.maximum(total_area, 1e-20)  # [G]
    pick = jax.lax.stop_gradient(u[:, 0:1])  # [N, 1]
    light_id = jnp.sum(
        (pick > jax.lax.stop_gradient(cdf)[None, :]).astype(jnp.int32), axis=-1
    )
    light_id = jnp.clip(light_id, 0, geoms.count - 1)
    onehot = jax.nn.one_hot(light_id, geoms.count, dtype=u.dtype)  # [N, G]

    from pathtracer_tpu.ops.intersect import select_rows

    xf = select_rows(onehot, geoms.transform)  # [N, 4, 4]
    inv = select_rows(onehot, geoms.inv_transform)
    is_sphere = (onehot @ (geoms.type == SPHERE).astype(u.dtype)) > 0.5

    # world face-pair areas for the picked cube light (for face weighting)
    lin = xf[:, :3, :3]
    s = jnp.linalg.norm(lin, axis=1)  # [N, 3] per-axis world scale
    face_pairs = 2.0 * jnp.stack(
        [s[:, 1] * s[:, 2], s[:, 0] * s[:, 2], s[:, 0] * s[:, 1]], axis=-1
    )

    p_cube, n_cube = _sample_unit_cube_surface(u[:, 1:4], face_pairs)
    p_sph, n_sph = _sample_unit_sphere_surface(u[:, 1:4])
    p_obj = jnp.where(is_sphere[:, None], p_sph, p_cube)
    n_obj = jnp.where(is_sphere[:, None], n_sph, n_cube)

    p_world = transform_point(xf, p_obj)
    n_world = transform_normal(inv, n_obj)

    # per-geom emitted radiance table (G-sized gather: trivially cheap),
    # then the same one-hot row selection as everything else
    emit_g = (
        materials.color[geoms.material_id]
        * materials.emittance[geoms.material_id][:, None]
    )  # [G, 3]
    emit_color = select_rows(onehot, emit_g)

    pdf = jnp.where(valid, 1.0 / jnp.maximum(total_area, 1e-20), 0.0)
    return LightSample(
        position=p_world,
        normal=n_world,
        emitted=emit_color,
        pdf_area=jnp.full((n,), 1.0) * pdf,
        valid=jnp.full((n,), valid),
    )
