"""TRS transform construction, batched and differentiable.

Matches the reference's conventions exactly (``src/utilities.cpp:70-77``):
angles are in **degrees** and the rotation order is ``T @ Rx @ Ry @ Rz @ S``
(X applied last when reading right-to-left onto the object).  Unlike the
reference we compute the inverse analytically (S^-1 Rz^T Ry^T Rx^T T^-1)
instead of a generic 4x4 inverse — cheaper, more accurate, and
differentiable without a linear solve.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _rot_axis_mats(angle_deg: jax.Array):
    """cos/sin for a batch of angles given in degrees."""
    rad = jnp.deg2rad(angle_deg)
    return jnp.cos(rad), jnp.sin(rad)


def build_transform(translation, rotation_deg, scale):
    """Build (transform, inverse) 4x4 pairs.

    Args are ``[..., 3]`` arrays; returns ``([..., 4, 4], [..., 4, 4])``.
    Rotation convention: ``R = Rx @ Ry @ Rz`` with degrees, matching
    ``utilityCore::buildTransformationMatrix`` (``src/utilities.cpp:70-77``).
    """
    translation = jnp.asarray(translation, jnp.float32)
    rotation_deg = jnp.asarray(rotation_deg, jnp.float32)
    scale = jnp.asarray(scale, jnp.float32)

    cx, sx = _rot_axis_mats(rotation_deg[..., 0])
    cy, sy = _rot_axis_mats(rotation_deg[..., 1])
    cz, sz = _rot_axis_mats(rotation_deg[..., 2])

    zero = jnp.zeros_like(cx)
    one = jnp.ones_like(cx)

    def mat3(rows):
        # rows: 3 lists of 3 batched scalars -> [..., 3, 3]
        return jnp.stack(
            [jnp.stack(r, axis=-1) for r in rows], axis=-2
        )

    rx = mat3([[one, zero, zero], [zero, cx, -sx], [zero, sx, cx]])
    ry = mat3([[cy, zero, sy], [zero, one, zero], [-sy, zero, cy]])
    rz = mat3([[cz, -sz, zero], [sz, cz, zero], [zero, zero, one]])

    hp = jax.lax.Precision.HIGHEST  # fp32 even on the TPU MXU
    r = jnp.matmul(jnp.matmul(rx, ry, precision=hp), rz, precision=hp)

    # M3 = R @ diag(scale); rows scaled columnwise
    m3 = r * scale[..., None, :]

    batch = cx.shape
    m = jnp.zeros(batch + (4, 4), jnp.float32)
    m = m.at[..., :3, :3].set(m3)
    m = m.at[..., :3, 3].set(translation)
    m = m.at[..., 3, 3].set(1.0)

    # inverse: S^-1 @ R^T applied to (p - t)
    rt = jnp.swapaxes(r, -1, -2)
    inv3 = rt / scale[..., :, None]
    inv_t = -mat3_apply(inv3, translation)
    minv = jnp.zeros(batch + (4, 4), jnp.float32)
    minv = minv.at[..., :3, :3].set(inv3)
    minv = minv.at[..., :3, 3].set(inv_t)
    minv = minv.at[..., 3, 3].set(1.0)
    return m, minv


def build_transform_batch(translations, rotations_deg, scales):
    """Alias for :func:`build_transform` over a leading geometry axis."""
    return build_transform(translations, rotations_deg, scales)


def mat3_apply(m: jax.Array, v: jax.Array) -> jax.Array:
    """``m[..., 3, 3] @ v[..., 3]`` as explicit fp32 multiply-adds.

    Deliberately NOT an einsum/dot: on TPU, dot_general defaults to
    bfloat16 MXU passes (which wrecks intersection precision — visible as
    ring-shaped surface acne) and pads the 3-dim to the 128-wide systolic
    array.  Written elementwise it runs on the VPU in full fp32 and fuses
    with neighboring ops.  Supports broadcasting between the batch dims of
    ``m`` and ``v``.
    """
    return jnp.stack(
        [
            m[..., i, 0] * v[..., 0] + m[..., i, 1] * v[..., 1] + m[..., i, 2] * v[..., 2]
            for i in range(3)
        ],
        axis=-1,
    )


def mat3_apply_t(m: jax.Array, v: jax.Array) -> jax.Array:
    """``m[..., :3, :3].T @ v`` (transpose apply), same VPU rationale as
    :func:`mat3_apply`."""
    return jnp.stack(
        [
            m[..., 0, i] * v[..., 0] + m[..., 1, i] * v[..., 1] + m[..., 2, i] * v[..., 2]
            for i in range(3)
        ],
        axis=-1,
    )


def transform_point(m: jax.Array, p: jax.Array) -> jax.Array:
    """Apply a 4x4 (or batch) to points ``[..., 3]`` with w=1.
    Analog of ``multiplyMV`` (``src/intersections.h:53-59``)."""
    return mat3_apply(m, p) + m[..., :3, 3]


def transform_dir(m: jax.Array, d: jax.Array) -> jax.Array:
    """Apply a 4x4 (or batch) to directions ``[..., 3]`` with w=0."""
    return mat3_apply(m, d)


def transform_normal(inv_m: jax.Array, n_obj: jax.Array) -> jax.Array:
    """Object-space normal -> normalized world-space normal via the
    inverse-transpose.  (The reference multiplies by the forward transform,
    ``src/intersections.h:162`` — correct only for axis-aligned normals or
    uniform scales; we use the mathematically correct form, which agrees
    with the reference on its own scenes.)"""
    n = mat3_apply_t(inv_m, n_obj)
    return n / jnp.linalg.norm(n, axis=-1, keepdims=True).clip(1e-12)
