"""Image-file texture mapping (elective, reference README.md:57-58).

The reference vendors the stb_image *reader* (src/stb_image/stb_image.c)
precisely to enable this elective; it never implements the sampling side.
TPU-native design:

* **Atlas in HBM**: every texture referenced by the scene is packed into
  one ``[K, H, W, 3]`` float32 array (padded to the largest image;
  per-texture sizes kept in ``hw``), loaded once and device-resident —
  no per-iteration uploads, static shapes for XLA.
* **Linear-light texels**: PNGs are sRGB-ish; texels are decoded with
  gamma 2.2 at load so albedo modulation happens in linear radiometry
  (the inverse of the save-time gamma, reference image.cpp:40-43).
* **UV from the hit record**: object-space hit position (+ object-space
  normal for meshes) — no extra per-vertex attributes needed:
  - sphere: spherical map of the unit-(r=0.5) object-space point,
  - cube: face-local map (dominant axis of ``|p_obj|`` picks the face),
  - mesh: box map (dominant axis of the object-space normal).
* **Bilinear, wrapping lookup** as four flat ``jnp.take`` gathers — and
  because ``take``'s transpose is a scatter-add, the texel table itself
  is a differentiable leaf: ``jax.grad`` w.r.t. the texture image works
  (inverse texture painting), tested in tests/test_texture.py.

The fused Pallas bounce kernel does not traverse the atlas; scenes with
image textures run the split per-op path (render/common.py gates this).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from pathtracer_tpu.scene.structs import CUBE, MESH, SPHERE, pytree_dataclass


@pytree_dataclass
class TextureAtlas:
    """All image textures of a scene, padded into one array."""

    data: jax.Array  # [K, H, W, 3] float32 linear-light texels
    hw: jax.Array  # [K, 2] float32 (height, width) actually used per slot

    @property
    def count(self) -> int:
        return self.data.shape[0]


def decode_srgb(img_u8: np.ndarray) -> np.ndarray:
    """uint8 RGB(A) -> float32 linear RGB (gamma 2.2 decode)."""
    rgb = np.asarray(img_u8, np.float32)[..., :3] / 255.0
    return rgb**2.2


def build_atlas(images) -> TextureAtlas:
    """Pack decoded float [Hi, Wi, 3] images into one padded atlas."""
    images = [np.asarray(im, np.float32) for im in images]
    if not images:
        raise ValueError("build_atlas needs at least one image")
    h = max(im.shape[0] for im in images)
    w = max(im.shape[1] for im in images)
    data = np.zeros((len(images), h, w, 3), np.float32)
    hw = np.zeros((len(images), 2), np.float32)
    for k, im in enumerate(images):
        data[k, : im.shape[0], : im.shape[1]] = im[..., :3]
        hw[k] = (im.shape[0], im.shape[1])
    return TextureAtlas(data=jnp.asarray(data), hw=jnp.asarray(hw))


def compute_uv(gtype: jax.Array, p_obj: jax.Array, n_obj: jax.Array) -> jax.Array:
    """Per-hit texture coordinates ``[N, 2]`` from the object-space hit.

    ``gtype``: winning geom's type [N] int32.  Branch-free: all three
    parameterizations are evaluated and lane-selected (VPU-friendly, and
    smooth a.e. for gradient flow through ``p_obj``).
    """
    px, py, pz = p_obj[:, 0], p_obj[:, 1], p_obj[:, 2]

    # sphere (unit r=0.5): longitude/latitude
    u_sph = jnp.arctan2(pz, px) / (2.0 * jnp.pi) + 0.5
    v_sph = jnp.arcsin(jnp.clip(py * 2.0, -1.0, 1.0)) / jnp.pi + 0.5

    # cube: face from dominant |p_obj| axis; mesh: box map from dominant
    # |n_obj| axis.  Same three planar projections either way.
    sel = jnp.where(
        (gtype == CUBE)[:, None], jnp.abs(p_obj), jnp.abs(n_obj)
    )
    axis = jnp.argmax(sel, axis=-1)
    u_box = jnp.where(axis == 0, pz, px) + 0.5
    v_box = jnp.where(axis == 2, py, jnp.where(axis == 0, py, pz)) + 0.5

    u = jnp.where(gtype == SPHERE, u_sph, u_box)
    v = jnp.where(gtype == SPHERE, v_sph, v_box)
    return jnp.stack([u, v], axis=-1)


def sample_atlas(atlas: TextureAtlas, tex_id: jax.Array, uv: jax.Array) -> jax.Array:
    """Bilinear, wrapping texel fetch ``[N, 3]``.

    ``tex_id`` [N] float/int (values < 0 return 1.0 = no modulation).
    Four flat gathers; differentiable in both ``uv`` (hit geometry) and
    ``atlas.data`` (the texels).
    """
    k = jnp.clip(tex_id.astype(jnp.int32), 0, atlas.count - 1)
    K, H, W, _ = atlas.data.shape
    hw = jnp.matmul(
        jax.nn.one_hot(k, K, dtype=jnp.float32),
        atlas.hw,
        precision=jax.lax.Precision.HIGHEST,
    )
    h, w = hw[:, 0], hw[:, 1]

    # wrap to [0,1), flip v (image rows go top-down)
    u = uv[:, 0] - jnp.floor(uv[:, 0])
    v = uv[:, 1] - jnp.floor(uv[:, 1])
    fx = u * w - 0.5
    fy = (1.0 - v) * h - 0.5
    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    ax = fx - x0
    ay = fy - y0

    if K * H <= 1024 and W <= 128:
        # Two-stage one-hot fetch (r5, measured on v5e at 262k lanes /
        # 64x64 atlas: 4 row gathers 4.5 ms -> 2.7 ms, and the gathers'
        # layout copies disappear).  Stage 1 fetches the two texture ROWS
        # [N, W*3] as one-hot MXU contractions over the K*H row table
        # (HIGHEST precision => exact texel values); stage 2 selects the
        # x columns with a W-wide one-hot VPU reduce.  A full-resolution
        # one-hot over K*H*W texels measurably LOSES above ~1k rows
        # (ops/intersect.take_rows docstring) — factoring it as
        # (row one-hot) x (column one-hot) keeps both factors tiny.
        # Linear in atlas.data (texel-table gradients ride the matmul
        # transpose, no scatter-add); the final lerp is the same formula
        # as the gather path.
        P = jax.lax.Precision.HIGHEST
        flat_rows = atlas.data.reshape(K * H, W * 3)
        h_safe = jnp.maximum(h, 1.0)
        w_safe = jnp.maximum(w, 1.0)

        def row(yi):
            yi = jnp.mod(yi, h_safe).astype(jnp.int32)
            oh = jax.nn.one_hot(k * H + yi, K * H, dtype=jnp.float32)
            return jnp.matmul(oh, flat_rows, precision=P).reshape(-1, W, 3)

        r0 = row(y0)
        r1 = row(y0 + 1.0)

        def col(r, xi):
            xi = jnp.mod(xi, w_safe).astype(jnp.int32)
            oh = jax.nn.one_hot(xi, W, dtype=jnp.float32)
            return jnp.einsum("nx,nxc->nc", oh, r, precision=P)

        c00 = col(r0, x0)
        c01 = col(r0, x0 + 1.0)
        c10 = col(r1, x0)
        c11 = col(r1, x0 + 1.0)
    else:
        # large atlases: row gathers (a one-hot over the full texel count
        # measurably loses above ~1k rows — ops/intersect.take_rows)
        from pathtracer_tpu.ops.intersect import take_rows

        flat_table = atlas.data.reshape(K * H * W, 3)

        def texel(yi, xi):
            yi = jnp.mod(yi, jnp.maximum(h, 1.0)).astype(jnp.int32)
            xi = jnp.mod(xi, jnp.maximum(w, 1.0)).astype(jnp.int32)
            flat_idx = (k * H + yi) * W + xi
            return take_rows(flat_table, flat_idx)

        c00 = texel(y0, x0)
        c01 = texel(y0, x0 + 1.0)
        c10 = texel(y0 + 1.0, x0)
        c11 = texel(y0 + 1.0, x0 + 1.0)
    top = c00 + (c01 - c00) * ax[:, None]
    bot = c10 + (c11 - c10) * ax[:, None]
    out = top + (bot - top) * ay[:, None]
    return jnp.where((tex_id >= 0.0)[:, None], out, 1.0)
