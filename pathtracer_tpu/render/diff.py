"""Differentiable rendering (inverse graphics) — no reference analog.

The reference is forward-only; this module is the capability named in the
north star: gradients of a pixel loss w.r.t. material colors/emittance,
object TRS transforms, and camera parameters, through the full bounce
loop.

Design (SURVEY.md §3.5 / §7 hard parts):

* **Engine**: the fixed-depth ``lax.scan`` megakernel — reverse-mode
  differentiable; the ``while_loop`` wavefront engine is forward-only.
* **Parameters**: a float-only pytree (:class:`SceneParams`) split from
  the static integer structure (:class:`SceneStatic`).  Transforms are
  rebuilt from TRS inside the differentiated function, so gradients flow
  to translation/rotation/scale directly (not to raw matrices).
* **Detached sampling**: discrete decisions (lobe choice, RR) are taken
  on ``stop_gradient`` values inside the BSDF; everything continuous —
  throughput, Fresnel weights, emittance, hit positions/normals via the
  intersection ``t`` — carries pathwise gradients.  The estimator is
  a.e.-smooth in params for a fixed RNG key, so ``jax.grad`` matches
  central finite differences away from visibility discontinuities
  (verified in tests/test_grad.py).
* **Memory**: one ``jax.checkpoint`` per progressive iteration: residuals
  are O(pixels · depth) for one iteration, not O(pixels · depth · spp).
* **Multi-device**: ``loss_and_grad_sharded`` shard_maps the same step
  over the pixel mesh and ``psum``s the parameter gradients; XLA overlaps
  the all-reduce with backward compute.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from pathtracer_tpu.config import RenderConfig
from pathtracer_tpu.ops.transforms import build_transform
from pathtracer_tpu.scene.structs import (
    Camera,
    Geoms,
    Materials,
    Scene,
    pytree_dataclass,
)


@pytree_dataclass
class SceneParams:
    """Every differentiable leaf of a scene."""

    materials: Materials
    translations: jax.Array  # [G, 3]
    rotations: jax.Array  # [G, 3] degrees
    scales: jax.Array  # [G, 3]
    cam_position: jax.Array  # [3]
    cam_view: jax.Array  # [3]
    cam_up: jax.Array  # [3]
    cam_fov: jax.Array  # [2]
    cam_aperture: jax.Array  # []
    cam_focal: jax.Array  # []
    mesh_verts: tuple = ()  # tuple of [T, 3, 3] object-space vertices, one
    # per MESH geom (gradients flow to vertices AND, via TRS, to the
    # instance transform) — realizes the reference's MESH branch
    # (raytraceKernel.cu:144-145) in differentiable mode
    textures: object = None  # ops/texture.TextureAtlas or None — the texel
    # table is itself a differentiable leaf (inverse texture painting)


@dataclasses.dataclass(frozen=True)
class SceneStatic:
    """The non-differentiable scene structure (static under jit)."""

    geom_type: tuple  # ints
    geom_material: tuple  # ints
    resolution: tuple
    mesh_geom_indices: tuple = ()  # geom slot of each mesh_verts entry
    # content-hash keys into _ACCEL_CACHE (None = dense sweep), one per
    # mesh_verts entry — keeps SceneStatic hashable while letting diff
    # mode traverse the LBVH (VERDICT r2 weak #2)
    mesh_accel_keys: tuple = ()


# host-built LBVHs over the DETACHED initial mesh vertices, keyed by a
# content hash so SceneStatic stays hashable (it keys the lru-cached
# executables).  Strong refs on purpose: the accel arrays are closed over
# as jit constants and must outlive the compiled executable.
#
# Measured (TPU, r3): the LBVH's wavefront-granularity chunk culling only
# pays when most of the wavefront can skip a chunk; for an in-frame
# 5120-tri icosphere at 200x200 the accel'd diff step is ~10% SLOWER
# (674 vs 591 ms) because nearly every chunk has >= 1 of 40k rays
# reaching its AABB.  It wins when the mesh is often missed (off-frame,
# shadow rays away from it) and on CPU.  Kept wired (capability parity +
# exact-match tests); the raw mesh-sweep speed is addressed separately
# (Pallas mesh kernel).
#
# Staleness: NONE (r4).  Only the Morton chunk GROUPING is cached; the
# triangle copies and chunk/root AABBs are rebound to the live vertices
# inside the traced graph on every step (ops/accel.refresh_accel via
# build_scene), so winners cannot be silently missed under vertex
# optimization — arbitrary drift only loosens the (stale-order) chunk
# AABBs, degrading culling, not correctness.  Re-calling
# params_from_description after large drift is now purely a PERF
# refresh (tighter Morton order), never a correctness requirement.
_ACCEL_CACHE: dict = {}


def _accel_key_for(verts) -> str:
    import hashlib

    import numpy as np

    a = np.ascontiguousarray(np.asarray(verts, np.float32))
    return f"{a.shape[0]}-{hashlib.sha1(a.tobytes()).hexdigest()[:16]}"


def params_from_description(desc, frame: int = 0, accel: bool = True):
    """SceneDescription -> (SceneParams, SceneStatic).

    ``accel=True`` builds a host-side LBVH over each big mesh's (detached)
    initial vertices so diff-mode winner searches traverse chunks instead
    of dense-scanning all triangles; see :data:`_ACCEL_CACHE` for the
    staleness contract under vertex optimization."""
    from pathtracer_tpu.ops.camera import derive_fov
    from pathtracer_tpu.scene.structs import ACCEL_MIN_TRIS

    mesh_tris = desc.mesh_tris_for_frame(frame)
    mesh_verts = tuple(
        jnp.asarray(t, jnp.float32) for t in mesh_tris if t is not None
    )
    mesh_accel_keys = []
    for t in mesh_tris:
        if t is None:
            continue
        if not accel or len(t) < ACCEL_MIN_TRIS:
            mesh_accel_keys.append(None)
            continue
        key = _accel_key_for(t)
        if key not in _ACCEL_CACHE:
            from pathtracer_tpu.ops.accel import build_mesh_accel

            _ACCEL_CACHE[key] = build_mesh_accel(t)
        mesh_accel_keys.append(key)
    atlas = None
    if desc.texture_images:
        from pathtracer_tpu.ops.texture import build_atlas

        atlas = build_atlas(desc.texture_images)
    mesh_geom_indices = tuple(
        g for g, t in enumerate(mesh_tris) if t is not None
    )

    mats = Materials(
        **{k: jnp.asarray(v, jnp.float32) for k, v in desc.materials.items()}
    )
    params = SceneParams(
        materials=mats,
        translations=jnp.asarray(desc.translations[frame], jnp.float32),
        rotations=jnp.asarray(desc.rotations[frame], jnp.float32),
        scales=jnp.asarray(desc.scales[frame], jnp.float32),
        cam_position=jnp.asarray(desc.eye[frame], jnp.float32),
        cam_view=jnp.asarray(desc.view[frame], jnp.float32),
        cam_up=jnp.asarray(desc.up[frame], jnp.float32),
        cam_fov=jnp.asarray(
            derive_fov(desc.fovy, desc.resolution[0], desc.resolution[1]), jnp.float32
        ),
        cam_aperture=jnp.asarray(desc.aperture, jnp.float32),
        cam_focal=jnp.asarray(desc.focal_distance, jnp.float32),
        mesh_verts=mesh_verts,
        textures=atlas,
    )
    static = SceneStatic(
        geom_type=tuple(int(t) for t in desc.geom_type),
        geom_material=tuple(int(m) for m in desc.geom_material),
        resolution=tuple(desc.resolution),
        mesh_geom_indices=mesh_geom_indices,
        mesh_accel_keys=tuple(mesh_accel_keys),
    )
    return params, static


def build_scene(params: SceneParams, static: SceneStatic) -> Scene:
    """Differentiable scene assembly: TRS -> matrices inside the graph.

    Mesh instances carry the host-built LBVH over their DETACHED initial
    vertices (``static.mesh_accel_keys`` -> :data:`_ACCEL_CACHE`): the
    stop-gradiented winner search traverses chunks instead of dense-
    scanning all triangles, while the differentiable per-winning-triangle
    recompute gathers from the live ``tri_verts`` in file order
    (ops/intersect.py lean path) so vertex gradients are unchanged."""
    from pathtracer_tpu.scene.structs import MeshInstance

    t, inv = build_transform(params.translations, params.rotations, params.scales)
    geoms = Geoms(
        type=jnp.asarray(static.geom_type, jnp.int32),
        material_id=jnp.asarray(static.geom_material, jnp.int32),
        transform=t,
        inv_transform=inv,
    )
    cam = Camera(
        resolution=static.resolution,
        position=params.cam_position,
        view=params.cam_view,
        up=params.cam_up,
        fov=params.cam_fov,
        aperture=params.cam_aperture,
        focal_distance=params.cam_focal,
    )
    from pathtracer_tpu.ops.accel import refresh_accel

    keys = static.mesh_accel_keys or (None,) * len(static.mesh_geom_indices)
    meshes = tuple(
        MeshInstance(
            geom_index=gi,
            tri_verts=v,
            # the LBVH's Morton grouping is cached; its triangle copies
            # and AABBs are rebound to the LIVE vertices every step, so
            # a vertex optimization can never silently miss winners
            # (ops/accel.refresh_accel — the r3 staleness contract made
            # automatic)
            # .get: a SceneStatic can outlive the process-local cache
            # (pickled static, module reload) — a cold cache degrades to
            # the dense sweep instead of raising (ADVICE r4)
            accel=(
                refresh_accel(_ACCEL_CACHE[k], v)
                if k and _ACCEL_CACHE.get(k) is not None
                else None
            ),
        )
        for gi, v, k in zip(static.mesh_geom_indices, params.mesh_verts, keys)
    )
    return Scene(
        geoms=geoms,
        materials=params.materials,
        camera=cam,
        meshes=meshes,
        textures=params.textures,
    )


def render_linear_rays(
    params: SceneParams,
    static: SceneStatic,
    spp: int,
    base_key: jax.Array,
    cfg: RenderConfig,
    pixel_index: jax.Array | None = None,
    n_global_pixels: int | None = None,
):
    """Differentiable *linear* (pre-tonemap) image estimate ``[N, 3]`` —
    the mean of ``spp`` progressive samples — plus the **measured** number
    of rays traced in one forward pass (primary + bounce + shadow; the
    same counter the forward engines report).  Linear radiance, because
    the gamma curve has unbounded gradient at 0 (use :func:`tonemap`
    outside the loss if display-space loss is really wanted).

    Engine split (the round-2 fwd+bwd speed work):

    * **Backward** always linearizes the gradient-lean XLA graph
      (``grad_lean=True``: stop-gradient winner search — on the fused
      Pallas kernel when on TPU — + O(N) winner-only recompute).
    * **Primal forward** on TPU additionally runs the fast forward path
      (fused Pallas bounce kernel) under a ``jax.custom_vjp`` whose bwd
      re-traces the lean graph — the two paths are RNG-bit-compatible and
      formula-identical, so this is exactly ``jax.checkpoint`` with a
      ~10x faster primal.
    """
    from pathtracer_tpu.render.integrator import render_sample

    cfg_bwd = dataclasses.replace(cfg, fused=False, grad_lean=True, debug=False)
    scene = build_scene(params, static)
    if pixel_index is None:
        w, h = static.resolution
        pixel_index = jax.lax.iota(jnp.int32, w * h)
    n_glob = n_global_pixels

    from pathtracer_tpu.render.common import fused_diff_eligible

    if fused_diff_eligible(scene, cfg_bwd):
        # Fused-diff engine (ops/bounce_grad.py): the primal IS the fused
        # Pallas kernel and the backward IS the Pallas vjp kernel — no
        # sample-level custom_vjp or lean re-trace needed.  The bounce
        # custom_vjp saves its carries per bounce (~16 planes x depth);
        # for big spp a per-iteration checkpoint bounds that to one
        # iteration (recompute = the fast fused forward).
        if spp > 8:
            @jax.checkpoint
            def sample(scene, pix, it, key):
                return render_sample(
                    scene, pix, it, key, cfg_bwd, n_global_pixels=n_glob
                )
        else:
            def sample(scene, pix, it, key):
                return render_sample(
                    scene, pix, it, key, cfg_bwd, n_global_pixels=n_glob
                )
    elif jax.default_backend() == "tpu" and cfg.fast_rng:
        cfg_fwd = dataclasses.replace(cfg, grad_lean=False, debug=False)

        @jax.custom_vjp
        def sample(scene, pix, it, key):
            return render_sample(scene, pix, it, key, cfg_fwd, n_global_pixels=n_glob)

        def sample_fwd(scene, pix, it, key):
            return sample(scene, pix, it, key), (scene, pix, it, key)

        def sample_bwd(res, g):
            scene, pix, it, key = res
            g_rad, _g_nrays = g
            _, vjp = jax.vjp(
                lambda s: render_sample(
                    s, pix, it, key, cfg_bwd, n_global_pixels=n_glob
                )[0],
                scene,
            )
            (g_scene,) = vjp(g_rad)
            return g_scene, None, None, None

        sample.defvjp(sample_fwd, sample_bwd)
    else:
        # CPU / slow-RNG: lean graph for both primal and backward, with
        # one rematerialization per progressive iteration
        @jax.checkpoint
        def sample(scene, pix, it, key):
            return render_sample(scene, pix, it, key, cfg_bwd, n_global_pixels=n_glob)

    # ---- measured and REJECTED: spp batching.  Both RNG paths are pure
    # functions of the per-ray global sample index (common.py:37-59), so
    # tracing several progressive iterations as one wide wavefront (tile
    # the pixel list, vary `iteration` per ray) is bit-exact per sample
    # and cuts HLO op count by the group factor.  Tried 2026-08-20 on
    # v5e against the per-op-overhead hypothesis (profile: ~45k leaf HLO
    # ops/step, no single op >4%): 800x800 gspp=4 regressed 329->463 ms
    # and even the small-image niche 256x256 spp=16 regressed 117->134
    # (group 4) ->160 ms (group 16), identical loss values.  The lean
    # backward is HBM-bandwidth-bound, and 4x-wider fusions made XLA's
    # layouts/pipelining worse, not better — keep one iteration per scan
    # step.  (Decomposition, same config: 57 ms fused primal + ~123 ms
    # per-bounce remat recompute + ~150 ms transpose; bounce-scan
    # unroll=8 bought 12% for 128 s of compile — also rejected.)
    def one_iter(carry, it):
        acc, nrays = carry
        radiance, n = sample(scene, pixel_index, it, base_key)
        return (acc + radiance, nrays + n), None

    (total, rays), _ = jax.lax.scan(
        one_iter,
        (jnp.zeros((pixel_index.shape[0], 3), jnp.float32), jnp.float32(0.0)),
        jax.lax.iota(jnp.int32, spp),
    )
    return total / spp, rays


def render_linear(
    params: SceneParams,
    static: SceneStatic,
    spp: int,
    base_key: jax.Array,
    cfg: RenderConfig,
    pixel_index: jax.Array | None = None,
    n_global_pixels: int | None = None,
) -> jax.Array:
    """:func:`render_linear_rays` without the ray counter."""
    return render_linear_rays(
        params, static, spp, base_key, cfg, pixel_index, n_global_pixels
    )[0]


def l2_loss_rays(
    params: SceneParams,
    static: SceneStatic,
    target: jax.Array,
    spp: int,
    base_key: jax.Array,
    cfg: RenderConfig,
    pixel_index=None,
    n_global_pixels=None,
):
    """``(MSE vs target linear image [N, 3], measured forward rays)``."""
    img, rays = render_linear_rays(
        params, static, spp, base_key, cfg, pixel_index, n_global_pixels
    )
    return jnp.mean((img - target) ** 2), rays


def l2_loss(
    params: SceneParams,
    static: SceneStatic,
    target: jax.Array,
    spp: int,
    base_key: jax.Array,
    cfg: RenderConfig,
    pixel_index=None,
    n_global_pixels=None,
):
    """Mean squared error against a target linear image ``[N, 3]``."""
    return l2_loss_rays(
        params, static, target, spp, base_key, cfg, pixel_index, n_global_pixels
    )[0]


# every optional physics block shade_bounce knows how to materialize —
# the safe superset (enabling a feature no material uses is an exact
# no-op on the image; DROPPING a used one is not)
ALL_FEATURES = (
    "texture", "bump", "volumetric", "glossy", "microfacet", "ward", "hg"
)


def features_for_materials(materials) -> tuple:
    """The minimal ``RenderConfig.features`` for a concrete material
    table.  Dropping a feature no material uses cannot change the image
    (the gated blocks are exact no-ops at zero parameters) but removes
    their ops — and, under ``jax.grad``, their transposes — from the
    compiled graph.  Requires concrete (non-traced) materials; returns
    the full feature superset (:data:`ALL_FEATURES`) when handed tracers,
    since enabling an unused feature is a no-op while dropping a used one
    is not (ADVICE r2)."""
    import numpy as np

    try:
        feats = []
        if (np.asarray(materials.texture_type) > 0).any():
            feats.append("texture")
        if (np.asarray(materials.bump_scale) > 0).any():
            feats.append("bump")
        if (np.asarray(materials.has_scatter) > 0).any() or (
            np.asarray(materials.absorption_coefficient) > 0
        ).any():
            feats.append("volumetric")
        if (
            (np.asarray(materials.specular_exponent) > 0)
            & (np.asarray(materials.has_reflective) > 0)
        ).any():
            feats.append("glossy")
        if (np.asarray(materials.brdf_model) > 0).any():
            feats.append("microfacet")
        if (np.asarray(materials.brdf_model) > 1.5).any():
            feats.append("ward")
        if (
            (np.asarray(materials.has_scatter) > 0)
            & (np.asarray(materials.phase_g) != 0)
        ).any():
            feats.append("hg")
        return tuple(feats)
    except jax.errors.TracerArrayConversionError:
        return ALL_FEATURES


_DEFAULT_FEATURES = RenderConfig().features


def resolve_features(cfg: RenderConfig, materials) -> RenderConfig:
    """Apply ``auto_features`` at a render entry point, honoring explicit
    pins: a user-supplied non-default ``features`` tuple is treated as an
    implicit pin and never overwritten (ADVICE r2 — previously a caller
    constructing ``RenderConfig(features=...)`` was silently overridden
    unless they also knew to set ``auto_features=False``)."""
    if not cfg.auto_features or cfg.features != _DEFAULT_FEATURES:
        return cfg
    return dataclasses.replace(cfg, features=features_for_materials(materials))


def _trim(cfg: RenderConfig, params: SceneParams) -> RenderConfig:
    return resolve_features(cfg, params.materials)


@functools.lru_cache(maxsize=None)
def _grad_executable(static: SceneStatic, spp: int, cfg: RenderConfig):
    @jax.jit
    def step(params, target, base_key):
        (loss, rays), grads = jax.value_and_grad(l2_loss_rays, has_aux=True)(
            params, static, target, spp, base_key, cfg
        )
        return loss, grads, rays

    return step


def loss_and_grad(params, static, target, spp, base_key, cfg):
    """Compiled ``(loss, dloss/dparams)`` on one device."""
    loss, grads, _ = _grad_executable(static, spp, _trim(cfg, params))(
        params, target, base_key
    )
    return loss, grads


def loss_and_grad_rays(params, static, target, spp, base_key, cfg):
    """Compiled ``(loss, dloss/dparams, measured forward rays)`` — the
    counter bench.py's fwd+bwd Mrays/s is computed from (one forward
    pass's primary + bounce + shadow rays; the backward recompute is NOT
    double-counted)."""
    return _grad_executable(static, spp, _trim(cfg, params))(
        params, target, base_key
    )


@functools.lru_cache(maxsize=None)
def _grad_executable_sharded(static: SceneStatic, spp: int, cfg: RenderConfig, mesh_key):
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from pathtracer_tpu.parallel.mesh import AXIS
    from pathtracer_tpu.parallel.sharded import _MESHES

    mesh = _MESHES[mesh_key]
    n_dev = mesh.devices.size

    def per_device(params, target_local, base_key):
        # device d owns strided pixels d + D*j (same layout as sharded.py)
        d = jax.lax.axis_index(AXIS)
        n_local = target_local.shape[0]
        n_global = n_local * n_dev
        pixel_index = d + n_dev * jax.lax.iota(jnp.int32, n_local)

        def local_loss(p):
            # mean over GLOBAL pixels = psum of local sums / global count
            img = render_linear(
                p, static, spp, base_key, cfg, pixel_index, n_global
            )
            return jnp.sum((img - target_local) ** 2) / (n_global * 3)

        loss, grads = jax.value_and_grad(local_loss)(params)
        # gradient all-reduce overlapped with backward by XLA (SURVEY.md §2)
        return jax.lax.psum(loss, AXIS), jax.lax.psum(grads, AXIS)

    fn = shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(), P(AXIS), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(fn)


def loss_and_grad_sharded(params, static, target_sharded, spp, base_key, cfg, mesh):
    """Multi-device ``(loss, grads)``: pixels sharded (device-major strided
    layout, see parallel/sharded.py), parameter grads psum-reduced.

    ``target_sharded``: ``[N, 3]`` with row ``d*(N/D)+j`` = global pixel
    ``d + D*j`` (use :func:`scatter_target`)."""
    from pathtracer_tpu.parallel.sharded import _mesh_key

    fn = _grad_executable_sharded(static, spp, _trim(cfg, params), _mesh_key(mesh))
    return fn(params, target_sharded, base_key)


def scatter_target(target_flat: jax.Array, mesh) -> jax.Array:
    """Pixel-ordered target [N, 3] -> device-major strided layout."""
    n_dev = mesh.devices.size
    n = target_flat.shape[0]
    return (
        target_flat.reshape(n // n_dev, n_dev, 3).transpose(1, 0, 2).reshape(n, 3)
    )
