"""Scene data model: struct-of-arrays pytrees.

TPU-native re-design of the reference's AoS structs (reference:
``src/sceneStructs.h:14-74``).  Where the reference stores an array of
``staticGeom`` structs and loops over them per CUDA thread
(``src/raytraceKernel.cu:137-148``), we store one array **per field** so
every intersection / shading op is a vectorized batch op over the geometry
axis, and the whole scene is a differentiable pytree leaf set.

All dataclasses are registered with :func:`jax.tree_util.register_dataclass`
so they can flow through ``jit`` / ``grad`` / ``shard_map`` directly.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

# Geometry type enum — mirrors the reference's GEOMTYPE (sceneStructs.h:14).
SPHERE = 0
CUBE = 1
MESH = 2

GEOM_TYPE_NAMES = {SPHERE: "sphere", CUBE: "cube", MESH: "mesh"}

# meshes with at least this many triangles get a chunked-LBVH accel
# structure (ops/accel.py); below it the dense sweep is cheaper
ACCEL_MIN_TRIS = 256


def pytree_dataclass(cls=None, *, meta_fields: tuple = ()):
    """Dataclass registered as a JAX pytree; ``meta_fields`` are static."""
    if cls is None:
        return partial(pytree_dataclass, meta_fields=meta_fields)
    cls = dataclasses.dataclass(frozen=True)(cls)
    data_fields = tuple(
        f.name for f in dataclasses.fields(cls) if f.name not in meta_fields
    )
    return jax.tree_util.register_dataclass(
        cls, data_fields=data_fields, meta_fields=tuple(meta_fields)
    )


@pytree_dataclass
class Rays:
    """A batch of rays, SoA.  Reference analog: ``ray`` (sceneStructs.h:16-19),
    one per CUDA thread; here one flat batch dimension ``[N]``."""

    origin: jax.Array  # [N, 3] float32
    direction: jax.Array  # [N, 3] float32, normalized

    @property
    def count(self) -> int:
        return self.origin.shape[0]


@pytree_dataclass
class Geoms:
    """All geometry instances for one animation frame, SoA.

    Reference analog: flattened ``staticGeom[]`` built per iteration
    (``src/raytraceKernel.cu:179-190``).  Unit primitives live in object
    space (sphere r=0.5, cube side 1) and are instanced by ``transform`` /
    ``inv_transform`` exactly like the reference's inverse-transform tests
    (``src/intersections.h:78-204``).
    """

    type: jax.Array  # [G] int32 in {SPHERE, CUBE, MESH}
    material_id: jax.Array  # [G] int32
    transform: jax.Array  # [G, 4, 4] float32, object->world
    inv_transform: jax.Array  # [G, 4, 4] float32, world->object

    @property
    def count(self) -> int:
        return self.type.shape[0]


@pytree_dataclass
class Materials:
    """Material table, SoA.  Reference analog: ``material``
    (sceneStructs.h:62-74) with its 10 fixed scene-DSL fields
    (``src/scene.cpp:230-259``)."""

    color: jax.Array  # [M, 3]
    specular_exponent: jax.Array  # [M]
    specular_color: jax.Array  # [M, 3]
    has_reflective: jax.Array  # [M] (float flag, like the reference)
    has_refractive: jax.Array  # [M]
    index_of_refraction: jax.Array  # [M]
    has_scatter: jax.Array  # [M]
    absorption_coefficient: jax.Array  # [M, 3]
    reduced_scatter_coefficient: jax.Array  # [M]
    emittance: jax.Array  # [M]
    # texture extensions (0 = none, 1 = checker, 2 = stripes, 3 = image);
    # procedural patterns evaluated in the hit geom's object space
    texture_type: jax.Array  # [M]
    texture_scale: jax.Array  # [M]
    texture_color2: jax.Array  # [M, 3]
    bump_scale: jax.Array  # [M] procedural bump frequency (0 = off)
    bump_amp: jax.Array  # [M] bump strength
    texture_image: jax.Array  # [M] atlas slot for type==3 (-1 = none)
    brdf_model: jax.Array  # [M] 0 = Phong, 1 = Cook-Torrance GGX, 2 = Ward
    roughness: jax.Array  # [M] GGX roughness (alpha = r^2) / Ward alpha_x
    roughness_y: jax.Array  # [M] Ward alpha_y (0 => isotropic)
    phase_g: jax.Array  # [M] Henyey-Greenstein g for SCATTER media (0 = isotropic)

    @property
    def count(self) -> int:
        return self.emittance.shape[0]


@pytree_dataclass(meta_fields=("resolution",))
class Camera:
    """Pinhole / thin-lens camera for one frame.

    Reference analog: ``cameraData`` (sceneStructs.h:41-47).  ``fov`` is
    (fovx, fovy) in degrees with fovx derived from fovy + aspect exactly as
    ``src/scene.cpp:202-205``.  ``aperture``/``focal_distance`` extend the
    reference with thin-lens depth of field (README.md elective feature).
    """

    resolution: tuple  # (width, height) static
    position: jax.Array  # [3]
    view: jax.Array  # [3]
    up: jax.Array  # [3]
    fov: jax.Array  # [2] degrees (fovx, fovy)
    aperture: jax.Array  # [] lens radius; 0 => pinhole
    focal_distance: jax.Array  # [] focus plane distance; <=0 => |view|

    @property
    def width(self) -> int:
        return int(self.resolution[0])

    @property
    def height(self) -> int:
        return int(self.resolution[1])


@pytree_dataclass(meta_fields=("geom_index",))
class MeshInstance:
    """A triangle mesh bound to one geom slot (type MESH).  Triangles live
    in the mesh's object space; the geom's transform instancing applies,
    exactly like the analytic primitives.  Reference analog: the declared
    GEOMTYPE::MESH whose trace branch was left empty
    (raytraceKernel.cu:144-145)."""

    geom_index: int  # static: which geoms[] slot this mesh occupies
    tri_verts: jax.Array  # [T, 3, 3] float32
    # chunked-LBVH acceleration (ops/accel.py — the KD-tree elective);
    # None = dense sweep (small meshes)
    accel: Any = None
    # authored per-corner attributes in FILE order (OBJ vt/vn records) —
    # None = box-mapped UVs / flat face normals.  Winner indices map from
    # scan order to file order via accel.scan_to_file when accelerated.
    tri_uv: Any = None  # [T, 3, 2] float32 texture coordinates
    tri_norm: Any = None  # [T, 3, 3] float32 unit shading normals

    @property
    def has_attrs(self) -> bool:
        return self.tri_uv is not None or self.tri_norm is not None


@pytree_dataclass
class Scene:
    """A full renderable scene for one animation frame — a differentiable
    pytree: ``jax.grad`` w.r.t. any leaf (material colors, transforms,
    camera position, ...) works out of the box."""

    geoms: Geoms
    materials: Materials
    camera: Camera
    meshes: tuple = ()  # tuple[MeshInstance, ...]
    # image-texture atlas (ops/texture.TextureAtlas) or None — the realized
    # stb_image elective (reference src/stb_image/stb_image.c, README.md:57)
    textures: Any = None


@dataclasses.dataclass(frozen=True)
class SceneDescription:
    """Host-side parsed scene: all animation frames + render settings.

    Reference analog: the ``scene`` class (``src/scene.cpp:9-33``) holding
    per-frame TRS arrays plus camera iteration budget / output filename
    (``src/scene.cpp:141-188``).
    """

    frames: int
    iterations: int
    image_name: str
    resolution: tuple  # (w, h)
    fovy: float
    # per-frame camera arrays [F, ...]
    eye: np.ndarray
    view: np.ndarray
    up: np.ndarray
    aperture: float
    focal_distance: float
    # geometry (static over frames except transforms)
    geom_type: np.ndarray  # [G]
    geom_material: np.ndarray  # [G]
    translations: np.ndarray  # [F, G, 3]
    rotations: np.ndarray  # [F, G, 3]
    scales: np.ndarray  # [F, G, 3]
    # material table (numpy dict of field -> array)
    materials: dict
    # per-object mesh triangles ([T,3,3] np arrays for MESH objects, else None)
    mesh_tris: tuple = ()
    # decoded linear-light image textures ([Hi,Wi,3] float arrays), indexed
    # by the materials' texture_image field
    texture_images: tuple = ()
    # deformational animation (hard elective): per-object tuple of per-FRAME
    # vertex arrays ([T,3,3], same triangle count every frame) or None —
    # produced by per-frame ``FILE other.obj`` lines in the DSL.  Motion
    # blur lerps these vertices continuously across the shutter interval
    # (render/motion.py), which is deformational motion blur.
    mesh_tris_frames: tuple = ()
    # authored per-corner mesh attributes (OBJ vt/vn): per-object
    # ``(uv [T,3,2] | None, norm [T,3,3] | None)`` tuples, or None.
    # Displaced meshes drop both (their geometry is regenerated);
    # deforming meshes keep frame-0 attributes (topology is pinned).
    mesh_attrs: tuple = ()

    def mesh_tris_for_frame(self, frame: int) -> tuple:
        """Per-object triangle arrays at ``frame`` (deforming meshes pick
        that frame's vertices; rigid meshes return their single array)."""
        base = self.mesh_tris or ()
        anim = self.mesh_tris_frames or ()
        out = []
        for g, tris in enumerate(base):
            per_frame = anim[g] if g < len(anim) else None
            out.append(per_frame[frame] if per_frame is not None else tris)
        return tuple(out)

    def scene_for_frame(self, frame: int) -> Scene:
        """Select one animation frame into a device-ready :class:`Scene`
        (the analog of the per-frame ``staticGeom`` packing at
        ``src/raytraceKernel.cu:179-190``)."""
        from pathtracer_tpu.ops.transforms import build_transform_batch

        t, inv = build_transform_batch(
            self.translations[frame], self.rotations[frame], self.scales[frame]
        )
        geoms = Geoms(
            type=jnp.asarray(self.geom_type, jnp.int32),
            material_id=jnp.asarray(self.geom_material, jnp.int32),
            transform=t,
            inv_transform=inv,
        )
        mats = Materials(
            **{k: jnp.asarray(v, jnp.float32) for k, v in self.materials.items()}
        )
        cam = self.camera_for_frame(frame)

        def mk_mesh(g, tris):
            accel = None
            if len(tris) >= ACCEL_MIN_TRIS:
                from pathtracer_tpu.ops.accel import build_mesh_accel

                accel = build_mesh_accel(tris)
            attrs = (
                self.mesh_attrs[g]
                if g < len(self.mesh_attrs or ()) and self.mesh_attrs[g]
                else (None, None)
            )
            uv, norm = attrs
            return MeshInstance(
                geom_index=g,
                tri_verts=jnp.asarray(tris, jnp.float32),
                accel=accel,
                tri_uv=None if uv is None else jnp.asarray(uv, jnp.float32),
                tri_norm=None if norm is None else jnp.asarray(norm, jnp.float32),
            )

        meshes = tuple(
            mk_mesh(g, tris)
            for g, tris in enumerate(self.mesh_tris_for_frame(frame))
            if tris is not None
        )
        textures = None
        if self.texture_images:
            from pathtracer_tpu.ops.texture import build_atlas

            textures = build_atlas(self.texture_images)
        return Scene(
            geoms=geoms, materials=mats, camera=cam, meshes=meshes,
            textures=textures,
        )

    def camera_for_frame(self, frame: int) -> Camera:
        from pathtracer_tpu.ops.camera import derive_fov

        fov = derive_fov(self.fovy, self.resolution[0], self.resolution[1])
        return Camera(
            resolution=tuple(self.resolution),
            position=jnp.asarray(self.eye[frame], jnp.float32),
            view=jnp.asarray(self.view[frame], jnp.float32),
            up=jnp.asarray(self.up[frame], jnp.float32),
            fov=jnp.asarray(fov, jnp.float32),
            aperture=jnp.asarray(self.aperture, jnp.float32),
            focal_distance=jnp.asarray(self.focal_distance, jnp.float32),
        )


def make_materials(rows: list) -> Materials:
    """Build a Materials SoA from a list of per-material dicts."""
    def col(name, width=None, default=0.0):
        vals = [r.get(name, [default] * (width or 1) if width else default) for r in rows]
        arr = jnp.asarray(np.array(vals, dtype=np.float32))
        return arr

    return Materials(
        color=col("color", width=3),
        specular_exponent=col("specular_exponent"),
        specular_color=col("specular_color", width=3),
        has_reflective=col("has_reflective"),
        has_refractive=col("has_refractive"),
        index_of_refraction=col("index_of_refraction"),
        has_scatter=col("has_scatter"),
        absorption_coefficient=col("absorption_coefficient", width=3),
        reduced_scatter_coefficient=col("reduced_scatter_coefficient"),
        emittance=col("emittance"),
        texture_type=col("texture_type"),
        texture_scale=col("texture_scale"),
        texture_color2=col("texture_color2", width=3),
        bump_scale=col("bump_scale"),
        bump_amp=col("bump_amp"),
        texture_image=col("texture_image", default=-1.0),
        brdf_model=col("brdf_model"),
        roughness=col("roughness"),
        roughness_y=col("roughness_y"),
        phase_g=col("phase_g"),
    )
