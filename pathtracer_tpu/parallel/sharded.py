"""Multi-device rendering via ``shard_map`` over a 1-D mesh.

Design (SURVEY.md §2 parallelism table):

* **Pixel data parallelism** — the pixel axis is sharded; device ``d`` of
  ``D`` owns the *strided* pixel subset ``{d + D*j}``.  Striding, not
  contiguous tiles: wavefront decay is spatially correlated (dark tiles
  die early, bright tiles bounce long), so interleaving pixels makes every
  device's path-length distribution statistically identical — the
  load-balance fix called out in SURVEY.md §7.
* **Per-device wavefront** — each device runs its own regeneration
  wavefront over its local sample queue; rays never cross devices (pixels
  are independent), so the forward pass needs **zero** collectives.
* **RNG** — all draws are keyed by global sample index (see
  megakernel.bounce_uniforms), so the D-device render computes exactly
  the single-device sample set: results are equal for any D.
* **Gradients** (differentiable mode) — each device differentiates its
  local loss term; parameter gradients are ``psum``-reduced across the
  mesh inside the same compiled step so XLA overlaps the all-reduce with
  backward compute (render/diff.py).

The accumulator lives sharded as ``[D, N/D, 3]``; ``gather_image`` folds
it back to pixel order (a pure layout transpose — the only cross-device
data movement in the whole renderer, and only at image readout).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

from pathtracer_tpu.config import RenderConfig
from pathtracer_tpu.parallel.mesh import AXIS, make_mesh
from pathtracer_tpu.scene.structs import Scene


@functools.lru_cache(maxsize=None)
def _sharded_chunk_executable(cfg: RenderConfig, n_iters: int, mesh_key):
    mesh = _MESHES[mesh_key]
    n_dev = mesh.devices.size

    def per_device(scene, accum_local, start_iteration, base_key):
        # accum_local: [N/D, 3]; device d owns global pixels d + D*j
        d = jax.lax.axis_index(AXIS)
        n_local = accum_local.shape[0]
        n_global = n_local * n_dev
        from pathtracer_tpu.render.wavefront import (
            render_samples_pinned,
            render_samples_wavefront,
        )

        if cfg.wavefront_pinned:
            accum_local, nrays = render_samples_pinned(
                scene,
                accum_local,
                start_iteration,
                n_iters,
                base_key,
                cfg,
                pixel_offset=d,
                pixel_stride=n_dev,
                n_global_pixels=n_global,
            )
        else:
            accum_local, nrays = render_samples_wavefront(
                scene,
                accum_local,
                start_iteration * n_local,
                n_iters * n_local,
                base_key,
                cfg,
                pixel_offset=d,
                pixel_stride=n_dev,
                n_global_pixels=n_global,
            )
        return accum_local, jax.lax.psum(nrays, AXIS)

    fn = shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(), P(AXIS), P(), P()),
        out_specs=(P(AXIS), P()),
        check_vma=False,
    )
    return jax.jit(fn, donate_argnames=("accum_local",))


_MESHES = {}


def _mesh_key(mesh):
    key = tuple(d.id for d in mesh.devices.flat)
    _MESHES[key] = mesh
    return key


def per_device_ray_counts(scene, spp, cfg, mesh, base_key=None):
    """Diagnostic: rays actually traced by EACH device for ``spp``
    progressive iterations — the load-balance evidence behind the strided
    pixel-ownership layout (SURVEY.md §7 hard-parts: wavefront decay must
    be statistically uniform across shards for the scaling-efficiency
    target to hold).  Returns a ``[D]`` numpy array."""
    import numpy as np

    from pathtracer_tpu.render.wavefront import render_samples_pinned

    if base_key is None:
        base_key = jax.random.PRNGKey(cfg.seed)
    mesh_key = _mesh_key(mesh)
    n_dev = mesh.devices.size
    w, h = scene.camera.width, scene.camera.height
    accum = make_accum(w * h, mesh)

    def per_device(scene, accum_local, base_key):
        d = jax.lax.axis_index(AXIS)
        n_local = accum_local.shape[0]
        _, nrays = render_samples_pinned(
            scene, accum_local, jnp.asarray(0, jnp.int32), spp, base_key,
            cfg, pixel_offset=d, pixel_stride=n_dev,
            n_global_pixels=n_local * n_dev,
        )
        return jnp.asarray(nrays, jnp.float32)[None]

    fn = shard_map(
        per_device,
        mesh=_MESHES[mesh_key],
        in_specs=(P(), P(AXIS), P()),
        out_specs=P(AXIS),
        check_vma=False,
    )
    return np.asarray(jax.jit(fn)(scene, accum, base_key))


def render_chunk_sharded(
    scene: Scene,
    accum_sharded: jax.Array,
    start_iteration,
    base_key,
    cfg: RenderConfig,
    n_iters: int,
    mesh,
):
    """One fused multi-iteration chunk on the mesh.

    ``accum_sharded``: ``[N, 3]`` where row ``i = d * (N/D) + j`` holds
    global pixel ``d + D*j`` (device-major strided layout); shard it with
    :func:`accum_sharding` so row blocks land on their owning device.
    Returns ``(accum_sharded, rays_traced)``."""
    fn = _sharded_chunk_executable(cfg, n_iters, _mesh_key(mesh))
    return fn(scene, accum_sharded, start_iteration, base_key)


def accum_sharding(mesh):
    return NamedSharding(mesh, P(AXIS))


def make_accum(n_pixels: int, mesh) -> jax.Array:
    n_dev = mesh.devices.size
    if n_pixels % n_dev:
        raise ValueError(f"n_pixels={n_pixels} not divisible by devices={n_dev}")
    return jax.device_put(
        jnp.zeros((n_pixels, 3), jnp.float32), accum_sharding(mesh)
    )


def gather_image(accum_sharded: jax.Array, mesh) -> jax.Array:
    """Sharded device-major accumulator -> pixel-ordered [N, 3] (host)."""
    n_dev = mesh.devices.size
    n = accum_sharded.shape[0]
    if isinstance(accum_sharded, jax.Array) and not accum_sharded.is_fully_addressable:
        # multi-host mesh: all-gather the global array to every process
        from jax.experimental import multihost_utils

        accum_sharded = multihost_utils.process_allgather(accum_sharded, tiled=True)
    # row d*(N/D)+j  <->  global pixel d + D*j : transpose the (D, N/D) view
    return (
        jnp.asarray(accum_sharded)
        .reshape(n_dev, n // n_dev, 3)
        .transpose(1, 0, 2)
        .reshape(n, 3)
    )


def scatter_accum(accum_flat, mesh) -> jax.Array:
    """Pixel-ordered [N, 3] -> device-major strided sharded accumulator —
    the inverse of :func:`gather_image`; used to restore a checkpointed
    accumulator onto the mesh (checkpoints persist in pixel order so they
    are layout-independent: a render checkpointed on D devices resumes on
    D' devices, or on one)."""
    n_dev = mesh.devices.size
    n = accum_flat.shape[0]
    if n % n_dev:
        raise ValueError(f"n_pixels={n} not divisible by devices={n_dev}")
    dev_major = (
        jnp.asarray(accum_flat, jnp.float32)
        .reshape(n // n_dev, n_dev, 3)
        .transpose(1, 0, 2)
        .reshape(n, 3)
    )
    return jax.device_put(dev_major, accum_sharding(mesh))


def render_sharded(
    scene: Scene,
    spp: int,
    cfg: RenderConfig | None = None,
    mesh=None,
    base_key=None,
    progress_fn=None,
    accum=None,
    start_iteration: int = 0,
):
    """Multi-device progressive render; returns ``(image, accum_sharded,
    stats)`` with the image identical (up to float addition order) to the
    single-device :func:`pathtracer_tpu.render.integrator.render`.

    ``accum``/``start_iteration`` resume a checkpointed render (the same
    contract as ``integrator.render``): pass the *sharded* accumulator
    from a previous call, or a pixel-ordered ``[N, 3]`` array restored
    from disk via :func:`scatter_accum`.  ``progress_fn(done, accum)``
    receives the sharded accumulator — ``gather_image`` it before use."""
    from pathtracer_tpu.ops.tonemap import tonemap

    cfg = cfg or RenderConfig(wavefront=True)
    from pathtracer_tpu.render.diff import resolve_features

    cfg = resolve_features(cfg, scene.materials)
    mesh = mesh or make_mesh()
    if base_key is None:
        base_key = jax.random.PRNGKey(cfg.seed)
    w, h = scene.camera.width, scene.camera.height
    if accum is None:
        accum = make_accum(w * h, mesh)
    elif getattr(accum, "sharding", None) != accum_sharding(mesh):
        # pixel-ordered array (e.g. restored from a checkpoint): scatter
        # into the device-major strided layout on this mesh
        accum = scatter_accum(accum, mesh)

    done = 0
    counts = []
    while done < spp:
        chunk = min(cfg.iters_per_launch, spp - done)
        accum, nrays = render_chunk_sharded(
            scene, accum, jnp.asarray(start_iteration + done, jnp.int32),
            base_key, cfg, chunk, mesh,
        )
        counts.append(nrays)
        done += chunk
        if progress_fn is not None:
            progress_fn(done, accum)

    img_flat = gather_image(accum, mesh)
    img = tonemap(img_flat.reshape(h, w, 3), start_iteration + spp)
    stats = {"rays_traced": float(sum(float(c) for c in counts)), "spp": spp}
    return img, accum, stats
