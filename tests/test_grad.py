"""Gradient correctness (BASELINE config 4): jax.grad through the full
bounce loop vs central finite differences, for material colors/emittance,
object transforms, and camera parameters.

The estimator is deterministic for a fixed base key and a.e.-smooth in
the parameters (detached sampling), so FD and AD agree away from
visibility discontinuities; tolerances are loose-ish because FD itself is
noisy where a few samples cross silhouettes.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pathtracer_tpu.config import RenderConfig
from pathtracer_tpu.render.diff import (
    build_scene,
    l2_loss,
    loss_and_grad,
    params_from_description,
    render_linear,
)

CFG = RenderConfig(max_depth=4, jitter=True, wavefront=False)
SPP = 4
KEY = jax.random.PRNGKey(7)


@pytest.fixture(scope="module")
def setup(cornell):
    desc = dataclasses.replace(cornell, resolution=(24, 24))
    params, static = params_from_description(desc, 0)
    # target = render at the true params (so loss=0, but grads of loss at a
    # PERTURBED point are informative); perturb the start point instead
    target = render_linear(params, static, SPP, KEY, CFG)
    return params, static, target


def _perturb(params):
    # nudge a few scalars so the loss landscape is non-degenerate
    mats = params.materials
    mats = dataclasses.replace(
        mats,
        color=mats.color.at[1, 0].add(0.1),
        emittance=mats.emittance.at[5].add(1.0),
    )
    return dataclasses.replace(
        params,
        materials=mats,
        translations=params.translations.at[7, 2].add(0.3),
        cam_position=params.cam_position.at[0].add(0.05),
    )


def _fd(loss_fn, params, get, set_, h):
    lp = loss_fn(set_(params, get(params) + h))
    lm = loss_fn(set_(params, get(params) - h))
    return (lp - lm) / (2.0 * h)


def _check(name, ad, fd, rtol=0.12, atol=None):
    ad, fd = float(ad), float(fd)
    scale = max(abs(ad), abs(fd))
    assert scale > 1e-7, f"{name}: degenerate gradient ({ad} vs {fd})"
    tol = atol if atol is not None else rtol * scale
    assert abs(ad - fd) <= tol, f"{name}: AD {ad} vs FD {fd}"


@pytest.mark.slow
def test_grads_match_finite_differences(setup):
    params0, static, target = setup
    params = _perturb(params0)

    def loss_fn(p):
        return float(l2_loss(p, static, target, SPP, KEY, CFG))

    loss, grads = loss_and_grad(params, static, target, SPP, KEY, CFG)
    assert float(loss) > 0

    # material color (red wall R channel)
    fd = _fd(
        loss_fn,
        params,
        lambda p: p.materials.color[1, 0],
        lambda p, v: dataclasses.replace(
            p, materials=dataclasses.replace(p.materials, color=p.materials.color.at[1, 0].set(v))
        ),
        h=2e-3,
    )
    _check("color[1,0]", grads.materials.color[1, 0], fd)

    # light emittance
    fd = _fd(
        loss_fn,
        params,
        lambda p: p.materials.emittance[5],
        lambda p, v: dataclasses.replace(
            p, materials=dataclasses.replace(p.materials, emittance=p.materials.emittance.at[5].set(v))
        ),
        h=2e-2,
    )
    _check("emittance[5]", grads.materials.emittance[5], fd)

    # object translation (blue diffuse sphere z)
    fd = _fd(
        loss_fn,
        params,
        lambda p: p.translations[7, 2],
        lambda p, v: dataclasses.replace(p, translations=p.translations.at[7, 2].set(v)),
        h=2e-3,
    )
    # fp32 FD of a ~1e-3 loss has only ~2 significant digits; plus the
    # detached estimator omits silhouette boundary terms — loose tolerance
    _check("translations[7,2]", grads.translations[7, 2], fd, rtol=0.5)

    # object scale (blue sphere, uniform x component)
    fd = _fd(
        loss_fn,
        params,
        lambda p: p.scales[7, 0],
        lambda p, v: dataclasses.replace(p, scales=p.scales.at[7, 0].set(v)),
        h=2e-3,
    )
    _check("scales[7,0]", grads.scales[7, 0], fd, rtol=0.25)

    # camera position: the cornell view is full of silhouettes, whose
    # boundary (visibility) derivative the detached-sampling estimator
    # deliberately omits — FD would measure smooth+boundary together, so
    # here we only require a finite, nonzero smooth gradient; the FD match
    # is asserted on a silhouette-free scene in
    # test_camera_gradient_smooth_scene.
    g = float(grads.cam_position[0])
    assert np.isfinite(g) and abs(g) > 1e-7, g


def test_gradient_descent_recovers_wall_color(setup):
    """Tiny inverse-rendering sanity: gradient steps on the red wall color
    reduce the loss toward the target."""
    params0, static, target = setup
    mats = params0.materials
    params = dataclasses.replace(
        params0,
        materials=dataclasses.replace(mats, color=mats.color.at[1].set(jnp.array([0.3, 0.3, 0.3]))),
    )
    losses = []
    lr = 2000.0
    for _ in range(16):
        loss, grads = loss_and_grad(params, static, target, SPP, KEY, CFG)
        if losses and float(loss) > losses[-1]:
            lr *= 0.5  # crude backtracking keeps the fixed-lr steps stable
        losses.append(float(loss))
        g = grads.materials.color
        mask = jnp.zeros_like(g).at[1].set(1.0)  # only optimize the wall color
        new_color = jnp.clip(params.materials.color - lr * g * mask, 0.0, 1.0)
        params = dataclasses.replace(
            params,
            materials=dataclasses.replace(params.materials, color=new_color),
        )
    assert min(losses) < 0.3 * losses[0], losses
    recovered = np.asarray(params.materials.color[1])
    true = np.asarray(params0.materials.color[1])
    assert np.abs(recovered - true).max() < 0.2, (recovered, true)


@pytest.mark.slow
def test_sharded_grads_match_single(setup):
    from pathtracer_tpu.parallel.mesh import make_mesh
    from pathtracer_tpu.render.diff import loss_and_grad_sharded, scatter_target

    params0, static, target = setup
    params = _perturb(params0)
    mesh = make_mesh()
    loss1, g1 = loss_and_grad(params, static, target, SPP, KEY, CFG)
    loss8, g8 = loss_and_grad_sharded(
        params, static, scatter_target(target, mesh), SPP, KEY, CFG, mesh
    )
    np.testing.assert_allclose(float(loss1), float(loss8), rtol=1e-5)
    flat1 = jax.tree_util.tree_leaves(g1)
    flat8 = jax.tree_util.tree_leaves(g8)
    for a, b in zip(flat1, flat8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=1e-5)


@pytest.mark.slow
def test_mesh_gradients_match_finite_differences():
    """Differentiable triangle meshes (round-2): AD vs FD for the mesh
    instance's translation AND a raw vertex coordinate (gradients flow
    through the winner-only Moeller-Trumbore recompute in
    ops/intersect.intersect_scene_lean)."""
    import os

    from pathtracer_tpu.scene.parser import load_scene

    path = os.path.join(os.path.dirname(__file__), "..", "scenes", "mesh_demo.txt")
    desc = dataclasses.replace(load_scene(path), resolution=(20, 20))
    params, static = params_from_description(desc, 0)
    assert params.mesh_verts, "mesh_demo must produce differentiable mesh leaves"
    assert static.mesh_geom_indices == (1,)

    # make the mesh diffuse: specular lobes add FD noise without testing
    # anything mesh-specific
    mats = params.materials
    params = dataclasses.replace(
        params,
        materials=dataclasses.replace(
            mats,
            has_reflective=mats.has_reflective.at[1].set(0.0),
            specular_exponent=mats.specular_exponent.at[1].set(0.0),
        ),
    )

    cfg = RenderConfig(max_depth=3, jitter=True, wavefront=False)
    key = jax.random.PRNGKey(11)
    target = render_linear(params, static, 2, key, cfg)
    # perturb so the loss is non-degenerate
    params = dataclasses.replace(
        params,
        translations=params.translations.at[1, 1].add(0.15),
        mesh_verts=(params.mesh_verts[0].at[0, 0, 1].add(0.05),),
    )

    def loss_fn(p):
        return float(l2_loss(p, static, target, 2, key, cfg))

    loss, grads = loss_and_grad(params, static, target, 2, key, cfg)
    assert float(loss) > 0

    # mesh instance translation (y)
    fd = _fd(
        loss_fn,
        params,
        lambda p: p.translations[1, 1],
        lambda p, v: dataclasses.replace(p, translations=p.translations.at[1, 1].set(v)),
        h=2e-3,
    )
    _check("mesh translations[1,1]", grads.translations[1, 1], fd, rtol=0.5)

    # raw vertex gradients: FD of a rigid +y shift of ALL vertices (in
    # mesh object space) vs the AD sum over every vertex's y gradient —
    # robust to any single vertex being off-screen at this resolution
    h = 2e-3
    lp = loss_fn(
        dataclasses.replace(params, mesh_verts=(params.mesh_verts[0].at[:, :, 1].add(h),))
    )
    lm = loss_fn(
        dataclasses.replace(params, mesh_verts=(params.mesh_verts[0].at[:, :, 1].add(-h),))
    )
    fd = (lp - lm) / (2.0 * h)
    ad = float(jnp.sum(grads.mesh_verts[0][:, :, 1]))
    _check("mesh_verts[0][:, :, 1] rigid shift", ad, fd, rtol=0.5)


@pytest.mark.slow
def test_camera_gradient_smooth_scene(cornell):
    """Camera gradients vs FD on a silhouette-free view (diffuse floor +
    light overhead): every term is smooth, so pathwise AD == FD."""
    from pathtracer_tpu.scene.parser import parse_scene_text

    txt = """
MATERIAL 0
RGB .7 .7 .7
SPECEX 0
SPECRGB 1 1 1
REFL 0
REFR 0
REFRIOR 0
SCATTER 0
ABSCOEFF 0 0 0
RSCTCOEFF 0
EMITTANCE 0

MATERIAL 1
RGB 1 1 1
SPECEX 0
SPECRGB 0 0 0
REFL 0
REFR 0
REFRIOR 0
SCATTER 0
ABSCOEFF 0 0 0
RSCTCOEFF 0
EMITTANCE 8

CAMERA
RES 16 16
FOVY 20
ITERATIONS 1
FILE x.png
frame 0
EYE 0 4 0
VIEW 0 -1 0
UP 0 0 -1

OBJECT 0
cube
material 0
frame 0
TRANS 0 0 0
ROTAT 0 0 0
SCALE 40 .1 40

OBJECT 1
cube
material 1
frame 0
TRANS 0 9 0
ROTAT 0 0 0
SCALE 40 .1 40
"""
    desc = parse_scene_text(txt)
    params, static = params_from_description(desc, 0)
    cfg = RenderConfig(max_depth=2, jitter=True, wavefront=False)
    key = jax.random.PRNGKey(3)
    target = render_linear(params, static, 2, key, cfg) * 0.8  # non-zero loss

    def loss_fn(p):
        return float(l2_loss(p, static, target, 2, key, cfg))

    _, grads = loss_and_grad(params, static, target, 2, key, cfg)
    for i, h in [(0, 1e-2), (1, 1e-2)]:
        fd = _fd(
            loss_fn,
            params,
            lambda p, i=i: p.cam_position[i],
            lambda p, v, i=i: dataclasses.replace(
                p, cam_position=p.cam_position.at[i].set(v)
            ),
            h=h,
        )
        _check(f"cam_position[{i}]", grads.cam_position[i], fd, rtol=0.1)


@pytest.mark.slow
def test_diff_mode_accel_matches_dense():
    """Diff-mode LBVH (VERDICT r2 weak #2): with an accel-sized mesh
    (>= ACCEL_MIN_TRIS), the stop-gradiented winner search traverses the
    host-built LBVH while gradients gather the live file-order vertices —
    loss AND grads must match the dense sweep."""
    import os
    import tempfile

    from pathtracer_tpu.render.diff import loss_and_grad
    from pathtracer_tpu.scene.obj import make_icosphere
    from pathtracer_tpu.scene.parser import load_scene

    tris = make_icosphere(2)  # 320 tris >= ACCEL_MIN_TRIS
    tmp = tempfile.mkdtemp()
    lines = []
    for t in tris:
        for v in t:
            lines.append(f"v {v[0]:.6f} {v[1]:.6f} {v[2]:.6f}")
    for i in range(len(tris)):
        lines.append(f"f {3*i+1} {3*i+2} {3*i+3}")
    open(os.path.join(tmp, "ico2.obj"), "w").write("\n".join(lines) + "\n")

    scene_txt = """
MATERIAL 0
RGB .7 .7 .7
SPECEX 0
SPECRGB 0 0 0
REFL 0
REFR 0
REFRIOR 0
SCATTER 0
ABSCOEFF 0 0 0
RSCTCOEFF 0
EMITTANCE 0

MATERIAL 1
RGB 1 1 1
SPECEX 0
SPECRGB 0 0 0
REFL 0
REFR 0
REFRIOR 0
SCATTER 0
ABSCOEFF 0 0 0
RSCTCOEFF 0
EMITTANCE 6

CAMERA
RES 20 20
FOVY 35
ITERATIONS 2
FILE x.png
frame 0
EYE 0 0 4
VIEW 0 0 -1
UP 0 1 0

OBJECT 0
ico2.obj
material 0
frame 0
TRANS 0 0 0
ROTAT 0 0 0
SCALE 2 2 2

OBJECT 1
cube
material 1
frame 0
TRANS 0 4 0
ROTAT 0 0 0
SCALE 4 .2 4
"""
    sp = os.path.join(tmp, "s.txt")
    open(sp, "w").write(scene_txt)
    desc = load_scene(sp)

    cfg = RenderConfig(max_depth=3, wavefront=False)
    key = jax.random.PRNGKey(5)

    p_acc, s_acc = params_from_description(desc, 0, accel=True)
    p_dense, s_dense = params_from_description(desc, 0, accel=False)
    assert s_acc.mesh_accel_keys[0] is not None
    assert s_dense.mesh_accel_keys == (None,)

    target = render_linear(p_dense, s_dense, 2, key, cfg)
    # perturb for a non-degenerate loss
    p_acc = dataclasses.replace(
        p_acc, translations=p_acc.translations.at[0, 0].add(0.1)
    )
    p_dense = dataclasses.replace(
        p_dense, translations=p_dense.translations.at[0, 0].add(0.1)
    )

    l_a, g_a = loss_and_grad(p_acc, s_acc, target, 2, key, cfg)
    l_d, g_d = loss_and_grad(p_dense, s_dense, target, 2, key, cfg)
    np.testing.assert_allclose(float(l_a), float(l_d), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(g_a.mesh_verts[0]), np.asarray(g_d.mesh_verts[0]),
        rtol=1e-4, atol=1e-7,
    )
    np.testing.assert_allclose(
        np.asarray(g_a.translations), np.asarray(g_d.translations),
        rtol=1e-4, atol=1e-7,
    )
    assert float(np.abs(np.asarray(g_a.mesh_verts[0])).sum()) > 0


@pytest.mark.slow
def test_vertex_optimization_accel_never_stale():
    """100-step vertex optimization with the LBVH on: the accel'd loss
    and vertex gradients match the dense sweep THROUGHOUT, even after
    the vertices have drifted far from the build-time positions (the
    live-AABB rebind, ops/accel.refresh_accel — VERDICT r3 #7)."""
    import dataclasses

    from pathtracer_tpu.render.diff import (
        l2_loss,
        params_from_description,
    )
    from pathtracer_tpu.scene import obj as obj_mod
    from pathtracer_tpu.scene.parser import parse_scene_text

    # a mesh big enough to carry an accel (>= ACCEL_MIN_TRIS)
    from pathtracer_tpu.scene.structs import ACCEL_MIN_TRIS

    tris = obj_mod.make_icosphere(3)  # 1280 tris
    assert len(tris) >= ACCEL_MIN_TRIS

    scene_txt = """MATERIAL 0
RGB .8 .75 .7
SPECEX 0
SPECRGB 0 0 0
REFL 0
REFR 0
REFRIOR 0
SCATTER 0
ABSCOEFF 0 0 0
RSCTCOEFF 0
EMITTANCE 0

MATERIAL 1
RGB 1 1 1
SPECEX 0
SPECRGB 0 0 0
REFL 0
REFR 0
REFRIOR 0
SCATTER 0
ABSCOEFF 0 0 0
RSCTCOEFF 0
EMITTANCE 6

CAMERA
RES 20 20
FOVY 35
ITERATIONS 1
FILE out.bmp
frame 0
EYE 0 0 4
VIEW 0 0 -1
UP 0 1 0

OBJECT 0
mesh.obj
material 0
frame 0
TRANS 0 0 0
ROTAT 0 0 0
SCALE 2 2 2

OBJECT 1
cube
material 1
frame 0
TRANS 0 3 2
ROTAT 0 0 0
SCALE 3 .2 3
"""
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        obj_path = os.path.join(td, "mesh.obj")
        obj_mod.save_obj(obj_path, tris) if hasattr(obj_mod, "save_obj") else None
        if not os.path.exists(obj_path):
            with open(obj_path, "w") as f:
                verts = tris.reshape(-1, 3)
                for v in verts:
                    f.write(f"v {v[0]} {v[1]} {v[2]}\n")
                for i in range(len(tris)):
                    f.write(f"f {3*i+1} {3*i+2} {3*i+3}\n")
        scene_path = os.path.join(td, "s.txt")
        with open(scene_path, "w") as f:
            f.write(scene_txt)
        from pathtracer_tpu.scene.parser import load_scene

        desc = load_scene(scene_path)

    params_a, static_a = params_from_description(desc, 0, accel=True)
    params_d, static_d = params_from_description(desc, 0, accel=False)
    assert static_a.mesh_accel_keys and static_a.mesh_accel_keys[0]

    key = jax.random.PRNGKey(0)
    n = 20 * 20
    target = jnp.zeros((n, 3), jnp.float32)
    cfg = RenderConfig(wavefront=False, nee=True, max_depth=2)

    grad_a = jax.jit(
        lambda p, k: jax.value_and_grad(l2_loss)(p, static_a, target, 1, k, cfg)
    )
    grad_d = jax.jit(
        lambda p, k: jax.value_and_grad(l2_loss)(p, static_d, target, 1, k, cfg)
    )

    # optimize the vertices with LARGE steps so they drift far from the
    # build-time Morton order; check accel == dense every 20 steps
    import numpy as np

    pa = params_a
    pd = params_d
    lr = 0.5
    for step in range(101):
        k = jax.random.fold_in(key, step)
        la, ga = grad_a(pa, k)
        if step % 20 == 0 or step == 100:
            ld, gd = grad_d(pd, k)
            np.testing.assert_allclose(
                float(la), float(ld), rtol=1e-5, atol=1e-7,
                err_msg=f"loss diverged at step {step}",
            )
            np.testing.assert_allclose(
                np.asarray(ga.mesh_verts[0]),
                np.asarray(gd.mesh_verts[0]),
                rtol=1e-4, atol=1e-6,
                err_msg=f"vertex grads diverged at step {step}",
            )
        upd_a = jax.tree_util.tree_map(lambda p, g: p - lr * g, pa.mesh_verts, ga.mesh_verts)
        pa = dataclasses.replace(pa, mesh_verts=upd_a)
        pd = dataclasses.replace(pd, mesh_verts=upd_a)  # keep in lockstep
    # the vertices really moved (the old contract would have missed
    # winners silently by now)
    drift = float(
        jnp.abs(pa.mesh_verts[0] - params_a.mesh_verts[0]).max()
    )
    assert drift > 0.05, drift
