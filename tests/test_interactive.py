"""Interactive camera REPL (elective): rig kinematics + scripted session."""

import io
import os

import numpy as np

from pathtracer_tpu.config import RenderConfig
from pathtracer_tpu.render.interactive import CameraRig, interactive_loop


def test_rig_moves(cornell_scene):
    rig = CameraRig(cornell_scene.camera)
    p0 = rig.position.copy()
    v0 = rig.view.copy()
    assert rig.apply("w")
    assert np.linalg.norm(rig.position - p0) > 0  # dollied forward
    # w then s returns to the start
    rig.apply("s")
    np.testing.assert_allclose(rig.position, p0, atol=1e-9)
    # yaw changes view direction but not its length
    rig.apply("j")
    assert np.linalg.norm(rig.view - v0) > 1e-3
    np.testing.assert_allclose(
        np.linalg.norm(rig.view), np.linalg.norm(v0), rtol=1e-12
    )
    # zoom clamps
    for _ in range(100):
        rig.apply("+")
    assert rig.fov.min() >= 5.0
    rig.reset()
    np.testing.assert_allclose(rig.position, p0)
    assert not rig.apply("z")  # unknown key


def test_scripted_session(cornell, tmp_path):
    """A scripted stdin session renders previews and a full save."""
    import dataclasses

    desc = dataclasses.replace(cornell, resolution=(32, 32))
    cfg = RenderConfig(max_depth=2, wavefront=False, iters_per_launch=2)
    out = str(tmp_path / "it.png")
    stdin = io.StringIO("w j stat\nspp=2\nd\nsave\nquit\n")
    stdout = io.StringIO()
    n = interactive_loop(
        desc, 0, cfg, preview_spp=2, out_path=out, full_spp=2,
        stdin=stdin, stdout=stdout,
    )
    log = stdout.getvalue()
    assert n >= 4  # initial + w + j + d previews + full save
    assert os.path.exists(out)
    assert os.path.exists(out.replace(".png", ".full.png"))
    assert "eye=" in log and "preview spp = 2" in log


def test_progressive_refine_matches_single_render(cornell, tmp_path):
    """'refine N' accumulates progressively: the preview after refining to
    K total spp equals one fresh render at K spp (same base key) — the
    continuously-updating-display contract (reference main.cpp:201-218)."""
    import dataclasses

    import jax

    from pathtracer_tpu.render.integrator import render
    from pathtracer_tpu.utils.imageio import load_png

    desc = dataclasses.replace(cornell, resolution=(32, 32))
    cfg = RenderConfig(max_depth=2, wavefront=False, iters_per_launch=2)
    out = str(tmp_path / "prog.png")
    stdin = io.StringIO("refine 3\nquit\n")  # 2 spp initial + 3x2 = 8 total
    stdout = io.StringIO()
    n = interactive_loop(
        desc, 0, cfg, preview_spp=2, out_path=out, full_spp=64,
        stdin=stdin, stdout=stdout,
    )
    assert n == 4  # initial preview + 3 refines
    assert "refined to 8 spp" in stdout.getvalue()

    scene = desc.scene_for_frame(0)
    img, _, _ = render(scene, 8, cfg, base_key=jax.random.PRNGKey(cfg.seed))
    got = load_png(out).astype(np.float32)
    want = np.asarray(
        np.clip(np.asarray(img) * 255.0 + 0.5, 0, 255).astype(np.uint8)
    ).astype(np.float32)
    np.testing.assert_allclose(got, want, atol=1.0)  # quantization only
