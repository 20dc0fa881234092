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
