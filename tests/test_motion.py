"""Motion blur (shutter-interval rendering between animation frames)."""

import dataclasses

import numpy as np
import pytest

from pathtracer_tpu.config import RenderConfig
from pathtracer_tpu.render.integrator import render
from pathtracer_tpu.render.motion import render_motion
from pathtracer_tpu.scene.parser import load_scene


@pytest.fixture(scope="module")
def anim():
    import os

    path = os.path.join(os.path.dirname(__file__), "..", "scenes", "animation.txt")
    desc = load_scene(path)
    return dataclasses.replace(desc, resolution=(32, 32))


CFG = RenderConfig(max_depth=4, iters_per_launch=8)


def test_static_frames_reduce_to_plain_render(anim):
    """If frame 1 == frame 0, the shutter integral is trivial: the motion
    render must equal the static render exactly (same RNG contract)."""
    frozen = dataclasses.replace(
        anim,
        eye=np.repeat(anim.eye[:1], 2, 0),
        view=np.repeat(anim.view[:1], 2, 0),
        up=np.repeat(anim.up[:1], 2, 0),
        translations=np.repeat(anim.translations[:1], 2, 0),
        rotations=np.repeat(anim.rotations[:1], 2, 0),
        scales=np.repeat(anim.scales[:1], 2, 0),
    )
    _, a_static, _ = render(frozen.scene_for_frame(0), 8, CFG)
    _, a_motion, _ = render_motion(frozen, 0, 8, CFG)
    np.testing.assert_allclose(
        np.asarray(a_static), np.asarray(a_motion), rtol=1e-4, atol=1e-4
    )


def test_motion_blur_spreads_the_moving_object(anim):
    """The sliding sphere must smear: pixels covered only at shutter-end
    times get partial coverage under motion blur."""
    _, a0, _ = render(anim.scene_for_frame(0), 24, CFG)
    _, am, _ = render_motion(anim, 0, 24, CFG)
    a0 = np.asarray(a0).reshape(32, 32, 3) / 24.0
    am = np.asarray(am).reshape(32, 32, 3) / 24.0
    assert np.isfinite(am).all()
    # images genuinely differ (the sphere moved during the shutter)
    assert np.abs(a0 - am).mean() > 0.005
    # energy is comparable (blur redistributes, doesn't create/destroy)
    assert abs(am.mean() - a0.mean()) < 0.25 * a0.mean()


def test_motion_requires_two_frames(anim):
    single = dataclasses.replace(anim, frames=1)
    with pytest.raises(ValueError):
        render_motion(single, 0, 4, CFG)
