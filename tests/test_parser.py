"""Scene DSL parser tests (grammar of reference src/scene.cpp)."""

import numpy as np
import pytest

from pathtracer_tpu.scene.parser import SceneParseError, parse_scene_text
from pathtracer_tpu.scene.structs import CUBE, SPHERE

MINI = """
MATERIAL 0
RGB .5 .25 1
SPECEX 0
SPECRGB 1 1 1
REFL 0
REFR 1
REFRIOR 1.33
SCATTER 0
ABSCOEFF .1 .2 .3
RSCTCOEFF 2
EMITTANCE 4

CAMERA
RES 64 32
FOVY 30
ITERATIONS 17
FILE out/test.png
frame 0
EYE 0 1 2
VIEW 0 0 -1
UP 0 1 0

OBJECT 0
sphere
material 0
frame 0
TRANS 1 2 3
ROTAT 10 20 30
SCALE 2 2 2
"""


def test_mini_scene_fields():
    d = parse_scene_text(MINI)
    assert d.frames == 1
    assert d.resolution == (64, 32)
    assert d.fovy == 30
    assert d.iterations == 17
    assert d.image_name == "out/test.png"
    np.testing.assert_allclose(d.eye[0], [0, 1, 2])
    assert d.geom_type[0] == SPHERE
    np.testing.assert_allclose(d.translations[0, 0], [1, 2, 3])
    np.testing.assert_allclose(d.materials["color"][0], [0.5, 0.25, 1.0])
    np.testing.assert_allclose(d.materials["absorption_coefficient"][0], [0.1, 0.2, 0.3])
    assert d.materials["emittance"][0] == 4
    assert d.materials["index_of_refraction"][0] == pytest.approx(1.33)


def test_cornell_scene(cornell):
    assert cornell.frames == 1
    assert cornell.resolution == (800, 800)
    assert cornell.geom_type.shape[0] == 9
    assert (cornell.geom_type == CUBE).sum() == 6
    assert (cornell.geom_type == SPHERE).sum() == 3
    # light is material 5 with emittance 12
    assert cornell.materials["emittance"][5] == 12


def test_scene_to_device_structs(cornell):
    sc = cornell.scene_for_frame(0)
    assert sc.geoms.transform.shape == (9, 4, 4)
    assert sc.materials.color.shape == (7, 3)
    # transform/inverse consistency
    prod = np.einsum(
        "gij,gjk->gik", np.asarray(sc.geoms.transform), np.asarray(sc.geoms.inv_transform)
    )
    np.testing.assert_allclose(prod, np.broadcast_to(np.eye(4), (9, 4, 4)), atol=1e-3)


def test_fov_derivation(cornell):
    # scene.cpp:202-205: fovx = atan(tan(fovy) * w/h)
    sc = cornell.scene_for_frame(0)
    fovx, fovy = np.asarray(sc.camera.fov)
    assert fovy == 25
    expected = np.degrees(np.arctan(np.tan(np.radians(25.0)) * 1.0))
    np.testing.assert_allclose(fovx, expected, rtol=1e-6)


def test_sequential_id_validation():
    bad = MINI.replace("MATERIAL 0", "MATERIAL 1")
    with pytest.raises(SceneParseError):
        parse_scene_text(bad)


def test_missing_camera_rejected():
    bad = "\n".join(
        l for l in MINI.splitlines() if True
    ).replace("CAMERA", "NOTCAMERA")
    with pytest.raises(SceneParseError):
        parse_scene_text(bad)


def test_frame_count_mismatch_rejected():
    extra = MINI + """
frame 1
TRANS 0 0 0
ROTAT 0 0 0
SCALE 1 1 1
"""
    with pytest.raises(SceneParseError):
        parse_scene_text(extra)


def test_comments_and_mesh_type(tmp_path):
    (tmp_path / "bunny.obj").write_text("v 0 0 0\nv 1 0 0\nv 0 1 0\nf 1 2 3\n")
    txt = MINI.replace("sphere", "bunny.obj  // a mesh")
    d = parse_scene_text(txt, scene_dir=str(tmp_path))
    from pathtracer_tpu.scene.structs import MESH

    assert d.geom_type[0] == MESH
    assert d.mesh_tris[0].shape == (1, 3, 3)


def test_aperture_focal_extension():
    txt = MINI.replace("FILE out/test.png", "FILE out/t.png\nAPERTURE .25\nFOCAL 7.5")
    d = parse_scene_text(txt)
    assert d.aperture == pytest.approx(0.25)
    assert d.focal_distance == pytest.approx(7.5)
