"""Native C++ runtime layer (native/libptnative.so): parser parity with the
Python implementation, encoder round-trips.  Skipped cleanly when the
toolchain is unavailable."""

import os

import numpy as np
import pytest

from pathtracer_tpu.utils import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built"
)

CORNELL = os.path.join(os.path.dirname(__file__), "..", "scenes", "cornell.txt")


def test_parser_parity_with_python():
    from pathtracer_tpu.scene.parser import parse_scene_text

    text = open(CORNELL).read()
    d_native = native.parse_scene_text(text)
    d_python = parse_scene_text(text)
    assert d_native.frames == d_python.frames
    assert d_native.resolution == d_python.resolution
    assert d_native.iterations == d_python.iterations
    assert d_native.image_name == d_python.image_name
    assert d_native.fovy == d_python.fovy
    np.testing.assert_array_equal(d_native.geom_type, d_python.geom_type)
    np.testing.assert_array_equal(d_native.geom_material, d_python.geom_material)
    for k in d_python.materials:
        np.testing.assert_allclose(d_native.materials[k], d_python.materials[k])
    np.testing.assert_allclose(d_native.translations, d_python.translations)
    np.testing.assert_allclose(d_native.rotations, d_python.rotations)
    np.testing.assert_allclose(d_native.scales, d_python.scales)
    np.testing.assert_allclose(d_native.eye, d_python.eye)
    np.testing.assert_allclose(d_native.view, d_python.view)
    np.testing.assert_allclose(d_native.up, d_python.up)


def test_parser_error_reporting():
    from pathtracer_tpu.scene.parser import SceneParseError

    with pytest.raises(SceneParseError):
        native.parse_scene_text("MATERIAL 5\nRGB 1 1 1\n")


def test_png_roundtrip(tmp_path):
    from pathtracer_tpu.utils.imageio import load_png

    img = (np.random.default_rng(1).random((21, 13, 3)) * 255).astype(np.uint8)
    p = str(tmp_path / "n.png")
    assert native.write_png(p, img)
    np.testing.assert_array_equal(load_png(p), img)


def test_bmp_matches_python_encoder(tmp_path):
    from pathtracer_tpu.utils.imageio import encode_bmp

    img = (np.random.default_rng(2).random((7, 5, 3)) * 255).astype(np.uint8)
    p = str(tmp_path / "n.bmp")
    assert native.write_bmp(p, img)
    assert open(p, "rb").read() == encode_bmp(img)


def test_save_image_uses_native(tmp_path):
    from pathtracer_tpu.utils.imageio import load_png, save_image

    img01 = np.random.default_rng(3).random((9, 9, 3)).astype(np.float32)
    p = save_image(str(tmp_path / "x.png"), img01)
    back = load_png(p).astype(np.float32) / 255.0
    np.testing.assert_allclose(back, img01, atol=1 / 255.0 + 1e-6)
