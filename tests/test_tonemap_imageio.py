"""Tone-map parity with the reference gamma pipeline (image.cpp:40-43) and
PNG/BMP writer round-trips."""

import os

import numpy as np

from pathtracer_tpu.ops.tonemap import to_uint8, tonemap
from pathtracer_tpu.utils.imageio import encode_bmp, load_png, save_image


def test_tonemap_progressive_average_gamma():
    # accum is a SUM over iterations; reference divides by iteration count
    # then applies gamma 1/2.2 (main.cpp:143-147, image.cpp:40-43)
    accum = np.full((2, 2, 3), 8.0, np.float32)  # 16 iters of 0.5
    img = np.asarray(tonemap(accum, 16))
    np.testing.assert_allclose(img, 0.5 ** (1 / 2.2), atol=1e-6)


def test_tonemap_clamps():
    accum = np.array([[[5.0, -1.0, 0.25]]], np.float32)
    img = np.asarray(tonemap(accum, 1))
    assert img[0, 0, 0] == 1.0
    assert img[0, 0, 1] == 0.0
    np.testing.assert_allclose(img[0, 0, 2], 0.25 ** (1 / 2.2), atol=1e-6)


def test_to_uint8():
    img = np.array([[[0.0, 0.5, 1.0]]], np.float32)
    u = np.asarray(to_uint8(img))
    assert list(u[0, 0]) == [0, 127, 255]


def test_png_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    img = rng.random((13, 17, 3)).astype(np.float32)
    p = save_image(str(tmp_path / "x.png"), img)
    back = load_png(p).astype(np.float32) / 255.0
    np.testing.assert_allclose(back, np.clip(img, 0, 1), atol=1 / 255.0 + 1e-6)


def test_bmp_format(tmp_path):
    img = np.zeros((2, 3, 3), np.uint8)
    img[0, 0] = [255, 0, 0]  # top-left red
    data = encode_bmp(img)
    assert data[:2] == b"BM"
    # 24bpp, bottom-up: last row in file is the top image row; BGR order
    # pixel data offset 54; row stride = 3*3 padded to 12
    top_row = data[54 + 12 : 54 + 24]
    assert top_row[0:3] == bytes([0, 0, 255])  # BGR of red


def test_save_image_extension_handling(tmp_path):
    img = np.full((4, 4, 3), 0.5, np.float32)
    p1 = save_image(str(tmp_path / "a.bmp"), img)
    assert p1.endswith(".bmp") and os.path.getsize(p1) > 54
    # trailing \r tolerated (reference image.cpp:67-71 OSX quirk)
    p2 = save_image(str(tmp_path / "b.png") + "\r", img)
    assert p2.endswith("b.png")
    # unknown extension falls back to png
    p3 = save_image(str(tmp_path / "c.tga"), img)
    assert p3.endswith(".png")


def test_checkpoint_roundtrip(tmp_path):
    from pathtracer_tpu.utils import checkpoint as ckpt

    accum = np.random.default_rng(1).random((64, 3)).astype(np.float32)
    path = str(tmp_path / "state.npz")
    ckpt.save(path, accum, spp_done=37, frame=1, seed=9)
    st = ckpt.load(path)
    np.testing.assert_array_equal(st["accum"], accum)
    assert st["spp_done"] == 37 and st["frame"] == 1 and st["seed"] == 9
    assert ckpt.load(str(tmp_path / "missing.npz")) is None
