"""ctypes bridge to the native C++ runtime library (``native/``).

Covers the host-side subsystems the reference implements in C++: the
scene-DSL loader (``src/scene.cpp``) and image encoding (``src/image.cpp``
+ stb).  The library is built lazily with ``make -C native`` on first use;
every entry point has a pure-Python fallback, so the native layer is a
fast path, never a hard dependency.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libptnative.so"))

_lock = threading.Lock()
_lib = None
_tried = False


def _load():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH):
            try:
                subprocess.run(
                    ["make", "-C", os.path.abspath(_NATIVE_DIR)],
                    check=True,
                    capture_output=True,
                    timeout=120,
                )
            except Exception:
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        lib.pt_parse_scene.restype = ctypes.c_void_p
        lib.pt_parse_scene.argtypes = [ctypes.c_char_p]
        lib.pt_scene_error.restype = ctypes.c_char_p
        lib.pt_scene_error.argtypes = [ctypes.c_void_p]
        for name in ("pt_num_materials", "pt_num_objects", "pt_num_frames", "pt_iterations"):
            getattr(lib, name).restype = ctypes.c_int
            getattr(lib, name).argtypes = [ctypes.c_void_p]
        for name in ("pt_fovy", "pt_aperture", "pt_focal"):
            getattr(lib, name).restype = ctypes.c_float
            getattr(lib, name).argtypes = [ctypes.c_void_p]
        lib.pt_image_name.restype = ctypes.c_char_p
        lib.pt_image_name.argtypes = [ctypes.c_void_p]
        lib.pt_free_scene.argtypes = [ctypes.c_void_p]
        ip = ctypes.POINTER(ctypes.c_int)
        fp = ctypes.POINTER(ctypes.c_float)
        lib.pt_resolution.argtypes = [ctypes.c_void_p, ip]
        lib.pt_materials.argtypes = [ctypes.c_void_p, fp]
        lib.pt_objects.argtypes = [ctypes.c_void_p, ip, ip]
        lib.pt_object_frames.argtypes = [ctypes.c_void_p, fp, fp, fp]
        lib.pt_camera_frames.argtypes = [ctypes.c_void_p, fp, fp, fp]
        lib.pt_write_png.restype = ctypes.c_int
        lib.pt_write_png.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
        ]
        lib.pt_write_bmp.restype = ctypes.c_int
        lib.pt_write_bmp.argtypes = list(lib.pt_write_png.argtypes)
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def parse_scene_text(text: str, name: str = "<native>"):
    """Native scene parse -> SceneDescription (same contract as the
    Python parser in scene/parser.py)."""
    from pathtracer_tpu.scene.parser import SceneParseError
    from pathtracer_tpu.scene.structs import SceneDescription

    lib = _load()
    assert lib is not None
    handle = lib.pt_parse_scene(text.encode())
    try:
        err = lib.pt_scene_error(handle)
        if err:
            raise SceneParseError(f"{name}: {err.decode()}")
        n_mat = lib.pt_num_materials(handle)
        n_obj = lib.pt_num_objects(handle)
        n_frames = lib.pt_num_frames(handle)
        wh = (ctypes.c_int * 2)()
        lib.pt_resolution(handle, ctypes.cast(wh, ctypes.POINTER(ctypes.c_int)))

        mats = np.zeros((n_mat, 16), np.float32)
        lib.pt_materials(handle, mats.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        types = np.zeros(n_obj, np.int32)
        gmats = np.zeros(n_obj, np.int32)
        lib.pt_objects(
            handle,
            types.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            gmats.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        )
        trans = np.zeros((n_frames, n_obj, 3), np.float32)
        rotat = np.zeros_like(trans)
        scale = np.zeros_like(trans)
        fp = ctypes.POINTER(ctypes.c_float)
        lib.pt_object_frames(
            handle,
            trans.ctypes.data_as(fp),
            rotat.ctypes.data_as(fp),
            scale.ctypes.data_as(fp),
        )
        eye = np.zeros((n_frames, 3), np.float32)
        view = np.zeros_like(eye)
        up = np.zeros_like(eye)
        lib.pt_camera_frames(
            handle, eye.ctypes.data_as(fp), view.ctypes.data_as(fp), up.ctypes.data_as(fp)
        )

        n_m = n_mat
        mat_soa = {
            "texture_type": np.zeros(n_m, np.float32),
            "texture_scale": np.ones(n_m, np.float32),
            "texture_color2": np.zeros((n_m, 3), np.float32),
            "bump_scale": np.zeros(n_m, np.float32),
            "bump_amp": np.zeros(n_m, np.float32),
            "texture_image": np.full(n_m, -1.0, np.float32),
            "brdf_model": np.zeros(n_m, np.float32),
            "roughness": np.zeros(n_m, np.float32),
            "roughness_y": np.zeros(n_m, np.float32),
            "phase_g": np.zeros(n_m, np.float32),
            "color": mats[:, 0:3].copy(),
            "specular_exponent": mats[:, 3].copy(),
            "specular_color": mats[:, 4:7].copy(),
            "has_reflective": mats[:, 7].copy(),
            "has_refractive": mats[:, 8].copy(),
            "index_of_refraction": mats[:, 9].copy(),
            "has_scatter": mats[:, 10].copy(),
            "absorption_coefficient": mats[:, 11:14].copy(),
            "reduced_scatter_coefficient": mats[:, 14].copy(),
            "emittance": mats[:, 15].copy(),
        }
        return SceneDescription(
            frames=n_frames,
            iterations=lib.pt_iterations(handle),
            image_name=lib.pt_image_name(handle).decode(),
            resolution=(int(wh[0]), int(wh[1])),
            fovy=float(lib.pt_fovy(handle)),
            eye=eye,
            view=view,
            up=up,
            aperture=float(lib.pt_aperture(handle)),
            focal_distance=float(lib.pt_focal(handle)),
            geom_type=types,
            geom_material=gmats,
            translations=trans,
            rotations=rotat,
            scales=scale,
            materials=mat_soa,
        )
    finally:
        lib.pt_free_scene(handle)


def write_png(path: str, rgb8: np.ndarray) -> bool:
    lib = _load()
    if lib is None:
        return False
    h, w, _ = rgb8.shape
    rgb8 = np.ascontiguousarray(rgb8)
    return bool(
        lib.pt_write_png(path.encode(), rgb8.ctypes.data_as(ctypes.c_char_p), w, h)
    )


def write_bmp(path: str, rgb8: np.ndarray) -> bool:
    lib = _load()
    if lib is None:
        return False
    h, w, _ = rgb8.shape
    rgb8 = np.ascontiguousarray(rgb8)
    return bool(
        lib.pt_write_bmp(path.encode(), rgb8.ctypes.data_as(ctypes.c_char_p), w, h)
    )
