"""Test configuration: force the CPU backend with 8 virtual devices.

Tests never touch the real TPU chip — multi-device behavior is validated
on a virtual CPU mesh (``xla_force_host_platform_device_count``), the
TPU-world equivalent of a fake-backend test rig (SURVEY.md §4.5).

Note: the environment's sitecustomize registers the ``axon`` TPU platform
at interpreter boot, so ``JAX_PLATFORMS=cpu`` in the env is overridden;
forcing via ``jax.config`` after import (before first backend use) works.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

# persistent compilation cache: the suite is compile-dominated on CPU
# (~100 distinct executables); repeat runs skip straight to execution
_cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def cornell():
    from pathtracer_tpu.scene.parser import load_scene

    path = os.path.join(os.path.dirname(__file__), "..", "scenes", "cornell.txt")
    return load_scene(path)


@pytest.fixture(scope="session")
def cornell_scene(cornell):
    return cornell.scene_for_frame(0)


def small_camera(scene, res=(48, 48)):
    import dataclasses

    return dataclasses.replace(
        scene, camera=dataclasses.replace(scene.camera, resolution=res)
    )


@pytest.fixture(scope="session")
def cornell_small(cornell_scene):
    return small_camera(cornell_scene)
