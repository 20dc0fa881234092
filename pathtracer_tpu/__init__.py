"""pathtracer_tpu — a TPU-native differentiable path tracing framework.

Brand-new JAX/XLA/Pallas re-design with the capability set of the
CIS565-Fall-2012 Project2-Pathtracer reference (camera raycast with
jittered supersampling, analytic sphere/cube instancing, diffuse /
perfect-specular / Fresnel-refractive BSDFs, emittance accumulation,
wavefront parallelization-by-ray with stream compaction) plus
differentiability and multi-chip scaling, which the reference lacks.
"""

from pathtracer_tpu.config import RenderConfig
from pathtracer_tpu.scene.parser import load_scene, parse_scene_text
from pathtracer_tpu.scene.structs import Camera, Geoms, Materials, Rays, Scene
from pathtracer_tpu.render.integrator import render, render_chunk

__version__ = "0.1.0"

__all__ = [
    "RenderConfig",
    "load_scene",
    "parse_scene_text",
    "Camera",
    "Geoms",
    "Materials",
    "Rays",
    "Scene",
    "render",
    "render_chunk",
]
