"""go_raytracing_tpu — a TPU-native differentiable path tracer.

Brand-new JAX/XLA/Pallas implementation of the byvfx/go-raytracing feature
set (see SURVEY.md): wavefront megabatch path tracing, SoA scene tables,
NEE+MIS area lights, HDRI importance sampling, volumes, instanced meshes,
and multi-chip rendering over a jax.sharding Mesh.
"""

from .camera import Camera, quick_preview, standard_quality, high_quality
from .geometry.scene import Affine, Scene, SceneBuilder
from .render.renderer import (
    RenderStats,
    render,
    render_image,
    render_progressive,
)
from .scenes.builders import REGISTRY, load_scene
from .core import film

__all__ = [
    "Affine",
    "Camera",
    "REGISTRY",
    "RenderStats",
    "Scene",
    "SceneBuilder",
    "film",
    "high_quality",
    "load_scene",
    "quick_preview",
    "render",
    "render_image",
    "render_progressive",
    "standard_quality",
]
