"""go_raytracing_tpu — a TPU-native differentiable path tracer.

Brand-new JAX/XLA/Pallas implementation of the byvfx/go-raytracing feature
set (see SURVEY.md): wavefront megabatch path tracing, SoA scene tables,
NEE+MIS area lights, HDRI importance sampling, volumes, instanced meshes,
and multi-chip rendering over a jax.sharding Mesh.
"""

import os as _os

# Persistent XLA compilation cache: compiles in this environment go through
# a slow remote helper (~minutes for the bounce loop), so caching across
# processes is a large win for tests, benches and repeated renders.
# An explicitly EMPTY env value opts out (tests/conftest.py: cache
# get/put of the 8-device train_step executable wedges under pytest).
_cache_dir = _os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    _os.path.join(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))), ".jax_cache"),
)
if _cache_dir:
    try:  # pragma: no cover
        import jax as _jax

        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

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
