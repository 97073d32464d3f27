"""Localize the NaN in the plain differentiable path's ior gradient
(simple scene).  Run: python scripts/nan_bisect.py"""

import dataclasses
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_debug_nans", True)

import go_raytracing_tpu as grt  # noqa: E402
from go_raytracing_tpu.camera import generate_rays  # noqa: E402
from go_raytracing_tpu.integrator import wavefront  # noqa: E402
from go_raytracing_tpu.parallel.sharding import apply_params, trainable_params  # noqa: E402

scene, cam = grt.load_scene("simple")
cam = dataclasses.replace(cam, image_width=32, aspect_ratio=1.0,
                          samples_per_pixel=2, max_depth=4)
n = 768
stream = jnp.arange(n, dtype=jnp.uint32)
w, h = cam.image_width, cam.image_height
px = (stream % w).astype(jnp.int32)
py = ((stream // w) % h).astype(jnp.int32)
o, d, tm = generate_rays(cam, px, py, stream, 3)

full = trainable_params(scene)


def loss(p):
    merged = dict(full, ior=p["ior"])
    s = apply_params(scene, merged)
    rad = wavefront.trace(s, cam, o, d, tm, stream, 0, differentiable=True)
    return jnp.sum(rad.rows() * 1e-3)


params = {"ior": full["ior"]}


with jax.disable_jit():
    g = jax.grad(loss)(params)
print("grad ior:", g["ior"])
