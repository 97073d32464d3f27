"""Multi-chip rendering and differentiable training over a device mesh.

The reference's parallelism is a goroutine worker pool over image buckets
with a mutex-guarded framebuffer (rt/bucket_renderer.go:194-300).  The
TPU-native equivalent: the ray megabatch is sharded over a 1-D
``jax.sharding.Mesh`` axis ``'rays'`` with ``shard_map`` — every device
traces its ray slice against the (replicated, small) scene and produces a
partial framebuffer; one ``psum`` over ICI replaces the mutex (SURVEY.md
§2.9, §5-distributed).

``train_step`` is the differentiable path: pixel-MSE loss against a target
image, reverse-mode gradients w.r.t. the material/texture/emission tables.
Because the loss is already a ``psum``-reduced scalar inside ``shard_map``,
the backward pass all-reduces parameter gradients over ICI automatically
(psum transposes to psum), overlapped by XLA with the backward compute —
the BASELINE north-star reduction pattern.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:
    from jax import shard_map  # jax >= 0.8
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from ..camera import Camera, generate_rays
from ..geometry.scene import Scene
from ..integrator import wavefront

RAY_AXIS = "rays"


def make_mesh(n_devices: Optional[int] = None) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise RuntimeError(
                f"need {n_devices} devices, have {len(devices)} "
                "(set XLA_FLAGS=--xla_force_host_platform_device_count=N for CPU tests)"
            )
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (RAY_AXIS,))


def _rays_per_device(scene, cam: Camera, spp: int, n_dev: int) -> int:
    from ..render.renderer import ray_layout, scene_tiled

    _, _, n_virt = ray_layout(
        cam.image_width, cam.image_height, scene_tiled(scene)
    )
    total = n_virt * spp
    per = -(-total // n_dev)
    return int(-(-per // 256) * 256)  # pad to VPU-friendly multiples


def _device_accum(scene, cam: Camera, start, count: int, spp: int, seed,
                  differentiable: bool = False):
    """Partial framebuffer for rays [start, start+count) of the global
    sample-major ray stream (invalid ids masked)."""
    from ..render.renderer import _id_to_pixel, ray_layout, scene_tiled

    w, h = cam.image_width, cam.image_height
    tiled = scene_tiled(scene)
    n_pixels = w * h
    _, _, n_virt = ray_layout(w, h, tiled)
    total = n_virt * spp
    ids = start + jnp.arange(count, dtype=jnp.uint32)
    valid = ids < total
    ids = jnp.minimum(ids, total - 1)
    px, py, in_bounds = _id_to_pixel(ids % n_virt, w, h, tiled)
    valid = valid & in_bounds
    pixel = (py * w + jnp.minimum(px, w - 1)).astype(jnp.uint32)
    pixel = jnp.minimum(pixel, w * h - 1)
    stream = ids  # spp-independent (see renderer._render_chunk)
    o, d, tm = generate_rays(cam, px, py, stream, seed)
    radiance = wavefront.trace(
        scene, cam, o, d, tm, stream, seed, differentiable=differentiable
    )
    rows = jnp.where(valid[:, None], radiance.rows(), 0.0)
    return jnp.zeros((n_pixels, 3), jnp.float32).at[pixel].add(rows)


@partial(jax.jit, static_argnames=("cam", "spp", "mesh"))
def render_sharded(scene: Scene, cam: Camera, mesh: Mesh, seed, *, spp: int):
    """Render with rays data-parallel over the mesh; returns the summed
    accumulation buffer [H, W, 3] (replicated on every device)."""
    n_dev = mesh.devices.size
    per = _rays_per_device(scene, cam, spp, n_dev)
    starts = jnp.arange(n_dev, dtype=jnp.uint32) * jnp.uint32(per)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(RAY_AXIS), P()),
        out_specs=P(),
    )
    def run(scene_rep, start, seed_rep):
        partial_fb = _device_accum(scene_rep, cam, start[0], per, spp, seed_rep)
        return jax.lax.psum(partial_fb, RAY_AXIS)

    fb = run(scene, starts, seed)
    return fb.reshape(cam.image_height, cam.image_width, 3)


# -----------------------------------------------------------------------------
# Differentiable training step (inverse rendering)
# -----------------------------------------------------------------------------

def trainable_params(scene: Scene):
    """The parameter pytree BASELINE targets gradients for: material fuzz /
    IOR, texture colors (albedo + emission), texture image maps, and —
    when the scene has an HDRI — the environment texels (env maps are
    texture maps too; the miss shader derives its footprint table from
    env.data in-trace, lights/hdri.quad_table)."""
    p = dict(
        fuzz=scene.materials.fuzz,
        ior=scene.materials.ior,
        color=scene.textures.color,
        even_color=scene.textures.even_color,
        odd_color=scene.textures.odd_color,
        atlas=scene.textures.atlas,
    )
    if scene.env is not None:
        p["env_data"] = scene.env.data
    return p


def apply_params(scene: Scene, params) -> Scene:
    env = scene.env
    if env is not None and "env_data" in params:
        env = env._replace(data=params["env_data"])
    return dataclasses.replace(
        scene,
        env=env,
        materials=scene.materials._replace(fuzz=params["fuzz"], ior=params["ior"]),
        textures=scene.textures._replace(
            color=params["color"],
            even_color=params["even_color"],
            odd_color=params["odd_color"],
            atlas=params["atlas"],
        ),
    )


@partial(jax.jit, static_argnames=("cam", "spp", "mesh"))
def train_step(scene: Scene, cam: Camera, mesh: Mesh, target, seed, lr, *, spp: int):
    """One SGD step of inverse rendering: rays sharded over the mesh,
    scalar loss and parameter grads psum-reduced over ICI inside the
    backward pass.  Returns (new_scene, loss)."""
    n_dev = mesh.devices.size
    per = _rays_per_device(scene, cam, spp, n_dev)
    starts = jnp.arange(n_dev, dtype=jnp.uint32) * jnp.uint32(per)
    n_pixels = cam.image_width * cam.image_height
    target_flat = target.reshape(n_pixels, 3)

    def loss_fn(params):
        scene_p = apply_params(scene, params)

        @partial(
            shard_map,
            mesh=mesh,
            in_specs=(P(), P(RAY_AXIS), P()),
            out_specs=P(),
        )
        def sharded_loss(scene_rep, start, seed_rep):
            fb = _device_accum(
                scene_rep, cam, start[0], per, spp, seed_rep,
                differentiable=True,
            )
            fb = jax.lax.psum(fb, RAY_AXIS)
            err = fb / spp - target_flat
            return jnp.mean(err * err)[None]

        return sharded_loss(scene_p, starts, seed)[0]

    params = trainable_params(scene)
    loss, grads = jax.value_and_grad(loss_fn)(params)
    new_params = jax.tree_util.tree_map(lambda p, g: p - lr * g, params, grads)
    return apply_params(scene, new_params), loss
