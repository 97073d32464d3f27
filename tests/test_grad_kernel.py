"""Gradient megakernel (ops/pallas_wavefront grad_mode) equivalence.

The kernel computes the ENTIRE fwd+bwd of the bounce loop in one pallas
launch, with a hand-derived product-chain adjoint (valid under the
grad_applicable gate: every material's scatter direction is
parameter-independent).  These tests pin it, in interpret mode, against
jax.grad of the differentiable XLA path on a scene exercising every
gradient source the kernel handles: solid albedo, checker even/odd,
emission color (both the emitted-hit and NEE terms), volume albedo,
firefly-clamped NEE, and the miss background at every bounce depth.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import go_raytracing_tpu as grt
from go_raytracing_tpu.camera import Camera, generate_rays
from go_raytracing_tpu.integrator import wavefront
from go_raytracing_tpu.ops import pallas_wavefront as mega
from go_raytracing_tpu.parallel.sharding import apply_params, trainable_params


def _mini_cornell():
    b = grt.SceneBuilder()
    white = b.lambertian((0.73, 0.72, 0.71))
    red = b.lambertian((0.65, 0.05, 0.05))
    checker = b.lambertian(b.checker(2.0, (0.2, 0.3, 0.1), (0.9, 0.9, 0.8)))
    light = b.diffuse_light((15.0, 14.0, 13.0))
    b.quad((0, 0, 0), (555, 0, 0), (0, 0, 555), checker)        # floor
    b.quad((555, 0, 0), (0, 555, 0), (0, 0, 555), red)          # right
    b.quad((555, 555, 555), (-555, 0, 0), (0, 0, -555), white)  # ceiling
    q = b.quad((213, 554, 227), (130, 0, 0), (0, 0, 105), light)
    b.add_light(q)
    b.box((150, 0, 150), (350, 200, 350), white)
    b.volume_box((0.1, 0.1, 0.1), (554.9, 554.9, 554.9), 0.0008,
                 (0.9, 0.95, 1.0))
    scene = b.build()
    cam = Camera(image_width=24, aspect_ratio=1.0, samples_per_pixel=4,
                 max_depth=4, look_from=(278, 278, -800),
                 look_at=(278, 278, 0), vfov=40.0,
                 background=(0.02, 0.01, 0.03))
    return scene, cam


def test_grad_kernel_matches_autodiff():
    scene, cam = _mini_cornell()
    mega.INTERPRET = True
    try:
        assert mega.grad_applicable(scene, cam.max_depth)
        r = 24 * 24 * 4
        ids = jnp.arange(r, dtype=jnp.uint32)
        px = ((ids % (24 * 24)) % 24).astype(jnp.int32)
        py = ((ids % (24 * 24)) // 24).astype(jnp.int32)
        o, d, tm = generate_rays(cam, px, py, ids, 0)
        g = jnp.asarray(
            np.random.default_rng(0).uniform(size=(r, 3)) * 1e-3,
            jnp.float32)

        rad_k, gk = mega.grad_megakernel(
            scene, cam, o, d, tm, ids, 0, (g[:, 0], g[:, 1], g[:, 2]))

        # radiance: matches the standard integrator's full radiance
        rad_ref = wavefront.trace(scene, cam, o, d, tm, ids, 0,
                                  differentiable=False)
        np.testing.assert_allclose(
            np.asarray(rad_k.rows()), np.asarray(rad_ref.rows()),
            rtol=1e-4, atol=1e-5)

        # gradients: match jax.grad of the differentiable path
        def inner(params):
            s = apply_params(scene, params)
            rad = wavefront.trace(s, cam, o, d, tm, ids, 0,
                                  differentiable=True)
            return jnp.sum(rad.rows() * g)

        gx = jax.grad(inner)(trainable_params(scene))
        for k in ("color", "even_color", "odd_color"):
            assert np.abs(np.asarray(gx[k])).max() > 1e-4, k
            np.testing.assert_allclose(
                np.asarray(gk[k]), np.asarray(gx[k]), rtol=2e-3,
                atol=1e-7, err_msg=k)
    finally:
        mega.INTERPRET = False


def test_grad_kernel_gate():
    """Metal/dielectric (direction depends on fuzz/ior) must leave the
    product-chain gate (the PATHWISE kernel takes them), and env + NEE
    light must fall back to the XLA replay path."""
    scene, cam = _mini_cornell()
    mega.INTERPRET = True
    try:
        assert mega.grad_applicable(scene, cam.max_depth)

        b = grt.SceneBuilder()
        b.sphere((0, 0, -3), 1.0, b.metal((0.8, 0.8, 0.8), fuzz=0.3))
        q = b.quad((-1, 4, -1), (2, 0, 0), (0, 0, 2),
                   b.diffuse_light((5, 5, 5)))
        b.add_light(q)
        s2 = b.build()
        assert not mega.grad_applicable(s2, 4)

        # NEE-free env scenes are ADMITTED since round 4 (miss-only env:
        # texel scatter + λ_mdir stream, see grad_megakernel) ...
        b = grt.SceneBuilder()
        b.sphere((0, 0, -3), 1.0, b.lambertian((0.5, 0.5, 0.5)))
        b.set_environment(np.full((4, 8, 3), 0.5, np.float32))
        s3 = b.build()
        assert mega.grad_applicable(s3, 4)

        # ... but env + NEE quad light leaves the PRODUCT gate (the
        # pathwise kernel takes it — per-bounce texel cotangent rows).
        b = grt.SceneBuilder()
        b.sphere((0, 0, -3), 1.0, b.lambertian((0.5, 0.5, 0.5)))
        q = b.quad((-1, 4, -1), (2, 0, 0), (0, 0, 2),
                   b.diffuse_light((5, 5, 5)))
        b.add_light(q)
        b.set_environment(np.full((4, 8, 3), 0.5, np.float32))
        s4 = b.build()
        assert not mega.grad_applicable(s4, 4)
    finally:
        mega.INTERPRET = False


def test_render_grad_uses_kernel_and_matches():
    """render_grad routes applicable scenes through the gradient kernel;
    its loss/grads match the XLA replay path (GRT_NO_GRADKERNEL=1)."""
    import os

    from go_raytracing_tpu.render.grad import render_grad

    scene, cam = _mini_cornell()
    cam = dataclasses.replace(cam, image_width=16, samples_per_pixel=2,
                              max_depth=3)
    target = np.zeros((16, 16, 3), np.float32)
    mega.INTERPRET = True
    try:
        loss_k, gk = render_grad(scene, cam, target, spp=2, seed=0)
        os.environ["GRT_NO_GRADKERNEL"] = "1"
        try:
            loss_x, gx = render_grad(scene, cam, target, spp=2, seed=0)
        finally:
            del os.environ["GRT_NO_GRADKERNEL"]
        np.testing.assert_allclose(float(loss_k), float(loss_x), rtol=1e-5)
        for k in gx:
            np.testing.assert_allclose(
                np.asarray(gk[k]), np.asarray(gx[k]), rtol=3e-3,
                atol=1e-8, err_msg=k)
    finally:
        mega.INTERPRET = False


def test_grad_kernel_admits_noise_scenes():
    """Marble (noise) albedo is parameter-FREE grayscale, so the product
    kernel admits noise scenes (round 4): noise winners route to the
    null cotangent slot and the remaining color/emission gradients match
    jax.grad exactly (rt/perlin.go — NoiseTexture has no trainable
    parameters)."""
    from go_raytracing_tpu.camera import generate_rays
    from go_raytracing_tpu.integrator import wavefront
    from go_raytracing_tpu.parallel.sharding import (apply_params,
                                                     trainable_params)

    b = grt.SceneBuilder()
    b.quad((-6, 0, -6), (12, 0, 0), (0, 0, 12),
           b.lambertian(b.noise(2.0)))              # marble floor
    b.sphere((0, 1, 0), 1.0, b.lambertian((0.2, 0.4, 0.7)))
    b.sphere((-2.2, 0.8, 0.5), 0.8, b.lambertian(b.noise(4.0)))
    q = b.quad((-1.5, 5, -1.5), (3, 0, 0), (0, 0, 3),
               b.diffuse_light((8, 8, 8)))
    b.add_light(q)
    scene = b.build()
    assert scene.has_noise
    from go_raytracing_tpu.camera import Camera
    cam = Camera(image_width=16, aspect_ratio=1.0, samples_per_pixel=4,
                 max_depth=4, look_from=(0, 3, 7), look_at=(0, 1, 0),
                 background=(0.05, 0.05, 0.1), vfov=45.0)
    old_br = mega.BLOCK_ROWS
    mega.INTERPRET, mega.BLOCK_ROWS = True, 8
    try:
        assert mega.grad_applicable(scene, cam.max_depth)
        r = 16 * 16 * 4
        ids = jnp.arange(r, dtype=jnp.uint32)
        px = ((ids % 256) % 16).astype(jnp.int32)
        py = ((ids % 256) // 16).astype(jnp.int32)
        o, d, tm = generate_rays(cam, px, py, ids, 0)
        g = jnp.asarray(
            np.random.default_rng(3).uniform(size=(r, 3)) * 1e-3,
            jnp.float32)
        rad_k, gk = mega.grad_megakernel(
            scene, cam, o, d, tm, ids, 0, (g[:, 0], g[:, 1], g[:, 2]))
        rad_ref = wavefront.trace(scene, cam, o, d, tm, ids, 0,
                                  differentiable=False)
        np.testing.assert_allclose(np.asarray(rad_k.rows()),
                                   np.asarray(rad_ref.rows()),
                                   rtol=1e-4, atol=1e-5)

        def inner(p):
            s = apply_params(scene, p)
            rad = wavefront.trace(s, cam, o, d, tm, ids, 0,
                                  differentiable=True)
            return jnp.sum(rad.rows() * g)

        gx = jax.grad(inner)(trainable_params(scene))
        assert np.abs(np.asarray(gx["color"])).max() > 1e-6
        for k in ("color", "even_color", "odd_color"):
            np.testing.assert_allclose(
                np.asarray(gk[k]), np.asarray(gx[k]), rtol=5e-3,
                atol=1e-7, err_msg=k)
    finally:
        mega.INTERPRET, mega.BLOCK_ROWS = False, old_br
