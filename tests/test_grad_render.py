"""Chunked gradient renderer (render/grad.py) vs direct jax.grad."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

import go_raytracing_tpu as grt
from go_raytracing_tpu.camera import Camera
from go_raytracing_tpu.render.grad import render_grad
from go_raytracing_tpu.parallel.sharding import apply_params, trainable_params


def _scene():
    b = grt.SceneBuilder()
    b.quad((-5, 0, -5), (10, 0, 0), (0, 0, 10),
           b.lambertian(b.checker(0.8, (0.7, 0.3, 0.2), (0.2, 0.3, 0.7))))
    b.sphere((0, 1, 0), 1.0, b.metal((0.8, 0.7, 0.6), 0.3))
    b.sphere((-2, 0.7, 1), 0.7, b.lambertian((0.2, 0.6, 0.3)))
    light = b.diffuse_light((5, 5, 5))
    q = b.quad((-1, 4, -1), (2, 0, 0), (0, 0, 2), light)
    b.add_light(q)
    return b.build()


def test_render_grad_matches_direct_grad():
    """Chunked two-pass VJP == jax.grad of the same MSE, across a chunk
    boundary (the decomposition must be exact: the loss is quadratic in
    the framebuffer and RNG streams are chunk-invariant)."""
    scene = _scene()
    cam = Camera(
        image_width=8, aspect_ratio=1.0, samples_per_pixel=4, max_depth=3,
        look_from=(0, 2, 6), look_at=(0, 1, 0), vfov=40.0,
        background=(0.2, 0.3, 0.5),
    )
    spp = 4
    target = np.asarray(
        grt.render(_scene(), cam, spp=spp, seed=9)
    ) / spp * 0.8  # something to fit toward

    loss_c, grads_c = render_grad(scene, cam, target, spp=spp, seed=0,
                                  chunk=128)  # 8*8*4 = 256 rays -> 2 chunks

    def direct_loss(params):
        s = apply_params(scene, params)
        fb = grt.render(s, cam, spp=spp, seed=0, differentiable=True)
        r = fb / spp - jnp.asarray(target)
        return jnp.mean(r * r)

    loss_d, grads_d = jax.value_and_grad(direct_loss)(trainable_params(scene))

    np.testing.assert_allclose(float(loss_c), float(loss_d), rtol=1e-5)
    for k in grads_d:
        np.testing.assert_allclose(
            np.asarray(grads_c[k]), np.asarray(grads_d[k]),
            rtol=2e-4, atol=1e-7, err_msg=k,
        )


def test_render_grad_descends():
    """A few SGD steps with render_grad reduce the fitting loss."""
    scene = _scene()
    cam = Camera(
        image_width=8, aspect_ratio=1.0, samples_per_pixel=4, max_depth=3,
        look_from=(0, 2, 6), look_at=(0, 1, 0), vfov=40.0,
        background=(0.2, 0.3, 0.5),
    )
    # target: same scene with greener checker
    b = _scene()
    tex_target = b.textures._replace(
        even_color=b.textures.even_color.at[:, 1].add(0.2)
    )
    target_scene = dataclasses.replace(b, textures=tex_target)
    target = np.asarray(grt.render(target_scene, cam, spp=4, seed=0)) / 4

    losses = []
    for _ in range(4):
        loss, grads = render_grad(scene, cam, target, spp=4, seed=0)
        losses.append(float(loss))
        params = trainable_params(scene)
        # descend on the parameters that actually differ (checker colors)
        for k in ("even_color", "odd_color"):
            params[k] = jnp.clip(params[k] - 20.0 * grads[k], 0.0, 1.0)
        scene = apply_params(scene, params)
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
