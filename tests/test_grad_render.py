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


def test_render_grad_image_tier_matches_direct():
    """IMAGE-PREFACTOR gradient tier (round 5): earth-class scenes ride
    the product kernel on the white scene + a nearest-texel segment-sum
    for the atlas (render/grad._grad_image_tier) — loss and ALL grads
    (atlas included) must match jax.grad of the differentiable path."""
    from go_raytracing_tpu.integrator import wavefront
    from go_raytracing_tpu.ops import pallas_wavefront as mega

    rng = np.random.default_rng(5)
    img = rng.uniform(0.1, 0.9, size=(8, 16, 3)).astype(np.float32)
    b = grt.SceneBuilder()
    b.sphere((0, 0, 0), 2.0, b.lambertian(b.image(img)))
    scene = b.build()
    cam = Camera(image_width=12, aspect_ratio=1.0, samples_per_pixel=4,
                 max_depth=3, look_from=(0, 0, 8), look_at=(0, 0, 0),
                 vfov=40.0, use_sky_gradient=True)
    assert wavefront.image_prefactor_ok(scene)
    spp = 4
    target = np.asarray(grt.render(scene, cam, spp=spp, seed=9)) / spp * 0.8

    old = mega.INTERPRET, mega.BLOCK_ROWS
    mega.INTERPRET, mega.BLOCK_ROWS = True, 8
    try:
        assert mega.grad_applicable(wavefront._strip_image(scene),
                                    cam.max_depth)
        loss_k, gk = render_grad(scene, cam, target, spp=spp, seed=0)
    finally:
        mega.INTERPRET, mega.BLOCK_ROWS = old

    def direct_loss(params):
        s = apply_params(scene, params)
        fb = grt.render(s, cam, spp=spp, seed=0, differentiable=True)
        r = fb / spp - jnp.asarray(target)
        return jnp.mean(r * r)

    loss_d, gd = jax.value_and_grad(direct_loss)(trainable_params(scene))
    np.testing.assert_allclose(float(loss_k), float(loss_d), rtol=1e-5)
    assert np.abs(np.asarray(gd["atlas"])).max() > 1e-9, \
        "direct grad produced no atlas signal; test scene too weak"
    for k in gd:
        np.testing.assert_allclose(
            np.asarray(gk[k]), np.asarray(gd[k]), rtol=2e-4, atol=1e-8,
            err_msg=k)


def test_render_grad_two_phase_matches_fused():
    """TWO-PHASE stash-resume (round 5) == the fused single-phase
    kernel path: identical forward/reverse arithmetic with the stash
    routed through HBM, on both the product tier (all-diffuse + sky)
    and the pathwise tier (metal + dielectric)."""
    import os

    from go_raytracing_tpu.ops import pallas_wavefront as mega

    def build(kind):
        b = grt.SceneBuilder()
        b.quad((-5, 0, -5), (10, 0, 0), (0, 0, 10),
               b.lambertian(b.checker(0.8, (0.7, 0.3, 0.2), (0.2, 0.3, 0.7))))
        if kind in ("glossy", "env"):
            b.sphere((0, 1, 0), 1.0, b.metal((0.8, 0.7, 0.6), 0.3))
            b.sphere((-2, 0.7, 1), 0.7, b.dielectric(1.5))
        else:
            b.sphere((0, 1, 0), 1.0, b.lambertian((0.2, 0.6, 0.3)))
        if kind == "env":
            # miss-only env (no NEE lights): the round-5 env two-phase
            rng = np.random.default_rng(7)
            env = rng.uniform(0.05, 1.0, size=(8, 16, 3)).astype(np.float32)
            env[2, 4] = (9.0, 8.0, 7.0)
            b.set_environment(env)
        else:
            light = b.diffuse_light((5, 5, 5))
            q = b.quad((-1, 4, -1), (2, 0, 0), (0, 0, 2), light)
            b.add_light(q)
        return b.build()

    cam = Camera(
        image_width=8, aspect_ratio=1.0, samples_per_pixel=4, max_depth=3,
        look_from=(0, 2, 6), look_at=(0, 1, 0), vfov=40.0,
        use_sky_gradient=True,
    )
    old = mega.INTERPRET, mega.BLOCK_ROWS
    mega.INTERPRET, mega.BLOCK_ROWS = True, 8
    try:
        for kind in ("diffuse", "glossy", "env"):
            scene = build(kind)
            camk = cam
            if kind == "env":
                camk = dataclasses.replace(cam, use_sky_gradient=False,
                                           phantom_hdri=True)
            assert mega.grad_two_phase_ok(scene, camk.max_depth)
            target = np.asarray(grt.render(scene, camk, seed=9)) / 4 * 0.8
            loss2, g2 = render_grad(scene, camk, target, spp=4, seed=0)
            os.environ["GRT_NO_TWOPHASE"] = "1"
            try:
                loss1, g1 = render_grad(scene, camk, target, spp=4, seed=0)
            finally:
                del os.environ["GRT_NO_TWOPHASE"]
            np.testing.assert_allclose(float(loss2), float(loss1),
                                       rtol=1e-6)
            assert set(g1) == set(g2)
            for k in g1:
                np.testing.assert_allclose(
                    np.asarray(g2[k]), np.asarray(g1[k]), rtol=1e-5,
                    atol=1e-9, err_msg=f"{kind}: {k}")
    finally:
        mega.INTERPRET, mega.BLOCK_ROWS = old


def test_render_grad_two_phase_hybrid_prefix():
    """Over-budget jobs stash a PREFIX of chunks and run the rest
    fused: with a budget of exactly one chunk's stash, a 2-chunk job
    must still produce grads identical to the all-fused path."""
    import os

    from go_raytracing_tpu.ops import pallas_wavefront as mega

    b = grt.SceneBuilder()
    b.quad((-5, 0, -5), (10, 0, 0), (0, 0, 10),
           b.lambertian((0.6, 0.5, 0.4)))
    b.sphere((0, 1, 0), 1.0, b.lambertian((0.2, 0.6, 0.3)))
    q = b.quad((-1, 4, -1), (2, 0, 0), (0, 0, 2), b.diffuse_light((5, 5, 5)))
    b.add_light(q)
    scene = b.build()
    cam = Camera(image_width=8, aspect_ratio=1.0, samples_per_pixel=4,
                 max_depth=3, look_from=(0, 2, 6), look_at=(0, 1, 0),
                 vfov=40.0, background=(0.1, 0.2, 0.3))
    target = np.asarray(grt.render(scene, cam, seed=9)) / 4 * 0.8
    old = mega.INTERPRET, mega.BLOCK_ROWS
    mega.INTERPRET, mega.BLOCK_ROWS = True, 8
    # chunk=128 -> 2 chunks of 8*8*4=256 rays; budget covers exactly one
    # chunk's stash (128 rays * depth 3 * 15 rows * 4 B = 23 KB)
    os.environ["GRT_STASH_BUDGET"] = str(128 * 3 * 15 * 4 + 1)
    try:
        loss2, g2 = render_grad(scene, cam, target, spp=4, seed=0,
                                chunk=128)
        os.environ["GRT_NO_TWOPHASE"] = "1"
        try:
            loss1, g1 = render_grad(scene, cam, target, spp=4, seed=0,
                                    chunk=128)
        finally:
            del os.environ["GRT_NO_TWOPHASE"]
        np.testing.assert_allclose(float(loss2), float(loss1), rtol=1e-6)
        for k in g1:
            np.testing.assert_allclose(
                np.asarray(g2[k]), np.asarray(g1[k]), rtol=1e-5,
                atol=1e-9, err_msg=k)
    finally:
        del os.environ["GRT_STASH_BUDGET"]
        mega.INTERPRET, mega.BLOCK_ROWS = old


def test_render_grad_two_phase_tiled_layout():
    """Two-phase on a TILED ray layout (>= 64 spheres routes scenes
    through 32x32 bucket tiling): the [n_virt, 3] fb rows must scatter
    through the virtual-pixel map identically to the fused path."""
    import os

    from go_raytracing_tpu.ops import pallas_wavefront as mega
    from go_raytracing_tpu.render import renderer as rmod

    b = grt.SceneBuilder()
    white = b.lambertian((0.6, 0.55, 0.5))
    b.quad((-40, 0, -40), (80, 0, 0), (0, 0, 80), white)
    blue = b.lambertian((0.2, 0.3, 0.7))
    for i in range(8):
        for j in range(8):
            b.sphere((i * 3 - 10, 0.5, j * 3 - 10), 0.5, blue)
    q = b.quad((-2, 12, -2), (4, 0, 0), (0, 0, 4), b.diffuse_light((7, 7, 7)))
    b.add_light(q)
    scene = b.build()
    assert rmod.scene_tiled(scene), "needs the tiled layout"
    cam = Camera(image_width=12, aspect_ratio=1.0, samples_per_pixel=2,
                 max_depth=3, look_from=(0, 8, 20), look_at=(0, 0, 0),
                 vfov=45.0, background=(0.05, 0.06, 0.08))
    target = np.asarray(grt.render(scene, cam, seed=9)) / 2 * 0.8
    old = mega.INTERPRET, mega.BLOCK_ROWS
    mega.INTERPRET, mega.BLOCK_ROWS = True, 8
    try:
        assert mega.grad_two_phase_ok(scene, cam.max_depth)
        loss2, g2 = render_grad(scene, cam, target, spp=2, seed=0)
        os.environ["GRT_NO_TWOPHASE"] = "1"
        try:
            loss1, g1 = render_grad(scene, cam, target, spp=2, seed=0)
        finally:
            del os.environ["GRT_NO_TWOPHASE"]
        np.testing.assert_allclose(float(loss2), float(loss1), rtol=1e-6)
        for k in g1:
            np.testing.assert_allclose(
                np.asarray(g2[k]), np.asarray(g1[k]), rtol=1e-5,
                atol=1e-9, err_msg=k)
    finally:
        mega.INTERPRET, mega.BLOCK_ROWS = old
