"""Integrator correctness: analytic light-transport checks and gradients."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

import go_raytracing_tpu as grt
from go_raytracing_tpu.camera import Camera, generate_rays
from go_raytracing_tpu.integrator import wavefront


def _tiny(cam, w=64, spp=4, depth=8):
    return dataclasses.replace(cam, image_width=w, samples_per_pixel=spp, max_depth=depth)


def test_white_furnace_plane():
    """Camera looking straight down at a Lambertian plane under a flat
    white background: every path is camera -> plane -> background, so the
    linear pixel value is exactly the albedo (per sample, zero variance in
    the value)."""
    albedo = 0.37
    b = grt.SceneBuilder()
    b.plane((0, -1, 0), (0, 1, 0), b.lambertian((albedo, albedo, albedo)))
    scene = b.build()
    cam = Camera(
        image_width=8, aspect_ratio=1.0, samples_per_pixel=16, max_depth=4,
        look_from=(0, 1, 0), look_at=(0, -1, 0), vup=(0, 0, 1),
        vfov=40.0, background=(1.0, 1.0, 1.0),
    )
    accum = grt.render(scene, cam, spp=16, seed=0)
    linear = np.asarray(accum) / 16.0
    np.testing.assert_allclose(linear, albedo, rtol=1e-4, atol=1e-4)


def test_background_and_sky_gradient():
    b = grt.SceneBuilder()
    b.lambertian((0.5, 0.5, 0.5))
    scene = b.build()
    cam = Camera(
        image_width=4, aspect_ratio=1.0, samples_per_pixel=4, max_depth=3,
        look_from=(0, 0, 0), look_at=(0, 0, -1), background=(0.2, 0.4, 0.6),
    )
    linear = np.asarray(grt.render(scene, cam, spp=4)) / 4.0
    np.testing.assert_allclose(
        linear, np.broadcast_to([0.2, 0.4, 0.6], linear.shape), atol=1e-5
    )
    # sky gradient: top of image bluer-ish mix toward (0.5,0.7,1.0)
    cam2 = dataclasses.replace(cam, use_sky_gradient=True, image_width=8)
    img = np.asarray(grt.render(scene, cam2, spp=4)) / 4.0
    assert img[0].mean() != img[-1].mean()
    assert np.all(img >= 0.49) and np.all(img <= 1.01)


def test_emissive_quad_direct_view():
    """Looking straight at a light: pixel = emission (allow_light on the
    primary segment, rt/camera.go:477-480)."""
    b = grt.SceneBuilder()
    light = b.diffuse_light((3.0, 2.0, 1.0))
    b.quad((-5, -5, -2), (10, 0, 0), (0, 10, 0), light)
    scene = b.build()
    cam = Camera(
        image_width=4, aspect_ratio=1.0, samples_per_pixel=4, max_depth=3,
        look_from=(0, 0, 0), look_at=(0, 0, -1), background=(0, 0, 0), vfov=30.0,
    )
    linear = np.asarray(grt.render(scene, cam, spp=4)) / 4.0
    np.testing.assert_allclose(
        linear, np.broadcast_to([3.0, 2.0, 1.0], linear.shape), atol=1e-5
    )


def test_metal_mirror_reflects_light():
    """Perfect mirror at 45 deg bounces the view ray into a light panel."""
    b = grt.SceneBuilder()
    mirror = b.metal((1.0, 1.0, 1.0), 0.0)
    b.quad((-2, -2, 0), (4, 0, 0), (0, 4, -4), mirror)  # 45 deg plane through (0,0,-2)
    light = b.diffuse_light((5.0, 5.0, 5.0))
    b.quad((-3, 5, -6), (6, 0, 0), (0, 0, 6), light)  # ceiling panel
    scene = b.build()
    cam = Camera(
        image_width=4, aspect_ratio=1.0, samples_per_pixel=8, max_depth=4,
        look_from=(0, 0, 0), look_at=(0, 0, -1), background=(0, 0, 0), vfov=5.0,
    )
    linear = np.asarray(grt.render(scene, cam, spp=8)) / 8.0
    np.testing.assert_allclose(linear, 5.0, atol=1e-4)


def test_dielectric_straight_through():
    """Normal-incidence ray through glass mostly continues straight
    (Schlick reflectance at cos=1 for ior 1.5 is 4%)."""
    b = grt.SceneBuilder()
    glass = b.dielectric(1.5)
    b.sphere((0, 0, -3), 1.0, glass)
    light = b.diffuse_light((1.0, 1.0, 1.0))
    b.quad((-4, -4, -10), (8, 0, 0), (0, 8, 0), light)
    scene = b.build()
    cam = Camera(
        image_width=2, aspect_ratio=1.0, samples_per_pixel=256, max_depth=8,
        look_from=(0, 0, 0), look_at=(0, 0, -1), background=(0, 0, 0), vfov=2.0,
    )
    linear = np.asarray(grt.render(scene, cam, spp=256)) / 256.0
    # most samples pass through both interfaces (0.96^2 ~ 0.92); reflected
    # paths leave the scene (background black)
    assert 0.8 < linear.mean() <= 1.0


def test_nee_mis_energy_reproduces_reference_quirk():
    """A diffuse floor lit by a small quad light, NEE+MIS vs BRDF-only.

    The reference's NEE contribution is emission * cos/pdfL * w * albedo
    (rt/camera.go:666-669) — it omits the 1/pi Lambertian BRDF factor that
    its own cosine-sampled BRDF path implies, so MIS renders are up to
    ~pi x brighter in direct light than BRDF-only renders of the same
    scene.  We reproduce the reference algorithm exactly, so assert the
    ratio lands in (1, pi] rather than at equality — and that it is
    deterministic across seeds."""

    def build(with_light):
        b = grt.SceneBuilder()
        floor = b.lambertian((0.8, 0.8, 0.8))
        b.quad((-5, 0, -5), (10, 0, 0), (0, 0, 10), floor)
        light = b.diffuse_light((10, 10, 10))
        q = b.quad((-1, 4, -1), (2, 0, 0), (0, 0, 2), light)
        if with_light:
            b.add_light(q)
        return b.build()

    cam = Camera(
        image_width=16, aspect_ratio=1.0, samples_per_pixel=1, max_depth=6,
        look_from=(0, 2, 6), look_at=(0, 0, 0), background=(0, 0, 0), vfov=40.0,
    )
    spp = 600
    mis = np.asarray(grt.render(build(True), cam, spp=spp, seed=1)) / spp
    mis2 = np.asarray(grt.render(build(True), cam, spp=spp, seed=3)) / spp
    brdf = np.asarray(grt.render(build(False), cam, spp=spp, seed=2)) / spp
    ratio = mis.mean() / max(brdf.mean(), 1e-9)
    assert 1.0 < ratio < np.pi + 0.3, ratio
    # NEE estimator has low variance: two seeds agree closely
    assert abs(mis.mean() - mis2.mean()) / mis.mean() < 0.05


def test_gradient_wrt_albedo_matches_finite_difference():
    """d(mean pixel)/d(albedo) via jax.grad vs central finite differences
    on the furnace-plane scene (BASELINE gradient target)."""

    def build(albedo):
        b = grt.SceneBuilder()
        b.plane((0, -1, 0), (0, 1, 0), b.lambertian((albedo, albedo, albedo)))
        return b.build()

    cam = Camera(
        image_width=4, aspect_ratio=1.0, samples_per_pixel=8, max_depth=4,
        look_from=(0, 1, 0), look_at=(0, -1, 0), vup=(0, 0, 1),
        vfov=40.0, background=(1.0, 1.0, 1.0),
    )
    scene = build(0.4)

    def loss(colors):
        s = dataclasses.replace(
            scene, textures=scene.textures._replace(color=colors)
        )
        return jnp.mean(
            grt.render(s, cam, spp=8, seed=0, differentiable=True) / 8.0
        )

    g = jax.grad(loss)(scene.textures.color)
    eps = 1e-3
    lo = loss(scene.textures.color - eps)
    hi = loss(scene.textures.color + eps)
    fd = (hi - lo) / (2 * eps * scene.textures.color.size)
    # Each of the 3 channels contributes; compare total derivative
    np.testing.assert_allclose(float(jnp.sum(g)), float(fd) * scene.textures.color.size,
                               rtol=1e-2)


def test_volume_darkens_light():
    """Dense black smoke between camera and light absorbs it."""
    def build(density):
        b = grt.SceneBuilder()
        light = b.diffuse_light((4, 4, 4))
        b.quad((-5, -5, -8), (10, 0, 0), (0, 10, 0), light)
        if density > 0:
            b.volume_box((-5, -5, -6), (5, 5, -2), density, (0, 0, 0))
        return b.build()

    cam = Camera(
        image_width=4, aspect_ratio=1.0, samples_per_pixel=64, max_depth=8,
        look_from=(0, 0, 0), look_at=(0, 0, -1), background=(0, 0, 0), vfov=20.0,
    )
    clear = np.asarray(grt.render(build(0.0), cam, spp=64)) / 64.0
    foggy = np.asarray(grt.render(build(2.0), cam, spp=64)) / 64.0
    assert clear.mean() > 3.9
    assert foggy.mean() < 0.5 * clear.mean()


def test_phantom_hdri_primary_black():
    env = np.full((8, 16, 3), 2.0, np.float32)
    b = grt.SceneBuilder()
    b.lambertian((0.5, 0.5, 0.5))
    b.set_environment(env)
    scene = b.build()
    cam = Camera(
        image_width=4, aspect_ratio=1.0, samples_per_pixel=4, max_depth=3,
        look_from=(0, 0, 0), look_at=(0, 0, -1), phantom_hdri=True,
    )
    linear = np.asarray(grt.render(scene, cam, spp=4)) / 4.0
    np.testing.assert_allclose(linear, 0.0, atol=1e-6)
    # without phantom, primary rays see the env
    cam2 = dataclasses.replace(cam, phantom_hdri=False)
    linear2 = np.asarray(grt.render(scene, cam2, spp=4)) / 4.0
    np.testing.assert_allclose(linear2, 2.0, atol=1e-5)


def test_hdri_plus_area_light_nee():
    """Combined HDRI NEE + area-light NEE (sampleLightMIS does both when
    lights exist and env importance sampling is on, rt/camera.go:538-562).
    No reference scene exercises this combination; our implementation
    must still be finite, deterministic, and brighter than area-light-only."""
    env = np.full((8, 16, 3), 0.8, np.float32)
    env[2, 4] = (40.0, 40.0, 40.0)

    def build(with_env):
        b = grt.SceneBuilder()
        floor = b.lambertian((0.6, 0.6, 0.6))
        b.quad((-5, 0, -5), (10, 0, 0), (0, 0, 10), floor)
        q = b.quad((-1, 4, -1), (2, 0, 0), (0, 0, 2), b.diffuse_light((5, 5, 5)))
        b.add_light(q)
        if with_env:
            b.set_environment(env)
        return b.build()

    cam = Camera(
        image_width=12, aspect_ratio=1.0, samples_per_pixel=8, max_depth=4,
        look_from=(0, 2, 6), look_at=(0, 0, 0), background=(0, 0, 0), vfov=40.0,
    )
    with_env = np.asarray(grt.render(build(True), cam, spp=8, seed=4)) / 8
    with_env2 = np.asarray(grt.render(build(True), cam, spp=8, seed=4)) / 8
    area_only = np.asarray(grt.render(build(False), cam, spp=8, seed=4)) / 8
    np.testing.assert_array_equal(with_env, with_env2)  # deterministic
    assert np.isfinite(with_env).all()
    assert with_env.mean() > area_only.mean()  # env adds light


def test_free_camera_matches_lookat():
    """EnableFreeCamera with forward == unit(look_at - look_from) must
    produce the same image as the look-at camera (rt/camera.go:226-232)."""
    b = grt.SceneBuilder()
    b.sphere((0, 0, -3), 1.0, b.lambertian((0.7, 0.3, 0.2)))
    scene = b.build()
    base = Camera(
        image_width=12, aspect_ratio=1.0, samples_per_pixel=4, max_depth=3,
        look_from=(0, 0.5, 1), look_at=(0, 0, -3), use_sky_gradient=True,
        vfov=50.0,
    )
    import numpy.linalg as la

    fwd = np.asarray(base.look_at) - np.asarray(base.look_from)
    free = base.enable_free_camera(base.look_from, fwd / la.norm(fwd), (0, 1, 0))
    a = np.asarray(grt.render(scene, base, spp=4, seed=1))
    c = np.asarray(grt.render(scene, free, spp=4, seed=1))
    np.testing.assert_allclose(a, c, rtol=1e-4, atol=1e-4)
