"""Finite-difference gradient matrix (BASELINE gradient contract).

BASELINE.md: "pixel gradients (albedo, fuzz, IOR, texture maps, emission)
allclose to a finite-difference oracle".  Albedo is covered in
test_integrator.py; this file covers the rest of the parameter list:
fuzz, IOR, emission color, checker even/odd colors, and an image atlas.

The RNG is counter-based over (seed, stream, bounce, purpose)
(core/rng.py), so loss(theta +/- eps) reuses *identical* random numbers —
common-random-number finite differences measure the same pathwise
derivative jax.grad computes, as long as eps doesn't flip a discrete
event (Schlick reflect/refract, metal absorption).  Small eps + the
asserted tolerances keep that regime.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import go_raytracing_tpu as grt
from go_raytracing_tpu.camera import Camera


def _loss_fn(scene, cam, field_path, spp=8):
    """Scalar render loss as a function of one parameter array.

    field_path: ("materials", "fuzz") etc. — which pack array to swap in.
    """
    group, name = field_path

    def loss(arr):
        pack = getattr(scene, group)
        s = dataclasses.replace(scene, **{group: pack._replace(**{name: arr})})
        img = grt.render(s, cam, spp=spp, seed=0, differentiable=True)
        return jnp.mean(img) / spp

    return loss


def _fd_check(loss, theta, entry, eps, rtol, min_grad=1e-5):
    """Central finite difference on one scalar entry vs jax.grad."""
    g = jax.grad(loss)(theta)
    basis = jnp.zeros_like(theta).at[entry].set(1.0)
    hi = loss(theta + eps * basis)
    lo = loss(theta - eps * basis)
    fd = (hi - lo) / (2 * eps)
    ga = float(g[entry])
    assert abs(float(fd)) > min_grad, (
        f"FD gradient {float(fd):.2e} too small to be a meaningful check"
    )
    np.testing.assert_allclose(ga, float(fd), rtol=rtol)
    return ga


def test_fd_metal_fuzz():
    """d(render)/d(fuzz) for a fuzzy metal sphere under the sky gradient.

    The radiance field must vary *smoothly* with the scatter direction for
    the pathwise derivative to be nonzero (piecewise-constant textures
    like checker/nearest-image have zero spatial gradient a.e.); the sky
    gradient miss shader (rt/camera.go:520-526) is smooth in d."""
    b = grt.SceneBuilder()
    metal = b.metal((0.9, 0.9, 0.9), 0.35)
    b.sphere((0, 0, 0), 1.2, metal)
    scene = b.build()
    cam = Camera(
        image_width=6, aspect_ratio=1.0, samples_per_pixel=8, max_depth=4,
        look_from=(0, 1.5, 5), look_at=(0, 0, 0), vfov=30.0,
        use_sky_gradient=True,
    )
    loss = _loss_fn(scene, cam, ("materials", "fuzz"))
    # rtol: FD curvature + rare discrete-event flips leave a few percent
    _fd_check(loss, scene.materials.fuzz, metal, eps=5e-3, rtol=6e-2,
              min_grad=1e-4)


def test_fd_dielectric_ior():
    """d(render)/d(IOR) for a glass sphere refracting the sky gradient
    (smooth in direction; see test_fd_metal_fuzz docstring)."""
    b = grt.SceneBuilder()
    glass = b.dielectric(1.5)
    b.sphere((0, 0, 0), 1.2, glass)
    scene = b.build()
    cam = Camera(
        image_width=6, aspect_ratio=1.0, samples_per_pixel=8, max_depth=6,
        look_from=(0, 1.0, 5), look_at=(0, 0, 0), vfov=30.0,
        use_sky_gradient=True,
    )
    loss = _loss_fn(scene, cam, ("materials", "ior"))
    _fd_check(loss, scene.materials.ior, glass, eps=5e-3, rtol=6e-2,
              min_grad=1e-4)


@pytest.mark.parametrize("with_nee", [False, True])
def test_fd_emission(with_nee):
    """d(render)/d(emission color), through both the BRDF-path emission
    term and (with_nee) the NEE direct-light sample (rt/camera.go:645)."""
    b = grt.SceneBuilder()
    b.quad((-4, 0, -4), (8, 0, 0), (0, 0, 8), b.lambertian((0.7, 0.7, 0.7)))
    light_tex = b.solid((6.0, 5.0, 4.0))
    light = b.diffuse_light(light_tex)
    q = b.quad((-1, 3, -1), (2, 0, 0), (0, 0, 2), light)
    if with_nee:
        b.add_light(q)
    scene = b.build()
    cam = Camera(
        image_width=6, aspect_ratio=1.0, samples_per_pixel=8, max_depth=4,
        look_from=(0, 1.5, 5), look_at=(0, 1, 0), vfov=45.0,
        background=(0, 0, 0),
    )
    loss = _loss_fn(scene, cam, ("textures", "color"))
    _fd_check(loss, scene.textures.color, (light_tex, 1), eps=1e-2, rtol=2e-2)


@pytest.mark.parametrize("field", ["even_color", "odd_color"])
def test_fd_checker_colors(field):
    """d(render)/d(checker even/odd color) on a checkered floor."""
    b = grt.SceneBuilder()
    tex = b.checker(0.8, (0.8, 0.2, 0.2), (0.2, 0.2, 0.8))
    b.quad((-6, 0, -6), (12, 0, 0), (0, 0, 12), b.lambertian(tex))
    scene = b.build()
    cam = Camera(
        image_width=6, aspect_ratio=1.0, samples_per_pixel=8, max_depth=3,
        look_from=(0, 3, 4), look_at=(0, 0, 0), vfov=40.0,
        background=(0.9, 0.9, 0.9),
    )
    loss = _loss_fn(scene, cam, ("textures", field))
    _fd_check(loss, getattr(scene.textures, field), (tex, 0), eps=1e-2,
              rtol=2e-2)


def test_fd_image_atlas():
    """d(render)/d(texel) for an image-textured quad facing the camera —
    the 'texture maps' entry of the BASELINE gradient list."""
    img = np.linspace(0.1, 0.9, 4 * 4 * 3, dtype=np.float32).reshape(4, 4, 3)
    b = grt.SceneBuilder()
    tex = b.image(img)
    b.quad((-2, -2, 0), (4, 0, 0), (0, 4, 0), b.lambertian(tex))
    scene = b.build()
    cam = Camera(
        image_width=6, aspect_ratio=1.0, samples_per_pixel=8, max_depth=3,
        look_from=(0, 0, 5), look_at=(0, 0, 0), vfov=45.0,
        background=(0.2, 0.2, 0.2),
    )

    def loss(atlas):
        s = dataclasses.replace(
            scene, textures=scene.textures._replace(atlas=atlas)
        )
        return jnp.mean(grt.render(s, cam, spp=8, seed=0,
                                   differentiable=True)) / 8.0

    atlas = scene.textures.atlas
    g = jax.grad(loss)(atlas)
    # FD on one texel channel that the render actually sees
    nz = np.argwhere(np.abs(np.asarray(g)) > 1e-5)
    assert len(nz) > 4, "atlas gradient is (nearly) all zero"
    entry = tuple(int(x) for x in nz[len(nz) // 2])
    eps = 1e-2
    basis = jnp.zeros_like(atlas).at[entry].set(1.0)
    fd = (loss(atlas + eps * basis) - loss(atlas - eps * basis)) / (2 * eps)
    np.testing.assert_allclose(float(g[entry]), float(fd), rtol=2e-2)


def test_fd_hdri_environment_map():
    """d(render)/d(HDRI texel): environment maps are texture maps too —
    gradients flow through the deferred miss shader's bilinear fetch."""
    env = np.full((8, 16, 3), 0.5, np.float32)
    env[2:5, 4:9] = 3.0  # bright patch
    b = grt.SceneBuilder()
    b.sphere((0, 0, -3), 1.0, b.lambertian((0.6, 0.6, 0.6)))
    b.set_environment(env)
    scene = b.build()
    cam = Camera(
        image_width=6, aspect_ratio=1.0, samples_per_pixel=8, max_depth=4,
        look_from=(0, 0, 2), look_at=(0, 0, -3), vfov=50.0,
    )

    def loss(data):
        s = dataclasses.replace(
            scene, env=scene.env._replace(data=data)
        )
        return jnp.mean(grt.render(s, cam, spp=8, seed=0,
                                   differentiable=True)) / 8.0

    data = scene.env.data
    g = jax.grad(loss)(data)
    nz = np.argwhere(np.abs(np.asarray(g)) > 1e-5)
    assert len(nz) > 4, "environment gradient is (nearly) all zero"
    entry = tuple(int(x) for x in nz[len(nz) // 2])
    eps = 1e-2
    basis = jnp.zeros_like(data).at[entry].set(1.0)
    fd = (loss(data + eps * basis) - loss(data - eps * basis)) / (2 * eps)
    np.testing.assert_allclose(float(g[entry]), float(fd), rtol=2e-2)
