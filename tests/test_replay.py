"""Replay-gradient path (wavefront.trace record/decisions modes).

The replay backward must reproduce the plain differentiable path's
radiance AND parameter gradients: the record pass stores only discrete
sweep outcomes (winner primitive + shadow blocked bits); everything else
is counter-RNG-replayable, and the winner's analytic t (_winner_t) is a
different — sweep-free — expression of the same value, so values agree
to f32 tolerance and gradients agree wherever the discrete winners are
stable (same caveat as the FD tests).
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import go_raytracing_tpu as grt
from go_raytracing_tpu.camera import Camera, generate_rays
from go_raytracing_tpu.integrator import wavefront
from go_raytracing_tpu.parallel.sharding import apply_params, trainable_params


def _rays(cam, n=768, seed=3):
    stream = jnp.arange(n, dtype=jnp.uint32)
    w, h = cam.image_width, cam.image_height
    px = (stream % w).astype(jnp.int32)
    py = ((stream // w) % h).astype(jnp.int32)
    o, d, tm = generate_rays(cam, px, py, stream, seed)
    return o, d, tm, stream


def _combined_nee_scene():
    """Area light + HDRI NEE + every material kind + checker + volume."""
    env = np.full((8, 16, 3), 0.6, np.float32)
    env[2, 4] = (25.0, 25.0, 25.0)
    b = grt.SceneBuilder()
    floor = b.lambertian(b.checker(0.7, (0.2, 0.3, 0.1), (0.9, 0.9, 0.8)))
    b.quad((-6, 0, -6), (12, 0, 0), (0, 0, 12), floor)
    b.sphere((0, 1, 0), 1.0, b.dielectric(1.5))
    b.sphere((-2.2, 1, 0), 1.0, b.metal((0.8, 0.6, 0.2), 0.3))
    b.sphere((2.2, 1, 0), 1.0, b.lambertian((0.1, 0.2, 0.5)))
    q = b.quad((-1, 5, -1), (2, 0, 0), (0, 0, 2), b.diffuse_light((6, 6, 6)))
    b.add_light(q)
    b.volume_box((-4, 0, 2), (-2.5, 1.5, 3.5), 0.4, (0.7, 0.7, 0.7))
    b.set_environment(env)
    scene = b.build()
    cam = Camera(
        image_width=24, aspect_ratio=1.0, samples_per_pixel=2, max_depth=5,
        look_from=(0, 2.5, 7), look_at=(0, 1, 0), background=(0, 0, 0),
        vfov=45.0,
    )
    return scene, cam


def _scene(name):
    if name == "combined":
        return _combined_nee_scene()
    scene, cam = grt.load_scene(name)
    cam = dataclasses.replace(
        cam, image_width=32, aspect_ratio=1.0, samples_per_pixel=2,
        max_depth=4,
    )
    return scene, cam


@pytest.mark.parametrize(
    "name", ["cornell", "simple", "cornell-smoke", "combined", "cornell-lucy"]
)
def test_replay_matches_differentiable(name):
    scene, cam = _scene(name)
    o, d, tm, stream = _rays(cam)
    params = trainable_params(scene)

    _, dec = wavefront.trace(
        scene, cam, o, d, tm, stream, 0, differentiable=False, record=True
    )

    def loss_plain(p):
        s = apply_params(scene, p)
        rad = wavefront.trace(s, cam, o, d, tm, stream, 0,
                              differentiable=True)
        return jnp.sum(rad.rows() * 1e-3)

    def loss_replay(p):
        s = apply_params(scene, p)
        rad = wavefront.trace(s, cam, o, d, tm, stream, 0, decisions=dec)
        return jnp.sum(rad.rows() * 1e-3)

    v0, g0 = jax.value_and_grad(loss_plain)(params)
    v1, g1 = jax.value_and_grad(loss_replay)(params)
    np.testing.assert_allclose(v0, v1, rtol=1e-4, atol=1e-6)
    for k in g0:
        a, b_ = np.asarray(g0[k]), np.asarray(g1[k])
        scale = max(np.abs(a).max(), 1e-8)
        np.testing.assert_allclose(
            b_, a, rtol=2e-3, atol=2e-4 * scale,
            err_msg=f"{name}: grad mismatch for {k}",
        )


def test_record_radiance_matches_trace():
    """The record pass is the fast forward itself: same radiance."""
    scene, cam = _scene("cornell")
    o, d, tm, stream = _rays(cam)
    plain = wavefront.trace(scene, cam, o, d, tm, stream, 0,
                            differentiable=False)
    rec, dec = wavefront.trace(scene, cam, o, d, tm, stream, 0,
                               differentiable=False, record=True)
    np.testing.assert_allclose(
        np.asarray(plain.rows()), np.asarray(rec.rows()), rtol=1e-6, atol=1e-7
    )
    assert dec.which.shape == (cam.max_depth, o.x.shape[0])


def test_replay_grad_render_exact():
    """render/grad.py replay path == direct jax.grad of the full render
    (the exact-match contract the chunked renderer already had)."""
    import os

    from go_raytracing_tpu.render.grad import render_grad

    scene, cam = _scene("cornell")
    cam = dataclasses.replace(cam, image_width=16, samples_per_pixel=2)
    spp = 2
    target = np.zeros((cam.image_height, cam.image_width, 3), np.float32)

    loss_r, grads_r = render_grad(scene, cam, target, spp=spp, seed=0,
                                  chunk=1024)

    def direct(params):
        s = apply_params(scene, params)
        img = grt.render(s, cam, spp=spp, seed=0, differentiable=True)
        return jnp.mean((img / spp - target) ** 2)

    loss_d, grads_d = jax.value_and_grad(direct)(trainable_params(scene))
    np.testing.assert_allclose(float(loss_r), float(loss_d), rtol=1e-5)
    for k in grads_d:
        a, b_ = np.asarray(grads_d[k]), np.asarray(grads_r[k])
        scale = max(np.abs(a).max(), 1e-8)
        np.testing.assert_allclose(b_, a, rtol=2e-3, atol=2e-4 * scale,
                                   err_msg=k)


@pytest.mark.parametrize("name", ["cornell", "combined"])
def test_megakernel_record_matches_scan_record(name):
    """The megakernel's decision recording (rec_dec) must be
    interchangeable with the scan-path record: same radiance, and the
    replay gradients driven by either decision set must agree."""
    from go_raytracing_tpu.ops import pallas_wavefront as mega

    scene, cam = _scene(name)
    o, d, tm, stream = _rays(cam)
    params = trainable_params(scene)

    mega.INTERPRET = True
    try:
        assert mega.applicable(scene)
        rad_m, dec_m = wavefront.trace(
            scene, cam, o, d, tm, stream, 0,
            differentiable=False, record=True, mega_mode="single",
        )
    finally:
        mega.INTERPRET = False
    rad_s, dec_s = wavefront.trace(
        scene, cam, o, d, tm, stream, 0,
        differentiable=False, record=True, mega_mode="off",
    )
    np.testing.assert_allclose(
        np.asarray(rad_m.rows()), np.asarray(rad_s.rows()),
        rtol=1e-3, atol=2e-3,
    )
    # Discrete outcomes must match almost everywhere (exact winner ties
    # may break differently between sweep orders).
    for f in ("which", "idx", "blk_a", "blk_h"):
        a = np.asarray(getattr(dec_m, f))
        b_ = np.asarray(getattr(dec_s, f))
        assert (a == b_).mean() > 0.999, f"{name}: {f} mismatch"

    def loss_with(dec):
        def loss(p):
            s = apply_params(scene, p)
            rad = wavefront.trace(s, cam, o, d, tm, stream, 0,
                                  decisions=dec)
            return jnp.sum(rad.rows() * 1e-3)
        return loss

    v0, g0 = jax.value_and_grad(loss_with(dec_s))(params)
    v1, g1 = jax.value_and_grad(loss_with(dec_m))(params)
    np.testing.assert_allclose(v0, v1, rtol=1e-4, atol=1e-6)
    for k in g0:
        a, b_ = np.asarray(g0[k]), np.asarray(g1[k])
        scale = max(np.abs(a).max(), 1e-8)
        np.testing.assert_allclose(
            b_, a, rtol=2e-3, atol=2e-4 * scale,
            err_msg=f"{name}: replay grad mismatch for {k}",
        )
