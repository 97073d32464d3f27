"""Pre-commit smoke gate (`pytest -m smoke`, < 60 s).

Covers the exact regression class that shipped broken in rounds 2 AND 3:
the trace() dispatcher seam between execution tiers — record=True must
return decisions in EVERY mega_mode, the replay driven by those
decisions must reproduce the differentiable path's loss/gradients, and
render_grad must route every scene class (product-chain kernel /
pathwise kernel / replay) without crashing.

Kept intentionally tiny (256 rays, depth 3, BLOCK_ROWS=8 interpret
blocks) — this is a seam test, not a numerics test; the full suite owns
tolerance duty.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import go_raytracing_tpu as grt
from go_raytracing_tpu.camera import generate_rays
from go_raytracing_tpu.integrator import wavefront
from go_raytracing_tpu.ops import pallas_wavefront as mega
from go_raytracing_tpu.parallel.sharding import apply_params, trainable_params

pytestmark = pytest.mark.smoke


def _scene():
    scene, cam = grt.load_scene("cornell")
    cam = dataclasses.replace(cam, image_width=16, aspect_ratio=1.0,
                              samples_per_pixel=1, max_depth=3)
    return scene, cam


def _rays(cam, n=256):
    stream = jnp.arange(n, dtype=jnp.uint32)
    px = (stream % cam.image_width).astype(jnp.int32)
    py = ((stream // cam.image_width) % cam.image_height).astype(jnp.int32)
    o, d, tm = generate_rays(cam, px, py, stream, 3)
    return o, d, tm, stream


@pytest.mark.parametrize("mode", ["off", "single", "split", "compact"])
def test_record_replay_round_trip(mode):
    """record=True must return (rad, decisions) in every mega_mode, and
    the replay of those decisions must reproduce the differentiable
    radiance (the round-2/round-3 shipped-regression seam)."""
    scene, cam = _scene()
    o, d, tm, stream = _rays(cam)
    old_br = mega.BLOCK_ROWS
    mega.INTERPRET, mega.BLOCK_ROWS = True, 8
    try:
        if mode != "off":
            assert mega.applicable(scene)
        out = wavefront.trace(scene, cam, o, d, tm, stream, 0,
                              differentiable=False, record=True,
                              mega_mode=mode)
    finally:
        mega.INTERPRET, mega.BLOCK_ROWS = False, old_br
    assert isinstance(out, tuple) and len(out) == 2, \
        f"record=True returned no decisions in mega_mode={mode}"
    rad_rec, dec = out
    rad_rep = wavefront.trace(scene, cam, o, d, tm, stream, 0,
                              decisions=dec)
    np.testing.assert_allclose(np.asarray(rad_rep.rows()),
                               np.asarray(rad_rec.rows()),
                               rtol=1e-3, atol=2e-3)


def test_replay_grads_flow():
    """jax.grad through the replay path returns finite, nonzero grads."""
    scene, cam = _scene()
    o, d, tm, stream = _rays(cam)
    _, dec = wavefront.trace(scene, cam, o, d, tm, stream, 0,
                             differentiable=False, record=True,
                             mega_mode="off")

    def loss(p):
        s = apply_params(scene, p)
        rad = wavefront.trace(s, cam, o, d, tm, stream, 0, decisions=dec)
        return jnp.sum(rad.rows() * 1e-3)

    g = jax.grad(loss)(trainable_params(scene))
    assert np.abs(np.asarray(g["color"])).max() > 0
    for k, v in g.items():
        assert np.isfinite(np.asarray(v)).all(), f"non-finite grad: {k}"


def test_render_grad_routes_all_tiers():
    """render_grad must pick a working path for each scene class:
    all-diffuse (product-chain kernel), metal/dielectric (pathwise
    kernel), env (replay).  Routing-only: tiny shapes, no tolerance."""
    from go_raytracing_tpu.render.grad import render_grad

    cases = {
        # (grad_applicable, grad_pathwise_applicable); render_grad
        # PREFERS product where both hold.  Round 5: volumes are
        # admitted to the pathwise gate (scatter-distance adjoint), so
        # cornell passes both and volume+metal rides pathwise.
        "cornell": (True, True),          # product-chain preferred
        "cornell-glossy": (False, True),  # pathwise gate
        "combined": (False, True),        # volume + metal -> pathwise
    }
    old_br = mega.BLOCK_ROWS
    mega.INTERPRET, mega.BLOCK_ROWS = True, 8
    try:
        for name, (want_prod, want_pw) in cases.items():
            if name == "combined":
                b = grt.SceneBuilder()
                b.quad((-6, 0, -6), (12, 0, 0), (0, 0, 12),
                       b.lambertian((0.5, 0.5, 0.5)))
                b.sphere((0, 1, 0), 1.0, b.metal((0.8, 0.6, 0.2), 0.3))
                q = b.quad((-1, 5, -1), (2, 0, 0), (0, 0, 2),
                           b.diffuse_light((6, 6, 6)))
                b.add_light(q)
                # volume + metal: the round-5 scatter-distance
                # adjoint routes this through the pathwise kernel
                b.volume_box((-3, 0, -3), (3, 2, 3), 0.05, (0.8, 0.8, 0.8))
                scene = b.build()
                _, cam = grt.load_scene("cornell")
            else:
                scene, cam = grt.load_scene(name)
            cam = dataclasses.replace(cam, image_width=8, aspect_ratio=1.0,
                                      samples_per_pixel=1, max_depth=3)
            assert mega.grad_applicable(scene, cam.max_depth) == want_prod, name
            assert mega.grad_pathwise_applicable(
                scene, cam.max_depth) == want_pw, name
            target = np.zeros((8, 8, 3), np.float32)
            loss, grads = render_grad(scene, cam, target, spp=1, seed=0)
            assert np.isfinite(float(loss)), name
            for k, v in grads.items():
                assert np.isfinite(np.asarray(v)).all(), f"{name}: {k}"
    finally:
        mega.INTERPRET, mega.BLOCK_ROWS = False, old_br
