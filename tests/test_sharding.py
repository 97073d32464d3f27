"""Multi-device sharding: sharded render == single-device render; sharded
train step produces finite loss and real gradients on an 8-CPU mesh."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import go_raytracing_tpu as grt
from go_raytracing_tpu.camera import Camera
from go_raytracing_tpu.parallel import sharding


def _scene_cam():
    b = grt.SceneBuilder()
    floor = b.lambertian((0.8, 0.4, 0.2))
    b.quad((-5, 0, -5), (10, 0, 0), (0, 0, 10), floor)
    light = b.diffuse_light((6, 6, 6))
    q = b.quad((-1, 4, -1), (2, 0, 0), (0, 0, 2), light)
    b.add_light(q)
    b.sphere((0, 1, 0), 0.8, b.metal((0.9, 0.9, 0.9), 0.1))
    scene = b.build()
    cam = Camera(
        image_width=16, aspect_ratio=1.0, samples_per_pixel=4, max_depth=4,
        look_from=(0, 2, 6), look_at=(0, 0, 0), background=(0, 0, 0), vfov=40.0,
    )
    return scene, cam


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_render_matches_single_device():
    scene, cam = _scene_cam()
    mesh = sharding.make_mesh(8)
    fb8 = np.asarray(
        sharding.render_sharded(scene, cam, mesh, jnp.uint32(0), spp=4)
    )
    mesh1 = sharding.make_mesh(1)
    fb1 = np.asarray(
        sharding.render_sharded(scene, cam, mesh1, jnp.uint32(0), spp=4)
    )
    # Counter-based RNG keyed by (pixel, sample): identical regardless of sharding
    np.testing.assert_allclose(fb8, fb1, rtol=1e-5, atol=1e-5)
    # Matches the chunked single-device renderer too
    fb_ref = np.asarray(grt.render(scene, cam, spp=4, seed=0))
    np.testing.assert_allclose(fb8, fb_ref, rtol=1e-4, atol=1e-4)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_train_step_reduces_loss():
    scene, cam = _scene_cam()
    mesh = sharding.make_mesh(8)
    target = jnp.zeros((cam.image_height, cam.image_width, 3), jnp.float32)
    s1, loss1 = sharding.train_step(
        scene, cam, mesh, target, jnp.uint32(0), jnp.float32(0.05), spp=4
    )
    assert np.isfinite(float(loss1)) and float(loss1) > 0
    # One step toward a black target must darken albedo params
    assert float(jnp.sum(s1.textures.color)) < float(jnp.sum(scene.textures.color))
    _, loss2 = sharding.train_step(
        s1, cam, mesh, target, jnp.uint32(0), jnp.float32(0.05), spp=4
    )
    assert float(loss2) < float(loss1)


def _all_diffuse_scene_cam():
    b = grt.SceneBuilder()
    b.quad((0, 0, 0), (555, 0, 0), (0, 0, 555), b.lambertian((0.73, 0.72, 0.71)))
    b.quad((555, 0, 0), (0, 555, 0), (0, 0, 555), b.lambertian((0.65, 0.05, 0.05)))
    light = b.diffuse_light((15.0, 14.0, 13.0))
    q = b.quad((213, 554, 227), (130, 0, 0), (0, 0, 105), light)
    b.add_light(q)
    b.box((150, 0, 150), (350, 200, 350), b.lambertian((0.73, 0.72, 0.71)))
    scene = b.build()
    cam = Camera(image_width=16, aspect_ratio=1.0, samples_per_pixel=8,
                 max_depth=4, look_from=(278, 278, -800),
                 look_at=(278, 278, 0), vfov=40.0, background=(0, 0, 0))
    return scene, cam


def _grad_mesh_case(scene, cam, expect_kernel):
    """Sharded render_grad (4-device mesh) vs single-device: same loss
    and grads up to float summation order."""
    from go_raytracing_tpu.ops import pallas_wavefront as mega
    from go_raytracing_tpu.render.grad import render_grad

    target = np.asarray(grt.render(scene, cam, seed=7)) / cam.samples_per_pixel
    prod = mega.grad_applicable(scene, cam.max_depth)
    pw = (not prod) and mega.grad_pathwise_applicable(scene, cam.max_depth)
    assert (prod or pw) == expect_kernel
    l1, g1 = render_grad(scene, cam, target, seed=0)
    l4, g4 = render_grad(scene, cam, target, seed=0,
                         mesh=sharding.make_mesh(4))
    np.testing.assert_allclose(float(l1), float(l4), rtol=1e-5)
    assert set(g1) == set(g4)
    for k in g1:
        np.testing.assert_allclose(np.asarray(g1[k]), np.asarray(g4[k]),
                                   rtol=2e-4, atol=1e-9, err_msg=k)
    gnorm = sum(float(jnp.abs(g).sum()) for g in g4.values())
    assert np.isfinite(gnorm) and gnorm > 0


@pytest.mark.smoke
@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 virtual devices")
def test_render_grad_mesh_product_kernel():
    """Gradient MEGAKERNEL (product-chain tier) under shard_map ==
    single-device (interpret mode; VERDICT r4 #1)."""
    from go_raytracing_tpu.ops import pallas_wavefront as mega

    scene, cam = _all_diffuse_scene_cam()
    old = mega.INTERPRET, mega.BLOCK_ROWS
    mega.INTERPRET, mega.BLOCK_ROWS = True, 8
    try:
        _grad_mesh_case(scene, cam, expect_kernel=True)
    finally:
        mega.INTERPRET, mega.BLOCK_ROWS = old


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 virtual devices")
def test_render_grad_mesh_pathwise_kernel():
    """PATHWISE gradient megakernel (metal+dielectric) under shard_map."""
    from go_raytracing_tpu.ops import pallas_wavefront as mega

    b = grt.SceneBuilder()
    b.quad((0, 0, 0), (555, 0, 0), (0, 0, 555), b.lambertian((0.73, 0.72, 0.71)))
    light = b.diffuse_light((15.0, 14.0, 13.0))
    q = b.quad((213, 554, 227), (130, 0, 0), (0, 0, 105), light)
    b.add_light(q)
    b.sphere((278, 100, 278), 90, b.metal((0.8, 0.7, 0.6), 0.2))
    b.sphere((120, 90, 190), 80, b.dielectric(1.5))
    scene = b.build()
    cam = Camera(image_width=16, aspect_ratio=1.0, samples_per_pixel=8,
                 max_depth=4, look_from=(278, 278, -800),
                 look_at=(278, 278, 0), vfov=40.0,
                 background=(0.1, 0.1, 0.1))
    old = mega.INTERPRET, mega.BLOCK_ROWS
    mega.INTERPRET, mega.BLOCK_ROWS = True, 8
    try:
        _grad_mesh_case(scene, cam, expect_kernel=True)
    finally:
        mega.INTERPRET, mega.BLOCK_ROWS = old


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 virtual devices")
def test_render_grad_mesh_replay_tier():
    """Scenes outside the kernel gates (noise + specular) shard via the
    record+replay tier with per-device decisions."""
    b = grt.SceneBuilder()
    b.quad((0, 0, 0), (555, 0, 0), (0, 0, 555), b.lambertian(b.noise(0.05)))
    light = b.diffuse_light((15.0, 14.0, 13.0))
    q = b.quad((213, 554, 227), (130, 0, 0), (0, 0, 105), light)
    b.add_light(q)
    b.sphere((278, 100, 278), 90, b.metal((0.8, 0.7, 0.6), 0.2))
    scene = b.build()
    cam = Camera(image_width=16, aspect_ratio=1.0, samples_per_pixel=4,
                 max_depth=3, look_from=(278, 278, -800),
                 look_at=(278, 278, 0), vfov=40.0,
                 background=(0.1, 0.1, 0.1))
    _grad_mesh_case(scene, cam, expect_kernel=False)


def _entry_subprocess(code: str):
    """Run driver-entrypoint checks in a FRESH process, exactly as the
    driver invokes them.  In-process, the 8-device train_step compile
    wedges (>20 min) after the full suite has run — XLA's in-process
    compile state degrades across ~110 prior test compilations (observed
    hung in backend_compile_and_load / cache get/put with three suite
    runs; every file-level subset passes).  A clean process compiles it
    in ~20 s."""
    import os
    import subprocess
    import sys

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=8"
                        ).strip()
    r = subprocess.run(
        [sys.executable, "-c", code], env=env, cwd="/root/repo",
        capture_output=True, text=True, timeout=900,
    )
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]


def test_dryrun_multichip_entrypoint():
    _entry_subprocess(
        "import __graft_entry__ as ge; ge.dryrun_multichip(8)"
    )


def test_entry_compiles():
    _entry_subprocess(
        "import __graft_entry__ as ge\n"
        "import jax, numpy as np\n"
        "fn, args = ge.entry()\n"
        "out = jax.jit(fn)(*args)\n"
        "assert np.isfinite(np.asarray(out)).all()\n"
    )
