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
