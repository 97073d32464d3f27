"""Renderer-level behavior: chunk invariance, progressive passes,
checkpoint/resume, camera features (DoF, motion blur)."""

import dataclasses
import os

import numpy as np
import jax.numpy as jnp

import go_raytracing_tpu as grt
from go_raytracing_tpu.camera import Camera, generate_rays
from go_raytracing_tpu.render import checkpoint


def _scene():
    b = grt.SceneBuilder()
    b.plane((0, -1, 0), (0, 1, 0), b.lambertian((0.6, 0.3, 0.2)))
    b.sphere((0, 0, -2), 0.7, b.metal((0.9, 0.9, 0.9), 0.1))
    return b.build()


def _cam(**kw):
    base = dict(
        image_width=12, aspect_ratio=1.0, samples_per_pixel=8, max_depth=4,
        look_from=(0, 0.5, 2), look_at=(0, 0, -2), use_sky_gradient=True,
    )
    base.update(kw)
    return Camera(**base)


def test_chunk_size_invariance():
    """Counter-based RNG: the image must not depend on chunk boundaries."""
    scene, cam = _scene(), _cam()
    a = np.asarray(grt.render(scene, cam, spp=8, seed=5, chunk=1024))
    b = np.asarray(grt.render(scene, cam, spp=8, seed=5, chunk=2048))
    np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-6)


def test_sample_offset_composition():
    """render(spp=8) == render(spp=5) accumulated with render(spp=3 at
    offset 5) — the checkpointing identity."""
    scene, cam = _scene(), _cam()
    full = np.asarray(grt.render(scene, cam, spp=8, seed=5))
    part = grt.render(scene, cam, spp=5, seed=5)
    part = grt.render(scene, cam, spp=3, seed=5, sample_offset=5, accum=part)
    np.testing.assert_allclose(np.asarray(part), full, rtol=1e-5, atol=1e-5)


def test_checkpoint_resume(tmp_path):
    scene, cam = _scene(), _cam()
    path = str(tmp_path / "ckpt.npz")
    # interrupted: only 4 of 8 samples
    acc = checkpoint.render_with_checkpoints(
        scene, cam, path, spp=4, seed=7, spp_per_checkpoint=2
    )
    # resume to 8
    acc = checkpoint.render_with_checkpoints(
        scene, cam, path, spp=8, seed=7, spp_per_checkpoint=2
    )
    full = np.asarray(grt.render(scene, cam, spp=8, seed=7))
    np.testing.assert_allclose(np.asarray(acc), full, rtol=1e-5, atol=1e-5)


def test_progressive_passes():
    scene, cam = _scene(), _cam()
    names = [name for name, img in grt.render_progressive(scene, cam, seed=1)]
    assert names == ["preview", "refining", "final"]


def test_defocus_blurs_out_of_focus():
    b = grt.SceneBuilder()
    b.quad((-0.05, -2, -6), (0.1, 0, 0), (0, 4, 0), b.diffuse_light((5, 5, 5)))
    scene = b.build()
    sharp_cam = _cam(defocus_angle=0.0, focus_dist=2.0, image_width=32,
                     look_from=(0, 0, 0), look_at=(0, 0, -1),
                     use_sky_gradient=False, background=(0, 0, 0), vfov=30.0)
    blurry_cam = dataclasses.replace(sharp_cam, defocus_angle=10.0)
    spp = 64
    sharp = np.asarray(grt.render(scene, sharp_cam, spp=spp)) / spp
    blurry = np.asarray(grt.render(scene, blurry_cam, spp=spp)) / spp
    # defocus spreads the thin bright strip across more pixels
    assert (blurry.max(axis=(0, 1)) < sharp.max(axis=(0, 1))).all()
    assert (blurry.sum() > 0) and (sharp.sum() > 0)


def test_motion_blur_camera_path():
    """Camera motion: rays at time ~0 originate near look_from, at ~1 near
    look_from2 (rt/camera.go:390-434)."""
    cam = _cam(camera_motion=True, look_from=(0, 0, 0), look_from2=(4, 0, 0),
               look_at=(0, 0, -5), look_at2=(4, 0, -5))
    px = jnp.zeros(4096, jnp.int32) + 6
    py = jnp.zeros(4096, jnp.int32) + 6
    stream = jnp.arange(4096, dtype=jnp.uint32)
    o, d, tm = generate_rays(cam, px, py, stream, 0)
    o, tm = np.asarray(o.rows()), np.asarray(tm)
    early = o[tm < 0.05]
    late = o[tm > 0.95]
    assert len(early) > 20 and len(late) > 20
    assert abs(early[:, 0].mean() - 0.0) < 0.3
    assert abs(late[:, 0].mean() - 4.0) < 0.3


def test_moving_sphere_blur_in_render():
    """A fast-moving emissive sphere smears along its path."""
    b = grt.SceneBuilder()
    light = b.diffuse_light((8, 8, 8))
    b.moving_sphere((-1.5, 0, -4), (1.5, 0, -4), 0.3, light)
    scene = b.build()
    cam = _cam(image_width=48, use_sky_gradient=False, background=(0, 0, 0),
               look_from=(0, 0, 0), look_at=(0, 0, -4), vfov=60.0)
    img = np.asarray(grt.render(scene, cam, spp=32)) / 32
    row = img[img.sum(axis=(1, 2)).argmax()]
    lit_cols = (row.sum(axis=-1) > 0.05).sum()
    assert lit_cols > 20  # smeared across many columns (static would be ~9)


def test_live_display_serves_frames():
    """LiveDisplay (the headless ebiten-window substitute): page, status
    and frame endpoints serve; the PNG round-trips the published image."""
    import json
    import urllib.request

    from go_raytracing_tpu.core import film
    from go_raytracing_tpu.render.display import LiveDisplay

    disp = LiveDisplay(port=0)  # ephemeral port
    try:
        img = np.linspace(0, 0.999, 6 * 5 * 3, dtype=np.float32)
        img = img.reshape(5, 6, 3)
        disp.update(img, pass_name="refining", done_spp=3, total_spp=8,
                    mrays=1.25)

        page = urllib.request.urlopen(disp.url, timeout=5).read()
        assert b"hud" in page
        status = json.loads(
            urllib.request.urlopen(disp.url + "status", timeout=5).read()
        )
        assert status["pass_name"] == "refining"
        assert status["seq"] == 0 and status["done_spp"] == 3
        png = urllib.request.urlopen(
            disp.url + "frame.png?seq=0", timeout=5
        ).read()
        import io
        import tempfile

        with tempfile.NamedTemporaryFile(suffix=".png") as f:
            f.write(png)
            f.flush()
            back = film.read_png(f.name)
        np.testing.assert_array_equal(back, film.to_uint8(img))
    finally:
        disp.close()


def test_interactive_cli_slicing_identity():
    """The CLI's -interactive SPP-sliced refinement must reproduce the
    one-shot image bit-exactly (counter RNG; same identity as resume)."""
    scene, cam = _scene(), _cam()
    full = np.asarray(grt.render(scene, cam, spp=8, seed=5))
    accum, done, step = None, 0, 1
    while done < 8:
        n = min(step, 8 - done)
        accum = grt.render(scene, cam, spp=n, sample_offset=done,
                           accum=accum, seed=5)
        done += n
        step = min(step * 2, max(8 // 8, 1))
    np.testing.assert_allclose(np.asarray(accum), full, rtol=1e-5, atol=1e-5)
