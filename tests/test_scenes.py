"""All 13 reference scenes build; representative ones render tiny images."""

import dataclasses

import numpy as np
import pytest

import go_raytracing_tpu as grt
from go_raytracing_tpu.scenes import builders


ALL_SCENES = sorted({fn.__name__ for fn in builders.REGISTRY.values()})


def test_registry_complete():
    # 13 constructors with the reference aliases (main.go:108-152)
    assert len(ALL_SCENES) == 13
    for alias in ["random", "checker", "simple", "perlin", "earth", "quads",
                  "cornell", "cornell-glossy", "cornell-lucy", "cornell-smoke",
                  "glossy-metal", "primitives", "hdri-test"]:
        assert alias in builders.REGISTRY


@pytest.mark.parametrize("name", [
    "simple", "quads", "cornell", "cornell-smoke", "glossy-metal",
    "primitives", "checker", "perlin",
])
def test_scene_builds(name):
    scene, cam = grt.load_scene(name)
    assert cam.image_width > 0
    n = (scene.spheres.radius.shape[0] + scene.planar.d.shape[0]
         + scene.volumes.neg_inv_density.shape[0])
    assert n > 0


def _tiny_render(name, w=24, spp=2, depth=4):
    scene, cam = grt.load_scene(name)
    cam = dataclasses.replace(cam, image_width=w, samples_per_pixel=spp,
                              max_depth=depth)
    img = np.asarray(grt.render_image(scene, cam, spp=spp))
    assert np.isfinite(img).all()
    assert img.min() >= 0.0 and img.max() <= 0.999
    return img


def test_render_simple():
    img = _tiny_render("simple")
    assert img.mean() > 0.1  # sky visible


def test_render_cornell():
    img = _tiny_render("cornell", w=24, spp=4, depth=5)
    assert img.mean() > 0.005  # light visible
    # Camera at z=-800 looks toward +z with u = -x, so the green wall
    # (x=555) is on screen-LEFT and the red wall (x=0) on screen-RIGHT —
    # matching the reference render orientation.
    left = img[:, :6].mean(axis=(0, 1))
    right = img[:, -6:].mean(axis=(0, 1))
    assert left[1] > left[0]    # green-ish
    assert right[0] > right[1]  # red-ish


def test_render_cornell_smoke():
    img = _tiny_render("cornell-smoke", w=16, spp=4, depth=5)
    assert img.mean() > 0.005


def test_render_hdri():
    img = _tiny_render("hdri-test", w=24, spp=2, depth=4)
    # phantom HDRI: direct background pixels are black, but spheres reflect
    assert img.max() > 0.05
