"""Statistical parity vs the reference's one published render.

The reference ships exactly one rendered artifact: /root/reference/image.png
(README.md:16-18) — HDRITestScene at 800x450, SPP 200, depth 20, rendered
by the bucket renderer which draws a HUD text bar into the bottom of the
framebuffer before saving (rt/bucket_renderer.go:312-411).  The reference
is seed-unstable (global math/rand + goroutine scheduling, SURVEY hard
part #5), so parity must be statistical: per-16x16-tile means of the
gamma-encoded images, not pixels.

This script renders the same config, compares tile statistics (HUD rows
excluded), writes PARITY_r03.json, and exits nonzero on failure.

Tolerances, set ~3x above the measured round-3 deltas (tile-mean abs
diff: mean 0.0022, p95 0.0071, max 0.017; tile-std mean 0.0020 — i.e.
our render matches the reference artifact to ~half an 8-bit LSB on
average):
  - global mean abs diff of tile means  <= 0.008  (8-bit scale: ~2/255)
  - 95th percentile tile-mean abs diff  <= 0.025
  - max tile-mean abs diff              <= 0.06   (fireflies at depth 20
    under phantom HDRI make single tiles noisy in BOTH renders)
  - mean abs diff of per-tile std       <= 0.008  (noise level match)

Run: python scripts/parity_check.py [--spp 200] [--out PARITY_r03.json]
"""

import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF_PNG = "/root/reference/image.png"
HUD_ROWS = 32          # bottom rows holding the reference HUD text bar
TILE = 16

TOL = dict(
    mean_abs=0.008,
    p95_abs=0.025,
    max_abs=0.06,
    std_mean_abs=0.008,
)


def tile_stats(img, tile=TILE):
    """[H, W, 3] -> per-tile mean and std over the tile's 3*tile^2 values."""
    h, w = img.shape[:2]
    th, tw = h // tile, w // tile
    x = img[: th * tile, : tw * tile].reshape(th, tile, tw, tile, 3)
    flat = x.transpose(0, 2, 1, 3, 4).reshape(th, tw, -1)
    return flat.mean(axis=2), flat.std(axis=2)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--spp", type=int, default=200)
    ap.add_argument("--depth", type=int, default=20)
    ap.add_argument("--out", default="PARITY_r03.json")
    ap.add_argument("--save", default="renders/parity_ours.png")
    args = ap.parse_args()

    from PIL import Image

    ref = np.asarray(Image.open(REF_PNG), np.float32) / 255.0
    h, w = ref.shape[:2]
    assert (h, w) == (450, 800), ref.shape

    import go_raytracing_tpu as grt

    scene, cam = grt.load_scene("hdri-test")
    cam = dataclasses.replace(
        cam, image_width=w, aspect_ratio=w / h,
        samples_per_pixel=args.spp, max_depth=args.depth,
    )
    t0 = time.perf_counter()
    accum = grt.render(scene, cam, spp=args.spp, seed=3)
    img = np.asarray(grt.film.tonemap(accum, args.spp))
    wall = time.perf_counter() - t0

    if args.save:
        os.makedirs(os.path.dirname(args.save), exist_ok=True)
        grt.film.write_png(args.save, grt.film.to_uint8(img))

    ours = img[: h - HUD_ROWS]
    refc = ref[: h - HUD_ROWS]
    m_o, s_o = tile_stats(ours)
    m_r, s_r = tile_stats(refc)
    dm = np.abs(m_o - m_r)
    ds = np.abs(s_o - s_r)

    stats = dict(
        config=dict(scene="hdri-test", width=w, height=h, spp=args.spp,
                    depth=args.depth, hud_rows_excluded=HUD_ROWS,
                    tile=TILE, reference=REF_PNG),
        wall_s=round(wall, 2),
        tiles=int(dm.size),
        tile_mean_abs_diff=dict(
            mean=float(dm.mean()), p95=float(np.percentile(dm, 95)),
            max=float(dm.max()),
        ),
        tile_std_abs_diff=dict(
            mean=float(ds.mean()), p95=float(np.percentile(ds, 95)),
            max=float(ds.max()),
        ),
        global_mean=dict(ours=float(ours.mean()), reference=float(refc.mean())),
        tolerances=TOL,
    )
    ok = (
        dm.mean() <= TOL["mean_abs"]
        and np.percentile(dm, 95) <= TOL["p95_abs"]
        and dm.max() <= TOL["max_abs"]
        and ds.mean() <= TOL["std_mean_abs"]
    )
    stats["pass"] = bool(ok)
    with open(args.out, "w") as f:
        json.dump(stats, f, indent=2)
    print(json.dumps(stats, indent=2))
    print("PARITY:", "PASS" if ok else "FAIL")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
