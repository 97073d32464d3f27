"""On-chip depth-gate evidence (VERDICT r4 #6): the reference's deep
configs (hdri-test ships depth 20) must run the gradient KERNEL tier,
not the replay tier.  Runs cornell-glossy at depth 20 through the
pathwise kernel (8-row blocks per _grad_block_rows; stash fits
GRAD_STASH_BUDGET) and cross-checks loss + every gradient family
against the XLA replay backward.  Writes DEPTH_GATE.json.

Run: python scripts/depth_gate_probe.py   (one TPU process at a time)
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

import go_raytracing_tpu as grt
from go_raytracing_tpu.ops import pallas_wavefront as mega
from go_raytracing_tpu.render.grad import render_grad


def main():
    assert jax.default_backend() == "tpu", "must run on the chip"
    scene, cam = grt.load_scene("cornell-glossy")
    cam = dataclasses.replace(cam, image_width=256, aspect_ratio=1.0,
                              samples_per_pixel=8, max_depth=20)
    assert mega.grad_pathwise_applicable(scene, cam.max_depth)
    br = mega._grad_block_rows(scene, cam.max_depth)
    target = np.zeros((cam.image_height, cam.image_width, 3), np.float32)

    def run(env=None):
        if env:
            os.environ[env] = "1"
        try:
            loss, g = render_grad(scene, cam, target, spp=8, seed=0)
            jax.block_until_ready(g)
            t0 = time.perf_counter()
            loss, g = render_grad(scene, cam, target, spp=8, seed=0)
            jax.block_until_ready(g)
            return float(loss), g, time.perf_counter() - t0
        finally:
            if env:
                del os.environ[env]

    loss_k, gk, wall_k = run()
    loss_x, gx, wall_x = run("GRT_NO_GRADKERNEL")
    rel_loss = abs(loss_k - loss_x) / max(abs(loss_x), 1e-12)
    worst = 0.0
    for k in gx:
        a, b = np.asarray(gk[k]), np.asarray(gx[k])
        den = max(float(np.abs(b).max()), 1e-12)
        worst = max(worst, float(np.abs(a - b).max()) / den)
    n_rays = cam.image_width * cam.image_height * 8
    out = dict(
        depth=20, block_rows=br,
        stash_bytes=20 * 22 * br * 128 * 4,
        kernel_wall_s=round(wall_k, 3), replay_wall_s=round(wall_x, 3),
        kernel_mrays_per_s=round(n_rays / wall_k / 1e6, 2),
        replay_mrays_per_s=round(n_rays / wall_x / 1e6, 2),
        rel_loss=rel_loss, worst_grad_rel=worst,
        ok=bool(rel_loss < 1e-5 and worst < 1e-3),
    )
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "DEPTH_GATE.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
