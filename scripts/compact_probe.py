"""A/B the mid-loop live-ray compaction (megakernel 'compact' mode)
against single-shot on RandomScene at bench shape.

DESIGN.md 5d: at depth 10, 0.9% of lanes but 72.8% of 1024-ray blocks
are still live by bounce 9 — bounces 2-9 run ~78% of blocks for ~5% of
lanes.  Split mode's argsort+full-state machinery measured +131 ms
gross; this probe measures whether the sort-free stable partition
(pallas_wavefront._compact_partition) is cheap enough to win.

Run on TPU: python scripts/compact_probe.py [--rays 4194304] [--at 3 5]
Each --at value is a separate outer-jit compile (the phase boundary is
a baked constant under jit — footgun #9: fresh fn per variant).
"""

import argparse
import dataclasses
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

import go_raytracing_tpu as grt  # noqa: E402
from go_raytracing_tpu.camera import generate_rays  # noqa: E402
from go_raytracing_tpu.integrator import wavefront  # noqa: E402
from go_raytracing_tpu.ops import pallas_wavefront as mega  # noqa: E402
from go_raytracing_tpu.render.renderer import _id_to_pixel  # noqa: E402


def timeit(fn, *a, warm=1, iters=5):
    @jax.jit
    def run(*a):
        r = fn(*a)
        tot = jnp.float32(0)
        for x in jax.tree_util.tree_leaves(r):
            if hasattr(x, "sum"):
                tot += jnp.clip(x.astype(jnp.float32), -1e6, 1e6).mean()
        return tot

    for _ in range(warm):
        s = float(run(*a))
    t0 = time.perf_counter()
    for _ in range(iters):
        s = float(run(*a))
    return (time.perf_counter() - t0) / iters, s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=1 << 22)
    ap.add_argument("--at", type=int, nargs="*", default=[3])
    args = ap.parse_args()
    r = args.rays

    scene, cam = grt.load_scene("random")
    cam = dataclasses.replace(cam, samples_per_pixel=25, max_depth=10)
    w = 600
    h = int(w / cam.aspect_ratio)
    ids = jnp.arange(r, dtype=jnp.uint32)
    px, py, _ = _id_to_pixel(ids % (w * h), w, h, True)
    o, d, tm = generate_rays(cam, px, py, ids, 0)
    print(f"rays={r/1e6:.2f}M depth={cam.max_depth} "
          f"spheres={scene.spheres.radius.shape[0]}")

    def mk(mode):
        def f(ox, oy, oz, dx, dy, dz, tm, stream):
            from go_raytracing_tpu.core.vec3 import V3

            return wavefront.trace(
                scene, cam, V3(ox, oy, oz), V3(dx, dy, dz), tm, stream,
                jnp.uint32(0), differentiable=False, mega_mode=mode)
        return f

    a8 = (o.x, o.y, o.z, d.x, d.y, d.z, tm, ids)
    dt, s = timeit(mk("single"), *a8)
    base = dt
    print(f"single : {dt*1e3:8.1f} ms ({r/dt/1e6:6.2f} Mrays/s) [{s:.5e}]")
    for at in args.at:
        mega.COMPACT_AT = at
        dt, s2 = timeit(mk("compact"), *a8)
        flag = "" if abs(s2 - s) < 2e-3 * max(abs(s), 1e-6) else "  MISMATCH!"
        print(f"compact@{at}: {dt*1e3:7.1f} ms ({r/dt/1e6:6.2f} Mrays/s) "
              f"[{s2:.5e}] {base/dt:.2f}x{flag}")


if __name__ == "__main__":
    main()
