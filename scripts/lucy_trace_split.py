"""Split cornell-lucy trace() wall time: full trace vs trace with mesh
sweeps stubbed out (monkeypatched to instant miss), plus per-bounce
reach/alive fractions — decides whether the next mesh-path round goes
after sweep work, sort/cull fixed costs, or the non-mesh remainder.

Run on TPU: python scripts/lucy_trace_split.py [--rays 2097152]
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
from go_raytracing_tpu.render.renderer import _id_to_pixel  # noqa: E402

BIG = np.float32(3.0e38)


def timeit(fn, *a, warm=1, iters=3):
    for _ in range(warm):
        r = fn(*a)
        jax.block_until_ready(r)
        float(sum(x.sum() for x in jax.tree_util.tree_leaves(r)
                  if hasattr(x, "sum")))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*a)
        float(sum(x.sum() for x in jax.tree_util.tree_leaves(r)
                  if hasattr(x, "sum")))
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=1 << 21)
    ap.add_argument("--detail", type=int, nargs=2, default=[256, 220])
    args = ap.parse_args()
    r = args.rays

    scene, cam = grt.load_scene("cornell-lucy",
                                mesh_detail=tuple(args.detail))
    cam = dataclasses.replace(cam, image_width=600, aspect_ratio=1.0,
                              samples_per_pixel=25, max_depth=5)
    proto = scene.meshes[0]
    print(f"tris={proto.tri_v0.shape[0]} inst={proto.inst_w2l.shape[0]} "
          f"rays={r/1e6:.2f}M depth={cam.max_depth}")

    ids = jnp.arange(r, dtype=jnp.uint32)
    px, py, _ = _id_to_pixel(ids % (600 * 600), 600, 600, True)
    o, d, tm = generate_rays(cam, px, py, ids, 0)

    def full(o, d, tm, ids):
        return wavefront.trace(scene, cam, o, d, tm, ids, 0,
                               differentiable=False).rows()

    dt_full = timeit(jax.jit(full), o, d, tm, ids)
    print(f"full trace:        {dt_full*1e3:8.1f} ms "
          f"({r/dt_full/1e6:5.2f} Mrays/s)")

    # Stub the mesh out (instant miss) and retrace: the difference is the
    # total mesh cost (sort + cull + kernel, closest + shadow).
    real = wavefront._mesh_intersect

    def stub(proto, o, d, t_min, t_max, any_hit=False):
        n = o.x.shape[0]
        return (jnp.full((n,), BIG), jnp.zeros((n,), jnp.int32),
                jnp.zeros((n,), jnp.int32), jnp.zeros((n,), bool),
                jnp.int32(0))

    # NOTE: must be a DIFFERENT function object than `full` — jax.jit
    # keys its trace cache on the wrapped function's identity, so
    # jax.jit(full) after monkeypatching would silently reuse the
    # pre-stub trace (measured: identical times, bogus "-0%").
    wavefront._mesh_intersect = stub
    try:
        def full_stub(o, d, tm, ids):
            return wavefront.trace(scene, cam, o, d, tm, ids, 0,
                                   differentiable=False).rows()

        dt_stub = timeit(jax.jit(full_stub), o, d, tm, ids)
    finally:
        wavefront._mesh_intersect = real
    print(f"mesh stubbed:      {dt_stub*1e3:8.1f} ms "
          f"-> mesh total {100*(dt_full-dt_stub)/dt_full:.0f}% of trace")

    # Sort+reach-key only (the per-sweep fixed cost paid outside the
    # kernel), once per sweep.
    def key_sort(o, d):
        t_max = jnp.full((r,), BIG)
        reach, key = wavefront._mesh_sort_key(proto, o, d, 1e-3, t_max)
        order = jnp.argsort(key)
        return order.astype(jnp.int32).sum(), reach.sum()

    dt_key = timeit(jax.jit(key_sort), o, d)
    print(f"key+argsort:       {dt_key*1e3:8.1f} ms per sweep")

    # Per-bounce alive / mesh-reach / NEE-active fractions, from a
    # recorded scan trace (cheap: stats only).
    rad, dec = wavefront.trace(scene, cam, o, d, tm, ids, 0,
                               differentiable=False, record=True)
    which = np.asarray(dec.which)          # [D, R]
    blk = np.asarray(dec.blk_a)
    alive = np.ones((r,), bool)
    for b in range(cam.max_depth):
        w = which[b]
        hit = w > 0
        lam_guess = hit  # any hit may shadow-sweep; report hit fraction
        print(f"bounce {b}: alive {alive.mean()*100:5.1f}%  "
              f"hit {(hit & alive).mean()*100:5.1f}%  "
              f"nee-blocked {(blk[b] & alive).mean()*100:5.1f}%")
        alive = alive & hit


if __name__ == "__main__":
    main()
