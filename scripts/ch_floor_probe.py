"""Control experiment: why does closest_hit(stub mesh) cost ~210 ms when
_surface_intersects alone is 30 ms?  Times both with more iters plus a
trivial select-only control, on the lucy scene rays."""

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


def timeit(fn, *a, warm=2, iters=10):
    @jax.jit
    def run(*a):
        r = fn(*a)
        tot = jnp.float32(0)
        for x in jax.tree_util.tree_leaves(r):
            if hasattr(x, "sum"):
                tot += jnp.clip(x.astype(jnp.float32), -1e6, 1e6).mean()
        return tot

    for _ in range(warm):
        float(run(*a))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(run(*a))
        ts.append(time.perf_counter() - t0)
    return min(ts), sum(ts) / iters


def main():
    r = 1 << 21
    scene, cam = grt.load_scene("cornell-lucy", mesh_detail=(256, 220))
    cam = dataclasses.replace(cam, image_width=600, aspect_ratio=1.0)
    ids = jnp.arange(r, dtype=jnp.uint32)
    px, py, _ = _id_to_pixel(ids % (600 * 600), 600, 600, True)
    o, d, tm = generate_rays(cam, px, py, ids, 0)
    tmax = jnp.full((r,), BIG)

    def stub(proto, o, d, t_min, t_max, any_hit=False):
        n = o.x.shape[0]
        return (jnp.full((n,), BIG), jnp.zeros((n,), jnp.int32),
                jnp.zeros((n,), jnp.int32), jnp.zeros((n,), bool),
                jnp.int32(0))

    def surf(o, d):
        return wavefront._surface_intersects(scene, o, d, tm, 1e-3, tmax)

    mn, av = timeit(surf, o, d)
    print(f"_surface_intersects: min {mn*1e3:7.1f} avg {av*1e3:7.1f} ms")

    def ch(o, d):
        return wavefront.closest_hit(scene, o, d, tm, 1e-3, tmax, 0, ids, 0)

    real = wavefront._mesh_intersect
    wavefront._mesh_intersect = stub
    try:
        mn, av = timeit(ch, o, d)
        print(f"closest_hit (stub) : min {mn*1e3:7.1f} avg {av*1e3:7.1f} ms")
    finally:
        wavefront._mesh_intersect = real

    mn, av = timeit(ch, o, d)
    print(f"closest_hit (real) : min {mn*1e3:7.1f} avg {av*1e3:7.1f} ms")

    def triv(o, d):
        return jnp.where(o.x > d.x, o.y, d.y)

    mn, av = timeit(triv, o, d)
    print(f"trivial select     : min {mn*1e3:7.1f} avg {av*1e3:7.1f} ms")


if __name__ == "__main__":
    main()
