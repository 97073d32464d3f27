"""Perf probe: time the integrator's pieces on the current backend.

Run: python -m go_raytracing_tpu.utils.perf_probe [--rays N]
Identifies which stage (closest-hit, records+scatter, NEE, full bounce)
dominates, and measures the [R,3] layout tax.
"""

from __future__ import annotations

import argparse
import time

import numpy as np
import jax
import jax.numpy as jnp


def _timeit(fn, *args, warmup=2, iters=10):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        jax.block_until_ready(fn(*args))
    return (time.perf_counter() - t0) / iters


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=1 << 20)
    args = ap.parse_args(argv)
    n = args.rays

    import go_raytracing_tpu as grt
    from go_raytracing_tpu.integrator import wavefront
    from go_raytracing_tpu.materials import tables as mats
    from go_raytracing_tpu.camera import generate_rays

    print(f"backend={jax.default_backend()} rays={n}")
    scene, cam = grt.load_scene("cornell")
    stream = jnp.arange(n, dtype=jnp.uint32)
    px = (stream % 600).astype(jnp.int32)
    py = ((stream // 600) % 600).astype(jnp.int32)
    o, d, tm = generate_rays(cam, px, py, stream, 0)
    o, d, tm = jax.block_until_ready((o, d, tm))
    tmax = jnp.full((n,), 3e38, jnp.float32)

    ch = jax.jit(lambda o, d: wavefront.closest_hit(scene, o, d, tm, 1e-3, tmax, 0, stream, 0))
    dt = _timeit(ch, o, d)
    print(f"closest_hit      : {dt*1e3:8.2f} ms  ({n/dt/1e6:7.1f} Mrays/s)")
    t, which, idx, aux, _ovf = ch(o, d)

    rec = jax.jit(lambda o, d, t: wavefront.extract_record(scene, o, d, tm, t, which, idx, aux))
    dt = _timeit(rec, o, d, t)
    print(f"extract_record   : {dt*1e3:8.2f} ms")
    p, nrm, front, uu, vv, mat = rec(o, d, t)

    sca = jax.jit(lambda d, nrm: mats.scatter(
        scene.materials, scene.textures, mat, d, nrm, front, uu, vv, p,
        0, stream, 0, **scene.tex_flags))
    dt = _timeit(sca, d, nrm)
    print(f"scatter          : {dt*1e3:8.2f} ms")
    sc = sca(d, nrm)

    nee = jax.jit(lambda p, nrm, d: wavefront.sample_area_light(
        scene, cam, p, nrm, d, sc.attenuation, mat, 0, stream, 0))
    dt = _timeit(nee, p, nrm, d)
    print(f"area_light NEE   : {dt*1e3:8.2f} ms")

    # full bounce via trace with depth=1 and depth=5 camera
    import dataclasses
    for depth in (1, 5):
        cam2 = dataclasses.replace(cam, max_depth=depth)
        tr = jax.jit(lambda o, d: wavefront.trace(scene, cam2, o, d, tm, stream, 0))
        dt = _timeit(tr, o, d, warmup=1, iters=3)
        print(f"trace depth={depth}    : {dt*1e3:8.2f} ms  ({n/dt/1e6:7.1f} Mrays/s)")

    # layout tax microbench: [R,3] vs [3,R] vs [R] component math
    a3 = jnp.ones((n, 3), jnp.float32)
    b3 = jnp.ones((n, 3), jnp.float32)
    f_rows = jax.jit(lambda a, b: jnp.sum(a * b + a, axis=-1))
    dt = _timeit(f_rows, a3, b3)
    print(f"[R,3] fma+dot    : {dt*1e3:8.2f} ms")
    at = jnp.ones((3, n), jnp.float32)
    bt = jnp.ones((3, n), jnp.float32)
    f_cols = jax.jit(lambda a, b: jnp.sum(a * b + a, axis=0))
    dt = _timeit(f_cols, at, bt)
    print(f"[3,R] fma+dot    : {dt*1e3:8.2f} ms")
    ax, ay, az = (jnp.ones((n,), jnp.float32) for _ in range(3))
    bx, by, bz = (jnp.ones((n,), jnp.float32) for _ in range(3))
    f_comp = jax.jit(lambda ax, ay, az, bx, by, bz:
                     ax * bx + ax + ay * by + ay + az * bz + az)
    dt = _timeit(f_comp, ax, ay, az, bx, by, bz)
    print(f"[R]x3 fma+dot    : {dt*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
