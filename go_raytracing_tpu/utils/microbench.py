"""Micro-benchmark suite mirroring rt/benchmark_test.go.

Run: ``python -m go_raytracing_tpu.utils.microbench [--rays N]``

Reference parity (rt/benchmark_test.go):
  - BenchmarkRayAABBIntersection (:82-95)  -> bench_aabb_slab
  - BenchmarkVec3Operations (:98-125)      -> bench_vec_ops
  - BenchmarkBVHConstruction (:128-146)    -> bench_bvh_build (mesh proto)
  - BenchmarkBVHTraversal (:194-235)       -> bench_sphere_field / bench_mesh
  - BenchmarkRayTracing (:149-161)         -> bench_cornell_ray
  - QuickBenchmark (:164-191)              -> bench_quick_cornell
Each prints name, iterations/rays per second, and wall time.
"""

from __future__ import annotations

import argparse
import time

import numpy as np
import jax
import jax.numpy as jnp


def _timeit(fn, *args, warmup=1, iters=5):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jax.block_until_ready(fn(*args))
    return (time.perf_counter() - t0) / iters, out


def bench_vec_ops(n):
    from ..core import vec

    r = np.random.default_rng(0)
    a = jnp.asarray(r.normal(size=(n, 3)), jnp.float32)
    b = jnp.asarray(r.normal(size=(n, 3)), jnp.float32)

    for name, fn in [
        ("add", jax.jit(lambda x, y: x + y)),
        ("dot", jax.jit(vec.dot)),
        ("cross", jax.jit(vec.cross)),
        ("normalize", jax.jit(lambda x, y: vec.unit(x))),
    ]:
        dt, _ = _timeit(fn, a, b)
        print(f"vec3/{name:10s}: {n / dt / 1e6:10.1f} Mops/s  ({dt*1e3:.3f} ms)")


def bench_aabb_slab(n):
    from ..geometry import mesh_bvh

    r = np.random.default_rng(0)
    o = jnp.asarray(r.normal(size=(n, 3)) * 2, jnp.float32)
    d = jnp.asarray(r.normal(size=(n, 3)), jnp.float32)
    inv = 1.0 / jnp.where(jnp.abs(d) < 1e-9, 1e-9, d)
    bmin = jnp.asarray([-1.0, -1.0, -1.0])
    bmax = jnp.asarray([1.0, 1.0, 1.0])
    fn = jax.jit(lambda o, i: mesh_bvh._slab(bmin, bmax, o, i, 1e-3, jnp.float32(1e9))[0])
    dt, _ = _timeit(fn, o, inv)
    print(f"aabb_slab      : {n / dt / 1e6:10.1f} Mrays/s  ({dt*1e3:.3f} ms)")


def bench_sphere_field(n_rays, n_spheres=1000):
    """1000-sphere closest hit (BenchmarkBVHTraversal shape)."""
    from ..geometry import packs
    from ..geometry.scene import SceneBuilder

    r = np.random.default_rng(0)
    b = SceneBuilder()
    m = b.lambertian((1, 1, 1))
    for _ in range(n_spheres):
        b.sphere(r.uniform(-50, 50, 3), r.uniform(0.5, 2.0), m)
    scene = b.build()
    o = jnp.asarray(r.uniform(-60, 60, (n_rays, 3)), jnp.float32)
    d = jnp.asarray(r.normal(size=(n_rays, 3)), jnp.float32)
    tm = jnp.zeros(n_rays, jnp.float32)
    tmax = jnp.full(n_rays, 1e9, jnp.float32)
    fn = jax.jit(lambda o, d: packs.intersect_spheres(scene.spheres, o, d, tm, 1e-3, tmax))
    dt, _ = _timeit(fn, o, d)
    print(f"sphere_field({n_spheres:4d}): {n_rays / dt / 1e6:8.1f} Mrays/s  ({dt*1e3:.3f} ms)")


def bench_bvh_build(n_tris=280_000):
    from ..geometry import mesh_bvh
    from ..io import obj as obj_mod

    # synthesize ~n_tris triangles
    seg = max(int(np.sqrt(n_tris / 2)), 8)
    verts, tris = obj_mod.lucy_standin(seg, seg + 1)
    t0 = time.perf_counter()
    proto = mesh_bvh.build_proto(verts, tris, [(np.eye(4), 0)])
    dt = time.perf_counter() - t0
    print(f"bvh_build({len(tris):7d} tris): {dt:.2f} s  depth={proto.depth}")
    return proto


def bench_mesh(n_rays, proto):
    from ..geometry import mesh_bvh

    r = np.random.default_rng(0)
    o = np.zeros((n_rays, 3))
    o[:, 1] = 800.0
    o[:, 2] = 2000.0
    targets = np.stack([
        r.uniform(-400, 400, n_rays), r.uniform(0, 1500, n_rays), np.zeros(n_rays)
    ], axis=-1)
    d = jnp.asarray(targets - o, jnp.float32)
    o = jnp.asarray(o, jnp.float32)
    tmax = jnp.full(n_rays, 1e9, jnp.float32)
    fn = jax.jit(lambda o, d: mesh_bvh.intersect_mesh(proto, o, d, 1e-3, tmax)[:4])
    dt, out = _timeit(fn, o, d)
    hits = int(np.asarray(out[3]).sum())
    print(f"mesh_traverse  : {n_rays / dt / 1e6:10.2f} Mrays/s  ({dt*1e3:.3f} ms, {hits} hits)")


def bench_quick_cornell(width=160, spp=1, depth=3):
    """QuickBenchmark parity: tiny Cornell render reporting rays/s
    (rt/benchmark_test.go:164-191)."""
    import dataclasses

    import go_raytracing_tpu as grt

    scene, cam = grt.load_scene("cornell")
    cam = dataclasses.replace(
        cam, image_width=width, aspect_ratio=16.0 / 9.0,
        samples_per_pixel=spp, max_depth=depth,
    )
    grt.render(scene, cam, spp=spp, seed=0)  # compile
    t0 = time.perf_counter()
    grt.render(scene, cam, spp=spp, seed=1)
    dt = time.perf_counter() - t0
    n = cam.image_width * cam.image_height * spp
    print(f"quick_cornell  : {n / dt / 1e6:10.2f} Mrays/s  ({dt*1e3:.1f} ms)")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=1 << 18)
    ap.add_argument("--tris", type=int, default=40_000)
    args = ap.parse_args(argv)

    print(f"backend: {jax.default_backend()}, devices: {jax.devices()}")
    bench_vec_ops(args.rays)
    bench_aabb_slab(args.rays)
    bench_sphere_field(args.rays)
    proto = bench_bvh_build(args.tris)
    bench_mesh(args.rays, proto)
    bench_quick_cornell()


if __name__ == "__main__":
    main()
