"""Per-stage timing of the cornell-lucy scan bounce on TPU: closest hit
(real vs mesh-stubbed), extract_record, material scatter, NEE shadow
(real vs stubbed), miss shader.  Locates the non-mesh cost found by
lucy_trace_split.py.

Run: python scripts/lucy_stage_probe.py [--rays 2097152]
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
from go_raytracing_tpu.materials import tables as mats  # noqa: E402
from go_raytracing_tpu.render.renderer import _id_to_pixel  # noqa: E402

BIG = np.float32(3.0e38)


def timeit(fn, *a, warm=1, iters=5):
    # ONE fused program ending in ONE scalar -> one transfer per iter
    # (np.asarray of full [2M] outputs would time the tunnel, and
    # per-leaf float() fetches add a ~30 ms roundtrip each).
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
    t0 = time.perf_counter()
    for _ in range(iters):
        float(run(*a))
    return (time.perf_counter() - t0) / iters


def stub_mesh():
    def stub(proto, o, d, t_min, t_max, any_hit=False):
        n = o.x.shape[0]
        return (jnp.full((n,), BIG), jnp.zeros((n,), jnp.int32),
                jnp.zeros((n,), jnp.int32), jnp.zeros((n,), bool),
                jnp.int32(0))
    return stub


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=1 << 21)
    args = ap.parse_args()
    r = args.rays

    scene, cam = grt.load_scene("cornell-lucy", mesh_detail=(256, 220))
    cam = dataclasses.replace(cam, image_width=600, aspect_ratio=1.0,
                              samples_per_pixel=25, max_depth=5)
    print(f"backend={jax.default_backend()} rays={r/1e6:.2f}M "
          f"tris={scene.meshes[0].tri_v0.shape[0]}")

    ids = jnp.arange(r, dtype=jnp.uint32)
    px, py, _ = _id_to_pixel(ids % (600 * 600), 600, 600, True)
    o, d, tm = generate_rays(cam, px, py, ids, 0)
    tmax = jnp.full((r,), BIG)
    seed = 0

    def ch(o, d):
        return wavefront.closest_hit(scene, o, d, tm, 1e-3, tmax, seed,
                                     ids, 0)

    dt = timeit(jax.jit(ch), o, d)
    print(f"closest_hit real : {dt*1e3:8.1f} ms ({r/dt/1e6:6.1f} Mrays/s)")
    t, which, idx, aux, _ = jax.block_until_ready(jax.jit(ch)(o, d))

    real = wavefront._mesh_intersect
    wavefront._mesh_intersect = stub_mesh()
    try:
        dt = timeit(jax.jit(ch), o, d)
        print(f"closest_hit stub : {dt*1e3:8.1f} ms")
    finally:
        wavefront._mesh_intersect = real

    hit = which > 0
    t_rec = jnp.where(hit, t, 1.0)

    def rec(o, d, t_rec, which, idx, aux):
        return wavefront.extract_record(scene, o, d, tm, t_rec, which,
                                        idx, aux)

    dt = timeit(jax.jit(rec), o, d, t_rec, which, idx, aux)
    print(f"extract_record   : {dt*1e3:8.1f} ms")
    p, normal, front, uu, vv, mat_id = jax.block_until_ready(
        jax.jit(rec)(o, d, t_rec, which, idx, aux))

    def sc_fn(mat_id, d, normal, front, uu, vv, p):
        return mats.scatter(scene.materials, scene.textures, mat_id, d,
                            normal, front, uu, vv, p, seed, ids, 0,
                            **scene.tex_flags)

    dt = timeit(jax.jit(sc_fn), mat_id, d, normal, front, uu, vv, p)
    print(f"mats.scatter     : {dt*1e3:8.1f} ms")
    sc = jax.block_until_ready(
        jax.jit(sc_fn)(mat_id, d, normal, front, uu, vv, p))

    use_mis = sc.can_use_nee & hit

    def nee(p, normal, d, atten, mat_id, use_mis):
        return wavefront.sample_area_light(
            scene, cam, p, normal, d, atten, mat_id, seed, ids, 0,
            active=use_mis)

    dt = timeit(jax.jit(nee), p, normal, d, sc.attenuation, mat_id, use_mis)
    print(f"sample_area_light real: {dt*1e3:8.1f} ms")

    wavefront._mesh_intersect = stub_mesh()
    try:
        dt = timeit(jax.jit(nee), p, normal, d, sc.attenuation, mat_id,
                    use_mis)
        print(f"sample_area_light stub: {dt*1e3:8.1f} ms")
    finally:
        wavefront._mesh_intersect = real

    def miss(d):
        return wavefront._miss_radiance(scene, cam, d,
                                        jnp.ones(d.x.shape, bool))

    dt = timeit(jax.jit(miss), d)
    print(f"_miss_radiance   : {dt*1e3:8.1f} ms")

    # ---- finer: inside closest_hit ----
    def surf(o, d):
        return wavefront._surface_intersects(scene, o, d, tm, 1e-3, tmax)

    dt = timeit(jax.jit(surf), o, d)
    print(f"_surface_intersects   : {dt*1e3:8.1f} ms")

    proto = scene.meshes[0]

    def mesh_real(o, d):
        return wavefront._mesh_intersect(proto, o, d, 1e-3, tmax)

    dt = timeit(jax.jit(mesh_real), o, d)
    print(f"_mesh_intersect real  : {dt*1e3:8.1f} ms (t_max=BIG)")

    # capped by the surface hit, like closest_hit does
    (t_s, i_s, h_s), (t_p, i_p, h_p) = jax.jit(surf)(o, d)
    t_capped = jnp.where(h_p, t_p, tmax)

    def mesh_capped(o, d, t_capped):
        return wavefront._mesh_intersect(proto, o, d, 1e-3, t_capped)

    dt = timeit(jax.jit(mesh_capped), o, d, t_capped)
    print(f"_mesh_intersect capped: {dt*1e3:8.1f} ms")

    def keysort(o, d, t_capped):
        reach, key = wavefront._mesh_sort_key(proto, o, d, 1e-3, t_capped)
        return jnp.argsort(key), reach

    dt = timeit(jax.jit(keysort), o, d, t_capped)
    print(f"  key+argsort         : {dt*1e3:8.1f} ms")

    from go_raytracing_tpu.ops import pallas_mesh_stream as pms

    def cull(o, d, t_capped):
        return pms.build_block_lists(
            proto.inst_w2l, proto.root_bbox_min, proto.root_bbox_max,
            proto.s_tilebox, o, d, t_capped, 1e-3)

    dt = timeit(jax.jit(cull), o, d, t_capped)
    print(f"  build_block_lists   : {dt*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
