"""Why are incoherent rays slow in the stream mesh kernel?

Measures, for camera primaries vs realistic secondary rays (cosine
scatter off the first hit) vs uniform interior rays:
  - reach fraction (rays whose segment enters any instance root box)
  - per-block slot counts from build_block_lists (the phase-B work)
  - kernel wall time
Run on TPU: python scripts/incoherent_probe.py
"""

import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timeit(fn, *args, iters=3):
    jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / iters


def main():
    from go_raytracing_tpu.camera import generate_rays
    from go_raytracing_tpu.core.vec3 import V3
    from go_raytracing_tpu.core import rng as grng
    from go_raytracing_tpu.integrator import wavefront
    from go_raytracing_tpu.ops import pallas_mesh_stream as pms
    from go_raytracing_tpu.render.renderer import _id_to_pixel
    from go_raytracing_tpu.scenes import builders

    print("backend:", jax.default_backend())
    R = 1 << 21
    scene, cam = builders.cornell_box_lucy(mesh_detail=(256, 220))
    cam = dataclasses.replace(cam, image_width=600, aspect_ratio=1.0)
    proto = scene.meshes[0]
    t_min = 1e-3

    ids = jnp.arange(R, dtype=jnp.uint32)
    px, py, _ = _id_to_pixel(ids % (600 * 600), 600, 600, True)
    o, d, tm = generate_rays(cam, px, py, ids, 0)
    big = jnp.full((R,), 3.0e38, jnp.float32)

    # Build realistic bounce-1 rays: closest hit + cosine hemisphere.
    @jax.jit
    def bounce1(o, d):
        (t_s, i_s, h_s), (t_p, i_p, h_p) = wavefront._surface_intersects(
            scene, o, d, tm, t_min, big)
        t_w = jnp.where(h_s & (~h_p | (t_s < t_p)), t_s,
                        jnp.where(h_p, t_p, big))
        t_m, tri, inst, h_m, _ = wavefront._mesh_intersect(
            proto, o, d, t_min, t_w)
        t = jnp.where(h_m, t_m, t_w)
        hit = h_s | h_p | h_m
        p = V3(o.x + d.x * t, o.y + d.y * t, o.z + d.z * t)
        # crude normal: use -d reflected about nothing; cosine sample
        # around world-up mixed with -d (good enough for ray stats)
        u1, u2 = grng.uniform2(0, ids, jnp.uint32(7), jnp.uint32(1))
        r_ = jnp.sqrt(u1)
        phi = 2 * np.pi * u2
        lx = r_ * jnp.cos(phi)
        ly = r_ * jnp.sin(phi)
        lz = jnp.sqrt(jnp.maximum(0.0, 1 - u1))
        nd = V3(-d.x, -d.y, -d.z)
        # frame around nd
        sgn = jnp.where(nd.z >= 0, 1.0, -1.0)
        a = -1.0 / (sgn + nd.z)
        b = nd.x * nd.y * a
        t1 = V3(1 + sgn * nd.x * nd.x * a, sgn * b, -sgn * nd.x)
        t2 = V3(b, sgn + nd.y * nd.y * a, -nd.y)
        nd2 = V3(t1.x * lx + t2.x * ly + nd.x * lz,
                 t1.y * lx + t2.y * ly + nd.y * lz,
                 t1.z * lx + t2.z * ly + nd.z * lz)
        eps = 1e-3
        o2 = V3(p.x + nd2.x * eps, p.y + nd2.y * eps, p.z + nd2.z * eps)
        alive = hit & (t < 1e30)
        return o2, nd2, jnp.where(alive, big, -1.0)

    o1, d1, tmax1 = jax.block_until_ready(bounce1(o, d))

    @jax.jit
    def wall_bound(o, d, cap):
        (t_s, _, h_s), (t_p, _, h_p) = wavefront._surface_intersects(
            scene, o, d, tm, t_min, jnp.abs(cap))
        sw = h_s & (~h_p | (t_s < t_p))
        t = jnp.where(sw, t_s, jnp.where(h_p, t_p, jnp.abs(cap)))
        return jnp.where(cap > 0, t, -1.0)

    tmax1 = jax.block_until_ready(wall_bound(o1, d1, tmax1))

    @jax.jit
    def reach_frac(o, d, tmx):
        live = tmx > 0
        rch = wavefront._mesh_sort_key(proto, o, d, t_min, tmx)[0] & live
        return rch.mean(), live.mean()

    @jax.jit
    def sortkey(o, d, t_max):
        reach, key = wavefront._mesh_sort_key(proto, o, d, t_min, t_max)
        t_max = jnp.where(reach, t_max, -1.0)
        order = jnp.argsort(key)
        return (V3(o.x[order], o.y[order], o.z[order]),
                V3(d.x[order], d.y[order], d.z[order]), t_max[order])

    def kern(o, d, t_max):
        return pms._call(
            proto.inst_w2l, proto.root_bbox_min, proto.root_bbox_max,
            proto.s_tilebox, proto.s_tri, o, d, t_max,
            t_min=t_min, n_inst=proto.n_instances,
        )

    for name, (oo, dd, tt) in {
        "primaries": (o, d, wall_bound(o, d, big)),
        "bounce1  ": (o1, d1, tmax1),
    }.items():
        rf, lf = jax.block_until_ready(reach_frac(oo, dd, tt))
        os_, ds_, ts_ = jax.block_until_ready(sortkey(oo, dd, tt))
        dt = timeit(kern, os_, ds_, ts_)
        ovf = int(kern(os_, ds_, ts_)[4])
        nhit = int(kern(os_, ds_, ts_)[3].sum())
        print(f"{name}: live={float(lf):.3f} reach={float(rf):.3f} "
              f"kernel={dt*1e3:7.1f} ms ({R/dt/1e6:5.2f} Mrays/s raw) "
              f"hits={nhit} ovf={ovf}")
        # slot-count stats from the cull
        segs, tilemask, nseg, instmask = jax.jit(
            lambda o, d, t: pms.build_block_lists(
                proto.inst_w2l, proto.root_bbox_min, proto.root_bbox_max,
                proto.s_tilebox, o, d, t, t_min))(os_, ds_, ts_)
        tiles_per_block = np.asarray(
            jax.jit(lambda m: jax.lax.population_count(m).sum(1))(tilemask))
        nseg = np.asarray(nseg)
        im = np.asarray(jax.lax.population_count(instmask))
        print(f"   tiles/block: mean={tiles_per_block.mean():7.1f} "
              f"p50={np.percentile(tiles_per_block, 50):6.0f} "
              f"p90={np.percentile(tiles_per_block, 90):6.0f} "
              f"max={tiles_per_block.max()}  "
              f"nseg mean={nseg.mean():5.1f} max={nseg.max()}  "
              f"inst/block mean={im.mean():4.1f}")


if __name__ == "__main__":
    main()
