"""Phase split of the stream mesh kernel on realistic rays: times
_call with skip_b (phase 0+A only) vs full, on (a) coherent camera
rays and (b) bounce-1-like rays (diffuse respawn at the camera hit
point), both coherence-sorted like _mesh_intersect does.

Run on TPU: python scripts/stream_phase_probe.py [--rays N]
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
from go_raytracing_tpu.core.vec3 import V3  # noqa: E402
from go_raytracing_tpu.core import rng as rngmod  # noqa: E402
from go_raytracing_tpu.integrator import wavefront  # noqa: E402
from go_raytracing_tpu.ops import pallas_mesh_stream as pms  # noqa: E402
from go_raytracing_tpu.render.renderer import _id_to_pixel  # noqa: E402

BIG = np.float32(3.0e38)


def timeit(fn, *a, warm=2, iters=5):
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
    return min(ts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=1 << 21)
    args = ap.parse_args()
    r = args.rays

    scene, cam = grt.load_scene("cornell-lucy", mesh_detail=(256, 220))
    cam = dataclasses.replace(cam, image_width=600, aspect_ratio=1.0,
                              samples_per_pixel=25, max_depth=5)
    proto = scene.meshes[0]
    print(f"backend={jax.default_backend()} rays={r/1e6:.2f}M "
          f"tris={proto.tri_v0.shape[0]}")

    ids = jnp.arange(r, dtype=jnp.uint32)
    px, py, _ = _id_to_pixel(ids % (600 * 600), 600, 600, True)
    o, d, tm = generate_rays(cam, px, py, ids, 0)
    tmax = jnp.full((r,), BIG)

    # bounce-1-like rays: full closest hit, diffuse respawn
    @jax.jit
    def respawn(o, d):
        t, which, idx, aux, _ = wavefront.closest_hit(
            scene, o, d, tm, 1e-3, tmax, 0, ids, 0)
        hit = which > 0
        t_rec = jnp.where(hit, t, 1.0)
        p, normal, front, uu, vv, mat_id = wavefront.extract_record(
            scene, o, d, tm, t_rec, which, idx, aux)
        u1 = rngmod.uniform(0, ids, jnp.uint32(0), rngmod.SCATTER_U)
        u2 = rngmod.uniform(0, ids, jnp.uint32(0), rngmod.SCATTER_V)
        z = 1.0 - 2.0 * u1
        rr = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
        ph = 2.0 * np.pi * u2
        sph = V3(rr * jnp.cos(ph), rr * jnp.sin(ph), z)
        nd = normal + sph
        d1 = nd * jax.lax.rsqrt(jnp.maximum(nd.dot(nd), 1e-12))
        cap = jnp.where(hit, BIG, -1.0)
        return p, d1, cap

    p1, d1, cap1 = jax.block_until_ready(respawn(o, d))

    def sortlike(o, d, cap):
        reach, key = wavefront._mesh_sort_key(proto, o, d, 1e-3, cap)
        cap = jnp.where(reach, cap, -1.0)
        order = jnp.argsort(key)
        return (V3(o.x[order], o.y[order], o.z[order]),
                V3(d.x[order], d.y[order], d.z[order]), cap[order],
                reach.sum())

    for name, (oo, dd, cc) in (
        ("camera", (o, d, tmax)),
        ("bounce1", (p1, d1, cap1)),
    ):
        os_, ds_, cs_, nreach = jax.block_until_ready(
            jax.jit(sortlike)(oo, dd, cc))
        print(f"[{name}] reach={int(nreach)/r*100:.0f}%")

        def call(os_, ds_, cs_, skip_b):
            return pms._call(
                proto.inst_w2l, proto.root_bbox_min, proto.root_bbox_max,
                proto.s_tilebox, proto.s_tri, os_, ds_, cs_,
                t_min=1e-3, n_inst=proto.n_instances, skip_b=skip_b)

        dt_a = timeit(lambda a, b, c: call(a, b, c, True), os_, ds_, cs_)
        dt_f = timeit(lambda a, b, c: call(a, b, c, False), os_, ds_, cs_)
        print(f"  phase 0+A: {dt_a*1e3:7.1f} ms   full: {dt_f*1e3:7.1f} ms"
              f"   phase B: {(dt_f-dt_a)*1e3:7.1f} ms")

        # XLA-side cull alone
        def cull(os_, ds_, cs_):
            return pms.build_block_lists(
                proto.inst_w2l, proto.root_bbox_min, proto.root_bbox_max,
                proto.s_tilebox, os_, ds_, cs_, 1e-3)

        dt_c = timeit(cull, os_, ds_, cs_)
        print(f"  XLA cull : {dt_c*1e3:7.1f} ms")


if __name__ == "__main__":
    main()
