"""Time the stream-mesh path's components separately on TPU:
build_block_lists (XLA cull), the pallas kernel call, and the
wavefront._mesh_intersect wrapper (sort + scatter-back)."""

import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timeit(fn, *args, iters=3):
    r = fn(*args)
    leaves = jax.tree_util.tree_leaves(r)
    float(sum(l.sum() for l in leaves if l.dtype != bool).block_until_ready())
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    s = float(sum(l.sum() for l in jax.tree_util.tree_leaves(r)
                  if l.dtype != bool))
    return (time.perf_counter() - t0) / iters, s


def main():
    from go_raytracing_tpu.camera import generate_rays
    from go_raytracing_tpu.core.vec3 import V3
    from go_raytracing_tpu.integrator import wavefront
    from go_raytracing_tpu.ops import pallas_mesh_stream as pms
    from go_raytracing_tpu.render.renderer import _id_to_pixel
    from go_raytracing_tpu.scenes import builders

    print("backend:", jax.default_backend())
    R = 1 << 21
    scene, cam = builders.cornell_box_lucy(mesh_detail=(256, 220))
    cam = dataclasses.replace(cam, image_width=600, aspect_ratio=1.0)
    proto = scene.meshes[0]

    ids = jnp.arange(R, dtype=jnp.uint32)
    px, py, _ = _id_to_pixel(ids % (600 * 600), 600, 600, True)
    o, d, tm = generate_rays(cam, px, py, ids, 0)
    big = jnp.full((R,), 3.0e38, jnp.float32)

    @jax.jit
    def wall_bound(o, d):
        (t_s, _, h_s), (t_p, _, h_p) = wavefront._surface_intersects(
            scene, o, d, jnp.zeros((R,), jnp.float32), 1e-3, big
        )
        sw = h_s & (~h_p | (t_s < t_p))
        return jnp.where(sw, t_s, jnp.where(h_p, t_p, big))

    t_max = jax.block_until_ready(wall_bound(o, d))

    @jax.jit
    def sortkey(o, d, t_max):
        _, key = wavefront._mesh_sort_key(proto, o, d, 1e-3, t_max)
        order = jnp.argsort(key)
        return (V3(o.x[order], o.y[order], o.z[order]),
                V3(d.x[order], d.y[order], d.z[order]), t_max[order])

    o2, d2, t2 = jax.block_until_ready(sortkey(o, d, t_max))

    @jax.jit
    def cull(o, d, t_max):
        return pms.build_block_lists(
            proto.inst_w2l, proto.root_bbox_min, proto.root_bbox_max,
            proto.s_tilebox, o, d, t_max, 1e-3,
        )

    dt, s = timeit(cull, o2, d2, t2)
    print(f"build_block_lists (XLA): {dt*1e3:8.2f} ms [{s:.3e}]")

    def kern(o, d, t_max):
        return pms._call(
            proto.inst_w2l, proto.root_bbox_min, proto.root_bbox_max,
            proto.s_tilebox, proto.s_tri, o, d, t_max,
            t_min=1e-3, n_inst=proto.n_instances,
        )

    dt, s = timeit(kern, o2, d2, t2)
    print(f"_call (cull+kernel):     {dt*1e3:8.2f} ms "
          f"({R/dt/1e6:6.1f} Mrays/s) [{s:.3e}]")

    t, tri, inst, hit, ovf = kern(o2, d2, t2)
    print(f"hits={int(hit.sum())} overflow={int(ovf)}")

    dt, s = timeit(jax.jit(lambda o, d, t: wavefront._mesh_intersect(
        proto, o, d, 1e-3, t)[0]), o, d, t_max)
    print(f"_mesh_intersect total:   {dt*1e3:8.2f} ms "
          f"({R/dt/1e6:6.1f} Mrays/s)")


if __name__ == "__main__":
    main()
