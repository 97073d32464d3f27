"""Profile where CornellBoxLucy render time goes on TPU.

Times, separately: coherence-key argsort, the mesh sweep kernel on
coherent vs shuffled rays, the closest-hit (sphere+planar) kernels, and a
full render chunk — to locate the bottleneck before redesigning the
large-mesh path.

Usage: python scripts/probe_lucy.py [--detail 48 40] [--rays 2097152]
"""

import argparse
import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, warmup=1, iters=3):
    for _ in range(warmup):
        r = fn(*args)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    # force materialization through the tunnel
    import jax

    leaves = jax.tree_util.tree_leaves(r)
    s = sum(float(l.sum()) for l in leaves if hasattr(l, "sum"))
    dt = (time.perf_counter() - t0) / iters
    return dt, s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--detail", type=int, nargs=2, default=[48, 40])
    ap.add_argument("--rays", type=int, default=1 << 21)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    import go_raytracing_tpu as grt
    from go_raytracing_tpu.camera import generate_rays
    from go_raytracing_tpu.core.vec3 import V3
    from go_raytracing_tpu.integrator import wavefront
    from go_raytracing_tpu.scenes import builders

    print("backend:", jax.default_backend())
    scene, cam = builders.cornell_box_lucy(mesh_detail=tuple(args.detail))
    cam = dataclasses.replace(
        cam, image_width=600, aspect_ratio=1.0, samples_per_pixel=25,
        max_depth=5,
    )
    proto = scene.meshes[0]
    n_tris = int(proto.tri_v0.shape[0])
    print(f"tris={n_tris} instances={proto.n_instances} "
          f"k_n_coarse={proto.k_n_coarse}")

    R = args.rays
    # Camera rays in tiled (coherent) order, like the renderer launches them
    ids = jnp.arange(R, dtype=jnp.uint32)
    from go_raytracing_tpu.render.renderer import _id_to_pixel

    px, py, _ = _id_to_pixel(ids % (600 * 600), 600, 600, True)
    o, d, tm = generate_rays(cam, px, py, ids, 0)
    o = jax.block_until_ready(o)

    t_min = 1e-3
    # Bound t_max by the walls first, exactly as closest_hit does before
    # the mesh query — an unbounded t_max is not what the kernel sees.
    @jax.jit
    def wall_bound(o, d):
        big = jnp.full((R,), 3.0e38, jnp.float32)
        (t_s, _, h_s), (t_p, _, h_p) = wavefront._surface_intersects(
            scene, o, d, jnp.zeros((R,), jnp.float32), t_min, big
        )
        sw = h_s & (~h_p | (t_s < t_p))
        return jnp.where(sw, t_s, jnp.where(h_p, t_p, big))

    t_max = jax.block_until_ready(wall_bound(o, d))

    # 1. argsort of the coherence key
    @jax.jit
    def key_sort(o, d, t_max):
        _, key = wavefront._mesh_sort_key(proto, o, d, 1e-3, t_max)
        return jnp.argsort(key)

    dt, _ = timeit(key_sort, o, d, t_max)
    print(f"argsort(coherence key) {R} rays: {dt*1e3:8.2f} ms")

    # 2. mesh sweep, coherent rays (includes sort path inside)
    @jax.jit
    def sweep(o, d, t_max):
        t, tri, inst, hit, _ = wavefront._mesh_intersect(
            proto, o, d, t_min, t_max
        )
        return t, hit

    dt, s = timeit(sweep, o, d, t_max)
    print(f"mesh sweep coherent:    {dt*1e3:8.2f} ms "
          f"({R/dt/1e6:7.1f} Mrays/s) checksum={s:.3e}")

    # 3. mesh sweep, shuffled rays (bounce-like incoherence)
    perm = jax.random.permutation(jax.random.PRNGKey(0), R)
    osh = V3(o.x[perm], o.y[perm], o.z[perm])
    dsh = V3(d.x[perm], d.y[perm], d.z[perm])
    tsh = t_max[perm]
    dt, s = timeit(sweep, osh, dsh, tsh)
    print(f"mesh sweep shuffled:    {dt*1e3:8.2f} ms "
          f"({R/dt/1e6:7.1f} Mrays/s) checksum={s:.3e}")

    # 4. mesh sweep with half lanes dead (like late bounces)
    t_half = jnp.where(ids % 2 == 0, t_max, -1.0)
    dt, s = timeit(sweep, o, d, t_half)
    print(f"mesh sweep half-dead:   {dt*1e3:8.2f} ms checksum={s:.3e}")

    # 4b. mesh any-hit (NEE shadow variant; exercised before full trace
    # so a fault here is attributable)
    from go_raytracing_tpu.ops import pallas_mesh_stream

    if pallas_mesh_stream.stream_ok(proto):
        @jax.jit
        def shadow(o, d, t_max):
            _, _, _, hit, _ = pallas_mesh_stream.intersect_mesh_stream(
                proto, o, d, t_min, t_max, any_hit=True
            )
            return hit

        dt, s = timeit(shadow, o, d, t_max)
        print(f"mesh any-hit (shadow):  {dt*1e3:8.2f} ms checksum={s:.3e}")

    # 5. sphere+planar closest hit (the non-mesh part of closest_hit)
    @jax.jit
    def surf(o, d, t_max):
        (t_s, i_s, h_s), (t_p, i_p, h_p) = wavefront._surface_intersects(
            scene, o, d, jnp.zeros((R,), jnp.float32), t_min, t_max
        )
        return t_s, t_p

    dt, s = timeit(surf, o, d, t_max)
    print(f"sphere+planar closest:  {dt*1e3:8.2f} ms checksum={s:.3e}")

    # 6. full trace chunk (everything: 5 bounces + NEE shadows)
    @jax.jit
    def full(o, d, tm, ids):
        return wavefront.trace(
            scene, cam, o, d, tm, ids, 0, differentiable=False
        ).rows()

    dt, s = timeit(full, o, d, tm, ids, warmup=1, iters=2)
    print(f"full trace (d5+NEE):    {dt*1e3:8.2f} ms "
          f"({R/dt/1e6:7.1f} camera-Mrays/s) checksum={s:.3e}")


if __name__ == "__main__":
    main()
