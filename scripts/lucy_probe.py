"""Decompose cornell-lucy trace() time: mesh sweep (coherent primaries vs
shuffled), coherence argsort + permute, sphere/planar sweeps, scatter.
Run on TPU: python scripts/lucy_probe.py [n_rays]"""

import dataclasses
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

import go_raytracing_tpu as grt  # noqa: E402
from go_raytracing_tpu.camera import generate_rays  # noqa: E402
from go_raytracing_tpu.core.vec3 import V3  # noqa: E402
from go_raytracing_tpu.integrator import wavefront  # noqa: E402


def timeit(fn, *a, warm=2, iters=5):
    for _ in range(warm):
        jax.block_until_ready(fn(*a))
    t0 = time.perf_counter()
    for _ in range(iters):
        jax.block_until_ready(fn(*a))
    return (time.perf_counter() - t0) / iters


def main():
    r = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 21
    scene, cam = grt.load_scene("cornell-lucy", mesh_detail=(256, 220))
    cam = dataclasses.replace(cam, image_width=600, aspect_ratio=1.0,
                              samples_per_pixel=25, max_depth=5)
    proto = scene.meshes[0]
    print(f"tris={proto.tri_v0.shape[0]}, instances={proto.inst_w2l.shape[0]}, "
          f"rays={r/1e6:.2f}M")

    ids = jnp.arange(r, dtype=jnp.uint32)
    px = (ids % cam.image_width).astype(jnp.int32)
    py = ((ids // cam.image_width) % cam.image_height).astype(jnp.int32)
    o, d, tm = jax.block_until_ready(
        jax.jit(lambda s: generate_rays(cam, px, py, ids, s))(0))
    t_min = jnp.float32(1e-3)
    t_max = jnp.full((r,), 1e30, jnp.float32)

    mi = jax.jit(lambda o, d, t_max: wavefront._mesh_intersect(
        proto, o, d, t_min, t_max)[0])
    dt = timeit(mi, o, d, t_max)
    print(f"  mesh sweep, primaries     : {dt*1e3:8.1f} ms "
          f"({r/dt/1e6:6.2f} Mrays/s)")

    # shuffled rays = worst-case incoherence (like deep-bounce scatter)
    perm = jax.random.permutation(jax.random.PRNGKey(0), r)
    o_sh = V3(o.x[perm], o.y[perm], o.z[perm])
    d_sh = V3(d.x[perm], d.y[perm], d.z[perm])
    dt = timeit(mi, o_sh, d_sh, t_max)
    print(f"  mesh sweep, shuffled      : {dt*1e3:8.1f} ms "
          f"({r/dt/1e6:6.2f} Mrays/s)")

    # random directions from scene interior (true secondary distribution)
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    dr = jax.random.normal(k1, (3, r))
    dn = dr / jnp.linalg.norm(dr, axis=0)
    o_in = V3(jax.random.uniform(k2, (r,)) * 400 + 100,
              jax.random.uniform(k1, (r,)) * 400 + 100,
              jax.random.uniform(k2, (r,)) * 400 + 100)
    d_in = V3(dn[0], dn[1], dn[2])
    dt = timeit(mi, o_in, d_in, t_max)
    print(f"  mesh sweep, random int    : {dt*1e3:8.1f} ms "
          f"({r/dt/1e6:6.2f} Mrays/s)")

    # half-dead lanes (bounce 2+: most rays terminated)
    t_half = jnp.where(ids % 2 == 0, t_max, -1.0)
    dt = timeit(mi, o_sh, d_sh, t_half)
    print(f"  mesh sweep, 50% dead shuf : {dt*1e3:8.1f} ms "
          f"({r/dt/1e6:6.2f} Mrays/s)")

    # argsort + permute alone
    def sort_only(o, d, t_max):
        order = jnp.argsort(wavefront._mesh_sort_key(proto, o, d, 1e-3, t_max)[1])
        inv = jnp.zeros((r,), jnp.int32).at[order].set(
            jnp.arange(r, dtype=jnp.int32))
        fwd = jnp.stack([o.x, o.y, o.z, d.x, d.y, d.z, t_max,
                         jnp.zeros_like(t_max)], axis=1)[order]
        return fwd, inv
    dt = timeit(jax.jit(sort_only), o_sh, d_sh, t_max)
    print(f"  argsort+permute alone     : {dt*1e3:8.1f} ms")

    # surface (sphere+planar) sweeps
    si = jax.jit(lambda o, d: wavefront._surface_intersects(
        scene, o, d, tm, t_min, t_max))
    dt = timeit(si, o, d)
    print(f"  sphere+planar sweeps      : {dt*1e3:8.1f} ms")

    # full closest_hit
    ch = jax.jit(lambda o, d: wavefront.closest_hit(
        scene, o, d, tm, t_min, t_max, 0, ids, jnp.uint32(0))[0])
    dt = timeit(ch, o, d)
    print(f"  closest_hit full          : {dt*1e3:8.1f} ms")

    # occluded (shadow sweep)
    oc = jax.jit(lambda o, d: wavefront.occluded(
        scene, o, d, tm, t_min, t_max, 0, ids, jnp.uint32(0),
        wavefront.PURPOSE_VOL_SHADOW_AREA)[0])
    dt = timeit(oc, o, d)
    print(f"  occluded full             : {dt*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
