"""Attribute the replay-backward (replay_g) cost to its differentiable
branches by stop_gradient surgery: NEE direct light, path attenuation,
emission, and the miss shader each get a variant where that branch's
gradient is severed (forward identical, backward branch dead — XLA DCEs
its reverse ops).  The deltas say where a hand-written backward would
pay.

Run on TPU: python scripts/grad_split.py [--chunk N]
"""

import argparse
import dataclasses
import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp


def best_of(fn, n=3, warm=1):
    for _ in range(warm):
        fn()
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunk", type=int, default=1 << 21)
    args = ap.parse_args()

    import go_raytracing_tpu as grt
    from go_raytracing_tpu.render import renderer as rmod
    from go_raytracing_tpu.integrator import wavefront
    from go_raytracing_tpu.camera import generate_rays
    from go_raytracing_tpu.core.vec3 import V3
    from go_raytracing_tpu.materials import tables as mats
    from go_raytracing_tpu.parallel.sharding import apply_params, trainable_params

    scene, cam = grt.load_scene("cornell")
    cam = dataclasses.replace(
        cam, image_width=600, aspect_ratio=600 / 338,
        samples_per_pixel=100, max_depth=5,
    )
    chunk = args.chunk
    w, h = cam.image_width, cam.image_height
    tiled = rmod.scene_tiled(scene)
    _, _, n_virt = rmod.ray_layout(w, h, tiled)
    ids = jnp.arange(chunk, dtype=jnp.uint32)
    px, py, _ = rmod._id_to_pixel(ids % n_virt, w, h, tiled)
    o, d, tm = generate_rays(cam, px, py, ids, 0)
    cot = jax.random.uniform(jax.random.PRNGKey(0), (chunk, 3)) * 1e-6

    @jax.jit
    def record_only(o, d, tm, stream):
        _, dec = wavefront.trace(scene, cam, o, d, tm, stream, 0,
                                 differentiable=False, record=True)
        return dec

    dec = jax.block_until_ready(record_only(o, d, tm, ids))

    sg = jax.lax.stop_gradient
    variants = {}

    def timed_grad(name, fn_make):
        """fn_make() patches modules; returns an undo callable."""
        undo = fn_make()
        try:
            def replay_grad(o, d, tm, stream, dec, cot):
                def inner(params):
                    s = apply_params(scene, params)
                    rad = wavefront.trace(s, cam, o, d, tm, stream, 0,
                                          differentiable=True, decisions=dec)
                    return jnp.sum(rad.rows() * cot)
                return jax.grad(inner)(trainable_params(scene))

            jf = jax.jit(replay_grad)

            def run():
                g = jf(o, d, tm, ids, dec, cot)
                return sum(float(np.asarray(x).sum())
                           for x in jax.tree_util.tree_leaves(g))

            dt = best_of(run)
            variants[name] = dt
            print(f"{name:18s}: {dt*1e3:8.1f} ms  "
                  f"{chunk/dt/1e6:7.2f} Mrays/s", flush=True)
        finally:
            undo()

    timed_grad("full", lambda: (lambda: None))

    def no_nee():
        real_a = wavefront.sample_area_light

        def stub(*a, **k):
            r = real_a(*a, **k)
            return V3(sg(r[0].x), sg(r[0].y), sg(r[0].z)), r[1], r[2]

        wavefront.sample_area_light = stub
        return lambda: setattr(wavefront, "sample_area_light", real_a)

    timed_grad("nee-severed", no_nee)

    def no_scatter_grad():
        real = mats.scatter

        def stub(*a, **k):
            r = real(*a, **k)
            return r._replace(
                attenuation=V3(sg(r.attenuation.x), sg(r.attenuation.y),
                               sg(r.attenuation.z)),
                emitted=V3(sg(r.emitted.x), sg(r.emitted.y),
                           sg(r.emitted.z)),
                direction=V3(sg(r.direction.x), sg(r.direction.y),
                             sg(r.direction.z)),
            )

        mats.scatter = stub
        return lambda: setattr(mats, "scatter", real)

    timed_grad("scatter-severed", no_scatter_grad)

    def no_record():
        real = wavefront.extract_record

        def stub(*a, **k):
            r = real(*a, **k)
            p, normal, front, uu, vv, mat_id = r
            return (V3(sg(p.x), sg(p.y), sg(p.z)),
                    V3(sg(normal.x), sg(normal.y), sg(normal.z)),
                    front, sg(uu), sg(vv), mat_id)

        wavefront.extract_record = stub
        return lambda: setattr(wavefront, "extract_record", real)

    timed_grad("record-severed", no_record)

    base = variants.get("full")
    for k, v in variants.items():
        if k != "full":
            print(f"  {k} saves {1e3*(base-v):7.1f} ms")


if __name__ == "__main__":
    main()
