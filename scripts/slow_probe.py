"""Stage timings for the slow bench scenes (simple / random / hdri-test).

Splits one bench-sized workload into: ray gen, megakernel trace, deferred
miss shader, full trace(), full render() — to locate where the wall time
goes before optimizing.  Run on TPU: python scripts/slow_probe.py [scene...]
"""

import dataclasses
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

import bench as benchmod  # noqa: E402
import go_raytracing_tpu as grt  # noqa: E402
from go_raytracing_tpu.camera import generate_rays  # noqa: E402
from go_raytracing_tpu.core.vec3 import V3  # noqa: E402
from go_raytracing_tpu.integrator import wavefront  # noqa: E402
from go_raytracing_tpu.ops import pallas_wavefront as mega  # noqa: E402
from go_raytracing_tpu.render.renderer import pick_chunk_size  # noqa: E402


def timeit(fn, *a, warm=2, iters=5):
    for _ in range(warm):
        jax.block_until_ready(fn(*a))
    t0 = time.perf_counter()
    for _ in range(iters):
        jax.block_until_ready(fn(*a))
    return (time.perf_counter() - t0) / iters


def probe(name):
    cfg = benchmod.ALL_CONFIGS[name]
    scene, cam = grt.load_scene(cfg.get("scene", name),
                                **cfg.get("scene_kwargs", {}))
    cam = dataclasses.replace(
        cam, image_width=cfg["width"], aspect_ratio=cfg["aspect"],
        samples_per_pixel=cfg["spp"], max_depth=cfg["depth"])
    spp = cam.samples_per_pixel
    w, h = cam.image_width, cam.image_height
    total = w * h * spp
    chunk = min(pick_chunk_size(scene), total)
    chunk = max(1024, (chunk // 1024) * 1024)
    r = chunk
    print(f"--- {name}: {w}x{h}x{spp}spp depth={cam.max_depth} "
          f"total={total/1e6:.2f}M rays, chunk={r/1e6:.2f}M")

    ids = jnp.arange(r, dtype=jnp.uint32)
    px = (ids % w).astype(jnp.int32)
    py = ((ids // w) % h).astype(jnp.int32)

    gen = jax.jit(lambda s: generate_rays(cam, px, py, ids, s))
    dt = timeit(gen, 0)
    print(f"  generate_rays    : {dt*1e3:8.2f} ms ({r/dt/1e6:7.1f} Mrays/s)")
    o, d, tm = jax.block_until_ready(gen(0))

    mode = wavefront.choose_mega_mode(scene, cam, r, False)
    print(f"  mega_mode={mode}")
    if mode != "off":
        mk = jax.jit(lambda o, d, tm: mega.trace_megakernel(
            scene, cam, o, d, tm, ids, 0, split=(mode == "split")))
        dt = timeit(mk, o, d, tm)
        print(f"  megakernel       : {dt*1e3:8.2f} ms ({r/dt/1e6:7.1f} Mrays/s)")
        radiance, miss_dir, miss_tp, missed, miss_primary = \
            jax.block_until_ready(mk(o, d, tm))
        n_miss = int(missed.sum())
        n_prim = int((missed & miss_primary).sum())
        print(f"  missed lanes     : {n_miss} ({100*n_miss/r:.1f}%), "
              f"primary {n_prim} ({100*n_prim/r:.1f}%)")

        ms = jax.jit(lambda dir, prim: wavefront._miss_radiance(
            scene, cam, dir, prim).rows())
        safe = V3.select(missed, miss_dir, V3.full((r,), (0, 0, 1.0)))
        dt = timeit(ms, safe, miss_primary)
        print(f"  miss shader      : {dt*1e3:8.2f} ms")

    tr = jax.jit(lambda o, d, tm: wavefront.trace(
        scene, cam, o, d, tm, ids, 0, differentiable=False,
        mega_mode=mode).rows())
    dt = timeit(tr, o, d, tm)
    print(f"  trace() full     : {dt*1e3:8.2f} ms ({r/dt/1e6:7.1f} Mrays/s)")

    rnd = lambda: jax.block_until_ready(
        grt.render(scene, cam, spp=spp, seed=0, chunk=chunk))
    rnd()
    t0 = time.perf_counter()
    rnd()
    dt = time.perf_counter() - t0
    print(f"  render() e2e     : {dt*1e3:8.2f} ms ({total/dt/1e6:7.1f} Mrays/s)"
          f"  [{-(-total//chunk)} chunks]")


if __name__ == "__main__":
    names = sys.argv[1:] or ["simple", "random", "hdri-test"]
    for n in names:
        probe(n)
