"""Break down the fwd+bwd (replay gradient) cost per component on TPU.

Times, for ONE cornell chunk (the same chunk size render_grad uses):
  record   — fast forward with record=True (decisions out)
  replay_f — differentiable replay forward only (decisions in)
  replay_g — grad of the replay forward (decisions in)
  full     — the production _chunk_vjp (record + vjp, one program)
plus the pass-1 framebuffer render rate for context.

Usage: python scripts/grad_probe.py [--chunk N] [--platform cpu]
Env: GRT_SCAN_UNROLL=d / GRT_REMAT=1 probe scan-shape variants.
"""

import argparse
import dataclasses
import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp


def best_of(fn, *args, n=3, warm=1):
    for _ in range(warm):
        fn(*args)
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        fn(*args)
        best = min(best, time.perf_counter() - t0)
    return best


def materialize(tree):
    return sum(float(np.asarray(x).sum()) for x in jax.tree_util.tree_leaves(tree))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunk", type=int, default=0)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import go_raytracing_tpu as grt
    from go_raytracing_tpu.render import renderer as rmod
    from go_raytracing_tpu.render.grad import _chunk_vjp
    from go_raytracing_tpu.integrator import wavefront
    from go_raytracing_tpu.camera import generate_rays
    from go_raytracing_tpu.parallel.sharding import apply_params, trainable_params

    scene, cam = grt.load_scene("cornell")
    cam = dataclasses.replace(
        cam, image_width=600, aspect_ratio=600 / 338,
        samples_per_pixel=100, max_depth=5,
    )
    chunk = args.chunk or max(rmod.pick_chunk_size(scene) // 2, 1024)
    print(f"chunk={chunk}")
    w, h = cam.image_width, cam.image_height

    # one chunk of rays (ids 0..chunk), same mapping as _chunk_vjp
    tiled = rmod.scene_tiled(scene)
    _, _, n_virt = rmod.ray_layout(w, h, tiled)
    ids = jnp.arange(chunk, dtype=jnp.uint32)
    px, py, _ = rmod._id_to_pixel(ids % n_virt, w, h, tiled)
    o, d, tm = generate_rays(cam, px, py, ids, 0)
    key = jax.random.PRNGKey(0)
    cot = jax.random.uniform(key, (chunk, 3)) * 1e-6
    o, d, tm, cot = jax.device_put((o, d, tm, cot))

    @jax.jit
    def record_only(o, d, tm, stream):
        _, dec = wavefront.trace(scene, cam, o, d, tm, stream, 0,
                                 differentiable=False, record=True)
        return dec

    @jax.jit
    def replay_fwd(o, d, tm, stream, dec):
        rad = wavefront.trace(scene, cam, o, d, tm, stream, 0,
                              differentiable=True, decisions=dec)
        return rad.rows().sum()

    @jax.jit
    def replay_grad(o, d, tm, stream, dec, cot):
        def inner(params):
            s = apply_params(scene, params)
            rad = wavefront.trace(s, cam, o, d, tm, stream, 0,
                                  differentiable=True, decisions=dec)
            return jnp.sum(rad.rows() * cot)
        return jax.grad(inner)(trainable_params(scene))

    g_fb = jnp.zeros((w * h, 3)) + 1e-7

    import os

    only = os.environ.get("GRT_PROBE_ONLY", "").split(",")
    results = {}

    dec = jax.block_until_ready(record_only(o, d, tm, ids))
    if not only[0] or "record" in only:
        # device-side checksum: np.asarray of the full Decisions pulls
        # ~150 MB through the tunnel (~3.4 s) and times the transfer,
        # not the record pass
        @jax.jit
        def rec_sum(o, d, tm, stream):
            dd = record_only(o, d, tm, stream)
            return sum(x.astype(jnp.float32).sum()
                       for x in jax.tree_util.tree_leaves(dd))

        results["record"] = best_of(lambda: float(rec_sum(o, d, tm, ids)))
    if not only[0] or "replay_f" in only:
        results["replay_f"] = best_of(
            lambda: float(replay_fwd(o, d, tm, ids, dec)))
    if not only[0] or "replay_g" in only:
        results["replay_g"] = best_of(
            lambda: materialize(replay_grad(o, d, tm, ids, dec, cot)))
    if not only[0] or "full" in only:
        results["full_chunk_vjp"] = best_of(
            lambda: materialize(_chunk_vjp(scene, cam, g_fb, jnp.uint32(0), 0,
                                           spp=100, chunk=chunk, max_depth=5)))

    for k, v in results.items():
        print(f"{k:16s}: {v*1e3:8.1f} ms   {chunk / v / 1e6:7.2f} Mrays/s")


if __name__ == "__main__":
    main()
