"""TPU probe: sharded render_grad (1-chip Mesh('rays')) vs unsharded.

VERDICT r4 #1 done-criterion (a): the gradient megakernels proven under
shard_map on the real TPU mesh, within noise of the unsharded path.
Run: python scripts/mesh_grad_probe.py  (one TPU process at a time).
"""

import dataclasses
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np
import jax
import jax.numpy as jnp

import go_raytracing_tpu as grt
from go_raytracing_tpu.parallel import sharding
from go_raytracing_tpu.render.grad import render_grad


def run(scene_name, cfg, seed=0):
    scene, cam = grt.load_scene(scene_name)
    cam = dataclasses.replace(
        cam, image_width=cfg["width"], aspect_ratio=cfg["aspect"],
        samples_per_pixel=cfg["spp"], max_depth=cfg["depth"])
    spp = cam.samples_per_pixel
    target = np.asarray(grt.render(scene, cam, spp=spp, seed=7)) / spp

    @jax.jit
    def checksum(loss, grads):
        return loss + sum(jnp.sum(g) for g in grads.values())

    def timed(mesh):
        t0 = time.perf_counter()
        loss, grads = render_grad(scene, cam, target, spp=spp, seed=seed,
                                  mesh=mesh)
        s = float(checksum(loss, grads))
        return time.perf_counter() - t0, s

    mesh = sharding.make_mesh(1)
    for name, m in (("unsharded", None), ("mesh(1)", mesh)):
        timed(m)  # compile+warm
        walls = [timed(m) for _ in range(6)]
        s = walls[0][1]
        ws = sorted(w for w, _ in walls)
        n_rays = cam.image_width * cam.image_height * spp
        print(f"{scene_name:14s} {name:10s}: best {n_rays/ws[0]/1e6:7.2f} "
              f"median {n_rays/ws[len(ws)//2]/1e6:7.2f} Mrays/s "
              f"checksum {s:.6e}  walls {' '.join(f'{w:.3f}' for w in ws)}")


if __name__ == "__main__":
    run("cornell", dict(width=600, aspect=600 / 338, spp=100, depth=5))
    run("cornell-glossy", dict(width=600, aspect=1.0, spp=100, depth=5))
