"""Time each bounce-step piece for cornell-lucy at 2M rays on TPU:
closest_hit, extract_record, mats.scatter, sample_area_light.
All timings force materialization (tunnel's block_until_ready lies)."""

import dataclasses
import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

from go_raytracing_tpu.camera import generate_rays
from go_raytracing_tpu.core import vec
from go_raytracing_tpu.integrator import wavefront
from go_raytracing_tpu.materials import tables as mats
from go_raytracing_tpu.render.renderer import _id_to_pixel
from go_raytracing_tpu.scenes import builders

R = 1 << 21
scene, cam = builders.cornell_box_lucy(mesh_detail=(256, 220))
cam = dataclasses.replace(cam, image_width=600, aspect_ratio=1.0,
                          samples_per_pixel=25, max_depth=5)
ids = jnp.arange(R, dtype=jnp.uint32)
px, py, _ = _id_to_pixel(ids % (600 * 600), 600, 600, True)
o, d, tm = generate_rays(cam, px, py, ids, 0)
BIG = jnp.float32(3.0e38)
t_cap = jnp.full((R,), BIG)


def timeit(fn, *args, iters=3):
    def mat(r):
        # on-device f64 sums, then ONE scalar transfer: np.asarray here
        # would pull 8 MB per output through the tunnel (~6 s/iter).
        return float(sum(x.astype(jnp.float64).sum()
                         for x in jax.tree_util.tree_leaves(r)
                         if hasattr(x, "sum")))
    mat(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        mat(fn(*args))
    return (time.perf_counter() - t0) / iters


ch = jax.jit(lambda o, d, t_cap: wavefront.closest_hit(
    scene, o, d, tm, vec.EPS_HIT, t_cap, 0, ids, jnp.uint32(0)))
print(f"closest_hit      : {timeit(ch, o, d, t_cap)*1e3:8.1f} ms",
      flush=True)
t, which, idx, aux, ovf = ch(o, d, t_cap)
t_rec = jnp.where(which != wavefront.HIT_NONE, t, 1.0)

er = jax.jit(lambda o, d, t_rec, which, idx, aux: wavefront.extract_record(
    scene, o, d, tm, t_rec, which, idx, aux))
print(f"extract_record   : "
      f"{timeit(er, o, d, t_rec, which, idx, aux)*1e3:8.1f} ms", flush=True)
p, normal, front, uu, vv, mat_id = er(o, d, t_rec, which, idx, aux)

sc_f = jax.jit(lambda mat_id, d, normal, front, uu, vv, p: mats.scatter(
    scene.materials, scene.textures, mat_id, d, normal, front, uu, vv, p,
    0, ids, jnp.uint32(0), **scene.tex_flags))
print(f"mats.scatter     : "
      f"{timeit(sc_f, mat_id, d, normal, front, uu, vv, p)*1e3:8.1f} ms",
      flush=True)
sc = sc_f(mat_id, d, normal, front, uu, vv, p)

active = (which != wavefront.HIT_NONE) & sc.can_use_nee
sal = jax.jit(lambda p, normal, d, att, mat_id, active:
              wavefront.sample_area_light(
                  scene, cam, p, normal, d, att, mat_id, 0, ids,
                  jnp.uint32(0), active=active))
print(f"sample_area_light: "
      f"{timeit(sal, p, normal, d, sc.attenuation, mat_id, active)*1e3:8.1f}"
      f" ms", flush=True)
print("active frac:", float(active.mean()), flush=True)
