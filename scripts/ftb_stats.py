"""Design stats for front-to-back (FTB) ordered phase-B traversal.

Simulates, in NumPy on bounce-1-like cornell-lucy rays (the expensive
incoherent case), what the stream kernel's phase B would sweep:

  baseline   exact per-group slot sets (what v6 sweeps today)
  ftb-exact  slots sorted by group-min entry t, sweep until every live
             member's true hit t <= the next slot's group-min entry
  ftb-K      K quantized depth buckets over the group's root-box
             interval (implementable with K bit-planes in the kernel):
             sweep bucket 0..k, stop when all live members' hit t is
             below bucket k+1's lower bound

plus the per-ray-exact lower bound (slots actually crossed per ray).
True hit t comes from the frontier oracle.  Decides whether FTB phase B
is worth the kernel surgery and what K buys.

Run (CPU): python scripts/ftb_stats.py [--rays 262144] [--groups 2048]
"""

import argparse
import dataclasses
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=1 << 18)
    ap.add_argument("--groups", type=int, default=2048)
    ap.add_argument("--detail", type=int, nargs=2, default=[256, 220])
    ap.add_argument("--buckets", type=int, default=4)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from go_raytracing_tpu.camera import generate_rays
    from go_raytracing_tpu.core import rng as rngmod
    from go_raytracing_tpu.core.vec3 import V3
    from go_raytracing_tpu.geometry import mesh_bvh
    from go_raytracing_tpu.integrator import wavefront
    from go_raytracing_tpu.ops import pallas_mesh_stream as pms
    from go_raytracing_tpu.render.renderer import _id_to_pixel
    from go_raytracing_tpu.scenes import builders

    BIG = np.float32(3.0e38)
    r = args.rays
    scene, cam = builders.cornell_box_lucy(mesh_detail=tuple(args.detail))
    cam = dataclasses.replace(cam, image_width=600, aspect_ratio=1.0,
                              samples_per_pixel=25, max_depth=5)
    proto = scene.meshes[0]
    print(f"tris={int(proto.tri_v0.shape[0])} inst={proto.n_instances}")

    ids = jnp.arange(r, dtype=jnp.uint32)
    px, py, _ = _id_to_pixel(ids % (600 * 600), 600, 600, True)
    o, d, tm = generate_rays(cam, px, py, ids, 0)
    tmax = jnp.full((r,), BIG)

    # bounce-1-like rays: closest hit, diffuse respawn (mirrors
    # stream_phase_probe)
    t, which, idx, aux, _ = wavefront.closest_hit(
        scene, o, d, tm, 1e-3, tmax, 0, ids, jnp.uint32(0))
    hit = which > 0
    t_rec = jnp.where(hit, t, 1.0)
    p, normal, *_ = wavefront.extract_record(
        scene, o, d, tm, t_rec, which, idx, aux)
    u1 = rngmod.uniform(0, ids, jnp.uint32(0), rngmod.SCATTER_U)
    u2 = rngmod.uniform(0, ids, jnp.uint32(0), rngmod.SCATTER_V)
    z = 1.0 - 2.0 * u1
    rr = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    ph = 2.0 * np.pi * u2
    nd = normal + V3(rr * jnp.cos(ph), rr * jnp.sin(ph), z)
    d1 = nd * jax.lax.rsqrt(jnp.maximum(nd.dot(nd), 1e-12))
    cap1 = jnp.where(hit, BIG, -1.0)

    reach, key = wavefront._mesh_sort_key(proto, p, d1, 1e-3, cap1)
    cap1 = jnp.where(reach, cap1, -1.0)
    order = np.asarray(jnp.argsort(key))
    ow = np.stack([np.asarray(p.x), np.asarray(p.y), np.asarray(p.z)],
                  axis=1)[order]
    dw = np.stack([np.asarray(d1.x), np.asarray(d1.y), np.asarray(d1.z)],
                  axis=1)[order]
    cap = np.asarray(cap1)[order]

    # true winner t via the frontier oracle, for sampled groups only
    G = r // pms.GROUP
    rng = np.random.default_rng(0)
    live_groups = np.nonzero(
        cap.reshape(G, pms.GROUP).max(axis=1) > 0)[0]
    gsel = rng.choice(live_groups, size=min(len(live_groups), args.groups),
                      replace=False)
    sel = (gsel[:, None] * pms.GROUP + np.arange(pms.GROUP)).reshape(-1)
    t_true, _, _, hit_true, _ = mesh_bvh.intersect_mesh(
        proto, jnp.asarray(ow[sel], jnp.float32),
        jnp.asarray(dw[sel], jnp.float32), 1e-3,
        jnp.asarray(cap[sel], jnp.float32))
    t_true = np.asarray(t_true).reshape(-1, pms.GROUP)
    hit_true = np.asarray(hit_true).reshape(-1, pms.GROUP)

    w2l = np.asarray(proto.inst_w2l)
    rlo = np.asarray(proto.root_bbox_min)
    rhi = np.asarray(proto.root_bbox_max)
    tilebox = np.asarray(proto.s_tilebox)
    S = tilebox.shape[0]
    nslot = S * pms.SEG_TILES
    tb_lo = tilebox[:, 0:3, :].transpose(0, 2, 1).reshape(nslot, 3)
    tb_hi = tilebox[:, 3:6, :].transpose(0, 2, 1).reshape(nslot, 3)
    I = w2l.shape[0]
    K = args.buckets

    base = ftb = ftbk = ideal = 0
    n_done = 0
    for gi, g in enumerate(gsel):
        sl = slice(g * pms.GROUP, (g + 1) * pms.GROUP)
        og, dg, cg = ow[sl], dw[sl], cap[sl]
        live = cg > 0
        tt = np.where(hit_true[gi], t_true[gi], np.where(live, cg, -1.0))
        for ii in range(I):
            ol = og @ w2l[ii, :, :3].T + w2l[ii, :, 3]
            dl = dg @ w2l[ii, :, :3].T
            inv = 1.0 / np.where(np.abs(dl) < 1e-12,
                                 np.where(dl < 0, -1e-12, 1e-12), dl)
            ta = (rlo - ol) * inv
            tb = (rhi - ol) * inv
            en = np.maximum(np.minimum(ta, tb).max(axis=1), 1e-3)
            ex = np.minimum(np.maximum(ta, tb).min(axis=1),
                            np.where(live, cg, -1.0))
            memb = ex >= en
            if not memb.any():
                continue
            # per (member, slot) slab
            t0 = (tb_lo[None] - ol[:, None]) * inv[:, None]
            t1 = (tb_hi[None] - ol[:, None]) * inv[:, None]
            near = np.maximum(np.minimum(t0, t1).max(axis=2), 1e-3)
            far = np.minimum(np.maximum(t0, t1).min(axis=2),
                             np.where(live, cg, -1.0)[:, None])
            shit = (far >= near) & memb[:, None]          # [8, nslot]
            gmask = shit.any(axis=0)
            slots = np.nonzero(gmask)[0]
            ns = len(slots)
            if ns == 0:
                continue
            base += ns
            # per-ray-exact lower bound: mean slots per live member
            ideal += shit.sum() / max(memb.sum(), 1)

            # member's termination t within THIS instance: its true hit
            # (could be another instance's surface; conservative bound)
            term = np.where(memb, np.where(tt > 0, tt, 0.0), 0.0)
            g_near = np.where(shit, near, np.inf).min(axis=0)[slots]
            oo = np.argsort(g_near)
            so = slots[oo]
            gn = g_near[oo]
            # ftb-exact: prefix until all live members' term < next near
            need_t = term[memb].max()
            cut = np.searchsorted(gn, need_t, side="right")
            ftb += min(max(cut, 1), ns)

            # ftb-K buckets over [min en, max ex] of the group
            lo_b = en[memb].min()
            hi_b = ex[memb].max()
            width = max(hi_b - lo_b, 1e-6)
            bk = np.clip(((gn - lo_b) / width * K).astype(int), 0, K - 1)
            # stop after bucket k when need_t < lower bound of bucket k+1
            kcut = min(int(np.clip((need_t - lo_b) / width * K, 0, K - 1)),
                       K - 1)
            ftbk += int((bk <= kcut).sum())
        n_done += 1

    print(f"groups sampled: {n_done}")
    print(f"sweeps/group  baseline : {base / n_done:8.2f}")
    print(f"sweeps/group  ftb-exact: {ftb / n_done:8.2f}  "
          f"({base / max(ftb, 1):.2f}x)")
    print(f"sweeps/group  ftb-{K}buck : {ftbk / n_done:8.2f}  "
          f"({base / max(ftbk, 1):.2f}x)")
    print(f"slots/ray     exact    : {ideal / n_done:8.2f}")


if __name__ == "__main__":
    main()
