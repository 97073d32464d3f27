"""CPU statistics for the stream mesh kernel's cull hierarchy.

Reports, for real CornellBoxLucy camera rays: tiles per block after the
XLA block-level cull (phase-A work + overflow frequency), instances per
block, and — by simulating the kernel's per-8-ray-group frustums in
NumPy — tiles per group (phase-B sweep count).  Run on CPU.

Usage: python scripts/stream_stats.py [--detail 256 220] [--rays 262144]
"""

import argparse
import dataclasses
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--detail", type=int, nargs=2, default=[256, 220])
    ap.add_argument("--rays", type=int, default=1 << 18)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from go_raytracing_tpu.camera import generate_rays
    from go_raytracing_tpu.core.vec3 import V3
    from go_raytracing_tpu.integrator import wavefront
    from go_raytracing_tpu.ops import pallas_mesh_stream as pms
    from go_raytracing_tpu.render.renderer import _id_to_pixel
    from go_raytracing_tpu.scenes import builders

    scene, cam = builders.cornell_box_lucy(mesh_detail=tuple(args.detail))
    cam = dataclasses.replace(
        cam, image_width=600, aspect_ratio=1.0, samples_per_pixel=25,
        max_depth=5,
    )
    proto = scene.meshes[0]
    print(f"tris={int(proto.tri_v0.shape[0])} instances={proto.n_instances} "
          f"segs={proto.s_n_seg} tiles={proto.s_tri.shape[0]}")

    R = args.rays
    ids = jnp.arange(R, dtype=jnp.uint32)
    px, py, _ = _id_to_pixel(ids % (600 * 600), 600, 600, True)
    o, d, tm = generate_rays(cam, px, py, ids, 0)
    big = jnp.full((R,), 3.0e38, jnp.float32)
    (t_s, _, h_s), (t_p, _, h_p) = wavefront._surface_intersects(
        scene, o, d, jnp.zeros((R,), jnp.float32), 1e-3, big
    )
    sw = h_s & (~h_p | (t_s < t_p))
    t_max = jnp.where(sw, t_s, jnp.where(h_p, t_p, big))

    # coherence sort, as _mesh_intersect does
    _, key = wavefront._mesh_sort_key(proto, o, d, 1e-3, t_max)
    order = jnp.argsort(key)
    o = V3(o.x[order], o.y[order], o.z[order])
    d = V3(d.x[order], d.y[order], d.z[order])
    t_max = t_max[order]

    t_cap = jnp.where(t_max >= pms.BIG, pms.BIG, t_max)
    segs, tilemask, nseg, instmask = pms.build_block_lists(
        proto.inst_w2l, proto.root_bbox_min, proto.root_bbox_max,
        proto.s_tilebox, o, d, t_cap, 1e-3,
    )
    tilemask = np.asarray(tilemask)
    nseg = np.asarray(nseg)
    instmask = np.asarray(instmask)
    nb = tilemask.shape[0]
    pc = np.vectorize(lambda x: bin(int(x) & 0xFFFFFFFF).count("1"))
    tiles_blk = pc(tilemask).sum(axis=1)
    ninst_blk = pc(instmask)
    print(f"blocks={nb}")
    for name, v in [("tiles/block", tiles_blk), ("insts/block", ninst_blk),
                    ("segs/block", nseg)]:
        print(f"  {name}: mean={v.mean():8.1f} p50={np.percentile(v,50):6.0f} "
              f"p90={np.percentile(v,90):6.0f} p99={np.percentile(v,99):6.0f} "
              f"max={v.max():6.0f}")
    tiles_bi = pc(tilemask.reshape(nb, -1, proto.n_instances)).sum(axis=1)
    drop = np.maximum(tiles_bi - pms.MAXT_INST, 0)
    print(f"  per-(block,inst) tiles: p99={np.percentile(tiles_bi, 99):.0f} "
          f"max={tiles_bi.max()}  cap={pms.MAXT_INST}  "
          f"DROPPED pairs={drop.sum()}")

    # --- simulate per-group frustums: tiles per group (phase-B sweeps)
    w2l = np.asarray(proto.inst_w2l)          # [I, 3, 4]
    rlo = np.asarray(proto.root_bbox_min)
    rhi = np.asarray(proto.root_bbox_max)
    tilebox = np.asarray(proto.s_tilebox)     # [S, 6, SEG_TILES]
    S = tilebox.shape[0]
    tb_lo = tilebox[:, 0:3, :].transpose(0, 2, 1).reshape(S * pms.SEG_TILES, 3)
    tb_hi = tilebox[:, 3:6, :].transpose(0, 2, 1).reshape(S * pms.SEG_TILES, 3)

    ox = np.asarray(o.x); oy = np.asarray(o.y); oz = np.asarray(o.z)
    dx = np.asarray(d.x); dy = np.asarray(d.y); dz = np.asarray(d.z)
    tc = np.asarray(t_cap)
    I = w2l.shape[0]
    G = R // pms.GROUP
    sweeps_per_group = []
    pair_tests = 0
    # sample up to 4096 groups for speed
    gsel = np.random.default_rng(0).choice(G, size=min(G, 4096), replace=False)
    for g in gsel:
        sl = slice(g * pms.GROUP, (g + 1) * pms.GROUP)
        ow = np.stack([ox[sl], oy[sl], oz[sl]], axis=1)   # [8,3]
        dw = np.stack([dx[sl], dy[sl], dz[sl]], axis=1)
        cap = tc[sl]
        live = cap > 0
        n_tiles_g = 0
        for ii in range(I):
            ol = ow @ w2l[ii, :, :3].T + w2l[ii, :, 3]
            dl = dw @ w2l[ii, :, :3].T
            inv = 1.0 / np.where(np.abs(dl) < 1e-12,
                                 np.where(dl < 0, -1e-12, 1e-12), dl)
            ta = (rlo - ol) * inv
            tb = (rhi - ol) * inv
            t_en = np.maximum(np.minimum(ta, tb).max(axis=1), 1e-3)
            t_ex = np.minimum(np.maximum(ta, tb).min(axis=1),
                              np.minimum(cap, 3e38))
            contrib = live & (t_ex >= t_en)
            if not contrib.any():
                continue
            olc = ol[contrib]; dlc = dl[contrib]
            o_lo = olc.min(0); o_hi = olc.max(0)
            d_lo = dlc.min(0); d_hi = dlc.max(0)
            bd = (d_lo > 1e-12) | (d_hi < -1e-12)
            sa = 1.0 / np.where(bd, d_lo, 1.0)
            sb = 1.0 / np.where(bd, d_hi, 1.0)
            g0 = np.minimum(sa, sb); g1 = np.maximum(sa, sb)
            near = t_en[contrib].min(); far = t_ex[contrib].max()
            r_lo = tb_lo - o_hi
            r_hi = tb_hi - o_lo
            p = np.stack([r_lo * g0, r_lo * g1, r_hi * g0, r_hi * g1])
            t_lo = np.where(bd, p.min(axis=0), -3e38).max(axis=1)
            t_hi = np.where(bd, p.max(axis=0), 3e38).min(axis=1)
            t_lo = np.maximum(t_lo, near)
            t_hi = np.minimum(t_hi, far)
            n_tiles_g += int((t_hi >= t_lo).sum())
        sweeps_per_group.append(n_tiles_g)
        pair_tests += n_tiles_g * pms.TILE * pms.GROUP
    spg = np.array(sweeps_per_group)
    print(f"  tiles/group (phase-B sweeps): mean={spg.mean():7.2f} "
          f"p50={np.percentile(spg,50):5.0f} p90={np.percentile(spg,90):5.0f} "
          f"p99={np.percentile(spg,99):5.0f} max={spg.max()}")
    # per block: sum over its 128 groups
    per_block_sweeps = spg.mean() * pms.N_GROUPS
    print(f"  est sweeps/block={per_block_sweeps:.0f}  "
          f"pair-tests/ray={pair_tests / (len(gsel) * pms.GROUP):.0f}")


if __name__ == "__main__":
    main()
