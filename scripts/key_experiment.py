"""Sort-key shootout for the stream mesh kernel's 8-ray groups.

Computes sweeps/group (phase-B cost driver) on bounce-1-like cornell-lucy
rays under alternative coherence keys, against the per-ray-exact lower
bound.  Decides whether re-keying buys phase-B time before any kernel
surgery.

Run (CPU): python scripts/key_experiment.py [--rays 131072]
"""

import argparse
import dataclasses
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def interleave3(a, b, c, bits):
    """Morton interleave three integer arrays of `bits` bits each."""
    out = np.zeros_like(a, dtype=np.int64)
    for i in range(bits):
        out |= (((a >> i) & 1) << (3 * i + 2)) | \
               (((b >> i) & 1) << (3 * i + 1)) | \
               (((c >> i) & 1) << (3 * i))
    return out


def interleave6(c3, d3, bits):
    """Interleave two pre-mortonized codes bit by bit (cell, dir)."""
    out = np.zeros_like(c3, dtype=np.int64)
    for i in range(3 * bits):
        out |= (((c3 >> i) & 1) << (2 * i + 1)) | (((d3 >> i) & 1) << (2 * i))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=1 << 17)
    ap.add_argument("--groups", type=int, default=1536)
    ap.add_argument("--detail", type=int, nargs=2, default=[256, 220])
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from go_raytracing_tpu.camera import generate_rays
    from go_raytracing_tpu.core import rng as rngmod
    from go_raytracing_tpu.core.vec3 import V3
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

    ids = jnp.arange(r, dtype=jnp.uint32)
    px, py, _ = _id_to_pixel(ids % (600 * 600), 600, 600, True)
    o, d, tm = generate_rays(cam, px, py, ids, 0)
    tmax = jnp.full((r,), BIG)
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
    cap1 = np.asarray(jnp.where(hit, BIG, -1.0))

    ow = np.stack([np.asarray(p.x), np.asarray(p.y), np.asarray(p.z)], 1)
    dw = np.stack([np.asarray(d1.x), np.asarray(d1.y), np.asarray(d1.z)], 1)

    w2l = np.asarray(proto.inst_w2l)
    rlo = np.asarray(proto.root_bbox_min)
    rhi = np.asarray(proto.root_bbox_max)
    tilebox = np.asarray(proto.s_tilebox)
    S = tilebox.shape[0]
    nslot = S * pms.SEG_TILES
    tb_lo = tilebox[:, 0:3, :].transpose(0, 2, 1).reshape(nslot, 3)
    tb_hi = tilebox[:, 3:6, :].transpose(0, 2, 1).reshape(nslot, 3)
    I = w2l.shape[0]
    ext = np.maximum(rhi - rlo, 1e-6)

    # Per-ray best-instance entry data (NumPy mirror of _mesh_sort_key)
    best_t = np.full(r, BIG, np.float32)
    best_i = np.full(r, -1, np.int32)
    entry = np.zeros((r, 3), np.float32)
    dirs_l = np.zeros((r, 3), np.float32)
    for ii in range(I):
        ol = ow @ w2l[ii, :, :3].T + w2l[ii, :, 3]
        dl = dw @ w2l[ii, :, :3].T
        inv = 1.0 / np.where(np.abs(dl) < 1e-12,
                             np.where(dl < 0, -1e-12, 1e-12), dl)
        ta = (rlo - 1e-3 - ol) * inv
        tb = (rhi + 1e-3 - ol) * inv
        en = np.maximum(np.minimum(ta, tb).max(1), 1e-3)
        ex = np.minimum(np.maximum(ta, tb).min(1), cap1)
        ok = (ex >= en) & (en < best_t) & (cap1 > 0)
        best_t = np.where(ok, en, best_t)
        best_i = np.where(ok, ii, best_i)
        pt = ol + dl * en[:, None]
        entry = np.where(ok[:, None], pt, entry)
        dn = dl / np.maximum(np.linalg.norm(dl, axis=1, keepdims=True), 1e-30)
        dirs_l = np.where(ok[:, None], dn, dirs_l)
    reach = best_i >= 0

    cellq = lambda n: np.clip(((entry - rlo) / ext * n).astype(np.int64),
                              0, n - 1)
    dirq = lambda n: np.clip(((dirs_l + 1) * (n / 2)).astype(np.int64),
                             0, n - 1)

    def key_current():
        c = cellq(8); dq = dirq(8)
        cell = (c[:, 0] * 8 + c[:, 1]) * 8 + c[:, 2]
        dd = (dq[:, 0] * 8 + dq[:, 1]) * 8 + dq[:, 2]
        return (best_i.astype(np.int64) * 512 + dd) * 512 + cell

    def key_cell_major():
        c = cellq(8); dq = dirq(8)
        cell = (c[:, 0] * 8 + c[:, 1]) * 8 + c[:, 2]
        dd = (dq[:, 0] * 8 + dq[:, 1]) * 8 + dq[:, 2]
        return (best_i.astype(np.int64) * 512 + cell) * 512 + dd

    def key_morton(nb_c, nb_d):
        c = cellq(1 << nb_c); dq = dirq(1 << nb_d)
        cm = interleave3(c[:, 0], c[:, 1], c[:, 2], nb_c)
        dm = interleave3(dq[:, 0], dq[:, 1], dq[:, 2], nb_d)
        return (best_i.astype(np.int64) << 48) | (dm << (3 * nb_c)) | cm

    def key_morton_mix(nb):
        c = cellq(1 << nb); dq = dirq(1 << nb)
        cm = interleave3(c[:, 0], c[:, 1], c[:, 2], nb)
        dm = interleave3(dq[:, 0], dq[:, 1], dq[:, 2], nb)
        mix = interleave6(cm, dm, nb)
        return (best_i.astype(np.int64) << 48) | mix

    def key_entry_t():
        # (inst, dir8, quantized entry distance along ray)
        dq = dirq(8)
        dd = (dq[:, 0] * 8 + dq[:, 1]) * 8 + dq[:, 2]
        tq = np.clip((best_t / np.linalg.norm(ext) * 64).astype(np.int64),
                     0, 63)
        return (best_i.astype(np.int64) * 512 + dd) * 64 + tq

    keys = {
        "current (i,d8,c8)": key_current(),
        "cell-major (i,c8,d8)": key_cell_major(),
        "morton d4c4": key_morton(4, 4),
        "morton d5c5": key_morton(5, 5),
        "morton mix4": key_morton_mix(4),
        "dir8+entry-t": key_entry_t(),
    }

    rng = np.random.default_rng(0)

    def sweeps_for(order):
        ow_s, dw_s, cap_s = ow[order], dw[order], cap1[order]
        G = r // pms.GROUP
        livg = np.nonzero(cap_s.reshape(G, 8).max(1) > 0)[0]
        gsel = rng.choice(livg, size=min(len(livg), args.groups),
                          replace=False)
        tot = tot_ideal = 0
        for g in gsel:
            sl = slice(g * 8, (g + 1) * 8)
            og, dg, cg = ow_s[sl], dw_s[sl], cap_s[sl]
            live = cg > 0
            for ii in range(I):
                ol = og @ w2l[ii, :, :3].T + w2l[ii, :, 3]
                dl = dg @ w2l[ii, :, :3].T
                inv = 1.0 / np.where(np.abs(dl) < 1e-12,
                                     np.where(dl < 0, -1e-12, 1e-12), dl)
                t0 = (tb_lo[None] - ol[:, None]) * inv[:, None]
                t1 = (tb_hi[None] - ol[:, None]) * inv[:, None]
                near = np.maximum(np.minimum(t0, t1).max(2), 1e-3)
                far = np.minimum(np.maximum(t0, t1).min(2),
                                 np.where(live, cg, -1.0)[:, None])
                shit = far >= near
                tot += int(shit.any(0).sum())
                tot_ideal += shit.sum() / max(live.sum(), 1)
        return tot / len(gsel), tot_ideal / len(gsel)

    for name, k in keys.items():
        k = np.where(reach & (cap1 > 0), k, np.int64(1) << 60)
        sw, ideal = sweeps_for(np.argsort(k, kind="stable"))
        print(f"{name:22s}: sweeps/group {sw:7.2f}   slots/ray {ideal:6.2f}")


if __name__ == "__main__":
    main()
