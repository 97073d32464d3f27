"""Offline experiment: per-ray stream-tile crossings under (a) the
current leaf-order tiling vs (b) a 128-aligned recursive median split
vs (c) aligned split with SAH-style largest-extent axis on the tile
AABB (not centroid).  Metric: mean tile-AABB crossings per reaching ray
on real cornell-lucy camera + bounced-like rays — proxies phase-B sweep
count.  CPU only.
"""

import dataclasses
import sys

import numpy as np

sys.path.insert(0, ".")

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402

from go_raytracing_tpu.camera import generate_rays  # noqa: E402
from go_raytracing_tpu.render.renderer import _id_to_pixel  # noqa: E402
from go_raytracing_tpu.scenes import builders  # noqa: E402

TILE = 128


def aligned_order(lo, hi, tile=TILE):
    """Recursive median split with split points aligned to ``tile``:
    every tile is one exact subtree."""
    n = lo.shape[0]
    centroid = (lo + hi) * 0.5
    order = np.arange(n)
    segs = [(0, n)]
    out = []
    while segs:
        s, e = segs.pop()
        cnt = e - s
        if cnt <= tile:
            out.append((s, e))
            continue
        c = centroid[order[s:e]]
        ext = c.max(axis=0) - c.min(axis=0)
        axis = int(np.argmax(ext))
        k = c[:, axis].argsort(kind="stable")
        order[s:e] = order[s:e][k]
        n_tiles = -(-cnt // tile)
        left_tiles = n_tiles // 2
        mid = s + left_tiles * tile
        segs.append((s, mid))
        segs.append((mid, e))
    return order


def tile_boxes(lo, hi, order, tile=TILE):
    n = lo.shape[0]
    nt = -(-n // tile)
    pad = nt * tile - n
    l = np.concatenate([lo[order], np.full((pad, 3), np.inf)])
    h = np.concatenate([hi[order], np.full((pad, 3), -np.inf)])
    return (l.reshape(nt, tile, 3).min(axis=1),
            h.reshape(nt, tile, 3).max(axis=1))


def crossings(bmin, bmax, o, d, t_max):
    """Mean tile-AABB crossings per ray (rays [R,3], local space)."""
    inv = 1.0 / np.where(np.abs(d) < 1e-12, 1e-12, d)
    r = o.shape[0]
    total = 0
    reach = 0
    chunk = 4096
    for s in range(0, r, chunk):
        oo, ii, tt = o[s:s+chunk], inv[s:s+chunk], t_max[s:s+chunk]
        ta = (bmin[None] - oo[:, None]) * ii[:, None]      # [c, NT, 3]
        tb = (bmax[None] - oo[:, None]) * ii[:, None]
        near = np.minimum(ta, tb).max(axis=2)
        far = np.maximum(ta, tb).min(axis=2)
        x = (far >= np.maximum(near, 1e-3)) & (near <= tt[:, None])
        per = x.sum(axis=1)
        total += per.sum()
        reach += (per > 0).sum()
    return total / max(reach, 1), reach / r


def main():
    scene, cam = builders.cornell_box_lucy(mesh_detail=(256, 220))
    cam = dataclasses.replace(cam, image_width=600, aspect_ratio=1.0)
    proto = scene.meshes[0]
    v0 = np.asarray(proto.tri_v0)
    e1 = np.asarray(proto.tri_e1)
    e2 = np.asarray(proto.tri_e2)
    lo = np.minimum(np.minimum(v0, v0 + e1), v0 + e2)
    hi = np.maximum(np.maximum(v0, v0 + e1), v0 + e2)
    n = v0.shape[0]
    print(f"tris={n}")

    R = 1 << 15
    rng_ids = np.random.default_rng(1)
    ids = jnp.asarray(
        rng_ids.permutation(600 * 600)[:R].astype(np.uint32))
    px, py, _ = _id_to_pixel(ids % (600 * 600), 600, 600, True)
    o, d, _tm = generate_rays(cam, px, py, ids, 0)
    o = np.stack([np.asarray(o.x), np.asarray(o.y), np.asarray(o.z)], 1)
    d = np.stack([np.asarray(d.x), np.asarray(d.y), np.asarray(d.z)], 1)

    # transform into instance-0 local space (w2l)
    w2l = np.asarray(proto.inst_w2l)[0]
    ol = o @ w2l[:, :3].T + w2l[:, 3]
    dl = d @ w2l[:, :3].T
    t_max = np.full((R,), 3e38, np.float32)

    # incoherent variant: shuffle directions (bounce-like)
    rng = np.random.default_rng(0)
    dsh = dl[rng.permutation(R)]

    cur = np.arange(n)
    al = aligned_order(lo, hi)

    # (c) aligned, axis by AABB extent of the boxes (not centroids)
    def aligned_order_box(lo, hi, tile=TILE):
        order = np.arange(n)
        segs = [(0, n)]
        while segs:
            s, e = segs.pop()
            cnt = e - s
            if cnt <= tile:
                continue
            l = lo[order[s:e]]
            h = hi[order[s:e]]
            ext = h.max(axis=0) - l.min(axis=0)
            axis = int(np.argmax(ext))
            c = ((l + h) * 0.5)[:, axis]
            k = c.argsort(kind="stable")
            order[s:e] = order[s:e][k]
            n_tiles = -(-cnt // tile)
            mid = s + (n_tiles // 2) * tile
            segs.append((s, mid))
            segs.append((mid, e))
        return order

    bx = aligned_order_box(lo, hi)

    for name, orderv in (("current", cur), ("aligned-centroid", al),
                         ("aligned-box", bx)):
        bmin, bmax = tile_boxes(lo, hi, orderv)
        area = ((bmax - bmin)[:, 0] * (bmax - bmin)[:, 1]
                + (bmax - bmin)[:, 1] * (bmax - bmin)[:, 2]
                + (bmax - bmin)[:, 0] * (bmax - bmin)[:, 2])
        area = area[np.isfinite(area)]
        c1, f1 = crossings(bmin, bmax, ol, dl, t_max)
        c2, _ = crossings(bmin, bmax, ol, dsh, t_max)
        print(f"{name:18s}: tiles={bmin.shape[0]} meanSA={area.mean():9.1f} "
              f"cross/reach-ray cam={c1:6.2f} shuf={c2:6.2f} "
              f"(reach {f1*100:.0f}%)")


if __name__ == "__main__":
    main()
