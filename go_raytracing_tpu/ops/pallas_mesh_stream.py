"""Large-mesh Pallas intersector: leaf-stream segments DMA'd from HBM.

The segment-sweep kernel (ops/pallas_mesh.py) holds every triangle in
SMEM, which caps it at ~16K triangles; the reference's defining scale is
a **280K-triangle** mesh BVH instanced 10x (rt/obj_loader.go:105-112,
devlog 2025-11-21).  This module is the TPU-native large-mesh path:

  host build   triangles in median-split *leaf order* (the implicit-BVH
               order, geometry/mesh_bvh.py) are packed into SEG=2048-tri
               segments: [S, 9, SEG] vertex/edge rows plus per-segment
               box ladders [S, 6, 336] (256 leaf + 64 subtile + 16 tile
               boxes) — both resident in HBM.
  XLA cull     per 4096-ray block x instance: a conservative *frustum*
               (interval-arithmetic slab test over the block's local-ray
               bounds) against every segment box.  Produces, per block,
               the ordered list of candidate segments and an instance
               bitmask per segment.  This replaces the BVH's upper
               levels: work is O(surviving segments), not O(mesh).
  kernel       one grid step per ray block: walks its segment list with
               double-buffered HBM->SMEM DMA (fetch segment j+1 while
               sweeping j), re-checks each (segment, instance) with a
               per-ray slab test, then runs the tile/subtile/leaf cond
               ladder and a Moller-Trumbore scalar-broadcast sweep — the
               same predicated sweep structure ops/pallas_mesh.py proved,
               fed by a stream instead of a resident table.

Like the small-mesh kernel: rays-on-lanes (32,128) blocks, triangle
constants broadcast from SMEM scalars, ``any_hit`` collapses t to 0 so
occluded rays prune every later test.  No per-ray gathers anywhere.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = np.float32(3.0e38)
BLOCK_ROWS = 32
LANES = 128
BLOCK = BLOCK_ROWS * LANES   # rays per grid step

SEG = 2048                   # triangles per streamed segment
TILE = 128                   # tile ladder sizes within a segment
SUB = 32
LEAF = 8
N_LEAF = SEG // LEAF         # 256
N_SUB = SEG // SUB           # 64
N_TILE = SEG // TILE         # 16
BOX_ROW = N_LEAF + N_SUB + N_TILE  # 336 box slots per component row
OFF_LEAF = 0
OFF_SUB = N_LEAF
OFF_TILE = N_LEAF + N_SUB

MAX_INSTANCES = 31           # instance bitmask fits one i32

# Flip for CPU correctness testing (pallas interpreter).
INTERPRET = False


# -----------------------------------------------------------------------------
# Host-side build
# -----------------------------------------------------------------------------

def build_stream_tables(v0, e1, e2):
    """NumPy: ([S, 9, SEG] tri rows, [S, 6, BOX_ROW] box ladders,
    [S, 6] segment boxes, n_segments).

    Boxes are (min_x..z at rows 0..2, max_x..z at rows 3..5); empty
    (padding) boxes are +BIG/-BIG so every slab test fails.
    """
    t = v0.shape[0]
    s = -(-t // SEG)
    tpad = s * SEG

    tri = np.zeros((s, 9, SEG), np.float32)
    rows = np.concatenate([v0.T, e1.T, e2.T], axis=0)  # [9, T]
    tri.transpose(1, 0, 2).reshape(9, tpad)[:, :t] = rows

    v1 = v0 + e1
    v2 = v0 + e2
    lo = np.minimum(np.minimum(v0, v1), v2).astype(np.float32)
    hi = np.maximum(np.maximum(v0, v1), v2).astype(np.float32)

    def seg_boxes(group):
        n = tpad // group
        lo_p = np.full((tpad, 3), np.inf, np.float32)
        hi_p = np.full((tpad, 3), -np.inf, np.float32)
        lo_p[:t] = lo
        hi_p[:t] = hi
        mn = lo_p.reshape(n, group, 3).min(axis=1)
        mx = hi_p.reshape(n, group, 3).max(axis=1)
        thin = (mx - mn) < 1e-4
        mn = np.where(thin, mn - 1e-4, mn)
        mx = np.where(thin, mx + 1e-4, mx)
        mn = np.where(np.isfinite(mn), mn, BIG)
        mx = np.where(np.isfinite(mx), mx, -BIG)
        return mn, mx  # [n, 3] each

    boxes = np.zeros((s, 6, BOX_ROW), np.float32)
    for group, off in ((LEAF, OFF_LEAF), (SUB, OFF_SUB), (TILE, OFF_TILE)):
        mn, mx = seg_boxes(group)
        per = SEG // group
        boxes[:, 0:3, off:off + per] = mn.reshape(s, per, 3).transpose(0, 2, 1)
        boxes[:, 3:6, off:off + per] = mx.reshape(s, per, 3).transpose(0, 2, 1)

    smn, smx = seg_boxes(SEG)
    segbox = np.concatenate([smn, smx], axis=1).astype(np.float32)  # [s, 6]
    return tri, boxes, segbox, s


# -----------------------------------------------------------------------------
# XLA cull: block frustums vs segment boxes -> per-block segment lists
# -----------------------------------------------------------------------------

def _block_frustums(w2l, o, d, t_max, n_blocks):
    """Per (block, instance): local-ray interval bounds.

    Returns (omin, omax, gmin, gmax, bounded, far, any_live) where every
    array is [n_blocks, I, 3] (far/any_live [n_blocks]).  ``bounded`` is
    False on axes whose direction component changes sign inside the
    block (the frustum constrains nothing there — conservative).
    """
    i_n = w2l.shape[0]
    live = t_max > 0.0
    big = jnp.float32(BIG)

    def mins(x, fill):
        x = jnp.where(live, x, fill)
        return x.reshape(n_blocks, BLOCK)

    oc = [o.x, o.y, o.z]
    dc = [d.x, d.y, d.z]
    o_lo_l, o_hi_l, d_lo_l, d_hi_l = [], [], [], []
    for ii in range(i_n):
        per_axis = [[], [], [], []]
        for i in range(3):
            m0, m1, m2, m3 = (w2l[ii, i, 0], w2l[ii, i, 1],
                              w2l[ii, i, 2], w2l[ii, i, 3])
            ol = m0 * oc[0] + m1 * oc[1] + m2 * oc[2] + m3
            dl = m0 * dc[0] + m1 * dc[1] + m2 * dc[2]
            per_axis[0].append(mins(ol, big).min(axis=1))
            per_axis[1].append(mins(ol, -big).max(axis=1))
            per_axis[2].append(mins(dl, big).min(axis=1))
            per_axis[3].append(mins(dl, -big).max(axis=1))
        o_lo_l.append(jnp.stack(per_axis[0], axis=-1))
        o_hi_l.append(jnp.stack(per_axis[1], axis=-1))
        d_lo_l.append(jnp.stack(per_axis[2], axis=-1))
        d_hi_l.append(jnp.stack(per_axis[3], axis=-1))
    o_lo = jnp.stack(o_lo_l, axis=1)   # [n_blocks, I, 3]
    o_hi = jnp.stack(o_hi_l, axis=1)
    d_lo = jnp.stack(d_lo_l, axis=1)
    d_hi = jnp.stack(d_hi_l, axis=1)
    bounded = (d_lo > 1e-12) | (d_hi < -1e-12)
    safe_lo = jnp.where(bounded, d_lo, 1.0)
    safe_hi = jnp.where(bounded, d_hi, 1.0)
    g_a = 1.0 / safe_lo
    g_b = 1.0 / safe_hi
    gmin = jnp.minimum(g_a, g_b)
    gmax = jnp.maximum(g_a, g_b)
    far = jnp.where(live, t_max, -big).reshape(n_blocks, BLOCK).max(axis=1)
    any_live = far > 0.0
    return o_lo, o_hi, gmin, gmax, bounded, far, any_live


def _frustum_vs_boxes(o_lo, o_hi, gmin, gmax, bounded, far, any_live,
                      segbox, t_min):
    """[n_blocks, I, S] conservative hit mask (segbox [S, 6])."""
    b_lo = segbox[:, 0:3]  # [S, 3]
    b_hi = segbox[:, 3:6]

    near = jnp.full(o_lo.shape[:2] + (segbox.shape[0],), t_min, jnp.float32)
    farv = jnp.broadcast_to(far[:, None, None], near.shape)
    for i in range(3):
        # interval products: ((b - o) * g) over o in [o_lo, o_hi],
        # g in [gmin, gmax] (g has one sign when bounded)
        r_lo = b_lo[None, None, :, i] - o_hi[:, :, None, i]
        r_hi = b_hi[None, None, :, i] - o_lo[:, :, None, i]
        g0 = gmin[:, :, None, i]
        g1 = gmax[:, :, None, i]
        p1, p2, p3, p4 = r_lo * g0, r_lo * g1, r_hi * g0, r_hi * g1
        t_lo = jnp.minimum(jnp.minimum(p1, p2), jnp.minimum(p3, p4))
        t_hi = jnp.maximum(jnp.maximum(p1, p2), jnp.maximum(p3, p4))
        bd = bounded[:, :, None, i]
        near = jnp.maximum(near, jnp.where(bd, t_lo, -BIG))
        farv = jnp.minimum(farv, jnp.where(bd, t_hi, BIG))
    hit = (farv >= near) & any_live[:, None, None]
    # reject segments whose box never overlaps [t_min, far] is built in
    return hit


def build_seg_lists(w2l, segbox, o, d, t_max, t_min):
    """Per ray block: ordered candidate segments + instance bitmasks.

    Returns (segs [B, S] i32, imask [B, S] i32, nseg [B] i32).  Unused
    tail entries keep the last valid segment id (so a speculative
    prefetch re-reads a resident segment instead of running off the
    table)."""
    r = o.x.shape[0]
    n_blocks = r // BLOCK
    s = segbox.shape[0]
    fr = _block_frustums(w2l, o, d, t_max, n_blocks)
    hit = _frustum_vs_boxes(*fr, segbox, t_min)          # [B, I, S]
    bits = (hit.astype(jnp.int32)
            << jnp.arange(w2l.shape[0], dtype=jnp.int32)[None, :, None])
    imask_full = jnp.sum(bits, axis=1).astype(jnp.int32)  # [B, S]
    any_seg = imask_full != 0
    # stable order, survivors first
    order = jnp.argsort(~any_seg, axis=1, stable=True).astype(jnp.int32)
    nseg = jnp.sum(any_seg, axis=1).astype(jnp.int32)
    imask = jnp.take_along_axis(imask_full, order, axis=1)
    # clamp the tail to the last real entry
    k = jnp.arange(s, dtype=jnp.int32)[None, :]
    last = jnp.maximum(nseg - 1, 0)[:, None]
    safe_k = jnp.minimum(k, last)
    segs = jnp.take_along_axis(order, safe_k, axis=1)
    imask = jnp.where(k < nseg[:, None], imask, 0)
    return segs, imask, nseg


# -----------------------------------------------------------------------------
# Kernel
# -----------------------------------------------------------------------------

def _kernel(nseg_ref, segs_ref, imask_ref, w2l_ref, segbox_ref,
            tri_hbm, box_hbm, ox, oy, oz, dx, dy, dz, tmax,
            t_out, tri_out, inst_out,
            local_scr, tri_scr, box_scr, sems,
            *, t_min, n_inst, any_hit):
    o_c = [ox[...], oy[...], oz[...]]
    d_c = [dx[...], dy[...], dz[...]]

    # Local rays for every instance, staged once per block:
    # local_scr[ii, 0:3]=origin, [3:6]=inv_dir, [6:9]=dir.
    for ii in range(n_inst):
        for i in range(3):
            m0 = w2l_ref[ii, i, 0]
            m1 = w2l_ref[ii, i, 1]
            m2 = w2l_ref[ii, i, 2]
            m3 = w2l_ref[ii, i, 3]
            ol = m0 * o_c[0] + m1 * o_c[1] + m2 * o_c[2] + m3
            dl = m0 * d_c[0] + m1 * d_c[1] + m2 * d_c[2]
            safe = jnp.where(jnp.abs(dl) < 1e-12,
                             jnp.where(dl < 0, -1e-12, 1e-12), dl)
            local_scr[ii, i] = ol
            local_scr[ii, 3 + i] = 1.0 / safe
            local_scr[ii, 6 + i] = dl

    t_best = tmax[...] * 1.0
    tri_best = jnp.full(t_best.shape, -1, jnp.int32)
    inst_best = jnp.full(t_best.shape, -1, jnp.int32)

    n = nseg_ref[0, 0]

    def tri_dma(j, slot):
        return pltpu.make_async_copy(
            tri_hbm.at[segs_ref[0, j]], tri_scr.at[slot], sems.at[slot, 0]
        )

    def box_dma(j, slot):
        return pltpu.make_async_copy(
            box_hbm.at[segs_ref[0, j]], box_scr.at[slot], sems.at[slot, 1]
        )

    @pl.when(n > 0)
    def _():
        tri_dma(0, 0).start()
        box_dma(0, 0).start()

    def seg_body(j, carry):
        slot = jax.lax.rem(j, 2)

        @pl.when(j + 1 < n)
        def _():
            nxt = jax.lax.rem(j + 1, 2)
            tri_dma(j + 1, nxt).start()
            box_dma(j + 1, nxt).start()

        tri_dma(j, slot).wait()
        box_dma(j, slot).wait()

        seg = segs_ref[0, j]
        mask = imask_ref[0, j]

        def inst_body(ii, carry):
            def do_inst(carry):
                ol = [local_scr[ii, i] for i in range(3)]
                inv = [local_scr[ii, 3 + i] for i in range(3)]
                dl = [local_scr[ii, 6 + i] for i in range(3)]

                def slab_any_smem(box_ref, prefix, bi, t_cap):
                    """Per-ray slab vs box bi of a [.., 6, BOX_ROW]-style
                    ref; prefix indexes leading dims."""
                    near = jnp.full_like(t_cap, t_min)
                    far = t_cap * 1.0
                    for i in range(3):
                        b0 = box_ref[prefix + (i, bi)]
                        b1 = box_ref[prefix + (3 + i, bi)]
                        ta = (b0 - ol[i]) * inv[i]
                        tb = (b1 - ol[i]) * inv[i]
                        near = jnp.maximum(near, jnp.minimum(ta, tb))
                        far = jnp.minimum(far, jnp.maximum(ta, tb))
                    return jnp.any(far > near)

                def seg_slab(t_cap):
                    near = jnp.full_like(t_cap, t_min)
                    far = t_cap * 1.0
                    for i in range(3):
                        b0 = segbox_ref[seg, i]
                        b1 = segbox_ref[seg, 3 + i]
                        ta = (b0 - ol[i]) * inv[i]
                        tb = (b1 - ol[i]) * inv[i]
                        near = jnp.maximum(near, jnp.minimum(ta, tb))
                        far = jnp.minimum(far, jnp.maximum(ta, tb))
                    return jnp.any(far > near)

                def do_seg(carry):
                    def tile_body(k, carry):
                        def do_tile(carry):
                            def sub_body(kk, carry):
                                si = k * (TILE // SUB) + kk

                                def do_sub(carry):
                                    def leaf_body(ll, carry):
                                        li = si * (SUB // LEAF) + ll

                                        def do_leaf(carry):
                                            def tri_body(jj, carry):
                                                t_best, tri_best, inst_best = carry
                                                tloc = li * LEAF + jj
                                                v0 = [tri_scr[slot, c, tloc]
                                                      for c in range(3)]
                                                e1 = [tri_scr[slot, 3 + c, tloc]
                                                      for c in range(3)]
                                                e2 = [tri_scr[slot, 6 + c, tloc]
                                                      for c in range(3)]
                                                hx = dl[1] * e2[2] - dl[2] * e2[1]
                                                hy = dl[2] * e2[0] - dl[0] * e2[2]
                                                hz = dl[0] * e2[1] - dl[1] * e2[0]
                                                a = (e1[0] * hx + e1[1] * hy
                                                     + e1[2] * hz)
                                                parallel = jnp.abs(a) < 1e-8
                                                f = 1.0 / jnp.where(
                                                    parallel, 1.0, a)
                                                sx = ol[0] - v0[0]
                                                sy = ol[1] - v0[1]
                                                sz = ol[2] - v0[2]
                                                u = f * (sx * hx + sy * hy
                                                         + sz * hz)
                                                qx = sy * e1[2] - sz * e1[1]
                                                qy = sz * e1[0] - sx * e1[2]
                                                qz = sx * e1[1] - sy * e1[0]
                                                v = f * (dl[0] * qx
                                                         + dl[1] * qy
                                                         + dl[2] * qz)
                                                tc = f * (e2[0] * qx
                                                          + e2[1] * qy
                                                          + e2[2] * qz)
                                                ok = (~parallel & (u >= 0.0)
                                                      & (u <= 1.0)
                                                      & (v >= 0.0)
                                                      & (u + v <= 1.0)
                                                      & (tc >= t_min)
                                                      & (tc < t_best))
                                                if any_hit:
                                                    t_best = jnp.where(
                                                        ok, 0.0, t_best)
                                                else:
                                                    t_best = jnp.where(
                                                        ok, tc, t_best)
                                                tri_best = jnp.where(
                                                    ok, seg * SEG + tloc,
                                                    tri_best)
                                                inst_best = jnp.where(
                                                    ok, ii, inst_best)
                                                return (t_best, tri_best,
                                                        inst_best)

                                            return jax.lax.fori_loop(
                                                0, LEAF, tri_body, carry)

                                        return jax.lax.cond(
                                            slab_any_smem(
                                                box_scr, (slot,),
                                                OFF_LEAF + li, carry[0]),
                                            do_leaf, lambda c: c, carry)

                                    return jax.lax.fori_loop(
                                        0, SUB // LEAF, leaf_body, carry)

                                return jax.lax.cond(
                                    slab_any_smem(box_scr, (slot,),
                                                  OFF_SUB + si, carry[0]),
                                    do_sub, lambda c: c, carry)

                            return jax.lax.fori_loop(
                                0, TILE // SUB, sub_body, carry)

                        return jax.lax.cond(
                            slab_any_smem(box_scr, (slot,),
                                          OFF_TILE + k, carry[0]),
                            do_tile, lambda c: c, carry)

                    return jax.lax.fori_loop(0, N_TILE, tile_body, carry)

                return jax.lax.cond(seg_slab(carry[0]), do_seg,
                                    lambda c: c, carry)

            bit = jax.lax.shift_right_logical(mask, ii) & 1
            return jax.lax.cond(bit == 1, do_inst, lambda c: c, carry)

        return jax.lax.fori_loop(0, n_inst, inst_body, carry)

    t_best, tri_best, inst_best = jax.lax.fori_loop(
        0, n, seg_body, (t_best, tri_best, inst_best)
    )
    t_out[...] = t_best
    tri_out[...] = tri_best
    inst_out[...] = inst_best


@functools.partial(jax.jit, static_argnames=("t_min", "n_inst", "any_hit"))
def _call(w2l, segbox, tri_tab, box_tab, o, d, t_max, *,
          t_min, n_inst, any_hit=False):
    from ..core.vec3 import V3

    if isinstance(o, V3):
        oc = [o.x, o.y, o.z]
        dc = [d.x, d.y, d.z]
    else:
        oc = [o[:, 0], o[:, 1], o[:, 2]]
        dc = [d[:, 0], d[:, 1], d[:, 2]]
        o = V3(*oc)
        d = V3(*dc)
    r = oc[0].shape[0]
    padded = -(-r // BLOCK) * BLOCK
    rows = padded // LANES

    t_cap = jnp.where(t_max >= BIG, BIG, t_max)

    def prep(a, fill=0.0):
        if padded != r:
            a = jnp.pad(a, (0, padded - r), constant_values=fill)
        return a

    oc = [prep(a) for a in oc]
    dc = [prep(a) for a in dc]
    t_cap = prep(t_cap, fill=-1.0)
    o_p = V3(*oc)
    d_p = V3(*dc)

    segs, imask, nseg = build_seg_lists(
        w2l, segbox, o_p, d_p, t_cap, t_min
    )

    rays = [a.reshape(rows, LANES) for a in oc + dc + [t_cap]]

    grid = (rows // BLOCK_ROWS,)
    ray_spec = pl.BlockSpec((BLOCK_ROWS, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((BLOCK_ROWS, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    s = segbox.shape[0]
    blk_smem = lambda w: pl.BlockSpec((1, w), lambda i: (i, 0),
                                      memory_space=pltpu.SMEM)

    t, tri, inst = pl.pallas_call(
        functools.partial(_kernel, t_min=np.float32(t_min), n_inst=n_inst,
                          any_hit=any_hit),
        grid=grid,
        in_specs=[
            blk_smem(1),            # nseg [B] -> per-block scalar
            blk_smem(s),            # segs
            blk_smem(s),            # imask
            smem,                   # w2l
            smem,                   # segbox
            pl.BlockSpec(memory_space=pltpu.ANY),   # tri_tab (HBM)
            pl.BlockSpec(memory_space=pltpu.ANY),   # box_tab (HBM)
        ] + [ray_spec] * 7,
        out_specs=[out_spec, out_spec, out_spec],
        out_shape=[
            jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
            jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
            jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((n_inst, 9, BLOCK_ROWS, LANES), jnp.float32),
            pltpu.SMEM((2, 9, SEG), jnp.float32),
            pltpu.SMEM((2, 6, BOX_ROW), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        interpret=INTERPRET,
    )(
        nseg.reshape(-1, 1), segs, imask, w2l, segbox, tri_tab, box_tab,
        *rays,
    )
    t = t.reshape(-1)[:r]
    tri = tri.reshape(-1)[:r]
    inst = inst.reshape(-1)[:r]
    hit = tri >= 0
    return jnp.where(hit, t, BIG), jnp.maximum(tri, 0), jnp.maximum(inst, 0), hit


def intersect_mesh_stream(proto, o, d, t_min, t_max, any_hit=False):
    """Drop-in mesh closest hit for large prototypes (requires proto
    built with stream tables).  Returns (t, tri, inst, hit, overflow=0);
    with any_hit=True only `hit` is meaningful."""
    t, tri, inst, hit = _call(
        proto.inst_w2l, proto.s_segbox, proto.s_tri, proto.s_box,
        o, d, t_max,
        t_min=float(t_min), n_inst=proto.n_instances, any_hit=any_hit,
    )
    return t, tri, inst, hit, jnp.int32(0)


def stream_ok(proto) -> bool:
    import os

    if os.environ.get("GRT_NO_PALLAS") == "1":
        return False
    if getattr(proto, "s_n_seg", 0) == 0:
        return False
    if proto.n_instances > MAX_INSTANCES:
        return False
    backend_ok = jax.default_backend() == "tpu" or INTERPRET
    return backend_ok
