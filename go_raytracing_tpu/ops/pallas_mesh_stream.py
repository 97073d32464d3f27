"""Large-mesh Pallas intersector: leaf-stream segments DMA'd from HBM.

The segment-sweep kernel (ops/pallas_mesh.py) holds every triangle in
SMEM, which caps it at ~16K triangles; the reference's defining scale is
a **280K-triangle** mesh BVH instanced 10x (rt/obj_loader.go:105-112,
devlog 2025-11-21).  This module is the TPU-native large-mesh path.

Design, driven by two measured facts (scripts/probe_lucy.py):
  1. in-kernel cond ladders (``jnp.any`` over a (32,128) mask, then a
     branch) are LATENCY-bound: each vector-reduce + scalar branch costs
     about as much as sweeping an entire 8-triangle leaf, so the
     small-mesh kernel spends most of its time deciding what to skip;
  2. per-ray table gathers are off the table entirely (~8 ns each).

So ALL culling happens before the kernel, as dense vector math XLA is
great at, and the kernel itself contains no per-ray box tests at all:

  host build   triangles in median-split *leaf order* (the implicit-BVH
               order, geometry/mesh_bvh.py) are packed into SEG=2048-tri
               segments [S, 9, SEG] resident in HBM, with per-tile
               (128-tri) AABBs [S, 6, N_TILE] for the cull.
  XLA cull     per 4096-ray block x instance: a conservative *frustum*
               (interval-arithmetic slab test over the block's local-ray
               bounds) against every 128-triangle tile box.  Produces,
               per block: the ordered list of candidate segments, a
               16-bit tile mask per (segment, instance), and an instance
               mask.  This replaces the BVH's upper levels; work below
               is O(surviving tiles), not O(mesh).
  kernel       one grid step per ray block: stages local-space rays once
               per present instance, walks the block's segment list with
               double-buffered HBM->SMEM DMA (fetch segment j+1 while
               sweeping j), and for each set tile bit runs a 128-tri
               Moller-Trumbore scalar-broadcast sweep.  The only
               branches are scalar bit tests on precomputed masks.

Like the small-mesh kernel: rays-on-lanes (32,128) blocks, triangle
constants broadcast from SMEM scalars, ``any_hit`` collapses t to 0 so
occluded rays shrink every later t-window.  No per-ray gathers anywhere.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = np.float32(3.0e38)
# 8-row (1024-ray) blocks: quarter the footprint of a 32-row block means
# ~2.5x fewer surviving tiles per block AND each 128-tri sweep touches a
# quarter of the vector rows — measured (cull_stats, 112K tris) 145 ->
# 56 est-ms per 1M coherent camera rays.  DMA refetch across blocks is
# noise (~1 ms/1M rays at HBM bandwidth).
BLOCK_ROWS = 8
LANES = 128
BLOCK = BLOCK_ROWS * LANES   # rays per grid step

SEG = 2048                   # triangles per streamed segment
TILE = 128                   # triangles per cullable tile (one mask bit)
N_TILE = SEG // TILE         # 16 -> tile mask fits an i32 comfortably
ROWS = 16                    # tri rows (9 used: v0/e1/e2 xyz) padded to a
                             # multiple of 8 — Mosaic tiles HBM memrefs
                             # (8,128) and a 9-row segment slice would be
                             # unaligned along dim 1

MAX_INSTANCES = 31           # instance bitmask fits one i32

# Flip for CPU correctness testing (pallas interpreter).
INTERPRET = False


# -----------------------------------------------------------------------------
# Host-side build
# -----------------------------------------------------------------------------

def build_stream_tables(v0, e1, e2):
    """NumPy: ([S, ROWS, SEG] tri rows, [S, 6, N_TILE] tile boxes, n_seg).

    Boxes are (min_xyz rows 0..2, max_xyz rows 3..5); padding boxes are
    +BIG/-BIG so every slab test fails.  Padding triangles are zero
    (degenerate) and never pass Moller-Trumbore.
    """
    t = v0.shape[0]
    s = -(-t // SEG)
    tpad = s * SEG

    rows9 = np.zeros((ROWS, tpad), np.float32)
    rows9[:9, :t] = np.concatenate([v0.T, e1.T, e2.T], axis=0)
    # [ROWS, S, SEG] -> [S, ROWS, SEG]; ascontiguousarray materializes
    # (assignment into a reshape of a transposed view is silently lost)
    tri = np.ascontiguousarray(
        rows9.reshape(ROWS, s, SEG).transpose(1, 0, 2)
    )

    v1 = v0 + e1
    v2 = v0 + e2
    lo_t = np.minimum(np.minimum(v0, v1), v2).astype(np.float32)
    hi_t = np.maximum(np.maximum(v0, v1), v2).astype(np.float32)
    lo_p = np.full((tpad, 3), np.inf, np.float32)
    hi_p = np.full((tpad, 3), -np.inf, np.float32)
    lo_p[:t] = lo_t
    hi_p[:t] = hi_t
    mn = lo_p.reshape(s * N_TILE, TILE, 3).min(axis=1)
    mx = hi_p.reshape(s * N_TILE, TILE, 3).max(axis=1)
    thin = (mx - mn) < 1e-4
    mn = np.where(thin, mn - 1e-4, mn)
    mx = np.where(thin, mx + 1e-4, mx)
    mn = np.where(np.isfinite(mn), mn, BIG)
    mx = np.where(np.isfinite(mx), mx, -BIG)
    tilebox = np.concatenate(
        [mn.reshape(s, N_TILE, 3), mx.reshape(s, N_TILE, 3)], axis=2
    ).transpose(0, 2, 1)  # [S, 6, N_TILE]
    return tri, np.ascontiguousarray(tilebox), s


# -----------------------------------------------------------------------------
# XLA cull: block frustums vs tile boxes -> per-block segment lists
# -----------------------------------------------------------------------------

def _block_frustums(w2l, root_lo, root_hi, o, d, t_max, t_min, n_blocks):
    """Per (block, instance): local-ray interval bounds over only the
    rays that can actually reach that instance.

    Each ray is slab-tested against the prototype's local-space root box
    per instance; rays that miss (or whose [t_min, t_max] window doesn't
    overlap the box) are excluded from the block's frustum reduction.
    This is what keeps one wild ray (e.g. an escaping edge ray with
    t_max = BIG) from inflating a whole block's frustum to the scene.

    Returns (o_lo, o_hi [B, I, 3], gmin, gmax, bounded [B, I, 3],
    near, far [B, I], present [B, I]).  ``bounded`` is False on axes
    whose local direction changes sign inside the block (the frustum
    constrains nothing there — conservative)."""
    i_n = w2l.shape[0]
    live = t_max > 0.0
    big = jnp.float32(BIG)
    oc = [o.x, o.y, o.z]
    dc = [d.x, d.y, d.z]

    outs = []  # per instance: (o_lo[3], o_hi[3], d_lo[3], d_hi[3], near, far, present)
    for ii in range(i_n):
        ol3, dl3 = [], []
        t_en = jnp.full_like(t_max, t_min)
        t_ex = jnp.minimum(t_max, big)
        for i in range(3):
            m0, m1, m2 = w2l[ii, i, 0], w2l[ii, i, 1], w2l[ii, i, 2]
            ol = m0 * oc[0] + m1 * oc[1] + m2 * oc[2] + w2l[ii, i, 3]
            dl = m0 * dc[0] + m1 * dc[1] + m2 * dc[2]
            inv = 1.0 / jnp.where(jnp.abs(dl) < 1e-12,
                                  jnp.where(dl < 0, -1e-12, 1e-12), dl)
            ta = (root_lo[i] - ol) * inv
            tb = (root_hi[i] - ol) * inv
            t_en = jnp.maximum(t_en, jnp.minimum(ta, tb))
            t_ex = jnp.minimum(t_ex, jnp.maximum(ta, tb))
            ol3.append(ol)
            dl3.append(dl)
        contrib = live & (t_ex >= t_en)

        def red(x, fill, op):
            x = jnp.where(contrib, x, fill)
            return op(x.reshape(n_blocks, BLOCK), axis=1)

        o_lo = jnp.stack([red(x, big, jnp.min) for x in ol3], -1)
        o_hi = jnp.stack([red(x, -big, jnp.max) for x in ol3], -1)
        d_lo = jnp.stack([red(x, big, jnp.min) for x in dl3], -1)
        d_hi = jnp.stack([red(x, -big, jnp.max) for x in dl3], -1)
        near = red(t_en, big, jnp.min)
        far = red(t_ex, -big, jnp.max)
        outs.append((o_lo, o_hi, d_lo, d_hi, near, far, far >= near))

    o_lo, o_hi, d_lo, d_hi = (
        jnp.stack([t[k] for t in outs], axis=1) for k in range(4)
    )                                   # [B, I, 3]
    near = jnp.stack([t[4] for t in outs], axis=1)   # [B, I]
    far = jnp.stack([t[5] for t in outs], axis=1)
    present = jnp.stack([t[6] for t in outs], axis=1)
    bounded = (d_lo > 1e-12) | (d_hi < -1e-12)
    safe_lo = jnp.where(bounded, d_lo, 1.0)
    safe_hi = jnp.where(bounded, d_hi, 1.0)
    g_a = 1.0 / safe_lo
    g_b = 1.0 / safe_hi
    gmin = jnp.minimum(g_a, g_b)
    gmax = jnp.maximum(g_a, g_b)
    return o_lo, o_hi, gmin, gmax, bounded, near, far, present


def _frustum_vs_tiles(fr, tilebox):
    """[n_blocks, I, S, N_TILE] conservative hit mask
    (tilebox [S, 6, N_TILE])."""
    o_lo, o_hi, gmin, gmax, bounded, near0, far0, present = fr
    shape = o_lo.shape[:2] + (tilebox.shape[0], N_TILE)
    near = jnp.broadcast_to(near0[:, :, None, None], shape)
    farv = jnp.broadcast_to(far0[:, :, None, None], shape)
    for i in range(3):
        b_lo = tilebox[None, None, :, i, :]       # [1, 1, S, T]
        b_hi = tilebox[None, None, :, 3 + i, :]
        r_lo = b_lo - o_hi[:, :, None, None, i]
        r_hi = b_hi - o_lo[:, :, None, None, i]
        g0 = gmin[:, :, None, None, i]
        g1 = gmax[:, :, None, None, i]
        p1, p2, p3, p4 = r_lo * g0, r_lo * g1, r_hi * g0, r_hi * g1
        t_lo = jnp.minimum(jnp.minimum(p1, p2), jnp.minimum(p3, p4))
        t_hi = jnp.maximum(jnp.maximum(p1, p2), jnp.maximum(p3, p4))
        bd = bounded[:, :, None, None, i]
        near = jnp.maximum(near, jnp.where(bd, t_lo, -BIG))
        farv = jnp.minimum(farv, jnp.where(bd, t_hi, BIG))
    return (farv >= near) & present[:, :, None, None]


def build_block_lists(w2l, root_lo, root_hi, tilebox, o, d, t_max, t_min):
    """Per ray block: candidate segments, per-(seg, inst) tile masks,
    instance mask.

    Returns (segs [B, S] i32, tilemask [B, S*I] i32, nseg [B] i32,
    instmask [B] i32).  ``segs`` tail entries repeat the last survivor
    so a speculative prefetch re-reads a resident segment.  ``tilemask``
    is indexed [b, seg * I + inst] (seg = the REAL segment id)."""
    r = o.x.shape[0]
    n_blocks = r // BLOCK
    i_n = w2l.shape[0]
    s = tilebox.shape[0]
    fr = _block_frustums(w2l, root_lo, root_hi, o, d, t_max, t_min,
                         n_blocks)
    hit = _frustum_vs_tiles(fr, tilebox)               # [B, I, S, T]
    tbits = jnp.arange(N_TILE, dtype=jnp.int32)[None, None, None, :]
    tilemask = jnp.sum(
        hit.astype(jnp.int32) << tbits, axis=3
    ).astype(jnp.int32)                                # [B, I, S]
    any_pair = tilemask != 0
    instmask = jnp.sum(
        jnp.any(any_pair, axis=2).astype(jnp.int32)
        << jnp.arange(i_n, dtype=jnp.int32)[None, :],
        axis=1,
    ).astype(jnp.int32)                                # [B]
    any_seg = jnp.any(any_pair, axis=1)                # [B, S]
    order = jnp.argsort(~any_seg, axis=1, stable=True).astype(jnp.int32)
    nseg = jnp.sum(any_seg, axis=1).astype(jnp.int32)
    k = jnp.arange(s, dtype=jnp.int32)[None, :]
    last = jnp.maximum(nseg - 1, 0)[:, None]
    segs = jnp.take_along_axis(order, jnp.minimum(k, last), axis=1)
    tilemask = tilemask.transpose(0, 2, 1).reshape(n_blocks, s * i_n)
    return segs, tilemask, nseg, instmask


# -----------------------------------------------------------------------------
# Kernel
# -----------------------------------------------------------------------------

def _kernel(nseg_ref, segs_ref, tilemask_ref, instmask_ref, w2l_ref,
            tri_hbm, ox, oy, oz, dx, dy, dz, tmax,
            t_out, tri_out, inst_out,
            local_scr, tri_scr, sems,
            *, t_min, n_inst, any_hit):
    o_c = [ox[...], oy[...], oz[...]]
    d_c = [dx[...], dy[...], dz[...]]
    imask = instmask_ref[0, 0, 0]

    # Local rays, staged once per *present* instance:
    # local_scr[ii, 0:3]=origin, [3:6]=dir (inv_dir is not needed: the
    # kernel has no slab tests).
    for ii in range(n_inst):
        @pl.when((jax.lax.shift_right_logical(imask, ii) & 1) == 1)
        def _():
            for i in range(3):
                m0 = w2l_ref[ii, i, 0]
                m1 = w2l_ref[ii, i, 1]
                m2 = w2l_ref[ii, i, 2]
                m3 = w2l_ref[ii, i, 3]
                local_scr[ii, i] = (
                    m0 * o_c[0] + m1 * o_c[1] + m2 * o_c[2] + m3
                )
                local_scr[ii, 3 + i] = m0 * d_c[0] + m1 * d_c[1] + m2 * d_c[2]

    t_best = tmax[...] * 1.0
    tri_best = jnp.full(t_best.shape, -1, jnp.int32)
    inst_best = jnp.full(t_best.shape, -1, jnp.int32)

    n = nseg_ref[0, 0, 0]

    def tri_dma(j, slot):
        return pltpu.make_async_copy(
            tri_hbm.at[segs_ref[0, 0, j]], tri_scr.at[slot], sems.at[slot]
        )

    @pl.when(n > 0)
    def _():
        tri_dma(0, 0).start()

    def seg_body(j, carry):
        slot = jax.lax.rem(j, 2)

        @pl.when(j + 1 < n)
        def _():
            tri_dma(j + 1, jax.lax.rem(j + 1, 2)).start()

        tri_dma(j, slot).wait()
        seg = segs_ref[0, 0, j]

        def inst_body(ii, carry):
            tm = tilemask_ref[0, 0, seg * n_inst + ii]

            def do_inst(carry):
                ol = [local_scr[ii, i] for i in range(3)]
                dl = [local_scr[ii, 3 + i] for i in range(3)]

                def tile_body(k, carry):
                    def do_tile(carry):
                        def tri_body(jj, carry):
                            t_best, tri_best, inst_best = carry
                            tloc = k * TILE + jj
                            v0 = [tri_scr[slot, c, tloc] for c in range(3)]
                            e1 = [tri_scr[slot, 3 + c, tloc]
                                  for c in range(3)]
                            e2 = [tri_scr[slot, 6 + c, tloc]
                                  for c in range(3)]
                            # Moller-Trumbore: scalar tri x (32,128) rays
                            hx = dl[1] * e2[2] - dl[2] * e2[1]
                            hy = dl[2] * e2[0] - dl[0] * e2[2]
                            hz = dl[0] * e2[1] - dl[1] * e2[0]
                            a = e1[0] * hx + e1[1] * hy + e1[2] * hz
                            parallel = jnp.abs(a) < 1e-8
                            f = 1.0 / jnp.where(parallel, 1.0, a)
                            sx = ol[0] - v0[0]
                            sy = ol[1] - v0[1]
                            sz = ol[2] - v0[2]
                            u = f * (sx * hx + sy * hy + sz * hz)
                            qx = sy * e1[2] - sz * e1[1]
                            qy = sz * e1[0] - sx * e1[2]
                            qz = sx * e1[1] - sy * e1[0]
                            v = f * (dl[0] * qx + dl[1] * qy + dl[2] * qz)
                            tc = f * (e2[0] * qx + e2[1] * qy + e2[2] * qz)
                            ok = (~parallel & (u >= 0.0) & (u <= 1.0)
                                  & (v >= 0.0) & (u + v <= 1.0)
                                  & (tc >= t_min) & (tc < t_best))
                            if any_hit:
                                t_best = jnp.where(ok, 0.0, t_best)
                            else:
                                t_best = jnp.where(ok, tc, t_best)
                            tri_best = jnp.where(
                                ok, seg * SEG + tloc, tri_best)
                            inst_best = jnp.where(ok, ii, inst_best)
                            return (t_best, tri_best, inst_best)

                        return jax.lax.fori_loop(0, TILE, tri_body, carry)

                    bit = jax.lax.shift_right_logical(tm, k) & 1
                    return jax.lax.cond(bit == 1, do_tile,
                                        lambda c: c, carry)

                return jax.lax.fori_loop(0, N_TILE, tile_body, carry)

            return jax.lax.cond(tm != 0, do_inst, lambda c: c, carry)

        return jax.lax.fori_loop(0, n_inst, inst_body, carry)

    t_best, tri_best, inst_best = jax.lax.fori_loop(
        0, n, seg_body, (t_best, tri_best, inst_best)
    )
    t_out[...] = t_best
    tri_out[...] = tri_best
    inst_out[...] = inst_best


@functools.partial(jax.jit, static_argnames=("t_min", "n_inst", "any_hit"))
def _call(w2l, root_lo, root_hi, tilebox, tri_tab, o, d, t_max, *,
          t_min, n_inst, any_hit=False):
    from ..core.vec3 import V3

    if isinstance(o, V3):
        oc = [o.x, o.y, o.z]
        dc = [d.x, d.y, d.z]
    else:
        oc = [o[:, 0], o[:, 1], o[:, 2]]
        dc = [d[:, 0], d[:, 1], d[:, 2]]
    r = oc[0].shape[0]
    padded = -(-r // BLOCK) * BLOCK
    rows = padded // LANES

    def prep(a, fill=0.0):
        if padded != r:
            a = jnp.pad(a, (0, padded - r), constant_values=fill)
        return a

    oc = [prep(a) for a in oc]
    dc = [prep(a) for a in dc]
    t_cap = prep(jnp.where(t_max >= BIG, BIG, t_max), fill=-1.0)

    segs, tilemask, nseg, instmask = build_block_lists(
        w2l, root_lo, root_hi, tilebox, V3(*oc), V3(*dc), t_cap, t_min
    )

    rays = [a.reshape(rows, LANES) for a in oc + dc + [t_cap]]

    grid = (rows // BLOCK_ROWS,)
    ray_spec = pl.BlockSpec((BLOCK_ROWS, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((BLOCK_ROWS, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    s = tilebox.shape[0]

    def blk_smem(w):
        # [B, 1, w] with (1, 1, w) blocks: Mosaic requires the last two
        # block dims be (8, 128)-divisible OR equal the array dims — a
        # leading grid-blocked dim plus an exact (1, w) tail satisfies it.
        return pl.BlockSpec((1, 1, w), lambda i: (i, 0, 0),
                            memory_space=pltpu.SMEM)

    t, tri, inst = pl.pallas_call(
        functools.partial(_kernel, t_min=np.float32(t_min), n_inst=n_inst,
                          any_hit=any_hit),
        grid=grid,
        in_specs=[
            blk_smem(1),            # nseg
            blk_smem(s),            # segs
            blk_smem(s * n_inst),   # tilemask
            blk_smem(1),            # instmask
            smem,                   # w2l
            # Explicit HBM (not ANY): ANY lets Mosaic place the table in
            # VMEM with a tiled layout, where a [1, 9, SEG] slice is
            # illegal (dim-1 slice must be 8-aligned); HBM is untiled.
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        ] + [ray_spec] * 7,
        out_specs=[out_spec, out_spec, out_spec],
        out_shape=[
            jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
            jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
            jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((n_inst, 6, BLOCK_ROWS, LANES), jnp.float32),
            pltpu.SMEM((2, ROWS, SEG), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=INTERPRET,
    )(
        nseg.reshape(-1, 1, 1), segs.reshape(-1, 1, s),
        tilemask.reshape(-1, 1, s * n_inst), instmask.reshape(-1, 1, 1),
        w2l, tri_tab, *rays,
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
        proto.inst_w2l, proto.root_bbox_min, proto.root_bbox_max,
        proto.s_tilebox, proto.s_tri, o, d, t_max,
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
    return jax.default_backend() == "tpu" or INTERPRET
