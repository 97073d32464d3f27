"""Large-mesh Pallas intersector: tris-on-lanes tile sweeps with per-8-ray
group culling.  The TPU-native answer to the reference's 280K-triangle
mesh BVH (rt/obj_loader.go:105-112, rt/bvh.go:219-239).

Design history (all numbers measured on v5e, scripts/probe_lucy.py):

  v1  segment-sweep (ops/pallas_mesh.py): every triangle as SMEM scalars,
      scalar-broadcast Moller-Trumbore against (32,128) ray blocks.
      Issue-bound: ~50 scalar-issued instructions per *triangle* -> caps
      out at ~16K triangles.
  v2  leaf-stream DMA + block-level frustum cull: 1.4 Mrays/s at 112K
      tris.  Two findings: (a) HBM->SMEM DMA is fine (120 GB/s), (b) the
      per-triangle scalar loop costs ~6300 serially-issued instructions
      per 128-tri tile no matter how many rays each vector op covers,
      and (c) 1024 rays sharing one tile list sweep ~20x more tiles
      than any single ray needs (block-union waste).
  v3  flips the layout: a *tile* is 128 triangles on the 128 VREG
      lanes ([9, 128] vector rows, VMEM-resident - no DMA), and rays
      come in groups of 8 on the sublanes.  One tile sweep = ~55
      VECTOR ops for all 8x128 ray-tri pairs.
  v4  deletes v3's unrefined-overflow path (128x sweep blowup on the
      12% of blocks past the slot cap, and it read garbage slots —
      faulted the TPU worker) and adds per-group summary words.
  v5  makes the phase-B instance loop static and replaces the 7
      dynamic pltpu.rolls per sweep (~55% of sweep cost,
      scripts/stream_micro.py) with an incremental static roll carried
      through the group loop.
  v6  culling is EXACT per ray, and the cull-slot bitmask covers the
      whole mesh at any size:

        XLA     per-block per-instance root-box cull (only to bound the
                in-kernel candidate scan); rays are pre-sorted by
                wavefront._mesh_sort_key (nearest entered instance +
                local entry cell + local direction) and pre-filtered by
                its reach bit.
        kernel  phase 0: per-instance local rays, 1/d, and per-ray
                root-box [entry, exit] intervals ([8, 128]: member on
                sublanes, group on lanes).
        kernel  phase A: each candidate SLOT's AABB is slab-tested
                against every ray ([8,128] vector pass — same vreg cost
                as the old [1,128] group-frustum test); the axis-0 fold
                is the MINIMAL per-group mask for 8-ray sweeps.  Group
                frustums over compaction-scattered rays covered ~242
                tiles vs ~30 for the union of the rays (measured,
                bounce-1); per-ray exactness was the 6x.
        kernel  phase B: per group with any bits (one summary-word SMEM
                read filters empty groups): the group's 8 local rays
                come from an incremental static roll, and each set
                slot's tps tiles are swept with tris-on-lanes
                Moller-Trumbore.  Per-lane bests are lane-reduced once
                per group and merged by an iota-select.

  A cull SLOT is tps = ceil(n_tiles / MAXT_INST) adjacent leaf-order
  tiles, so MAXT_INST slot bits always cover the whole mesh: nothing is
  ever dropped (the host-side overflow count remains wired and must
  read 0).

  v7  (this file) interleaves phases A+B per instance, clipping later
      instances' slab exits by the running per-member best t (exact,
      vector-only cross-instance termination); adds the hierarchical
      per-ray SEGMENT gate before slot tests; Baldwin-Weber rows; and
      paired two-slot loop iterations with independent accumulator
      chains (the sweeps are VPU-latency-bound, not issue-bound).

Like every hot kernel here: no per-ray gathers and no [R,3] arrays.
Vector-reduce conditions appear ONLY at coarse granularity (one
jnp.any per (segment, instance) gate — ~55/instance/block); a per-tile
reduce in the sweep loop conditions measured 22% slower end-to-end.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = np.float32(3.0e38)
LANES = 128
GROUP = 8                    # rays per cull group (one VREG sublane set)
N_GROUPS = 128               # groups per block (one VREG lane set)
BLOCK = GROUP * N_GROUPS     # 1024 rays per grid step

TILE = 128                   # triangles per tile (tris on lanes)
SEG_TILES = 16               # tiles per cull segment (bitmask word)
SEG = TILE * SEG_TILES       # 2048 triangles per segment
ROWS = 16                    # tri rows (13 used: n, U, V, id, d_p, Uo, Vo)

MAX_INSTANCES = 31           # instance bitmask fits one i32
MAXT_INST = 896              # cull slots per (block, instance); a slot
                             # is tps adjacent tiles with tps chosen so
                             # MAXT_INST slots cover the whole mesh
                             # (tps=1 up to 114K tris).  The instance-
                             # entry sort key compacts sparse reaching
                             # rays, so one block can legitimately touch
                             # most of an instance.  W_WORDS must stay
                             # <= 31 so the per-group summary fits one
                             # i32 (millions of tris at tps >= 2).
W_WORDS = MAXT_INST // 32    # per-(instance, group) bitmask words (10)

# Whole tile table must sit in VMEM (no DMA in v3).  48 MB budget.
MAX_STREAM_TRIS = 48 * 2**20 // (ROWS * 4)

# Flip for CPU correctness testing (pallas interpreter).
INTERPRET = False


# -----------------------------------------------------------------------------
# Host-side build
# -----------------------------------------------------------------------------

def aligned_stream_order(lo, hi, tile=TILE):
    """TILE-aligned recursive median split: every 128-tri tile is one
    exact subtree, so tile AABBs are minimal for the topology.

    The implicit-BVH leaf order (geometry/mesh_bvh.py) has variable-size
    leaves, so 128-consecutive-tri tiles straddle subtree boundaries —
    measured 2.8x larger mean tile surface area and 2.2x more per-ray
    tile crossings on the 112K-tri cornell-lucy stand-in
    (scripts/tile_order_experiment.py).  Phase-B sweep count tracks
    crossings, so the aligned order is the stream kernel's tiling; the
    kernel reports winners by ORIGINAL id (row 9 of the tile table)."""
    n = lo.shape[0]
    centroid = (lo + hi) * 0.5
    order = np.arange(n)
    segs = [(0, n)]
    while segs:
        s, e = segs.pop()
        cnt = e - s
        if cnt <= tile:
            continue
        c = centroid[order[s:e]]
        ext = c.max(axis=0) - c.min(axis=0)
        axis = int(np.argmax(ext))
        k = c[:, axis].argsort(kind="stable")
        order[s:e] = order[s:e][k]
        mid = s + (-(-cnt // tile) // 2) * tile
        segs.append((s, mid))
        segs.append((mid, e))
    return order


def build_stream_tables(v0, e1, e2):
    """NumPy: ([NT, ROWS, TILE] tile-major tri rows, [S, 6, SEG_TILES]
    per-SLOT AABBs, n_seg).

    Triangles are re-clustered into TILE-aligned subtrees
    (:func:`aligned_stream_order`); row 9 of each tile carries the
    triangle's ORIGINAL (implicit-BVH leaf order) index as f32 — exact
    to 2^24, far above MAX_STREAM_TRIS — so the kernel's winner ids stay
    in the order every other consumer (records, replay decisions, the
    frontier oracle) uses.  A cull SLOT is ``tps = ceil(n_tiles /
    MAXT_INST)`` adjacent tiles (1 for <= 112K tris), so the
    per-(block, instance) slot bitmask always covers the WHOLE mesh —
    overflow is structurally impossible at any size the VMEM table
    admits (aligned-split adjacency keeps the grouped boxes compact).
    Padding triangles are zero (n = 0 -> rejected as parallel); padding
    slot boxes are +BIG/-BIG so every slab test fails.

    Rows hold the Baldwin-Weber precomputed intersection transform
    instead of raw (v0, e1, e2): rows 0-2 the unnormalized plane normal
    n = e1 x e2, rows 3-5 U = (e2 x n)/|n|^2 and rows 6-8
    V = (n x e1)/|n|^2 (barycentrics as affine functions of the hit
    point: u = U.p + Uo, v = V.p + Vo), row 9 the original id, row 10
    d_p = n.v0, rows 11-12 Uo/Vo.  Same accept region as
    Moller-Trumbore but ~37 vector ops per tile sweep instead of ~61
    (the sweep is VPU-issue-bound at ~71 ns, scripts/stream_micro.py).
    Precomputed in f64 so sliver triangles' U/V stay accurate in f32.
    """
    t = v0.shape[0]
    if t:
        lo0 = np.minimum(np.minimum(v0, v0 + e1), v0 + e2)
        hi0 = np.maximum(np.maximum(v0, v0 + e1), v0 + e2)
        perm = aligned_stream_order(lo0, hi0)
        v0, e1, e2 = v0[perm], e1[perm], e2[perm]
    else:
        perm = np.zeros((0,), np.int64)
    nt_raw = -(-t // TILE)
    tps = max(1, -(-nt_raw // MAXT_INST))   # tiles per cull slot
    slot_tris = TILE * tps
    s = -(-(-(-t // slot_tris)) // SEG_TILES)  # segments of 16 slots
    nslot = s * SEG_TILES
    tpad = nslot * slot_tris
    nt = tpad // TILE

    v064 = v0.astype(np.float64)
    e164 = e1.astype(np.float64)
    e264 = e2.astype(np.float64)
    n64 = np.cross(e164, e264)
    n2 = np.maximum((n64 * n64).sum(axis=1, keepdims=True), 1e-300)
    U = np.cross(e264, n64) / n2
    V = np.cross(n64, e164) / n2
    rows9 = np.zeros((ROWS, tpad), np.float32)
    rows9[0:3, :t] = n64.T
    rows9[3:6, :t] = U.T
    rows9[6:9, :t] = V.T
    rows9[9, :t] = perm.astype(np.float32)  # original (leaf-order) ids
    rows9[10, :t] = (n64 * v064).sum(axis=1)         # d_p
    rows9[11, :t] = -(U * v064).sum(axis=1)          # Uo
    rows9[12, :t] = -(V * v064).sum(axis=1)          # Vo
    # [ROWS, NT, TILE] -> [NT, ROWS, TILE]; ascontiguousarray materializes
    # (assignment into a reshape of a transposed view is silently lost)
    tri = np.ascontiguousarray(
        rows9.reshape(ROWS, nt, TILE).transpose(1, 0, 2)
    )

    v1 = v0 + e1
    v2 = v0 + e2
    lo_t = np.minimum(np.minimum(v0, v1), v2).astype(np.float32)
    hi_t = np.maximum(np.maximum(v0, v1), v2).astype(np.float32)
    lo_p = np.full((tpad, 3), np.inf, np.float32)
    hi_p = np.full((tpad, 3), -np.inf, np.float32)
    lo_p[:t] = lo_t
    hi_p[:t] = hi_t
    mn = lo_p.reshape(nslot, slot_tris, 3).min(axis=1)
    mx = hi_p.reshape(nslot, slot_tris, 3).max(axis=1)
    thin = (mx - mn) < 1e-4
    mn = np.where(thin, mn - 1e-4, mn)
    mx = np.where(thin, mx + 1e-4, mx)
    mn = np.where(np.isfinite(mn), mn, BIG)
    mx = np.where(np.isfinite(mx), mx, -BIG)
    tilebox = np.concatenate(
        [mn.reshape(s, SEG_TILES, 3), mx.reshape(s, SEG_TILES, 3)], axis=2
    ).transpose(0, 2, 1)  # [S, 6, SEG_TILES]
    return tri, np.ascontiguousarray(tilebox), s


# -----------------------------------------------------------------------------
# XLA cull: group + block frustums -> per-block segment lists & local rays
# -----------------------------------------------------------------------------

def _block_frustums(w2l, root_lo, root_hi, o, d, t_max, t_min, n_blocks):
    """Per-(block, instance) frustums over only the rays that can reach
    that instance (local-space root-box slab test per ray — one escaping
    ray must not inflate a block's frustum to the scene).

    The finer per-GROUP frustums are rebuilt *inside* the kernel from
    the raw ray block (materializing them here costs ~0.5 GB of HBM
    traffic per 2M rays — measured 3x slowdown).
    """
    i_n = w2l.shape[0]
    live = t_max > 0.0
    big = jnp.float32(BIG)
    oc = [o.x, o.y, o.z]
    dc = [d.x, d.y, d.z]

    outs = []
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
        outs.append((o_lo, o_hi, d_lo, d_hi, near, far))

    o_lo, o_hi, d_lo, d_hi = (
        jnp.stack([p[k] for p in outs], axis=1) for k in range(4)
    )                                       # [B, I, 3]
    near = jnp.stack([p[4] for p in outs], axis=1)  # [B, I]
    far = jnp.stack([p[5] for p in outs], axis=1)
    present = far >= near
    bounded = (d_lo > 1e-12) | (d_hi < -1e-12)
    sa = 1.0 / jnp.where(bounded, d_lo, 1.0)
    sb = 1.0 / jnp.where(bounded, d_hi, 1.0)
    gmin = jnp.minimum(sa, sb)
    gmax = jnp.maximum(sa, sb)
    return (o_lo, o_hi, gmin, gmax, bounded, near, far, present)


def _frustum_vs_tiles(blk, tilebox):
    """[n_blocks, I, S, SEG_TILES] conservative block-level hit mask
    (tilebox [S, 6, SEG_TILES])."""
    o_lo, o_hi, gmin, gmax, bounded, near0, far0, present = blk
    shape = o_lo.shape[:2] + (tilebox.shape[0], SEG_TILES)
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
    """XLA-side cull.  Returns (segs [B, S], tilemask [B, S*I], nseg [B],
    instmask [B]).

    ``segs`` tail entries repeat the last survivor; ``tilemask`` is
    indexed [b, seg * I + inst] with seg the REAL segment id."""
    r = o.x.shape[0]
    n_blocks = r // BLOCK
    i_n = w2l.shape[0]
    s = tilebox.shape[0]
    blk = _block_frustums(
        w2l, root_lo, root_hi, o, d, t_max, t_min, n_blocks
    )
    hit = _frustum_vs_tiles(blk, tilebox)              # [B, I, S, T]
    tbits = jnp.arange(SEG_TILES, dtype=jnp.int32)[None, None, None, :]
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

def _sweep_tile(tri_ref, tid, o_l, d_l, t_cap, best_t, best_id, ii,
                *, t_min, any_hit):
    """Baldwin-Weber intersection: one 128-tri tile (tris on lanes)
    against rays broadcast per sublane.  o_l/d_l: 3 x [GROUP or 8, 128]
    (lane-const per sublane); best_t/best_id: running [_, 128] per-lane
    bests.  Per-tri rows carry the precomputed plane (n, d_p) and the
    barycentric affine transform (U, Uo, V, Vo) — see
    build_stream_tables — cutting the sweep from ~61 to ~37 vector ops
    (it is VPU-issue-bound, scripts/stream_micro.py).  Accept region is
    identical to Moller-Trumbore: u >= 0, v >= 0, u + v <= 1."""
    tile = tri_ref[tid]                      # [ROWS, TILE] dynamic dim-0
    nr = [tile[c:c + 1, :] for c in range(3)]
    U = [tile[3 + c:4 + c, :] for c in range(3)]
    V = [tile[6 + c:7 + c, :] for c in range(3)]
    d_p = tile[10:11, :]
    Uo = tile[11:12, :]
    Vo = tile[12:13, :]
    den = nr[0] * d_l[0] + nr[1] * d_l[1] + nr[2] * d_l[2]
    num = d_p - (nr[0] * o_l[0] + nr[1] * o_l[1] + nr[2] * o_l[2])
    parallel = jnp.abs(den) < 1e-12
    tc = num / jnp.where(parallel, 1.0, den)
    px = o_l[0] + tc * d_l[0]
    py = o_l[1] + tc * d_l[1]
    pz = o_l[2] + tc * d_l[2]
    u = U[0] * px + U[1] * py + U[2] * pz + Uo
    v = V[0] * px + V[1] * py + V[2] * pz + Vo
    ok = (~parallel & (u >= 0.0)
          & (v >= 0.0) & (u + v <= 1.0)
          & (tc >= t_min) & (tc < t_cap) & (tc < best_t))
    # Row 9 carries the triangle's original (leaf-order) id as f32 —
    # tiles are re-clustered by aligned_stream_order, but winners must
    # report ids in the order records/replay/oracle use.
    oid = jnp.broadcast_to(tile[9:10, :], best_t.shape).astype(jnp.int32)
    pid = (oid << 5) | ii
    if any_hit:
        new_t = jnp.where(ok, 0.0, best_t)
    else:
        new_t = jnp.where(ok, tc, best_t)
    new_id = jnp.where(ok, pid, best_id)
    return new_t, new_id


def _kernel(nseg_ref, segs_ref, tilemask_ref, instmask_ref,
            w2l_ref, rootb_ref, segb_ref, tileb_ref, tri_ref, rays_ref,
            t_out, id_out,
            lr_scr, gw, gw_s, tl_s, sems,
            *, t_min, n_inst, any_hit, tps=1, skip_b=False):
    imask = instmask_ref[0, 0, 0]
    nsegs = nseg_ref[0, 0, 0]
    big = jnp.float32(BIG)

    # ---- phase 0: per-instance local rays + per-ray root-box interval.
    # Rays arrive [8, GROUP, N_GROUPS]: member on sublanes, group on
    # lanes — so an axis-0 reduce IS the per-group fold.  lr_scr rows:
    # 0-2 local origin, 3-5 local dir, 6-8 1/dir (signed-eps safe),
    # 9 per-ray segment entry into the instance root box, 10 exit
    # (already clipped by t_cap, so dead lanes have exit < entry).
    ox = rays_ref[0, 0]          # [GROUP, LANES]
    oy = rays_ref[0, 1]
    oz = rays_ref[0, 2]
    dx = rays_ref[0, 3]
    dy = rays_ref[0, 4]
    dz = rays_ref[0, 5]
    t_cap = rays_ref[0, 6]
    for ii in range(n_inst):
        @pl.when((jax.lax.shift_right_logical(imask, ii) & 1) == 1)
        def _(ii=ii):
            t_en = jnp.full((GROUP, LANES), t_min, jnp.float32)
            t_ex = jnp.minimum(t_cap, big)
            for i in range(3):
                m0 = w2l_ref[ii, i * 4 + 0]
                m1 = w2l_ref[ii, i * 4 + 1]
                m2 = w2l_ref[ii, i * 4 + 2]
                m3 = w2l_ref[ii, i * 4 + 3]
                ol = m0 * ox + m1 * oy + m2 * oz + m3
                dl = m0 * dx + m1 * dy + m2 * dz
                lr_scr[ii, i] = ol
                lr_scr[ii, 3 + i] = dl
                inv = 1.0 / jnp.where(jnp.abs(dl) < 1e-12,
                                      jnp.where(dl < 0, -1e-12, 1e-12),
                                      dl)
                lr_scr[ii, 6 + i] = inv
                ta = (rootb_ref[i] - ol) * inv
                tb = (rootb_ref[3 + i] - ol) * inv
                t_en = jnp.maximum(t_en, jnp.minimum(ta, tb))
                t_ex = jnp.minimum(t_ex, jnp.maximum(ta, tb))
            lr_scr[ii, 9] = t_en
            lr_scr[ii, 10] = t_ex

    # ---- phases A+B, INTERLEAVED PER INSTANCE (v7).  v6 ran phase A
    # for every instance, then phase B for every instance; v7 processes
    # one instance end-to-end and clips the NEXT instance's slab exits by
    # the running per-member best t:
    #
    #     far_eff(member) = min(root_exit, t_cap, acc_t(member))
    #
    # A slot can only improve a member's hit if its entry is below that
    # member's current best, so the clip is EXACT, per-member, and pure
    # vector algebra — no scalar reduces in any loop condition (an
    # "all 8 members occluded" scalar-reduce exit measured 22% slower
    # end-to-end; this formulation gets cross-instance termination for
    # free).  Effects: groups resolved in an earlier instance set no
    # bits in later instances (phase-B sweeps skipped via the existing
    # summary==0 gate), and in any-hit mode a hit member's acc_t of 0
    # fails every later slab — whole shadow groups go dark.  Rays are
    # instance-sorted, so most of a block's rays resolve in one
    # instance and later instances' sweeps vanish.
    #
    # Phase A for instance ii: dense tile slot list (tl_s, instance-
    # local slots) + per-group bit matrix.  Row w of gw holds slot word
    # w across the 128 groups; row W_WORDS is the per-group summary
    # (bit w set iff word w has any bit) — phase B skips empty
    # words/groups on one scalar read.
    acc_t = jnp.full((GROUP, LANES), BIG, jnp.float32)
    acc_id = jnp.full((GROUP, LANES), -1, jnp.int32)

    for ii in range(n_inst):
        def inst_all(carry, ii=ii):
            acc_t, acc_id = carry
            for iw in range(W_WORDS + 1):
                gw[iw, :, :] = jnp.zeros((1, LANES), jnp.int32)

            near0 = lr_scr[ii, 9]
            # cross-instance termination: clip by the running bests
            far0 = jnp.minimum(lr_scr[ii, 10], acc_t)
            slab_rows = [(lr_scr[ii, i], lr_scr[ii, 6 + i])
                         for i in range(3)]

            def seg_body(j, nt):
                seg = segs_ref[0, 0, j]
                tm0 = tilemask_ref[0, 0, seg * n_inst + ii]

                # HIERARCHICAL GATE: one per-ray [8,128] slab over the
                # whole SEGMENT's AABB (union of its SEG_TILES slot
                # boxes) before the up-to-16 per-slot tests.  The XLA
                # block frustum is nearly useless on incoherent bounce
                # rays (direction spread unbounds it — measured: phase A
                # tested ~40% of ALL (instance, slot) pairs per block),
                # while the per-ray segment test kills most segments
                # outright.  Skipped segments allocate no slots: nt is a
                # pure within-block counter, and gw/tl_s stay consistent
                # because both are written under the same allocation.
                s_near = near0
                s_far = far0
                for i in range(3):
                    ol, inv = slab_rows[i]
                    ta = (segb_ref[i, seg] - ol) * inv
                    tb = (segb_ref[3 + i, seg] - ol) * inv
                    s_near = jnp.maximum(s_near, jnp.minimum(ta, tb))
                    s_far = jnp.minimum(s_far, jnp.maximum(ta, tb))
                seg_live = jnp.any(s_far >= s_near)

                def slab(tid):
                    # EXACT per-ray slab test ([8, 128]: member x group)
                    # — a group frustum over 8 compaction-scattered rays
                    # covers ~8x more tiles than the union of its rays
                    # (measured 242 vs ~30 tiles/group on bounce-1
                    # rays); per-ray costs the same vreg ops, and the
                    # axis-0 fold gives the minimal per-group mask for
                    # 8-ray sweeps.
                    near = near0
                    farv = far0
                    for i in range(3):
                        b_lo = tileb_ref[i, tid]
                        b_hi = tileb_ref[3 + i, tid]
                        ol, inv = slab_rows[i]
                        ta = (b_lo - ol) * inv
                        tb = (b_hi - ol) * inv
                        near = jnp.maximum(near, jnp.minimum(ta, tb))
                        farv = jnp.minimum(farv, jnp.maximum(ta, tb))
                    return jnp.any(farv >= near, axis=0, keepdims=True
                                   ).astype(jnp.int32)     # [1, LANES]

                def bit_body(c):
                    # TWO slots per iteration (independent slab chains
                    # the scheduler interleaves — same latency-hiding
                    # trick as phase B's paired sweeps); the second
                    # slot's bookkeeping is predicated on has2.
                    tm, nt = c
                    nz1 = tm & (-tm)
                    k1 = 31 - jax.lax.clz(nz1)
                    t1 = tm & (tm - 1)
                    has2 = t1 != 0
                    nz2 = t1 & (-t1)
                    k2 = jnp.where(has2, 31 - jax.lax.clz(nz2 | nz1), k1)
                    tm_next = jnp.where(has2, t1 & (t1 - 1), t1)
                    tid1 = seg * SEG_TILES + k1
                    tid2 = seg * SEG_TILES + k2
                    hit1 = slab(tid1)
                    hit2 = slab(tid2)

                    @pl.when(nt < MAXT_INST)
                    def _():
                        w = nt // 32
                        bit = nt - w * 32
                        gw[w, :, :] = gw[w, :, :] | (hit1 << bit)
                        gw[W_WORDS, :, :] = gw[W_WORDS, :, :] | (hit1 << w)
                        tl_s[jax.lax.shift_right_logical(nt, 7),
                             nt & 127] = tid1

                    n2 = nt + 1
                    @pl.when(has2 & (n2 < MAXT_INST))
                    def _():
                        w = n2 // 32
                        bit = n2 - w * 32
                        gw[w, :, :] = gw[w, :, :] | (hit2 << bit)
                        gw[W_WORDS, :, :] = gw[W_WORDS, :, :] | (hit2 << w)
                        tl_s[jax.lax.shift_right_logical(n2, 7),
                             n2 & 127] = tid2
                    return (tm_next, jnp.where(has2, nt + 2, nt + 1))

                return jax.lax.cond(
                    seg_live,
                    lambda nt: jax.lax.while_loop(
                        lambda c: c[0] != 0, bit_body, (tm0, nt))[1],
                    lambda nt: nt,
                    nt,
                )

            jax.lax.fori_loop(0, nsegs, seg_body, jnp.int32(0))

            if skip_b:  # phase-timing debug mode: no sweeps
                return (acc_t + gw[0, :, :].astype(jnp.float32) * 0.0,
                        acc_id)

            # ---- phase B for this instance: group-inner refined
            # sweeps.  The instance loop is static, so the group's 8
            # local rays come from an INCREMENTAL static roll (shift -1
            # per group step, carried in registers) instead of 7 dynamic
            # rolls per slot — the dynamic rolls were ~55% of the
            # per-sweep cost (scripts/stream_micro.py).
            cp = pltpu.make_async_copy(gw, gw_s, sems.at[0])
            cp.start()
            cp.wait()
            rows0 = tuple(lr_scr[ii, c] for c in range(6)) + (t_cap,)

            def group_body(g, carry):
                acc_t, acc_id, rows = carry
                summary = gw_s[W_WORDS, 0, g]

                def do(c):
                    acc_t, acc_id = c
                    bc = [jnp.broadcast_to(r[:, 0:1], (GROUP, LANES))
                          for r in rows]
                    o_l, d_l, g_cap = bc[0:3], bc[3:6], bc[6]

                    # TWO independent accumulator pairs: a single sweep
                    # is a serial ~37-op dependency chain (t -> p ->
                    # u,v -> select), so per-sweep time is VPU-LATENCY
                    # bound, not issue bound (Baldwin-Weber's 61 -> 37
                    # op cut measured ~0 end-to-end).  Each bit-loop
                    # iteration therefore sweeps TWO slots with disjoint
                    # accumulators — two independent chains the
                    # scheduler interleaves.  When only one bit remains
                    # the second sweep re-tests the same tile into acc2:
                    # idempotent-by-merge (same hits, min-merged below;
                    # strict tc < best_t keeps per-acc tie order).
                    bt1 = jnp.full((GROUP, LANES), BIG, jnp.float32)
                    bi1 = jnp.full((GROUP, LANES), -1, jnp.int32)
                    bt2 = jnp.full((GROUP, LANES), BIG, jnp.float32)
                    bi2 = jnp.full((GROUP, LANES), -1, jnp.int32)

                    def word_body(c):
                        summ, bt1, bi1, bt2, bi2 = c
                        nzw = summ & (-summ)
                        w_idx = 31 - jax.lax.clz(nzw)

                        def bit_body(c):
                            word, bt1, bi1, bt2, bi2 = c
                            nz1 = word & (-word)
                            b1 = 31 - jax.lax.clz(nz1)
                            w1 = word & (word - 1)
                            has2 = w1 != 0
                            nz2 = w1 & (-w1)
                            b2 = jnp.where(
                                has2,
                                31 - jax.lax.clz(nz2 | nz1), b1)
                            w2 = jnp.where(has2, w1 & (w1 - 1), w1)
                            s1 = w_idx * 32 + b1
                            s2 = w_idx * 32 + b2
                            sid1 = tl_s[
                                jax.lax.shift_right_logical(s1, 7),
                                s1 & 127]
                            sid2 = tl_s[
                                jax.lax.shift_right_logical(s2, 7),
                                s2 & 127]
                            # a cull slot covers tps adjacent tiles
                            for dt in range(tps):
                                bt1, bi1 = _sweep_tile(
                                    tri_ref, sid1 * tps + dt, o_l, d_l,
                                    g_cap, bt1, bi1, ii,
                                    t_min=t_min, any_hit=any_hit,
                                )
                                bt2, bi2 = _sweep_tile(
                                    tri_ref, sid2 * tps + dt, o_l, d_l,
                                    g_cap, bt2, bi2, ii,
                                    t_min=t_min, any_hit=any_hit,
                                )
                            return (w2, bt1, bi1, bt2, bi2)

                        w0 = gw_s[w_idx, 0, g]
                        _, bt1, bi1, bt2, bi2 = jax.lax.while_loop(
                            lambda c: c[0] != 0, bit_body,
                            (w0, bt1, bi1, bt2, bi2),
                        )
                        return (summ & (summ - 1), bt1, bi1, bt2, bi2)

                    _, bt1, bi1, bt2, bi2 = jax.lax.while_loop(
                        lambda c: c[0] != 0, word_body,
                        (summary, bt1, bi1, bt2, bi2),
                    )
                    # merge the two chains (acc1 wins ties: it held the
                    # lower bit, i.e. the serial order's first visit)
                    best_id = jnp.where(bt2 < bt1, bi2, bi1)
                    best_t = jnp.minimum(bt1, bt2)

                    # lane-reduce the group's bests, merge into block acc
                    t_min_l = jnp.min(best_t, axis=1, keepdims=True)
                    id_min = jnp.where(
                        best_t <= t_min_l, best_id, jnp.int32(0x7FFFFFFF)
                    )
                    id_l = jnp.min(id_min, axis=1, keepdims=True)
                    li = jax.lax.broadcasted_iota(
                        jnp.int32, (GROUP, LANES), 1)
                    tb = jnp.broadcast_to(t_min_l, (GROUP, LANES))
                    ib = jnp.broadcast_to(id_l, (GROUP, LANES))
                    upd = (li == g) & (tb < acc_t)
                    return (jnp.where(upd, tb, acc_t),
                            jnp.where(upd, ib, acc_id))

                acc_t, acc_id = jax.lax.cond(
                    summary != 0, do, lambda c: c, (acc_t, acc_id)
                )
                rows = tuple(pltpu.roll(r, shift=LANES - 1, axis=1)
                             for r in rows)
                return acc_t, acc_id, rows

            acc_t, acc_id, _ = jax.lax.fori_loop(
                0, N_GROUPS, group_body, (acc_t, acc_id, rows0)
            )
            return acc_t, acc_id

        acc_t, acc_id = jax.lax.cond(
            (jax.lax.shift_right_logical(imask, ii) & 1) == 1,
            inst_all,
            lambda c: c,
            (acc_t, acc_id),
        )

    t_out[0] = acc_t
    id_out[0] = acc_id


@functools.partial(jax.jit, static_argnames=(
    "t_min", "n_inst", "any_hit", "skip_b"))
def _call(w2l, root_lo, root_hi, tilebox, tri_tiles, o, d, t_max, *,
          t_min, n_inst, any_hit=False, skip_b=False):
    # tiles per cull slot, from the build's padding invariant
    tps = tri_tiles.shape[0] // (tilebox.shape[0] * SEG_TILES)
    from ..core.vec3 import V3

    if isinstance(o, V3):
        oc = [o.x, o.y, o.z]
        dc = [d.x, d.y, d.z]
    else:
        oc = [o[:, 0], o[:, 1], o[:, 2]]
        dc = [d[:, 0], d[:, 1], d[:, 2]]
    r = oc[0].shape[0]
    padded = -(-r // BLOCK) * BLOCK

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

    n_blocks = padded // BLOCK
    s = tilebox.shape[0]
    # per-slot boxes for the in-kernel refine, [6, NSLOT]: SMEM arrays get
    # an (8, 128)-tiled layout, so the big axis must be LAST (a [NT, 6]
    # layout lane-pads 6 -> 128: 450 KB of the 1 MB SMEM for nothing).
    tileb_flat = tilebox.transpose(1, 0, 2).reshape(6, s * SEG_TILES)
    # per-SEGMENT boxes (union of the segment's slots) for phase A's
    # hierarchical gate; padding slots are +BIG/-BIG so they vanish.
    segb = jnp.concatenate(
        [jnp.min(tilebox[:, 0:3, :], axis=2),
         jnp.max(tilebox[:, 3:6, :], axis=2)], axis=1,
    ).T                                                  # [6, S]

    # Exact host-side overflow count: per-(block, instance) slots beyond
    # MAXT_INST are dropped by the kernel (hits can be missed) —
    # surface it, never silent.
    tiles_bi = jnp.sum(
        jax.lax.population_count(
            tilemask.reshape(tilemask.shape[0], -1, n_inst)
        ),
        axis=1,
    )                                                   # [B, I]
    overflow = jnp.sum(
        jnp.maximum(tiles_bi - MAXT_INST, 0)
    ).astype(jnp.int32)

    # Rays enter the kernel [7, GROUP, N_GROUPS]: member on sublanes,
    # group on lanes (r = b*BLOCK + g*GROUP + m), so axis-0 reduces give
    # per-group frustums directly.
    rays = jnp.stack(
        [a.reshape(n_blocks, N_GROUPS, GROUP).transpose(0, 2, 1)
         for a in oc + dc + [t_cap]],
        axis=1,
    )                                                   # [B, 7, GROUP, 128]
    rootb = jnp.concatenate([root_lo, root_hi]).astype(jnp.float32)
    w2l_flat = w2l.reshape(n_inst, 12)     # [I, 12]: SMEM lane-packing

    grid = (n_blocks,)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    vmem_full = pl.BlockSpec(memory_space=pltpu.VMEM)

    def blk_smem(w):
        # [B, 1, w] with (1, 1, w) blocks: Mosaic requires the last two
        # block dims be (8, 128)-divisible OR equal the array dims.
        return pl.BlockSpec((1, 1, w), lambda i: (i, 0, 0),
                            memory_space=pltpu.SMEM)

    ray_spec = pl.BlockSpec((1, 7, GROUP, LANES), lambda i: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, GROUP, LANES), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    t, pid = pl.pallas_call(
        functools.partial(_kernel, t_min=np.float32(t_min), n_inst=n_inst,
                          any_hit=any_hit, tps=tps, skip_b=skip_b),
        grid=grid,
        in_specs=[
            blk_smem(1),            # nseg
            blk_smem(s),            # segs
            blk_smem(s * n_inst),   # tilemask
            blk_smem(1),            # instmask
            smem,                   # w2l [n_inst, 12]
            smem,                   # rootb [6]
            smem,                   # segb [6, S]
            smem,                   # tileb_flat [6, NT]
            vmem_full,              # tri_tiles [NT, ROWS, TILE]
            ray_spec,               # rays
        ],
        out_specs=[out_spec, out_spec],
        out_shape=[
            jax.ShapeDtypeStruct((n_blocks, GROUP, LANES), jnp.float32),
            jax.ShapeDtypeStruct((n_blocks, GROUP, LANES), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((n_inst, 11, GROUP, LANES), jnp.float32),  # lr_scr
            pltpu.VMEM((W_WORDS + 1, 1, LANES), jnp.int32),       # gw
            pltpu.SMEM((W_WORDS + 1, 1, LANES), jnp.int32),       # gw_s
            pltpu.SMEM((-(-MAXT_INST // 128), 128), jnp.int32),   # tl_s
            pltpu.SemaphoreType.DMA((1,)),
        ],
        # The whole tri-tile table is VMEM-resident (MAX_STREAM_TRIS = 48
        # MB); the default 16 MB scoped-vmem limit rejects >~250K tris.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20,
        ),
        interpret=INTERPRET,
    )(
        nseg.reshape(-1, 1, 1), segs.reshape(-1, 1, s),
        tilemask.reshape(-1, 1, s * n_inst), instmask.reshape(-1, 1, 1),
        w2l_flat, rootb, segb, tileb_flat, tri_tiles, rays,
    )
    # [B, GROUP(m), 128(g)] -> ray-major: r = b*BLOCK + g*GROUP + m
    t = t.transpose(0, 2, 1).reshape(-1)[:r]
    pid = pid.transpose(0, 2, 1).reshape(-1)[:r]
    hit = pid >= 0
    tri = jax.lax.shift_right_logical(jnp.maximum(pid, 0), 5)
    inst = jnp.maximum(pid, 0) & 31
    return jnp.where(hit, t, BIG), tri, inst, hit, overflow


def intersect_mesh_stream(proto, o, d, t_min, t_max, any_hit=False):
    """Drop-in mesh closest hit for large prototypes (requires proto
    built with stream tables).  Returns (t, tri, inst, hit, overflow);
    with any_hit=True only `hit` is meaningful.  ``overflow`` counts
    (block, tile) pairs dropped past the kernel's slot caps."""
    t, tri, inst, hit, overflow = _call(
        proto.inst_w2l, proto.root_bbox_min, proto.root_bbox_max,
        proto.s_tilebox, proto.s_tri, o, d, t_max,
        t_min=float(t_min), n_inst=proto.n_instances, any_hit=any_hit,
    )
    return t, tri, inst, hit, overflow


def stream_ok(proto) -> bool:
    import os

    if os.environ.get("GRT_NO_PALLAS") == "1":
        return False
    if getattr(proto, "s_n_seg", 0) == 0:
        return False
    if proto.n_instances > MAX_INSTANCES:
        return False
    if proto.tri_v0.shape[0] > MAX_STREAM_TRIS:
        return False
    return jax.default_backend() == "tpu" or INTERPRET
