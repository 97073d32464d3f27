"""Pallas mesh intersector: segment-bounded triangle sweep.

The XLA frontier traversal (geometry/mesh_bvh.intersect_mesh) is correct
but gather-bound: every frontier step gathers node boxes / leaf triangles
at ~8 ns per element, which made CornellBoxLucy ~0.003 Mcamera-rays/s.

This kernel is the TPU-native alternative for prototypes up to ~64K
triangles: triangles stay in *leaf order* (spatially coherent contiguous
segments — the median-split BVH order), and the kernel sweeps them with
**segment bounding boxes + block-coherent early-outs**:

  for each instance:            cond-skip if no ray in block hits root
    for each coarse segment:    cond-skip if no ray hits segment bbox
      for each 128-tri tile:    cond-skip if no ray hits tile bbox
        for each 32-tri subtile:  cond-skip if no ray hits subtile bbox
          Moller-Trumbore sweep   triangle loop, (32,128)-ray tiles each

Because triangles are in median-split leaf order, every contiguous
segment IS a BVH node, so the segment boxes are exactly the implicit-BVH
node boxes — the cond ladder is a breadth-limited BVH walk.

``any_hit=True`` turns the sweep into a shadow/occlusion kernel: the
first accepted hit collapses that ray's ``t_best`` to 0, which makes
every later slab test fail for it (far <= 0 < near = t_min), so fully
occluded blocks skip all remaining instances/segments for free.

No pointers, no per-ray stacks, no gathers — the hierarchy is implicit in
segment bounds (like the implicit wide BVH, but consumed by predicated
sweeps instead of frontier gathers).  A grid step owns 4096 pixel-adjacent
rays as a (32,128) tile, so the early-outs prune like a per-block BVH walk
while every VPU op runs at full lane utilization; triangle constants
broadcast from SMEM scalars exactly like the primitive sweeps in
pallas_intersect.py.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = np.float32(3.0e38)
# 32 sublanes x 128 lanes = 4096 rays per grid step == four 32x32 pixel
# buckets of the renderer's tiled ray layout: block rays share a tight
# frustum (so the segment early-outs prune) while grid/cond overhead
# amortizes over 4x more rays than single-bucket blocks.
BLOCK_ROWS = 32          # (8-row blocks measured 2x slower: cond overhead)
LANES = 128
TILE = 128               # triangles per (cond-skippable) tile
SUB = 32                 # triangles per (cond-skippable) subtile
LEAF = 8                 # triangles per (cond-skippable) leaf = BVH leaf
COARSE = 16              # tiles per coarse segment (2048 triangles)
MAX_KERNEL_TRIS = 16384  # SMEM budget bound; above -> frontier traversal

# Flip for CPU correctness testing (pallas interpreter).
INTERPRET = False


def build_kernel_tables(v0, e1, e2):
    """Host-side (NumPy): sub/tile/coarse segment boxes + padded tri rows.

    Returns (ktri [9, Tpad] f32, leafbox [n_leaf,2,3], subtilebox
    [n_sub,2,3], tilebox [n_tiles,2,3], coarsebox [n_coarse,2,3],
    n_tiles, n_coarse).
    """
    v1 = v0 + e1
    v2 = v0 + e2
    lo = np.minimum(np.minimum(v0, v1), v2)
    hi = np.maximum(np.maximum(v0, v1), v2)

    def seg_boxes(seg):
        t = lo.shape[0]
        n_seg = -(-t // seg)
        pad = n_seg * seg - t
        lo_p = np.pad(lo, ((0, pad), (0, 0)), constant_values=np.inf)
        hi_p = np.pad(hi, ((0, pad), (0, 0)), constant_values=-np.inf)
        mn = lo_p.reshape(n_seg, seg, 3).min(axis=1)
        mx = hi_p.reshape(n_seg, seg, 3).max(axis=1)
        thin = (mx - mn) < 1e-4
        mn = np.where(thin, mn - 1e-4, mn)
        mx = np.where(thin, mx + 1e-4, mx)
        # empty (all-padding) segments: +/-inf never passes the slab test,
        # but keep them finite for SMEM friendliness
        mn = np.where(np.isfinite(mn), mn, 3e38)
        mx = np.where(np.isfinite(mx), mx, -3e38)
        return np.stack([mn, mx], axis=1)

    def pad_segs(boxes, want):
        if boxes.shape[0] < want:
            empty = np.zeros((want - boxes.shape[0], 2, 3), np.float32)
            empty[:, 0] = np.float32(3e38)
            empty[:, 1] = np.float32(-3e38)
            boxes = np.concatenate([boxes, empty], axis=0)
        return boxes

    leafbox = seg_boxes(LEAF)
    subtilebox = seg_boxes(SUB)
    tilebox = seg_boxes(TILE)
    coarsebox = seg_boxes(TILE * COARSE)
    n_coarse = coarsebox.shape[0]
    tilebox = pad_segs(tilebox, n_coarse * COARSE)
    n_tiles = tilebox.shape[0]
    subtilebox = pad_segs(subtilebox, n_tiles * (TILE // SUB))
    leafbox = pad_segs(leafbox, n_tiles * (TILE // LEAF))

    t_pad = n_tiles * TILE
    ktri = np.zeros((9, t_pad), np.float32)
    n = v0.shape[0]
    for c in range(3):
        ktri[c, :n] = v0[:, c]
        ktri[3 + c, :n] = e1[:, c]
        ktri[6 + c, :n] = e2[:, c]
    # zero-padded triangles are degenerate and never pass the MT tests
    return (
        ktri.astype(np.float32),
        leafbox.astype(np.float32),
        subtilebox.astype(np.float32),
        tilebox.astype(np.float32),
        coarsebox.astype(np.float32),
        n_tiles,
        n_coarse,
    )


def _kernel(n_inst_ref, w2l_ref, rootbox_ref, coarsebox_ref, tilebox_ref,
            subtilebox_ref, leafbox_ref, ktri_ref, ox, oy, oz, dx, dy, dz,
            tmax, t_out, tri_out, inst_out, *, t_min, n_coarse, any_hit):
    o_c = [ox[...], oy[...], oz[...]]       # (32, 128) each
    d_c = [dx[...], dy[...], dz[...]]
    t_best = tmax[...] * 1.0
    tri_best = jnp.full(t_best.shape, -1, jnp.int32)
    inst_best = jnp.full(t_best.shape, -1, jnp.int32)

    def instance_body(ii, carry):
        t_best, tri_best, inst_best = carry
        ol, dl, inv = [], [], []
        for i in range(3):
            m0 = w2l_ref[ii, i, 0]
            m1 = w2l_ref[ii, i, 1]
            m2 = w2l_ref[ii, i, 2]
            m3 = w2l_ref[ii, i, 3]
            oli = m0 * o_c[0] + m1 * o_c[1] + m2 * o_c[2] + m3
            dli = m0 * d_c[0] + m1 * d_c[1] + m2 * d_c[2]
            safe = jnp.where(jnp.abs(dli) < 1e-12,
                             jnp.where(dli < 0, -1e-12, 1e-12), dli)
            ol.append(oli)
            dl.append(dli)
            inv.append(1.0 / safe)

        def slab_any(box_ref, bi, t_cap):
            near = jnp.full_like(t_cap, t_min)
            far = t_cap * 1.0
            for i in range(3):
                ta = (box_ref[bi, 0, i] - ol[i]) * inv[i]
                tb = (box_ref[bi, 1, i] - ol[i]) * inv[i]
                near = jnp.maximum(near, jnp.minimum(ta, tb))
                far = jnp.minimum(far, jnp.maximum(ta, tb))
            return jnp.any(far > near)

        def do_instance(carry):
            def coarse_body(ci, carry):
                def do_coarse(carry):
                    def tile_body(k, carry):
                        ti = ci * COARSE + k

                        def do_tile(carry):
                            def sub_body(kk, carry):
                                si = ti * (TILE // SUB) + kk

                                def do_sub(carry):
                                    def leaf_body(ll, carry):
                                        li = si * (SUB // LEAF) + ll

                                        def do_leaf(carry):
                                            def tri_body(jj, carry):
                                                t_best, tri_best, inst_best = carry
                                                j = li * LEAF + jj
                                                v0 = [ktri_ref[c, j]
                                                      for c in range(3)]
                                                e1 = [ktri_ref[3 + c, j]
                                                      for c in range(3)]
                                                e2 = [ktri_ref[6 + c, j]
                                                      for c in range(3)]

                                                # Moller-Trumbore:
                                                # scalar tri x (32,128) rays
                                                hx = dl[1] * e2[2] - dl[2] * e2[1]
                                                hy = dl[2] * e2[0] - dl[0] * e2[2]
                                                hz = dl[0] * e2[1] - dl[1] * e2[0]
                                                a = (e1[0] * hx + e1[1] * hy
                                                     + e1[2] * hz)
                                                parallel = jnp.abs(a) < 1e-8
                                                f = 1.0 / jnp.where(parallel,
                                                                    1.0, a)
                                                sx = ol[0] - v0[0]
                                                sy = ol[1] - v0[1]
                                                sz = ol[2] - v0[2]
                                                u = f * (sx * hx + sy * hy
                                                         + sz * hz)
                                                qx = sy * e1[2] - sz * e1[1]
                                                qy = sz * e1[0] - sx * e1[2]
                                                qz = sx * e1[1] - sy * e1[0]
                                                v = f * (dl[0] * qx + dl[1] * qy
                                                         + dl[2] * qz)
                                                tc = f * (e2[0] * qx
                                                          + e2[1] * qy
                                                          + e2[2] * qz)
                                                ok = (~parallel & (u >= 0.0)
                                                      & (u <= 1.0) & (v >= 0.0)
                                                      & (u + v <= 1.0)
                                                      & (tc >= t_min)
                                                      & (tc < t_best))
                                                if any_hit:
                                                    # Collapse t: every later
                                                    # slab test fails for
                                                    # occluded rays.
                                                    t_best = jnp.where(
                                                        ok, 0.0, t_best)
                                                else:
                                                    t_best = jnp.where(
                                                        ok, tc, t_best)
                                                tri_best = jnp.where(
                                                    ok, j, tri_best)
                                                inst_best = jnp.where(
                                                    ok, ii, inst_best)
                                                return (t_best, tri_best,
                                                        inst_best)

                                            return jax.lax.fori_loop(
                                                0, LEAF, tri_body, carry)

                                        return jax.lax.cond(
                                            slab_any(leafbox_ref, li,
                                                     carry[0]),
                                            do_leaf, lambda c: c, carry,
                                        )

                                    return jax.lax.fori_loop(
                                        0, SUB // LEAF, leaf_body, carry)

                                return jax.lax.cond(
                                    slab_any(subtilebox_ref, si, carry[0]),
                                    do_sub, lambda c: c, carry,
                                )

                            return jax.lax.fori_loop(0, TILE // SUB, sub_body,
                                                     carry)

                        return jax.lax.cond(
                            slab_any(tilebox_ref, ti, carry[0]),
                            do_tile, lambda c: c, carry,
                        )

                    return jax.lax.fori_loop(0, COARSE, tile_body, carry)

                return jax.lax.cond(
                    slab_any(coarsebox_ref, ci, carry[0]),
                    do_coarse, lambda c: c, carry,
                )

            return jax.lax.fori_loop(0, n_coarse, coarse_body, carry)

        return jax.lax.cond(
            slab_any(rootbox_ref, ii, t_best),
            do_instance, lambda c: c, (t_best, tri_best, inst_best),
        )

    t_best, tri_best, inst_best = jax.lax.fori_loop(
        0, n_inst_ref[0], instance_body, (t_best, tri_best, inst_best)
    )
    t_out[...] = t_best
    tri_out[...] = tri_best
    inst_out[...] = inst_best


@functools.partial(jax.jit, static_argnames=("t_min", "n_coarse", "any_hit"))
def _call(w2l, rootbox, coarsebox, tilebox, subtilebox, leafbox, ktri,
          n_inst, o, d, t_max, *, t_min, n_coarse, any_hit=False):
    from ..core.vec3 import V3

    if isinstance(o, V3):
        oc = [o.x, o.y, o.z]
        dc = [d.x, d.y, d.z]
    else:
        oc = [o[:, 0], o[:, 1], o[:, 2]]
        dc = [d[:, 0], d[:, 1], d[:, 2]]
    r = oc[0].shape[0]
    block = BLOCK_ROWS * LANES
    padded = -(-r // block) * block
    rows = padded // LANES

    def prep(a, fill=0.0):
        if padded != r:
            a = jnp.pad(a, (0, padded - r), constant_values=fill)
        return a.reshape(rows, LANES)

    rays = [prep(a) for a in oc + dc] + [
        prep(jnp.where(t_max >= BIG, BIG, t_max), fill=-1.0)
    ]

    grid = (rows // BLOCK_ROWS,)
    ray_spec = pl.BlockSpec((BLOCK_ROWS, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    out_spec = pl.BlockSpec((BLOCK_ROWS, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    t, tri, inst = pl.pallas_call(
        functools.partial(_kernel, t_min=np.float32(t_min), n_coarse=n_coarse,
                          any_hit=any_hit),
        grid=grid,
        in_specs=[smem] * 8 + [ray_spec] * 7,
        out_specs=[out_spec, out_spec, out_spec],
        out_shape=[
            jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
            jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
            jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
        ],
        interpret=INTERPRET,
    )(
        jnp.asarray([n_inst], jnp.int32),
        w2l, rootbox, coarsebox, tilebox, subtilebox, leafbox, ktri, *rays,
    )
    t = t.reshape(-1)[:r]
    tri = tri.reshape(-1)[:r]
    inst = inst.reshape(-1)[:r]
    hit = tri >= 0
    return jnp.where(hit, t, BIG), jnp.maximum(tri, 0), jnp.maximum(inst, 0), hit


def intersect_mesh_kernel(proto, o, d, t_min, t_max, any_hit=False):
    """Drop-in replacement for mesh_bvh.intersect_mesh for small
    prototypes (requires proto built with kernel tables).
    Returns (t, tri, inst, hit, overflow=0).  With any_hit=True the
    returned t is meaningless for hit rays (shadow/occlusion mode);
    only `hit` should be consumed."""
    rootbox = jnp.broadcast_to(
        jnp.stack([proto.root_bbox_min, proto.root_bbox_max], axis=0)[None],
        (proto.n_instances, 2, 3),
    )
    t, tri, inst, hit = _call(
        proto.inst_w2l, rootbox, proto.k_coarsebox, proto.k_tilebox,
        proto.k_subtilebox, proto.k_leafbox, proto.k_tri,
        proto.n_instances, o, d, t_max,
        t_min=float(t_min), n_coarse=proto.k_n_coarse, any_hit=any_hit,
    )
    return t, tri, inst, hit, jnp.int32(0)


def kernel_ok(proto) -> bool:
    import os

    if os.environ.get("GRT_NO_PALLAS") == "1":
        return False
    if getattr(proto, "k_n_coarse", 0) == 0:
        return False
    n_tris = int(proto.tri_v0.shape[0])
    backend_ok = jax.default_backend() == "tpu" or INTERPRET
    return backend_ok and n_tris <= MAX_KERNEL_TRIS