"""Implicit wide BVH for triangle meshes + breadth-first TPU traversal.

The reference builds a pointer-based binary BVH with median splits on the
longest centroid axis and recursive traversal (rt/bvh.go:120-239).  Median
split (``mid = n/2``, rt/bvh.go:159) makes the tree *exactly balanced*, so
on TPU we make the hierarchy **implicit**: triangles are reordered by
level-by-level segment sorts (same topology as the reference build), and
the tree is stored as dense per-level tables of child bounding boxes —
node (k, i) covers a contiguous triangle segment whose 8 children at level
k+1 are its arithmetic sub-segments.  No pointers anywhere.

Traversal is breadth-first over a (ray, instance, node) *frontier* with
stream compaction between levels — the wavefront analogue of "stackless
traversal": each level gathers the 8 child AABBs per frontier pair, slab
tests them as one vectorized batch, and compacts the surviving pairs.  The
final level intersects each pair's <= LEAF_SIZE contiguous triangles with
Moller-Trumbore and scatter-mins the results per ray.  All shapes are
static; capacity overflows are counted and surfaced (never silent).

Instancing follows rt/transform.go + rt/scenes.go:770-801: instances share
one triangle prototype and carry world->local affines; rays are
transformed into local space (t values are preserved by affine maps) and
hit normals are mapped back by the inverse-transpose.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import List, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..core import vec

BRANCH = 8          # children per wide node (3 binary median splits)
# Max triangles per leaf segment.  Small leaves trade one more (cheap,
# [P,8]) level of box tests for 4x less leaf-phase gather volume — XLA
# gathers cost ~8 ns/element on TPU, so leaf fetch volume dominates.
LEAF_SIZE = 8
BIG = np.float32(3.0e38)  # numpy, not jnp: module import must not init the XLA backend (jax.distributed.initialize comes first on pods)


# -----------------------------------------------------------------------------
# Host-side build
# -----------------------------------------------------------------------------

@dataclass(frozen=True)
class MeshProto:
    """One triangle prototype (BLAS) with its implicit wide BVH and the
    instance table referencing it."""

    # Leaf-ordered triangle data (local space)
    tri_v0: jnp.ndarray       # [T, 3]
    tri_e1: jnp.ndarray       # [T, 3]
    tri_e2: jnp.ndarray       # [T, 3]
    # Per-level child boxes: level k has 8^k parent nodes x BRANCH children
    level_bbox_min: Tuple[jnp.ndarray, ...]  # each [8^k, BRANCH, 3]
    level_bbox_max: Tuple[jnp.ndarray, ...]
    leaf_start: jnp.ndarray   # [n_leaves] i32 (leaves = segments at last level)
    leaf_count: jnp.ndarray   # [n_leaves] i32 (<= LEAF_SIZE)
    root_bbox_min: jnp.ndarray  # [3]
    root_bbox_max: jnp.ndarray  # [3]
    # Instances
    inst_w2l: jnp.ndarray     # [I, 3, 4] world -> local affine
    inst_nmat: jnp.ndarray    # [I, 3, 3] normal transform (inv-transpose)
    inst_mat: jnp.ndarray     # [I] i32 material id
    # World-space AABB of all instances (origin-cell grid for ray sorting)
    world_bbox_min: jnp.ndarray  # [3]
    world_bbox_max: jnp.ndarray  # [3]
    # Pallas segment-sweep kernel tables (ops/pallas_mesh.py; small meshes)
    k_tri: jnp.ndarray        # [9, Tpad] padded v0/e1/e2 component rows
    k_leafbox: jnp.ndarray    # [n_leaf, 2, 3]
    k_subtilebox: jnp.ndarray  # [n_sub, 2, 3]
    k_tilebox: jnp.ndarray    # [n_tiles, 2, 3]
    k_coarsebox: jnp.ndarray  # [n_coarse, 2, 3]
    # Pallas leaf-stream tables (ops/pallas_mesh_stream.py; large meshes)
    s_tri: jnp.ndarray        # [NT, ROWS, TILE] tile-major tri rows
    s_tilebox: jnp.ndarray    # [S, 6, SEG_TILES] 128-tri tile AABBs
    # static
    depth: int = field(default=0, metadata=dict(static=True))
    k_n_tiles: int = field(default=0, metadata=dict(static=True))
    k_n_coarse: int = field(default=0, metadata=dict(static=True))
    s_n_seg: int = field(default=0, metadata=dict(static=True))

    @property
    def n_instances(self) -> int:
        return int(self.inst_mat.shape[0])

    @property
    def n_leaves(self) -> int:
        return int(self.leaf_start.shape[0])


jax.tree_util.register_dataclass(
    MeshProto,
    data_fields=[
        "tri_v0", "tri_e1", "tri_e2", "level_bbox_min", "level_bbox_max",
        "leaf_start", "leaf_count", "root_bbox_min", "root_bbox_max",
        "inst_w2l", "inst_nmat", "inst_mat",
        "world_bbox_min", "world_bbox_max",
        "k_tri", "k_leafbox", "k_subtilebox", "k_tilebox", "k_coarsebox",
        "s_tri", "s_tilebox",
    ],
    meta_fields=["depth", "k_n_tiles", "k_n_coarse", "s_n_seg"],
)


def build_proto(verts: np.ndarray, tris: np.ndarray, instances) -> MeshProto:
    """Build the implicit wide BVH.

    verts [V,3] f64, tris [T,3] int, instances: list of (affine_4x4, mat_id)
    where affine maps local -> world.
    """
    v0 = verts[tris[:, 0]]
    v1 = verts[tris[:, 1]]
    v2 = verts[tris[:, 2]]
    n_tris = len(tris)

    # Max leaf size after 3*depth median splits is ceil(n / 2^(3*depth))
    # (repeated halving: ceil(ceil(n/2)/2) == ceil(n/4)); a floor here
    # under-sized depth for e.g. n=280496 (>>15 == 8, true max 9).
    depth = 0
    while -(-n_tris // (1 << (3 * depth))) > LEAF_SIZE:
        depth += 1

    lo = np.minimum(np.minimum(v0, v1), v2)
    hi = np.maximum(np.maximum(v0, v1), v2)
    centroid = (lo + hi) * 0.5

    # Level-by-level segment sorts on the longest centroid axis — the
    # vectorized equivalent of buildBVHNode's sort.Slice + LongestAxis
    # (rt/bvh.go:145-159).  Median splits keep segments arithmetic, so the
    # tree never needs explicit nodes.
    order = np.arange(n_tris)
    seg_starts = np.array([0, n_tris], np.int64)
    for _level in range(3 * depth):
        starts, ends = seg_starts[:-1], seg_starts[1:]
        counts = ends - starts
        seg_id = np.repeat(np.arange(len(starts)), counts)
        c = centroid[order]
        # per-segment centroid extents via reduceat (empty segments masked)
        nonempty = counts > 0
        red_idx = np.minimum(starts, n_tris - 1)
        cmin = np.minimum.reduceat(c, red_idx, axis=0)
        cmax = np.maximum.reduceat(c, red_idx, axis=0)
        ext = np.where(nonempty[:, None], cmax - cmin, 0.0)
        # LongestAxis tie-break (rt/aabb.go:139-150): x strictly greatest,
        # else y vs z
        axis = np.where(
            (ext[:, 0] > ext[:, 1]) & (ext[:, 0] > ext[:, 2]),
            0,
            np.where(ext[:, 1] > ext[:, 2], 1, 2),
        )
        key = c[np.arange(n_tris), axis[seg_id]]
        perm = np.lexsort((key, seg_id))
        order = order[perm]
        mids = starts + counts // 2
        nxt = np.empty(2 * len(starts) + 1, np.int64)
        nxt[0::2] = seg_starts
        nxt[1::2] = mids
        seg_starts = nxt

    v0, v1, v2 = v0[order], v1[order], v2[order]
    lo = np.minimum(np.minimum(v0, v1), v2)
    hi = np.maximum(np.maximum(v0, v1), v2)

    def seg_boxes(bounds):
        """AABBs of the segments delimited by ``bounds`` (empty -> inf/-inf)."""
        starts, ends = bounds[:-1], bounds[1:]
        nonempty = ends > starts
        red_idx = np.minimum(starts, max(n_tris - 1, 0))
        mn = np.minimum.reduceat(lo, red_idx, axis=0)
        mx = np.maximum.reduceat(hi, red_idx, axis=0)
        # reduceat reduces to the *next* boundary in red_idx order, which for
        # our monotone starts equals the segment; fix empties explicitly.
        mn = np.where(nonempty[:, None], mn, np.inf)
        mx = np.where(nonempty[:, None], mx, -np.inf)
        # padToMinimums (rt/aabb.go:117-128): expand degenerate axes so flat
        # geometry (axis-aligned triangles) still passes the slab test.
        thin = (mx - mn) < 1e-4
        mn = np.where(thin & nonempty[:, None], mn - 1e-4, mn)
        mx = np.where(thin & nonempty[:, None], mx + 1e-4, mx)
        return mn, mx

    level_bbox_min, level_bbox_max = [], []
    for k in range(depth):
        cb = _wide_bounds(n_tris, k + 1)
        mn, mx = seg_boxes(cb)
        parents = 8 ** k
        level_bbox_min.append(jnp.asarray(mn.reshape(parents, BRANCH, 3), jnp.float32))
        level_bbox_max.append(jnp.asarray(mx.reshape(parents, BRANCH, 3), jnp.float32))

    leaf_bounds = _wide_bounds(n_tris, depth)
    leaf_start = leaf_bounds[:-1].astype(np.int32)
    leaf_count = (leaf_bounds[1:] - leaf_bounds[:-1]).astype(np.int32)
    assert leaf_count.max(initial=0) <= LEAF_SIZE

    root_min = lo.min(axis=0)
    root_max = hi.max(axis=0)
    thin = (root_max - root_min) < 1e-4
    root_min = np.where(thin, root_min - 1e-4, root_min)
    root_max = np.where(thin, root_max + 1e-4, root_max)

    w2l = np.zeros((len(instances), 3, 4))
    nmat = np.zeros((len(instances), 3, 3))
    mats = np.zeros(len(instances), np.int32)
    corners = np.stack(np.meshgrid(
        [root_min[0], root_max[0]], [root_min[1], root_max[1]],
        [root_min[2], root_max[2]], indexing="ij",
    ), axis=-1).reshape(8, 3)
    wmin = np.full(3, np.inf)
    wmax = np.full(3, -np.inf)
    for i, (l2w, mat_id) in enumerate(instances):
        inv = np.linalg.inv(l2w)
        w2l[i] = inv[:3, :4]
        nmat[i] = np.linalg.inv(l2w[:3, :3]).T
        mats[i] = mat_id
        wc = corners @ l2w[:3, :3].T + l2w[:3, 3]
        wmin = np.minimum(wmin, wc.min(axis=0))
        wmax = np.maximum(wmax, wc.max(axis=0))
    if not np.all(np.isfinite(wmin)):
        wmin, wmax = np.zeros(3), np.ones(3)

    e1 = v1 - v0
    e2 = v2 - v0

    from ..ops import pallas_mesh, pallas_mesh_stream

    # One resident-kernel table set per size class: small prototypes fit
    # the whole mesh in SMEM (pallas_mesh); large ones get leaf-stream
    # segments DMA'd from HBM (pallas_mesh_stream).  Building only the
    # applicable set keeps big meshes from paying double table memory.
    if n_tris <= pallas_mesh.MAX_KERNEL_TRIS:
        (ktri, leafbox, subtilebox, tilebox, coarsebox, n_tiles,
         n_coarse) = pallas_mesh.build_kernel_tables(
            v0.astype(np.float32), e1.astype(np.float32), e2.astype(np.float32)
        )
        s_tri = np.zeros(
            (0, pallas_mesh_stream.ROWS, pallas_mesh_stream.TILE),
            np.float32,
        )
        s_tilebox = np.zeros(
            (0, 6, pallas_mesh_stream.SEG_TILES), np.float32
        )
        s_n_seg = 0
    else:
        ktri = np.zeros((9, 0), np.float32)
        leafbox = subtilebox = tilebox = coarsebox = np.zeros(
            (0, 2, 3), np.float32
        )
        n_tiles = n_coarse = 0
        s_tri, s_tilebox, s_n_seg = pallas_mesh_stream.build_stream_tables(
            v0.astype(np.float32), e1.astype(np.float32), e2.astype(np.float32)
        )
    return MeshProto(
        tri_v0=jnp.asarray(v0, jnp.float32),
        tri_e1=jnp.asarray(e1, jnp.float32),
        tri_e2=jnp.asarray(e2, jnp.float32),
        k_tri=jnp.asarray(ktri),
        k_leafbox=jnp.asarray(leafbox),
        k_subtilebox=jnp.asarray(subtilebox),
        k_tilebox=jnp.asarray(tilebox),
        k_coarsebox=jnp.asarray(coarsebox),
        k_n_tiles=n_tiles,
        k_n_coarse=n_coarse,
        s_tri=jnp.asarray(s_tri),
        s_tilebox=jnp.asarray(s_tilebox),
        s_n_seg=s_n_seg,
        level_bbox_min=tuple(level_bbox_min),
        level_bbox_max=tuple(level_bbox_max),
        leaf_start=jnp.asarray(leaf_start),
        leaf_count=jnp.asarray(leaf_count),
        root_bbox_min=jnp.asarray(root_min, jnp.float32),
        root_bbox_max=jnp.asarray(root_max, jnp.float32),
        inst_w2l=jnp.asarray(w2l, jnp.float32),
        inst_nmat=jnp.asarray(nmat, jnp.float32),
        inst_mat=jnp.asarray(mats),
        world_bbox_min=jnp.asarray(wmin, jnp.float32),
        world_bbox_max=jnp.asarray(wmax, jnp.float32),
        depth=depth,
    )


def _wide_bounds(n_tris: int, k: int) -> np.ndarray:
    """Segment boundary offsets of the 8^k wide segments at wide level k."""
    b = np.array([0, n_tris], np.int64)
    for _ in range(3 * k):
        starts, ends = b[:-1], b[1:]
        mids = starts + (ends - starts) // 2
        nxt = np.empty(2 * len(starts) + 1, np.int64)
        nxt[0::2] = b
        nxt[1::2] = mids
        b = nxt
    return b


# -----------------------------------------------------------------------------
# Device-side traversal
# -----------------------------------------------------------------------------

def _compact(valid, fields, cap):
    """Compact flat (valid-masked) arrays into fixed capacity ``cap``.
    Returns (compacted fields, n_valid, overflow)."""
    pos = jnp.cumsum(valid.astype(jnp.int32)) - 1
    n_valid = jnp.sum(valid.astype(jnp.int32))
    keep = valid & (pos < cap)
    slot = jnp.where(keep, pos, cap)  # cap -> dropped
    out = []
    for arr, fill in fields:
        buf = jnp.full((cap,), fill, arr.dtype)
        out.append(buf.at[slot].set(jnp.where(keep, arr, fill), mode="drop"))
    overflow = jnp.maximum(n_valid - cap, 0)
    return out, n_valid, overflow


def _slab(bmin, bmax, o, inv_d, t_min, t_max):
    """Vectorized AABB slab test (rt/aabb.go:59-116). Broadcasts over
    leading axes; o/inv_d are [..., 3]."""
    t0 = (bmin - o) * inv_d
    t1 = (bmax - o) * inv_d
    tn = jnp.minimum(t0, t1)
    tf = jnp.maximum(t0, t1)
    near = jnp.maximum(jnp.max(tn, axis=-1), t_min)
    far = jnp.minimum(jnp.min(tf, axis=-1), t_max)
    return far > near, near


def intersect_mesh(proto: MeshProto, o, d, t_min, t_max, *, cap_factor: int = 8):
    """Closest triangle hit over all instances of a prototype.

    o, d: [R, 3] world rays; t_max: [R] current closest-surface bound.
    Returns (t [R], tri [R] i32, inst [R] i32, hit [R], overflow scalar).

    All pair intermediates are *per-component* 2-D arrays ([P] or [P, B] /
    [P, L]) — never [..., 3]: the trailing-3 layout lane-pads 42x on TPU
    and at frontier scale (P*L can reach 10^8) that padded gather output
    alone would exceed HBM.
    """
    r_count = o.shape[0]
    n_inst = proto.n_instances
    f32 = o.dtype

    # Local-space rays per instance: 3 components of [I, R]
    m = proto.inst_w2l  # [I, 3, 4]
    oc = [o[:, 0], o[:, 1], o[:, 2]]
    dc = [d[:, 0], d[:, 1], d[:, 2]]
    o_l = []
    d_l = []
    inv_l = []
    for i in range(3):
        ol_i = (
            m[:, i, 0][:, None] * oc[0][None, :]
            + m[:, i, 1][:, None] * oc[1][None, :]
            + m[:, i, 2][:, None] * oc[2][None, :]
            + m[:, i, 3][:, None]
        )
        dl_i = (
            m[:, i, 0][:, None] * dc[0][None, :]
            + m[:, i, 1][:, None] * dc[1][None, :]
            + m[:, i, 2][:, None] * dc[2][None, :]
        )
        safe = jnp.where(jnp.abs(dl_i) < 1e-12, jnp.where(dl_i < 0, -1e-12, 1e-12), dl_i)
        o_l.append(ol_i)
        d_l.append(dl_i)
        inv_l.append(1.0 / safe)

    # Level 0 frontier: (ray, inst) pairs whose instance root box is hit
    near = jnp.full((n_inst, r_count), t_min, f32)
    far = jnp.broadcast_to(t_max[None, :], (n_inst, r_count))
    for i in range(3):
        ta = (proto.root_bbox_min[i] - o_l[i]) * inv_l[i]
        tb = (proto.root_bbox_max[i] - o_l[i]) * inv_l[i]
        near = jnp.maximum(near, jnp.minimum(ta, tb))
        far = jnp.minimum(far, jnp.maximum(ta, tb))
    hit_root = far > near

    ray0 = jnp.broadcast_to(jnp.arange(r_count, dtype=jnp.int32)[None, :], (n_inst, r_count)).reshape(-1)
    inst0 = jnp.broadcast_to(jnp.arange(n_inst, dtype=jnp.int32)[:, None], (n_inst, r_count)).reshape(-1)
    cap = int(r_count * cap_factor)
    (ray_f, inst_f, node_f), n_valid, overflow = _compact(
        hit_root.reshape(-1),
        [(ray0, jnp.int32(-1)), (inst0, jnp.int32(0)),
         (jnp.zeros_like(ray0), jnp.int32(0))],
        min(cap, n_inst * r_count),
    )
    total_overflow = overflow

    def pair_rays(ray_safe, inst_f):
        flat = inst_f * r_count + ray_safe
        op = [c.reshape(-1)[flat] for c in o_l]
        ip = [c.reshape(-1)[flat] for c in inv_l]
        dp = [c.reshape(-1)[flat] for c in d_l]
        return op, ip, dp

    # Internal levels
    for k in range(proto.depth):
        valid_f = ray_f >= 0
        ray_safe = jnp.maximum(ray_f, 0)
        op, ip, _ = pair_rays(ray_safe, inst_f)
        tmax_p = t_max[ray_safe][:, None]
        near = jnp.full(node_f.shape + (BRANCH,), t_min, f32)
        far = jnp.broadcast_to(tmax_p, node_f.shape + (BRANCH,))
        for i in range(3):
            bmin_i = proto.level_bbox_min[k][..., i][node_f]   # [P, B]
            bmax_i = proto.level_bbox_max[k][..., i][node_f]
            ta = (bmin_i - op[i][:, None]) * ip[i][:, None]
            tb = (bmax_i - op[i][:, None]) * ip[i][:, None]
            near = jnp.maximum(near, jnp.minimum(ta, tb))
            far = jnp.minimum(far, jnp.maximum(ta, tb))
        hits = (far > near) & valid_f[:, None]

        child_node = node_f[:, None] * BRANCH + jnp.arange(BRANCH, dtype=jnp.int32)[None, :]
        flat_valid = hits.reshape(-1)
        flat_ray = jnp.broadcast_to(ray_f[:, None], hits.shape).reshape(-1)
        flat_inst = jnp.broadcast_to(inst_f[:, None], hits.shape).reshape(-1)
        flat_node = child_node.reshape(-1)
        (ray_f, inst_f, node_f), n_valid, overflow = _compact(
            flat_valid,
            [(flat_ray, jnp.int32(-1)), (flat_inst, jnp.int32(0)),
             (flat_node, jnp.int32(0))],
            cap,
        )
        total_overflow = total_overflow + overflow

    # Leaf phase: node_f indexes a leaf segment
    valid_f = ray_f >= 0
    ray_safe = jnp.maximum(ray_f, 0)
    start = proto.leaf_start[node_f]                  # [P]
    count = proto.leaf_count[node_f]
    tri_idx = start[:, None] + jnp.arange(LEAF_SIZE, dtype=jnp.int32)[None, :]
    tri_ok = (jnp.arange(LEAF_SIZE, dtype=jnp.int32)[None, :] < count[:, None]) & valid_f[:, None]
    tri_idx = jnp.minimum(tri_idx, proto.tri_v0.shape[0] - 1)

    # Per-component triangle fetches: [P, L] each
    v0c = [proto.tri_v0[:, i][tri_idx] for i in range(3)]
    e1c = [proto.tri_e1[:, i][tri_idx] for i in range(3)]
    e2c = [proto.tri_e2[:, i][tri_idx] for i in range(3)]
    op, _, dp = pair_rays(ray_safe, inst_f)
    opc = [c[:, None] for c in op]
    dpc = [c[:, None] for c in dp]

    def cross(a, b):
        return [
            a[1] * b[2] - a[2] * b[1],
            a[2] * b[0] - a[0] * b[2],
            a[0] * b[1] - a[1] * b[0],
        ]

    def dot(a, b):
        return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]

    # Moller-Trumbore (rt/triangle.go:57-104)
    h = cross(dpc, e2c)
    a = dot(e1c, h)
    parallel = jnp.abs(a) < 1e-8
    f = 1.0 / jnp.where(parallel, 1.0, a)
    s = [opc[i] - v0c[i] for i in range(3)]
    u = f * dot(s, h)
    q = cross(s, e1c)
    v = f * dot(dpc, q)
    t_cand = f * dot(e2c, q)
    tmax_p = t_max[ray_safe][:, None]
    ok = (
        tri_ok & ~parallel
        & (u >= 0.0) & (u <= 1.0) & (v >= 0.0) & (u + v <= 1.0)
        & (t_cand >= t_min) & (t_cand <= tmax_p)
    )
    t_cand = jnp.where(ok, t_cand, BIG)

    # Per-pair best, then scatter-min per ray
    pair_best = jnp.min(t_cand, axis=-1)
    pair_arg = jnp.argmin(t_cand, axis=-1)
    pair_tri = jnp.take_along_axis(tri_idx, pair_arg[:, None], axis=-1)[:, 0]

    best_t = jnp.full((r_count,), BIG, f32).at[ray_safe].min(
        jnp.where(valid_f, pair_best, BIG), mode="drop"
    )
    # winner attribution: pairs matching the per-ray best write their ids
    is_winner = valid_f & (pair_best == best_t[ray_safe]) & (pair_best < BIG)
    best_tri = jnp.full((r_count,), -1, jnp.int32).at[
        jnp.where(is_winner, ray_safe, r_count)
    ].set(pair_tri, mode="drop")
    best_inst = jnp.full((r_count,), -1, jnp.int32).at[
        jnp.where(is_winner, ray_safe, r_count)
    ].set(inst_f, mode="drop")

    hit = best_t < jnp.minimum(t_max, BIG)
    return best_t, best_tri, best_inst, hit, total_overflow


def mesh_hit_record(proto: MeshProto, tri, inst, o, d, t):
    """Hit record for winning (tri, inst) pairs (any lanes may be invalid;
    caller masks).  Normals are geometric face normals transformed by the
    instance's inverse-transpose (rt/transform.go Scale/Rotate semantics)."""
    tri = jnp.maximum(tri, 0)
    inst = jnp.maximum(inst, 0)
    e1 = proto.tri_e1[tri]
    e2 = proto.tri_e2[tri]
    v0 = proto.tri_v0[tri]

    rot = proto.inst_w2l[inst, :, :3]
    trn = proto.inst_w2l[inst, :, 3]
    o_l = jnp.einsum("rij,rj->ri", rot, o) + trn
    d_l = jnp.einsum("rij,rj->ri", rot, d)

    # Barycentric UV via Moller-Trumbore partials (rt/triangle.go:75-88)
    h = jnp.cross(d_l, e2)
    a = jnp.sum(e1 * h, axis=-1)
    f = 1.0 / jnp.where(jnp.abs(a) < 1e-12, 1.0, a)
    s = o_l - v0
    uu = f * jnp.sum(s * h, axis=-1)
    q = jnp.cross(s, e1)
    vv = f * jnp.sum(d_l * q, axis=-1)

    n_local = jnp.cross(e1, e2)
    n_world = jnp.einsum("rij,rj->ri", proto.inst_nmat[inst], n_local)
    n_world = vec.unit(n_world)
    front = vec.dot(d, n_world) < 0.0
    normal = jnp.where(front[:, None], n_world, -n_world)
    p = vec.ray_at(o, d, t)
    return p, normal, front, uu, vv, proto.inst_mat[inst]
