"""Structure-of-arrays primitive tables and megabatch intersection.

The reference dispatches intersections through a ``Hittable`` interface
(rt/hittable.go:15-18) — one virtual call per ray per object.  On TPU the
idiomatic formulation is *tables*: each primitive kind is a dense SoA pack,
and intersection is computed for a whole ray megabatch against a whole pack
at once.  The ray-pair dot products (``d·c``, ``o·c`` ...) are written as
``[R,3] x [3,N]`` contractions so XLA can place them on the MXU; the
remaining per-pair arithmetic is a short fused VPU chain followed by a
min-reduction over the primitive axis.

For scenes up to a few thousand primitives this brute-force megabatch is
*faster* on TPU than any pointer-chasing BVH (no gathers, no divergence);
the reference's BVH (rt/bvh.go) exists to fix exactly the CPU problem TPUs
do not have at this scale.  Large triangle meshes do need hierarchy and get
a separate two-level path (geometry/bvh.py).

Primitive parity map (reference -> pack):
  - Sphere / moving sphere  (rt/sphere.go)          -> SpherePack
  - Quad, Triangle, Circle, Plane (rt/quad.go,
    rt/triangle.go, rt/circle.go, rt/plane.go)      -> PlanarPack (unified
    plane-hit + kind-specific interior test)
  - Box / Pyramid (rt/primitives.go)                -> builder sugar emitting
    quads/triangles into PlanarPack
  - Translate/Rotate/Scale wrappers (rt/transform.go) -> affine transforms
    baked into vertices at build time (exact for planar primitives)
  - Volume (rt/volume.go)                           -> VolumePack (OBB media)
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..core import vec

# Planar primitive kinds
KIND_QUAD = 0
KIND_TRI = 1
KIND_CIRCLE = 2
KIND_PLANE = 3

BIG = np.float32(3.0e38)  # numpy, not jnp: module import must not init the XLA backend (jax.distributed.initialize comes first on pods)


class SpherePack(NamedTuple):
    """Static and moving spheres. ``center`` is the t=0 position and
    ``velocity`` the per-unit-time displacement (rt/sphere.go:49-51)."""

    center: jnp.ndarray    # [N, 3] f32
    velocity: jnp.ndarray  # [N, 3] f32
    radius: jnp.ndarray    # [N]    f32
    mat: jnp.ndarray       # [N]    i32


class PlanarPack(NamedTuple):
    """Quads, triangles, circles and infinite planes in one table.

    Field use per kind:
      quad:     q=Q, u, v = edge vectors; w = n/|n|^2 (rt/quad.go:16-33)
      triangle: q=v0, u=edge1, v=edge2; interior via barycentrics
                (algebraically identical to Moller-Trumbore, rt/triangle.go:57-104)
      circle:   q=center, radius; local frame from normal (rt/circle.go:58-71)
      plane:    q=point (rt/plane.go)
    """

    q: jnp.ndarray       # [N, 3]
    u: jnp.ndarray       # [N, 3]
    v: jnp.ndarray       # [N, 3]
    normal: jnp.ndarray  # [N, 3] unit
    w: jnp.ndarray       # [N, 3]
    d: jnp.ndarray       # [N] plane constant dot(normal, q)
    radius: jnp.ndarray  # [N] circle radius (0 otherwise)
    kind: jnp.ndarray    # [N] i32
    mat: jnp.ndarray     # [N] i32


VOL_BOX = 0
VOL_SPHERE = 1
VOL_PLANES = 2


class VolumePack(NamedTuple):
    """Constant-density media bounded by transformed boxes, spheres, or
    arbitrary convex polyhedra.

    The reference wraps an arbitrary ``Hittable`` boundary
    (rt/volume.go:34); every reference scene uses boxes, but the API
    admits any shape.  Rays are mapped to local space by a 3x4 affine
    ``world_to_local``; the boundary there is the [box_min, box_max]
    slab box (VOL_BOX), the UNIT sphere (VOL_SPHERE — the affine bakes
    center/radius; an ellipsoid under non-uniform scale), or an
    intersection of half-spaces n.x <= d (VOL_PLANES — any convex
    polyhedron: pyramids, prisms, hulls; this is the vectorized form of
    the reference's double-Hit entry/exit walk, which is itself only
    well-defined for convex boundaries).
    """

    world_to_local: jnp.ndarray  # [N, 3, 4]
    box_min: jnp.ndarray         # [N, 3]
    box_max: jnp.ndarray         # [N, 3]
    neg_inv_density: jnp.ndarray  # [N] = -1/rho (rt/volume.go:17)
    mat: jnp.ndarray             # [N] i32 (isotropic phase material)
    kind: jnp.ndarray            # [N] i32 VOL_BOX | VOL_SPHERE | VOL_PLANES
    # [N, K, 4] local-space half-spaces (nx, ny, nz, d): inside iff
    # n.x <= d for all k.  None when the scene has no VOL_PLANES media;
    # non-planes rows pad with (0,0,0,1) — a no-op constraint.
    planes: jnp.ndarray = None


def empty_spheres():
    z3 = jnp.zeros((0, 3), jnp.float32)
    z = jnp.zeros((0,), jnp.float32)
    return SpherePack(z3, z3, z, jnp.zeros((0,), jnp.int32))


def empty_planar():
    z3 = jnp.zeros((0, 3), jnp.float32)
    z = jnp.zeros((0,), jnp.float32)
    zi = jnp.zeros((0,), jnp.int32)
    return PlanarPack(z3, z3, z3, z3, z3, z, z, zi, zi)


def empty_volumes():
    return VolumePack(
        jnp.zeros((0, 3, 4), jnp.float32),
        jnp.zeros((0, 3), jnp.float32),
        jnp.zeros((0, 3), jnp.float32),
        jnp.zeros((0,), jnp.float32),
        jnp.zeros((0,), jnp.int32),
        jnp.zeros((0,), jnp.int32),
    )


# -----------------------------------------------------------------------------
# Sphere intersection (rt/sphere.go:63-94, half-b quadratic formulation)
# -----------------------------------------------------------------------------

def intersect_spheres(pack: SpherePack, o, d, tm, t_min, t_max):
    """Closest sphere hit per ray.

    o, d: [R, 3]; tm: [R] ray times; t_min scalar; t_max: [R].
    Returns (t [R], idx [R], hit [R] bool). Expanded so every ray-pair dot
    product is an [R,3]x[3,N] contraction (MXU) — with moving spheres,
      h      = d.c0 + tm * d.vel - d.o
      c_term = |c0|^2 + 2 tm c0.vel + tm^2 |vel|^2
               - 2 o.c0 - 2 tm o.vel + |o|^2 - r^2.
    """
    n = pack.radius.shape[0]
    if n == 0:
        r_ = o.shape[0]
        return jnp.full((r_,), BIG), jnp.zeros((r_,), jnp.int32), jnp.zeros((r_,), bool)

    c0, vel, rad = pack.center, pack.velocity, pack.radius
    f32 = jnp.float32
    # Per-primitive scalars [N]
    c0c0 = jnp.sum(c0 * c0, axis=-1)
    c0v = jnp.sum(c0 * vel, axis=-1)
    vv = jnp.sum(vel * vel, axis=-1)
    r2 = rad * rad
    # Per-ray scalars [R]
    do_ = vec.dot(d, o)
    oo = vec.dot(o, o)
    a = vec.dot(d, d)
    # Cross terms [R, N] — MXU contractions
    d_c0 = jnp.einsum("rc,nc->rn", d, c0, preferred_element_type=f32)
    d_v = jnp.einsum("rc,nc->rn", d, vel, preferred_element_type=f32)
    o_c0 = jnp.einsum("rc,nc->rn", o, c0, preferred_element_type=f32)
    o_v = jnp.einsum("rc,nc->rn", o, vel, preferred_element_type=f32)

    tmc = tm[:, None]
    h = d_c0 + tmc * d_v - do_[:, None]
    c_term = (
        c0c0[None, :]
        + 2.0 * tmc * c0v[None, :]
        + (tmc * tmc) * vv[None, :]
        - 2.0 * o_c0
        - 2.0 * tmc * o_v
        + oo[:, None]
        - r2[None, :]
    )
    ac = a[:, None]
    disc = h * h - ac * c_term
    has_root = disc >= 0.0
    # Double-where: sqrt'(0) = inf would turn miss lanes (disc < 0, zero
    # cotangent) into NaN gradients that poison the whole backward pass.
    sqrtd = jnp.where(
        has_root, jnp.sqrt(jnp.where(has_root, disc, 1.0)), 0.0
    )
    inv_a = 1.0 / ac
    root0 = (h - sqrtd) * inv_a
    root1 = (h + sqrtd) * inv_a
    tmaxc = t_max[:, None]
    # Surrounds(): strict inequalities (rt/interval.go:65-67)
    ok0 = (root0 > t_min) & (root0 < tmaxc)
    ok1 = (root1 > t_min) & (root1 < tmaxc)
    root = jnp.where(ok0, root0, root1)
    valid = has_root & (ok0 | ok1)
    t_pair = jnp.where(valid, root, BIG)

    # Numerical refinement: the expanded pair form above trades precision
    # for MXU throughput (|o|^2 - 2 o.c + |c|^2 cancels catastrophically in
    # f32 when the scene is far from the origin), so near-tangent pairs can
    # produce false hits/misses.  Recompute the candidate's quadratic per
    # ray in the stable oc = c - o form (rt/sphere.go:63-94) — O(R) work
    # after the O(R*N) search — for the top-2 candidates, falling back to
    # the runner-up when the winner was a tangent false positive.
    def refine(cand_idx):
        center = pack.center[cand_idx] + tm[:, None] * pack.velocity[cand_idx]
        rad = pack.radius[cand_idx]
        oc = center - o
        h2 = vec.dot(d, oc)
        c2 = vec.dot(oc, oc) - rad * rad
        disc2 = h2 * h2 - a * c2
        pos2 = disc2 >= 0.0
        sq2 = jnp.where(pos2, jnp.sqrt(jnp.where(pos2, disc2, 1.0)), 0.0)
        r0 = (h2 - sq2) / a
        r1 = (h2 + sq2) / a
        ok0 = (r0 > t_min) & (r0 < t_max)
        ok1 = (r1 > t_min) & (r1 < t_max)
        t_ref = jnp.where(ok0, r0, r1)
        ok = (disc2 >= 0.0) & (ok0 | ok1)
        return jnp.where(ok, t_ref, BIG), ok

    idx1 = jnp.argmin(t_pair, axis=-1).astype(jnp.int32)
    had1 = jnp.take_along_axis(t_pair, idx1[:, None], axis=-1)[:, 0] < BIG
    t_pair2 = jnp.where(
        jax.nn.one_hot(idx1, n, dtype=bool), BIG, t_pair
    )
    idx2 = jnp.argmin(t_pair2, axis=-1).astype(jnp.int32)
    had2 = jnp.take_along_axis(t_pair2, idx2[:, None], axis=-1)[:, 0] < BIG

    t1, ok1_ = refine(idx1)
    t2, ok2_ = refine(idx2)
    use2 = (~(had1 & ok1_)) & had2 & ok2_
    idx = jnp.where(use2, idx2, idx1)
    hit = (had1 & ok1_) | use2
    t_best = jnp.where(use2, t2, jnp.where(had1 & ok1_, t1, BIG))
    return t_best, idx, hit


def sphere_hit_record(pack: SpherePack, idx, o, d, tm, t):
    """Normal / UV / material for the winning sphere per ray.

    UV matches getSphereUV (rt/sphere.go:53-59): theta = acos(-y),
    phi = atan2(-z, x) + pi.
    """
    c0 = pack.center[idx]
    vel = pack.velocity[idx]
    rad = pack.radius[idx]
    center = c0 + tm[:, None] * vel
    p = vec.ray_at(o, d, t)
    outward = (p - center) / rad[:, None]
    front = vec.dot(d, outward) < 0.0
    normal = jnp.where(front[:, None], outward, -outward)
    theta = jnp.arccos(jnp.clip(-outward[:, 1], -1.0, 1.0))
    phi = jnp.arctan2(-outward[:, 2], outward[:, 0]) + np.pi
    uu = phi / (2.0 * np.pi)
    vv = theta / np.pi
    return p, normal, front, uu, vv, pack.mat[idx]


# -----------------------------------------------------------------------------
# Planar intersection (quad/tri/circle/plane unified)
# -----------------------------------------------------------------------------

def intersect_planar(pack: PlanarPack, o, d, t_min, t_max):
    """Closest planar-primitive hit per ray. Returns (t, idx, hit).

    All pair-wise intermediates are [R, N] component arrays — never
    [R, N, 3] — so the TPU lane dimension carries primitives (or rays),
    not the wasted 3-vector axis.  The barycentric test is expanded as
      alpha = w . (rel x v) = rel . (v x w),   beta = rel . (w x u)
    with the per-primitive constant vectors (v x w) and (w x u)
    precomputed host-side-equivalent (cheap [N,3] work).
    """
    n = pack.d.shape[0]
    if n == 0:
        r_ = o.shape[0]
        return jnp.full((r_,), BIG), jnp.zeros((r_,), jnp.int32), jnp.zeros((r_,), bool)

    f32 = jnp.float32
    nrm = pack.normal
    denom = jnp.einsum("rc,nc->rn", d, nrm, preferred_element_type=f32)  # [R,N]
    n_dot_o = jnp.einsum("rc,nc->rn", o, nrm, preferred_element_type=f32)
    not_parallel = jnp.abs(denom) >= vec.EPS_PARALLEL
    t = (pack.d[None, :] - n_dot_o) / jnp.where(not_parallel, denom, 1.0)

    tmaxc = t_max[:, None]
    is_plane = (pack.kind == KIND_PLANE)[None, :]
    # plane: Surrounds (strict, rt/plane.go:33); others: Contains (rt/quad.go:53)
    t_ok = jnp.where(
        is_plane,
        (t > t_min) & (t < tmaxc),
        (t >= t_min) & (t <= tmaxc),
    )

    # alpha = rel.(v x w), beta = rel.(w x u), with rel = o + t d - q.
    # rel.c = (o.c - q.c) + t (d.c) for any constant c — two [R,N] matmuls
    # per constant plus elementwise FMA.
    vxw = jnp.cross(pack.v, pack.w)   # [N, 3] constants
    wxu = jnp.cross(pack.w, pack.u)
    q_vxw = jnp.sum(pack.q * vxw, axis=-1)   # [N]
    q_wxu = jnp.sum(pack.q * wxu, axis=-1)
    o_vxw = jnp.einsum("rc,nc->rn", o, vxw, preferred_element_type=f32)
    d_vxw = jnp.einsum("rc,nc->rn", d, vxw, preferred_element_type=f32)
    o_wxu = jnp.einsum("rc,nc->rn", o, wxu, preferred_element_type=f32)
    d_wxu = jnp.einsum("rc,nc->rn", d, wxu, preferred_element_type=f32)
    alpha = o_vxw + t * d_vxw - q_vxw[None, :]
    beta = o_wxu + t * d_wxu - q_wxu[None, :]

    kind = pack.kind[None, :]
    in_quad = (alpha >= 0.0) & (alpha <= 1.0) & (beta >= 0.0) & (beta <= 1.0)
    in_tri = (alpha >= 0.0) & (alpha <= 1.0) & (beta >= 0.0) & (alpha + beta <= 1.0)

    # Circle: |rel|^2 = |o-q|^2 + 2 t (o-q).d + t^2 |d|^2, expanded so the
    # pair term is scalar [R,N] work off three more contractions.
    qq = jnp.sum(pack.q * pack.q, axis=-1)          # [N]
    oo = jnp.sum(o * o, axis=-1)                    # [R]
    dd = jnp.sum(d * d, axis=-1)                    # [R]
    o_q = jnp.einsum("rc,nc->rn", o, pack.q, preferred_element_type=f32)
    d_q = jnp.einsum("rc,nc->rn", d, pack.q, preferred_element_type=f32)
    d_o = jnp.sum(d * o, axis=-1)                   # [R]
    oq2 = oo[:, None] - 2.0 * o_q + qq[None, :]
    oq_dot_d = d_o[:, None] - d_q
    dist2 = oq2 + 2.0 * t * oq_dot_d + t * t * dd[:, None]
    in_circle = dist2 <= (pack.radius * pack.radius)[None, :]

    interior = jnp.where(
        kind == KIND_QUAD,
        in_quad,
        jnp.where(
            kind == KIND_TRI, in_tri, jnp.where(kind == KIND_CIRCLE, in_circle, True)
        ),
    )

    valid = not_parallel & t_ok & interior
    t_pair = jnp.where(valid, t, BIG)
    idx = jnp.argmin(t_pair, axis=-1).astype(jnp.int32)
    t_best = jnp.take_along_axis(t_pair, idx[:, None], axis=-1)[:, 0]
    return t_best, idx, t_best < BIG


def planar_hit_record(pack: PlanarPack, idx, o, d, t):
    """Normal / UV / material for the winning planar primitive per ray."""
    q = pack.q[idx]
    u_e = pack.u[idx]
    v_e = pack.v[idx]
    nrm = pack.normal[idx]
    w = pack.w[idx]
    rad = pack.radius[idx]
    kind = pack.kind[idx]

    p = vec.ray_at(o, d, t)
    rel = p - q
    alpha = vec.dot(w, jnp.cross(rel, v_e))
    beta = vec.dot(w, jnp.cross(u_e, rel))

    # Circle UV: local frame from the normal (rt/circle.go:58-71)
    use_x = jnp.abs(nrm[:, 1]) > 0.9
    ref_axis = jnp.where(
        use_x[:, None],
        jnp.array([1.0, 0.0, 0.0], jnp.float32)[None, :],
        jnp.array([0.0, 1.0, 0.0], jnp.float32)[None, :],
    )
    cu = vec.unit(jnp.cross(ref_axis, nrm))
    cv = jnp.cross(nrm, cu)
    safe_rad = jnp.where(rad > 0, rad, 1.0)
    cx = vec.dot(rel, cu) / safe_rad
    cy = vec.dot(rel, cv) / safe_rad
    circ_u = (cx + 1.0) * 0.5
    circ_v = (cy + 1.0) * 0.5

    uu = jnp.where(kind == KIND_CIRCLE, circ_u, jnp.where(kind == KIND_PLANE, 0.0, alpha))
    vv = jnp.where(kind == KIND_CIRCLE, circ_v, jnp.where(kind == KIND_PLANE, 0.0, beta))

    front = vec.dot(d, nrm) < 0.0
    normal = jnp.where(front[:, None], nrm, -nrm)
    return p, normal, front, uu, vv, pack.mat[idx]


# -----------------------------------------------------------------------------
# Volume (constant-density medium) sampling  (rt/volume.go:34-79)
# -----------------------------------------------------------------------------

def sample_volumes(pack: VolumePack, o, d, t_min, t_surface, u_flight):
    """Stochastic media interaction against every volume.

    For each ray: slab-test the oriented box to get [t0, t1], clamp to
    [t_min, t_surface], draw the exponential free-flight distance
    ``-1/rho * log(u)`` and accept if it fits inside (rt/volume.go:60-70).
    Among accepted volumes the smallest scatter t wins.

    u_flight: [R, N] uniforms (one per ray x volume).
    Returns (t_vol [R], vol_idx [R], vol_hit [R]).
    """
    n = pack.neg_inv_density.shape[0]
    r_ = o.shape[0]
    if n == 0:
        return jnp.full((r_,), BIG), jnp.zeros((r_,), jnp.int32), jnp.zeros((r_,), bool)

    m = pack.world_to_local  # [N, 3, 4]
    rot = m[:, :, :3]
    trn = m[:, :, 3]
    # Local-space rays, per pair: [R, N, 3]
    o_l = jnp.einsum("nij,rj->rni", rot, o) + trn[None, :, :]
    d_l = jnp.einsum("nij,rj->rni", rot, d)

    safe_d = jnp.where(jnp.abs(d_l) < 1e-12, jnp.where(d_l < 0, -1e-12, 1e-12), d_l)
    inv_d = 1.0 / safe_d
    ta = (pack.box_min[None] - o_l) * inv_d
    tb = (pack.box_max[None] - o_l) * inv_d
    t0 = jnp.max(jnp.minimum(ta, tb), axis=-1)
    t1 = jnp.min(jnp.maximum(ta, tb), axis=-1)

    # Unit-sphere boundary in local space (kind VOL_SPHERE): quadratic
    # roots replace the slab interval.
    a_q = jnp.sum(d_l * d_l, axis=-1)
    hb = jnp.sum(o_l * d_l, axis=-1)
    c_q = jnp.sum(o_l * o_l, axis=-1) - 1.0
    disc = hb * hb - a_q * c_q
    sph_ok = disc > 0.0
    # sqrt'(0) = inf: masked lanes need a safe operand (0 * inf = NaN in
    # the backward pass) — same double-where as intersect_spheres above.
    sq = jnp.sqrt(jnp.where(sph_ok, disc, 1.0))
    # Floor 1e-12 (in sync with wavefront._sample_volumes): reciprocal's
    # backward squares this, and (1e-20)^2 underflows f32 to inf.
    inv_a = 1.0 / jnp.maximum(a_q, 1e-12)
    s0 = (-hb - sq) * inv_a
    s1 = (-hb + sq) * inv_a
    is_sph = pack.kind[None, :] == VOL_SPHERE
    t0 = jnp.where(is_sph, jnp.where(sph_ok, s0, BIG), t0)
    t1 = jnp.where(is_sph, jnp.where(sph_ok, s1, -BIG), t1)

    # Convex-polyhedron boundary (VOL_PLANES): the ray interval inside
    # the half-space intersection n.x <= d is [max entering, min exiting].
    if pack.planes is not None:
        pn = pack.planes                                   # [N, K, 4]
        den = jnp.einsum("rni,nki->rnk", d_l, pn[:, :, :3])
        num = pn[None, :, :, 3] - jnp.einsum(
            "rni,nki->rnk", o_l, pn[:, :, :3])
        safe_den = jnp.where(jnp.abs(den) < 1e-12,
                             jnp.where(den < 0, -1e-12, 1e-12), den)
        tq = num / safe_den
        lower = jnp.where(den < -1e-12, tq, -np.inf)
        upper = jnp.where(den > 1e-12, tq, np.inf)
        # parallel AND outside that half-space -> never inside
        empty = jnp.any((jnp.abs(den) <= 1e-12) & (num < 0.0), axis=-1)
        p0 = jnp.where(empty, BIG, jnp.max(lower, axis=-1))
        p1 = jnp.where(empty, -BIG, jnp.min(upper, axis=-1))
        is_pl = pack.kind[None, :] == VOL_PLANES
        t0 = jnp.where(is_pl, p0, t0)
        t1 = jnp.where(is_pl, p1, t1)
    crosses = t1 > t0

    t0c = jnp.maximum(t0, t_min)           # rec1.T clamp (rt/volume.go:50-52)
    t1c = jnp.minimum(t1, t_surface[:, None])
    inside = crosses & (t0c < t1c)

    ray_len = vec.length(d)[:, None]
    dist_inside = (t1c - t0c) * ray_len
    log_u = jnp.log(jnp.maximum(u_flight, 1e-38))
    hit_dist = pack.neg_inv_density[None, :] * log_u
    accept = inside & (hit_dist <= dist_inside)
    t_scatter = t0c + hit_dist / ray_len
    t_pair = jnp.where(accept, t_scatter, BIG)

    idx = jnp.argmin(t_pair, axis=-1).astype(jnp.int32)
    t_best = jnp.take_along_axis(t_pair, idx[:, None], axis=-1)[:, 0]
    return t_best, idx, t_best < BIG
