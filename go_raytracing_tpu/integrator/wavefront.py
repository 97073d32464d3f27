"""Wavefront path-tracing integrator (component-SoA hot path).

The reference's recursive integrator (``rayColorInternal``,
rt/camera.go:443-518) becomes an iterative bounce loop over a ray megabatch
— the only XLA-shaped formulation.  Per-ray state (origin, direction,
throughput, radiance, alive, allow_light_hits) is carried through a
``lax.scan`` over ``max_depth`` bounces with masked lanes; the
``allowLightHits`` flag that kills BRDF-path double counting of NEE-sampled
lights (rt/camera.go:473-517) becomes a per-ray bit.

All 3-vectors are ``core.vec3.V3`` component SoA — three dense [R] arrays
— because [R, 3] arrays pad the TPU lane dimension 3->128 and waste ~40x
of the VPU (see core/vec3.py).

Algorithm parity with the reference per bounce:
  1. closest hit over spheres + planar prims (+ instanced meshes), then
     stochastic volume scattering may preempt the surface hit
     (rt/volume.go:34-79);
  2. miss -> HDRI miss shader (with phantom-primary-ray test
     ``bounce == 0`` == ``depth == MaxDepth``, rt/camera.go:453-461) /
     sky gradient (rt/camera.go:520-526) / flat background;
  3. emission added iff allow_light_hits (rt/camera.go:473-481);
  4. NEE+MIS for Lambertian hits when lights exist: HDRI importance sample
     + uniformly picked area light, balance-heuristic weights, x numLights,
     firefly clamp at 20 (rt/camera.go:538-678);
  5. scatter (branchless material table) and continue with
     allow_light_hits = not(MIS used this bounce).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ..core import fetch
from ..core import rng as rngmod
from ..core import vec
from ..core.vec3 import V3
from ..geometry import mesh_bvh, packs
from ..geometry.scene import Scene
from ..materials import tables as mats
from ..materials import textures as tex
from ..lights import hdri as hdri_mod
from ..camera import Camera

FIREFLY_CLAMP = 20.0  # rt/camera.go:601-604, 671-675
SHADOW_EPS = 1e-3     # rt/camera.go:639

HIT_NONE = 0
HIT_SPHERE = 1
HIT_PLANAR = 2
HIT_VOLUME = 3
HIT_MESH_BASE = 4  # + mesh prototype index


class Decisions(NamedTuple):
    """Per-bounce discrete sweep outcomes recorded by the fast forward
    (trace(record=True)) and consumed by the replay backward
    (trace(decisions=...)).  Everything else — RNG, scatter choices,
    light picks — is counter-replayable and NOT stored.  All [D, R]."""

    which: jnp.ndarray   # i32 HIT_* winner kind
    idx: jnp.ndarray     # i32 winner primitive index
    aux: jnp.ndarray     # i32 mesh instance id
    blk_a: jnp.ndarray   # bool area-light shadow ray blocked
    blk_h: jnp.ndarray   # bool HDRI shadow ray blocked

# Extra RNG purpose bases (see core/rng.py for the primary enumeration).
PURPOSE_VOL_MAIN = 64      # + 32 * volume_index
PURPOSE_VOL_SHADOW_AREA = 65
PURPOSE_VOL_SHADOW_HDRI = 66

BIG = packs.BIG


def _volume_uniforms(seed, stream, bounce, base, n_volumes):
    purpose = base + 32 * jnp.arange(n_volumes, dtype=jnp.uint32)[None, :]
    u, _, _ = rngmod.uniform3(seed, stream[:, None], bounce, purpose)
    return u


# -----------------------------------------------------------------------------
# Intersection (SoA)
# -----------------------------------------------------------------------------

def _sample_volumes(pack: packs.VolumePack, o: V3, d: V3, t_min, t_surface, u_flight):
    """Component-SoA port of packs.sample_volumes (rt/volume.go:34-79).
    u_flight: [R, N]. Returns (t_vol [R], idx [R], hit [R])."""
    n = pack.neg_inv_density.shape[0]
    r_ = o.x.shape[0]
    if n == 0:
        return jnp.full((r_,), BIG), jnp.zeros((r_,), jnp.int32), jnp.zeros((r_,), bool)

    m = pack.world_to_local  # [N, 3, 4]

    def to_local(v: V3, translate):
        out = []
        for i in range(3):
            c = (
                m[None, :, i, 0] * v.x[:, None]
                + m[None, :, i, 1] * v.y[:, None]
                + m[None, :, i, 2] * v.z[:, None]
            )
            if translate:
                c = c + m[None, :, i, 3]
            out.append(c)  # [R, N]
        return out

    o_l = to_local(o, True)
    d_l = to_local(d, False)

    t0 = jnp.full((r_, n), -np.inf, jnp.float32)
    t1 = jnp.full((r_, n), np.inf, jnp.float32)
    for i in range(3):
        dli = d_l[i]
        safe = jnp.where(jnp.abs(dli) < 1e-12, jnp.where(dli < 0, -1e-12, 1e-12), dli)
        inv = 1.0 / safe
        ta = (pack.box_min[None, :, i] - o_l[i]) * inv
        tb = (pack.box_max[None, :, i] - o_l[i]) * inv
        t0 = jnp.maximum(t0, jnp.minimum(ta, tb))
        t1 = jnp.minimum(t1, jnp.maximum(ta, tb))

    # Unit-sphere boundaries (packs.VOL_SPHERE) in local space.
    a_q = d_l[0] ** 2 + d_l[1] ** 2 + d_l[2] ** 2
    hb = o_l[0] * d_l[0] + o_l[1] * d_l[1] + o_l[2] * d_l[2]
    c_q = o_l[0] ** 2 + o_l[1] ** 2 + o_l[2] ** 2 - 1.0
    disc = hb * hb - a_q * c_q
    sph_ok = disc > 0.0
    # sqrt's derivative is infinite at 0: masked (disc <= 0) lanes must
    # see a safe operand or the backward pass emits 0 * inf = NaN.
    sq = jnp.sqrt(jnp.where(sph_ok, disc, 1.0))
    # Floor 1e-12: reciprocal's backward squares this, and (1e-20)^2
    # underflows f32 to an inf partial on degenerate lanes.
    inv_a = 1.0 / jnp.maximum(a_q, 1e-12)
    is_sph = pack.kind[None, :] == packs.VOL_SPHERE
    t0 = jnp.where(is_sph, jnp.where(sph_ok, (-hb - sq) * inv_a, BIG), t0)
    t1 = jnp.where(is_sph, jnp.where(sph_ok, (-hb + sq) * inv_a, -BIG), t1)

    # Convex-polyhedron boundaries (packs.VOL_PLANES): [entry, exit] =
    # [max lower, min upper] over the local half-spaces n.x <= d.
    if pack.planes is not None:
        kmax = pack.planes.shape[1]
        p0 = jnp.full((r_, n), -np.inf, jnp.float32)
        p1 = jnp.full((r_, n), np.inf, jnp.float32)
        empty = jnp.zeros((r_, n), bool)
        for k in range(kmax):
            nx = pack.planes[None, :, k, 0]
            ny = pack.planes[None, :, k, 1]
            nz = pack.planes[None, :, k, 2]
            dd = pack.planes[None, :, k, 3]
            den = nx * d_l[0] + ny * d_l[1] + nz * d_l[2]
            num = dd - (nx * o_l[0] + ny * o_l[1] + nz * o_l[2])
            safe = jnp.where(jnp.abs(den) < 1e-12,
                             jnp.where(den < 0, -1e-12, 1e-12), den)
            tq = num / safe
            p0 = jnp.maximum(p0, jnp.where(den < -1e-12, tq, -np.inf))
            p1 = jnp.minimum(p1, jnp.where(den > 1e-12, tq, np.inf))
            empty = empty | ((jnp.abs(den) <= 1e-12) & (num < 0.0))
        is_pl = pack.kind[None, :] == packs.VOL_PLANES
        t0 = jnp.where(is_pl, jnp.where(empty, BIG, p0), t0)
        t1 = jnp.where(is_pl, jnp.where(empty, -BIG, p1), t1)
    crosses = t1 > t0

    t0c = jnp.maximum(t0, t_min)           # rec1.T clamp (rt/volume.go:50-52)
    t1c = jnp.minimum(t1, t_surface[:, None])
    inside = crosses & (t0c < t1c)

    ray_len = d.length()[:, None]
    dist_inside = (t1c - t0c) * ray_len
    log_u = jnp.log(jnp.maximum(u_flight, 1e-38))
    hit_dist = pack.neg_inv_density[None, :] * log_u
    accept = inside & (hit_dist <= dist_inside)
    t_scatter = t0c + hit_dist / ray_len
    t_pair = jnp.where(accept, t_scatter, BIG)

    idx = jnp.argmin(t_pair, axis=-1).astype(jnp.int32)
    t_best = jnp.take_along_axis(t_pair, idx[:, None], axis=-1)[:, 0]
    return t_best, idx, t_best < BIG


# Sort rays before the mesh sweep once batches are big enough for block
# coherence to matter (the kernel owns 4096-ray blocks; smaller batches
# are one block anyway and tests stay bit-simple).
_MESH_SORT_MIN = 1 << 16

# Frontier capacity multiple for the XLA mesh fallback
# (mesh_bvh.intersect_mesh cap_factor).  Module-level so tests can force
# overflow; dropped (ray, node) pairs are *counted* and surfaced through
# trace(..., with_stats=True) -> RenderStats.mesh_overflow — never silent.
MESH_CAP_FACTOR = 8


_KEY_DEAD = np.int32(1 << 30)
# Sort-key quantization: entry-point cells per axis on the instance's
# local root box, direction levels per axis.  Direction is the dominant
# term for group-frustum tightness (a cone of half-angle ~90°/DIRL grows
# with segment length; entry cells only bound the apex).
_KEY_CELLS = 8
_KEY_DIRL = 8


def _mesh_sort_key(proto, o: V3, d: V3, t_min, t_max):
    """Reach test + ray-sort key in one pass.

    Per instance, a local-space slab ladder (the same math as the
    kernel's phase-0 cull) finds the ray segment's entry into that
    instance's root box.  ``reach`` is true if any instance is entered;
    the key groups rays by (nearest entered instance, entry-point cell
    on an 8^3 grid of the LOCAL root box, 4-levels/axis local
    direction).  The stream kernel culls tiles per 8-ray group and per
    (group, instance): rays sharing a key enter the SAME instance in the
    same region heading the same way, so their group frustum covers few
    tiles and every other instance is culled outright.  World-space
    origin cells (the previous key) fail for sparse reaching rays —
    compaction packs far-apart origins into one group (measured 4.6
    Mrays/s raw on bounce-1 rays vs 11 coherent).  Dead/unreaching lanes
    get the max key so whole blocks die."""
    w2l = proto.inst_w2l                      # [I, 3, 4]
    lo, hi = proto.root_bbox_min, proto.root_bbox_max
    eps = 1e-3
    ext = jnp.maximum(hi - lo, 1e-6)
    best_t = jnp.full_like(t_max, BIG)
    best_key = jnp.full(o.x.shape, _KEY_DEAD - 1, jnp.int32)
    for ii in range(w2l.shape[0]):
        olc, dlc = [], []
        t_en = jnp.full_like(t_max, t_min)
        t_ex = jnp.minimum(t_max, BIG)
        for i in range(3):
            m0, m1, m2, m3 = (w2l[ii, i, 0], w2l[ii, i, 1],
                              w2l[ii, i, 2], w2l[ii, i, 3])
            ol = m0 * o.x + m1 * o.y + m2 * o.z + m3
            dl = m0 * d.x + m1 * d.y + m2 * d.z
            olc.append(ol)
            dlc.append(dl)
            inv = 1.0 / jnp.where(jnp.abs(dl) < 1e-12,
                                  jnp.where(dl < 0, -1e-12, 1e-12), dl)
            ta = (lo[i] - eps - ol) * inv
            tb = (hi[i] + eps - ol) * inv
            t_en = jnp.maximum(t_en, jnp.minimum(ta, tb))
            t_ex = jnp.minimum(t_ex, jnp.maximum(ta, tb))
        hit_i = t_ex >= t_en
        better = hit_i & (t_en < best_t)
        # entry cell + local dir, dir-major within the instance: at
        # range, direction similarity bounds the frustum cross-section;
        # the entry cell only bounds the apex.
        nc, nd_ = _KEY_CELLS, _KEY_DIRL
        dn = jax.lax.rsqrt(dlc[0] ** 2 + dlc[1] ** 2 + dlc[2] ** 2 + 1e-30)
        cell = jnp.zeros(o.x.shape, jnp.int32)
        dirq = jnp.zeros(o.x.shape, jnp.int32)
        for i in range(3):
            p = olc[i] + dlc[i] * t_en
            q = jnp.clip(
                jnp.floor((p - lo[i]) * (nc / ext[i])).astype(jnp.int32),
                0, nc - 1)
            cell = cell * nc + q
            dq = jnp.clip(
                jnp.floor((dlc[i] * dn + 1.0) * (nd_ / 2.0)
                          ).astype(jnp.int32),
                0, nd_ - 1)
            dirq = dirq * nd_ + dq
        key_i = ((ii * nd_ ** 3 + dirq) * nc ** 3 + cell).astype(jnp.int32)
        best_t = jnp.where(better, t_en, best_t)
        best_key = jnp.where(better, key_i, best_key)
    reach = best_t < BIG
    key = jnp.where(reach & (t_max > 0), best_key, _KEY_DEAD)
    return reach, key


def _mesh_intersect(proto, o: V3, d: V3, t_min, t_max, any_hit=False):
    """Mesh closest hit: pallas segment-sweep kernel on TPU for small
    prototypes (gather-free), leaf-stream DMA kernel for large ones,
    XLA frontier traversal otherwise.  Kernel batches are
    coherence-sorted (results are per-ray, so the output — inverse-
    permuted — is bit-identical to the unsorted sweep)."""
    from ..ops import pallas_mesh, pallas_mesh_stream

    if pallas_mesh.kernel_ok(proto):
        kern = pallas_mesh.intersect_mesh_kernel
    elif pallas_mesh_stream.stream_ok(proto):
        kern = pallas_mesh_stream.intersect_mesh_stream
    else:
        kern = None
    if kern is not None:
        sg = jax.lax.stop_gradient
        proto, o, d, t_max = sg(proto), sg(o), sg(d), sg(t_max)
        r = o.x.shape[0]
        # Reach prefilter: a ray whose segment can't enter any instance
        # root box is dead for this sweep (miss = the kernel's default
        # output for dead lanes).
        reach, key = _mesh_sort_key(proto, o, d, t_min, t_max)
        t_max = jnp.where(reach, t_max, -1.0)
        if r >= _MESH_SORT_MIN:
            # Permute via ONE row gather of a packed [R, 8] matrix per
            # direction: separate [R] gathers are latency-bound at ~12 ns
            # per element (7 of them = 240 ms at 2M rays); a row gather
            # moves all components for one lookup (measured 18 ms).
            order = jnp.argsort(key)
            inv = jnp.zeros((r,), jnp.int32).at[order].set(
                jnp.arange(r, dtype=jnp.int32)
            )
            fwd = jnp.stack(
                [o.x, o.y, o.z, d.x, d.y, d.z, t_max,
                 jnp.zeros_like(t_max)], axis=1,
            )[order]
            o_s = V3(fwd[:, 0], fwd[:, 1], fwd[:, 2])
            d_s = V3(fwd[:, 3], fwd[:, 4], fwd[:, 5])
            t, tri, inst, hit, ovf = kern(
                proto, o_s, d_s, t_min, fwd[:, 6], any_hit=any_hit
            )
            bc = jax.lax.bitcast_convert_type
            rev = jnp.stack(
                [t, bc(tri, jnp.float32), bc(inst, jnp.float32),
                 hit.astype(jnp.float32)], axis=1,
            )[inv]
            return (
                rev[:, 0],
                bc(rev[:, 1], jnp.int32),
                bc(rev[:, 2], jnp.int32),
                rev[:, 3] > 0.5,
                ovf,
            )
        return kern(proto, o, d, t_min, t_max, any_hit=any_hit)
    # Frontier fallback has no any-hit mode: closest hit answers occlusion.
    return mesh_bvh.intersect_mesh(proto, o.rows(), d.rows(), t_min, t_max,
                                   cap_factor=MESH_CAP_FACTOR)


def _surface_intersects(scene: Scene, o: V3, d: V3, tm, t_min, t_max):
    """Sphere + planar closest hits, dispatched to the pallas kernels on
    TPU (geometry detached there — intersections are non-differentiable
    control flow; shading gradients flow through the hit *records*)."""
    from ..ops import pallas_intersect as pk

    r_ = o.x.shape[0]

    def empty():
        return (
            jnp.full((r_,), BIG),
            jnp.zeros((r_,), jnp.int32),
            jnp.zeros((r_,), bool),
        )

    if pk.enabled():
        sg = jax.lax.stop_gradient
        o_, d_, tm_, tmax_ = sg(o), sg(d), sg(tm), sg(t_max)
        s = (
            pk.sphere_closest(sg(scene.spheres), o_, d_, tm_, tmax_, t_min=float(t_min))
            if scene.spheres.radius.shape[0] > 0
            else empty()
        )
        p = (
            pk.planar_closest(sg(scene.planar), o_, d_, tmax_, t_min=float(t_min))
            if scene.planar.d.shape[0] > 0
            else empty()
        )
        return s, p

    rows_o, rows_d = o.rows(), d.rows()
    t_s, i_s, h_s = packs.intersect_spheres(scene.spheres, rows_o, rows_d, tm, t_min, t_max)
    t_p, i_p, h_p = packs.intersect_planar(scene.planar, rows_o, rows_d, t_min, t_max)
    return (t_s, i_s, h_s), (t_p, i_p, h_p)


def attr_path_ok(scene: Scene, differentiable: bool) -> bool:
    """Static predicate: can this scene render through the gather-free
    winner-attribute kernels?  (Per-ray table gathers cost ~8 ns each on
    TPU; the attribute path removes all of them.)  Excluded: gradient
    traces (attributes are detached SMEM constants), noise/image textures
    (need per-ray procedural eval / atlas fetch), meshes (separate path)."""
    from ..ops import pallas_intersect as pk

    return (
        pk.enabled()
        and not differentiable
        and not scene.has_noise
        and not scene.has_image
        and not scene.meshes
    )


def _attr_closest_hit(scene: Scene, o: V3, d: V3, tm, t_min, t_max,
                      seed, stream, bounce):
    """Closest hit via the attribute kernels.  Returns
    (t, which, idx, attrs) where attrs is a dict of per-ray winner
    constants (geometry + denormalized material)."""
    from ..ops import pallas_intersect as pk
    from ..materials import tables as mats_mod

    sg = jax.lax.stop_gradient
    r_ = o.x.shape[0]
    n_extra = 7 if scene.has_checker else 0

    def empty(n_attr):
        return (
            jnp.full((r_,), BIG),
            jnp.zeros((r_,), jnp.int32),
            jnp.zeros((r_,), bool),
            [jnp.zeros((r_,), jnp.float32)] * n_attr,
        )

    o_, d_, tm_, tmax_ = sg(o), sg(d), sg(tm), sg(t_max)
    if scene.spheres.radius.shape[0] > 0:
        consts_s = pk._material_consts(
            sg(scene.materials), sg(scene.textures), scene.spheres.mat
        )
        t_s, i_s, h_s, a_s = pk.sphere_closest_attrs(
            sg(scene.spheres), consts_s, o_, d_, tm_, tmax_,
            t_min=float(t_min), n_attr=10 + n_extra,
        )
    else:
        t_s, i_s, h_s, a_s = empty(10 + n_extra)
    if scene.planar.d.shape[0] > 0:
        consts_p = pk._material_consts(
            sg(scene.materials), sg(scene.textures), scene.planar.mat
        )
        t_p, i_p, h_p, a_p = pk.planar_closest_attrs(
            sg(scene.planar), consts_p, o_, d_, tmax_,
            t_min=float(t_min), n_attr=12 + n_extra,
        )
    else:
        t_p, i_p, h_p, a_p = empty(12 + n_extra)

    sphere_wins = h_s & (~h_p | (t_s < t_p))
    t_surf = jnp.where(sphere_wins, t_s, t_p)
    which = jnp.where(
        sphere_wins, HIT_SPHERE, jnp.where(h_p, HIT_PLANAR, HIT_NONE)
    ).astype(jnp.int32)
    idx = jnp.where(sphere_wins, i_s, i_p)
    hit_surf = h_s | h_p

    def pick(si, pi):
        return jnp.where(sphere_wins, a_s[si], a_p[pi])

    attrs = dict(
        # sphere geometry (garbage on planar lanes, masked by `which`)
        center=V3(a_s[0], a_s[1], a_s[2]),
        rad2=a_s[3],
        # planar geometry
        pnormal=V3(a_p[0], a_p[1], a_p[2]),
        alpha=a_p[3],
        beta=a_p[4],
        pkind=a_p[11],
        # material constants (merged)
        kindpack=pick(4, 5),
        fuzz=pick(5, 6),
        ior=pick(6, 7),
        col=V3(pick(7, 8), pick(8, 9), pick(9, 10)),
    )
    if scene.has_checker:
        attrs.update(
            even=V3(pick(10, 12), pick(11, 13), pick(12, 14)),
            odd=V3(pick(13, 15), pick(14, 16), pick(15, 17)),
            scale=pick(16, 18),
        )

    # Volumes: stochastic preemption; inject the (few) volume materials'
    # constants via per-volume selects — no per-ray gathers.
    if scene.n_volumes > 0:
        t_limit = jnp.where(hit_surf, t_surf, jnp.full_like(t_surf, BIG))
        u_vol = _volume_uniforms(seed, stream, bounce, PURPOSE_VOL_MAIN, scene.n_volumes)
        t_v, i_v, h_v = _sample_volumes(sg(scene.volumes), o_, d_, t_min, t_limit, u_vol)
        vol_wins = h_v & (~hit_surf | (t_v < t_surf))
        t_surf = jnp.where(vol_wins, t_v, t_surf)
        which = jnp.where(vol_wins, HIT_VOLUME, which).astype(jnp.int32)
        idx = jnp.where(vol_wins, i_v, idx)
        mats_sg = sg(scene.materials)
        tex_sg = sg(scene.textures)
        for vi in range(scene.n_volumes):
            m = vol_wins & (idx == vi)
            vmat = scene.volumes.mat[vi]
            vkind = mats_sg.kind[vmat]
            vtex = mats_sg.tex[vmat]
            vtexkind = tex_sg.kind[vtex]
            attrs["kindpack"] = jnp.where(
                m, (vkind * 8 + vtexkind).astype(jnp.float32), attrs["kindpack"]
            )
            attrs["fuzz"] = jnp.where(m, mats_sg.fuzz[vmat], attrs["fuzz"])
            attrs["ior"] = jnp.where(m, mats_sg.ior[vmat], attrs["ior"])
            vcol = V3(tex_sg.color[vtex, 0], tex_sg.color[vtex, 1], tex_sg.color[vtex, 2])
            attrs["col"] = V3.select(m, V3.from_tuple((0, 0, 0), like=attrs["col"]) + vcol, attrs["col"])

    return t_surf, which, idx, attrs


def _attr_record_and_albedo(scene: Scene, o: V3, d: V3, t, which, attrs):
    """Hit record + albedo from kernel attributes (no table gathers).

    Known simplification: circle UV is not reconstructed (only used by
    image textures, which force the gather path anyway)."""
    p = o.at(d, t)

    # sphere record
    rad = jnp.sqrt(jnp.maximum(attrs["rad2"], 1e-20))
    outward = (p - attrs["center"]) * (1.0 / rad)
    s_front = d.dot(outward) < 0.0
    s_normal = V3.select(s_front, outward, -outward)

    # planar record
    pn = attrs["pnormal"]
    p_front = d.dot(pn) < 0.0
    p_normal = V3.select(p_front, pn, -pn)

    is_sphere = which == HIT_SPHERE
    is_vol = which == HIT_VOLUME
    normal = V3.select(is_sphere, s_normal, p_normal)
    normal = V3.select(is_vol, V3.full(t.shape, (1.0, 0.0, 0.0)), normal)
    front = jnp.where(is_sphere, s_front, p_front) | is_vol

    matkind = (attrs["kindpack"] / 8.0).astype(jnp.int32)
    texkind = (attrs["kindpack"].astype(jnp.int32)) % 8

    albedo = attrs["col"]
    if scene.has_checker:
        inv_scale = attrs["scale"]
        lx = jnp.floor(inv_scale * p.x + 1e-4).astype(jnp.int32)
        ly = jnp.floor(inv_scale * p.y + 1e-4).astype(jnp.int32)
        lz = jnp.floor(inv_scale * p.z + 1e-4).astype(jnp.int32)
        is_even = (lx + ly + lz) % 2 == 0
        checker = V3.select(is_even, attrs["even"], attrs["odd"])
        from ..materials import textures as tex_mod

        albedo = V3.select(texkind == tex_mod.TEX_CHECKER, checker, albedo)

    return p, normal, front, matkind, albedo


def _winner_t(scene: Scene, o: V3, d: V3, tm, t_min, which, idx, aux,
              seed, stream, bounce):
    """Differentiable hit distance for a KNOWN winner primitive (replay
    path).  The sweep's discrete outcome (which, idx, aux) was recorded by
    the fast forward; only the winner's analytic t is recomputed, so
    reverse-mode differentiates ONE primitive per (ray, bounce) instead of
    the whole scene.  Gradients flow through (o, d) — geometry tables are
    not trainable (parallel/sharding.trainable_params).

    Formulas mirror the oracle sweeps exactly: sphere = packs.
    intersect_spheres' stable ``refine`` form; planar = intersect_planar's
    plane solve; volume = _sample_volumes' free-flight; mesh =
    Moller-Trumbore in instance-local space (t is affine-invariant)."""
    r = o.x.shape[0]
    f32 = o.x.dtype
    t = jnp.full((r,), BIG, f32)
    safe_idx = jnp.maximum(idx, 0)

    sp = scene.spheres
    if sp.radius.shape[0] > 0:
        i = jnp.minimum(safe_idx, sp.radius.shape[0] - 1)
        c0 = V3(sp.center[:, 0][i], sp.center[:, 1][i], sp.center[:, 2][i])
        vel = V3(sp.velocity[:, 0][i], sp.velocity[:, 1][i],
                 sp.velocity[:, 2][i])
        center = c0 + vel * tm
        oc = center - o
        a = jnp.maximum(d.dot(d), 1e-30)
        h = d.dot(oc)
        rad = sp.radius[i]
        c = oc.dot(oc) - rad * rad
        disc = h * h - a * c
        pos = lax.stop_gradient(disc) > 0.0
        sq = jnp.where(pos, jnp.sqrt(jnp.where(pos, disc, 1.0)), 0.0)
        r0 = (h - sq) / a
        r1 = (h + sq) / a
        ts = jnp.where(lax.stop_gradient(r0) > t_min, r0, r1)
        t = jnp.where(which == HIT_SPHERE, ts, t)

    pp = scene.planar
    if pp.d.shape[0] > 0:
        i = jnp.minimum(safe_idx, pp.d.shape[0] - 1)
        nrm = V3(pp.normal[:, 0][i], pp.normal[:, 1][i], pp.normal[:, 2][i])
        denom = nrm.dot(d)
        safe = jnp.where(
            jnp.abs(lax.stop_gradient(denom)) < vec.EPS_PARALLEL, 1.0, denom
        )
        tp = (pp.d[i] - nrm.dot(o)) / safe
        t = jnp.where(which == HIT_PLANAR, tp, t)

    for mi, proto in enumerate(scene.meshes):
        sel = which == HIT_MESH_BASE + mi
        nt = proto.tri_v0.shape[0]
        i = jnp.minimum(safe_idx, nt - 1)
        ai = jnp.minimum(jnp.maximum(aux, 0), proto.inst_w2l.shape[0] - 1)
        w2l = proto.inst_w2l  # [I, 3, 4]

        def lrow(k, translate):
            m0 = w2l[:, k, 0][ai]
            m1 = w2l[:, k, 1][ai]
            m2 = w2l[:, k, 2][ai]
            ol = m0 * o.x + m1 * o.y + m2 * o.z
            dl = m0 * d.x + m1 * d.y + m2 * d.z
            if translate:
                ol = ol + w2l[:, k, 3][ai]
            return ol, dl

        (ox, dx), (oy, dy), (oz, dz) = lrow(0, True), lrow(1, True), lrow(2, True)
        ol, dl = V3(ox, oy, oz), V3(dx, dy, dz)
        v0 = V3(proto.tri_v0[:, 0][i], proto.tri_v0[:, 1][i], proto.tri_v0[:, 2][i])
        e1 = V3(proto.tri_e1[:, 0][i], proto.tri_e1[:, 1][i], proto.tri_e1[:, 2][i])
        e2 = V3(proto.tri_e2[:, 0][i], proto.tri_e2[:, 1][i], proto.tri_e2[:, 2][i])
        hv = dl.cross(e2)
        av = e1.dot(hv)
        fv = 1.0 / jnp.where(
            jnp.abs(lax.stop_gradient(av)) < 1e-12, 1.0, av
        )
        sv = ol - v0
        qv = sv.cross(e1)
        tt = fv * e2.dot(qv)
        t = jnp.where(sel, tt, t)

    if scene.n_volumes > 0:
        vp = scene.volumes
        u_vol = _volume_uniforms(seed, stream, bounce, PURPOSE_VOL_MAIN,
                                 scene.n_volumes)
        ray_len = d.length()
        t_v = jnp.zeros((r,), f32)
        for vi in range(scene.n_volumes):
            m = vp.world_to_local[vi]
            ol = [m[k, 0] * o.x + m[k, 1] * o.y + m[k, 2] * o.z + m[k, 3]
                  for k in range(3)]
            dl = [m[k, 0] * d.x + m[k, 1] * d.y + m[k, 2] * d.z
                  for k in range(3)]
            t0 = jnp.full((r,), -np.inf, f32)
            for k in range(3):
                dk = dl[k]
                safe = jnp.where(jnp.abs(dk) < 1e-12,
                                 jnp.where(dk < 0, -1e-12, 1e-12), dk)
                inv = 1.0 / safe
                ta = (vp.box_min[vi, k] - ol[k]) * inv
                tb = (vp.box_max[vi, k] - ol[k]) * inv
                t0 = jnp.maximum(t0, jnp.minimum(ta, tb))
            t0c = jnp.maximum(t0, t_min)
            lu = jnp.log(jnp.maximum(u_vol[:, vi], 1e-38))
            tv = t0c + vp.neg_inv_density[vi] * lu / ray_len
            t_v = jnp.where(safe_idx == vi, tv, t_v)
        t = jnp.where(which == HIT_VOLUME, t_v, t)

    return t


def closest_hit(scene: Scene, o: V3, d: V3, tm, t_min, t_max, seed, stream, bounce):
    """Closest surface hit, then stochastic volume preemption.

    Returns (t [R], which [R] i32, idx [R], aux [R] mesh-instance id,
    overflow scalar i32 — dropped frontier pairs, see MESH_CAP_FACTOR).
    """
    (t_s, i_s, h_s), (t_p, i_p, h_p) = _surface_intersects(
        scene, o, d, tm, t_min, t_max
    )

    sphere_wins = h_s & (~h_p | (t_s < t_p))
    t_surf = jnp.where(sphere_wins, t_s, t_p)
    which = jnp.where(
        sphere_wins,
        HIT_SPHERE,
        jnp.where(h_p, HIT_PLANAR, HIT_NONE),
    ).astype(jnp.int32)
    idx = jnp.where(sphere_wins, i_s, i_p)
    hit_surf = h_s | h_p
    aux = jnp.zeros_like(idx)
    overflow = jnp.int32(0)

    for mi, proto in enumerate(scene.meshes):
        t_limit = jnp.where(hit_surf, jnp.minimum(t_surf, t_max), t_max)
        t_m, tri_m, inst_m, h_m, ovf = _mesh_intersect(proto, o, d, t_min, t_limit)
        mesh_wins = h_m & (~hit_surf | (t_m < t_surf))
        t_surf = jnp.where(mesh_wins, t_m, t_surf)
        which = jnp.where(mesh_wins, HIT_MESH_BASE + mi, which).astype(jnp.int32)
        idx = jnp.where(mesh_wins, tri_m, idx)
        aux = jnp.where(mesh_wins, inst_m, aux)
        hit_surf = hit_surf | h_m
        overflow = overflow + jnp.asarray(ovf, jnp.int32)

    if scene.n_volumes > 0:
        t_limit = jnp.where(hit_surf, t_surf, jnp.full_like(t_surf, BIG))
        u_vol = _volume_uniforms(seed, stream, bounce, PURPOSE_VOL_MAIN, scene.n_volumes)
        t_v, i_v, h_v = _sample_volumes(scene.volumes, o, d, t_min, t_limit, u_vol)
        vol_wins = h_v & (~hit_surf | (t_v < t_surf))
        t_surf = jnp.where(vol_wins, t_v, t_surf)
        which = jnp.where(vol_wins, HIT_VOLUME, which).astype(jnp.int32)
        idx = jnp.where(vol_wins, i_v, idx)

    return t_surf, which, idx, aux, overflow


_rows_gather = fetch.rows_fetch


def _sphere_record(pack: packs.SpherePack, idx, o: V3, d: V3, tm, t):
    """SoA sphere hit record (UV per getSphereUV, rt/sphere.go:53-59)."""
    cx, cy, cz, vx, vy, vz, rad, mat = _rows_gather(
        [pack.center[:, 0], pack.center[:, 1], pack.center[:, 2],
         pack.velocity[:, 0], pack.velocity[:, 1], pack.velocity[:, 2],
         pack.radius, pack.mat], idx)
    c0 = V3(cx, cy, cz)
    vel = V3(vx, vy, vz)
    center = c0 + vel * tm
    p = o.at(d, t)
    outward = (p - center) * (1.0 / rad)
    front = d.dot(outward) < 0.0
    normal = V3.select(front, outward, -outward)
    # Grad-safe UV: arccos'(+-1) is Inf and arctan2 at (0,0) is 0/0 — both
    # produce NaN in the BACKWARD for lanes whose (untaken) sphere branch
    # saturates (0 * Inf = NaN), poisoning e.g. every fuzz gradient.  The
    # where-guards keep the forward bit-identical while the saturated
    # lanes differentiate a harmless constant instead.
    xc = jnp.clip(-outward.y, -1.0, 1.0)
    x_in = jnp.abs(xc) < 1.0
    theta = jnp.where(x_in, jnp.arccos(jnp.where(x_in, xc, 0.0)),
                      jnp.where(xc > 0, 0.0, np.pi))
    az, ax = -outward.z, outward.x
    pole = (az == 0.0) & (ax == 0.0)
    phi = jnp.arctan2(jnp.where(pole, 0.0, az),
                      jnp.where(pole, 1.0, ax)) + np.pi
    uu = phi / (2.0 * np.pi)
    vv = theta / np.pi
    return p, normal, front, uu, vv, mat


def _planar_record(pack: packs.PlanarPack, idx, o: V3, d: V3, t):
    """SoA planar hit record (quad/tri barycentrics; circle local frame)."""
    (qx, qy, qz, nx, ny, nz, ux, uy, uz, vx, vy, vz, wx, wy, wz,
     rad, kind, mat) = _rows_gather(
        [pack.q[:, 0], pack.q[:, 1], pack.q[:, 2],
         pack.normal[:, 0], pack.normal[:, 1], pack.normal[:, 2],
         pack.u[:, 0], pack.u[:, 1], pack.u[:, 2],
         pack.v[:, 0], pack.v[:, 1], pack.v[:, 2],
         pack.w[:, 0], pack.w[:, 1], pack.w[:, 2],
         pack.radius, pack.kind, pack.mat], idx)
    q = V3(qx, qy, qz)
    nrm = V3(nx, ny, nz)
    u_e = V3(ux, uy, uz)
    v_e = V3(vx, vy, vz)
    w = V3(wx, wy, wz)

    p = o.at(d, t)
    rel = p - q
    alpha = w.dot(rel.cross(v_e))
    beta = w.dot(u_e.cross(rel))

    # Circle UV: local frame from the normal (rt/circle.go:58-71)
    use_x = jnp.abs(nrm.y) > 0.9
    ref_axis = V3.select(
        use_x,
        V3.from_tuple((1.0, 0.0, 0.0), like=V3(nrm.x, nrm.y, nrm.z)),
        V3.from_tuple((0.0, 1.0, 0.0), like=V3(nrm.x, nrm.y, nrm.z)),
    )
    cu = ref_axis.cross(nrm).unit()
    cv = nrm.cross(cu)
    safe_rad = jnp.where(rad > 0, rad, 1.0)
    cx = rel.dot(cu) / safe_rad
    cy = rel.dot(cv) / safe_rad
    circ_u = (cx + 1.0) * 0.5
    circ_v = (cy + 1.0) * 0.5

    uu = jnp.where(kind == packs.KIND_CIRCLE, circ_u,
                   jnp.where(kind == packs.KIND_PLANE, 0.0, alpha))
    vv = jnp.where(kind == packs.KIND_CIRCLE, circ_v,
                   jnp.where(kind == packs.KIND_PLANE, 0.0, beta))

    front = d.dot(nrm) < 0.0
    normal = V3.select(front, nrm, -nrm)
    return p, normal, front, uu, vv, mat


def _mesh_record(proto, tri, inst, o: V3, d: V3, t):
    """SoA mesh hit record: TWO row gathers (9 tri floats by triangle,
    22 instance floats by instance) instead of mesh_bvh.mesh_hit_record's
    per-component gathers + [R,3] einsums (which lane-pad 3 -> 128).
    Same math as mesh_bvh.mesh_hit_record (the oracle; tests compare)."""
    tri = jnp.maximum(tri, 0)
    inst = jnp.maximum(inst, 0)
    tv = _rows_gather(
        [proto.tri_v0[:, 0], proto.tri_v0[:, 1], proto.tri_v0[:, 2],
         proto.tri_e1[:, 0], proto.tri_e1[:, 1], proto.tri_e1[:, 2],
         proto.tri_e2[:, 0], proto.tri_e2[:, 1], proto.tri_e2[:, 2]], tri)
    v0 = V3(tv[0], tv[1], tv[2])
    e1 = V3(tv[3], tv[4], tv[5])
    e2 = V3(tv[6], tv[7], tv[8])
    w2l = proto.inst_w2l.reshape(-1, 12)
    nmat = proto.inst_nmat.reshape(-1, 9)
    iv = _rows_gather(
        [w2l[:, k] for k in range(12)] + [nmat[:, k] for k in range(9)]
        + [proto.inst_mat], inst)
    o_l = V3(iv[0] * o.x + iv[1] * o.y + iv[2] * o.z + iv[3],
             iv[4] * o.x + iv[5] * o.y + iv[6] * o.z + iv[7],
             iv[8] * o.x + iv[9] * o.y + iv[10] * o.z + iv[11])
    d_l = V3(iv[0] * d.x + iv[1] * d.y + iv[2] * d.z,
             iv[4] * d.x + iv[5] * d.y + iv[6] * d.z,
             iv[8] * d.x + iv[9] * d.y + iv[10] * d.z)

    # Barycentric UV via Moller-Trumbore partials (rt/triangle.go:75-88)
    h = d_l.cross(e2)
    a = e1.dot(h)
    f = 1.0 / jnp.where(jnp.abs(a) < 1e-12, 1.0, a)
    s = o_l - v0
    uu = f * s.dot(h)
    q = s.cross(e1)
    vv = f * d_l.dot(q)

    n_local = e1.cross(e2)
    n_world = V3(
        iv[12] * n_local.x + iv[13] * n_local.y + iv[14] * n_local.z,
        iv[15] * n_local.x + iv[16] * n_local.y + iv[17] * n_local.z,
        iv[18] * n_local.x + iv[19] * n_local.y + iv[20] * n_local.z,
    ).unit()
    front = d.dot(n_world) < 0.0
    normal = V3.select(front, n_world, -n_world)
    p = o.at(d, t)
    return p, normal, front, uu, vv, iv[21]


def extract_record(scene: Scene, o: V3, d: V3, tm, t, which, idx, aux):
    """Hit record for the winning primitive per ray (SoA)."""
    r = o.x.shape[0]
    p = o.at(d, t)
    normal = V3.full((r,), (1.0, 0.0, 0.0))  # volume normal (rt/volume.go:73)
    front = jnp.ones((r,), bool)
    uu = jnp.zeros((r,), o.x.dtype)
    vv = jnp.zeros((r,), o.x.dtype)
    mat_id = jnp.zeros((r,), jnp.int32)

    if scene.spheres.radius.shape[0] > 0:
        sp, sn, sf, su, sv, sm = _sphere_record(scene.spheres, idx, o, d, tm, t)
        m = which == HIT_SPHERE
        p = V3.select(m, sp, p)
        normal = V3.select(m, sn, normal)
        front = jnp.where(m, sf, front)
        uu = jnp.where(m, su, uu)
        vv = jnp.where(m, sv, vv)
        mat_id = jnp.where(m, sm, mat_id)

    if scene.planar.d.shape[0] > 0:
        pp, pn, pf, pu, pv, pm = _planar_record(scene.planar, idx, o, d, t)
        m = which == HIT_PLANAR
        p = V3.select(m, pp, p)
        normal = V3.select(m, pn, normal)
        front = jnp.where(m, pf, front)
        uu = jnp.where(m, pu, uu)
        vv = jnp.where(m, pv, vv)
        mat_id = jnp.where(m, pm, mat_id)

    for mi, proto in enumerate(scene.meshes):
        mp, mn, mf, mu, mv, mm = _mesh_record(proto, idx, aux, o, d, t)
        m = which == HIT_MESH_BASE + mi
        p = V3.select(m, mp, p)
        normal = V3.select(m, mn, normal)
        front = jnp.where(m, mf, front)
        uu = jnp.where(m, mu, uu)
        vv = jnp.where(m, mv, vv)
        mat_id = jnp.where(m, mm, mat_id)

    if scene.n_volumes > 0:
        m = which == HIT_VOLUME
        mat_id = jnp.where(m, scene.volumes.mat[idx], mat_id)

    return p, normal, front, uu, vv, mat_id


def occluded(scene: Scene, o: V3, d: V3, tm, t_min, t_max, seed, stream, bounce,
             purpose_base, active=None):
    """Shadow-ray test: anything (surface or stochastic medium) in
    (t_min, t_max)?  Mirrors world.Hit on shadow rays (rt/camera.go:582,639),
    which includes volumes.

    ``active`` (optional bool mask): lanes whose answer the caller will
    discard.  Their t_max collapses to -1 so the predicated mesh sweeps
    (and any fully-inactive ray block) skip all box/triangle work."""
    if active is not None:
        t_max = jnp.where(active, t_max, -1.0)
    (t_s, _, h_s), (t_p, _, h_p) = _surface_intersects(
        scene, o, d, tm, t_min, t_max
    )
    blocked = h_s | h_p
    t_surf = jnp.minimum(
        jnp.where(h_s, t_s, BIG), jnp.where(h_p, t_p, BIG)
    )
    overflow = jnp.int32(0)
    for proto in scene.meshes:
        # Any-hit mode: the kernel collapses a ray's t on its first hit so
        # later segments prune; the returned t is unusable, but shadow rays
        # only need `blocked`.
        _, _, _, h_m, ovf = _mesh_intersect(
            proto, o, d, t_min, jnp.minimum(t_surf, t_max), any_hit=True
        )
        blocked = blocked | h_m
        t_surf = jnp.where(h_m, t_min, t_surf)
        overflow = overflow + jnp.asarray(ovf, jnp.int32)
    if scene.n_volumes > 0:
        u_vol = _volume_uniforms(seed, stream, bounce, purpose_base, scene.n_volumes)
        t_limit = jnp.minimum(t_surf, t_max)
        _, _, h_v = _sample_volumes(scene.volumes, o, d, t_min, t_limit, u_vol)
        blocked = blocked | h_v
    return blocked, overflow


# -----------------------------------------------------------------------------
# NEE / MIS
# -----------------------------------------------------------------------------

def sample_area_light(scene: Scene, cam, p: V3, normal: V3, ray_d: V3,
                      attenuation: V3, mat_id, seed, stream, bounce,
                      mat_attrs=None, active=None, blocked=None):
    """NEE toward one uniformly chosen registered quad light
    (rt/camera.go:609-678).  Returns (V3 contribution (no throughput),
    mesh-frontier overflow scalar, blocked [R] bool).

    ``blocked``: optional recorded shadow-sweep outcome (replay path) —
    when given, the occlusion sweep is skipped entirely."""
    n_lights = scene.n_lights
    u_pick = rngmod.uniform(seed, stream, bounce, rngmod.LIGHT_PICK)
    li = jnp.minimum((u_pick * n_lights).astype(jnp.int32), n_lights - 1)

    a_s, b_s = rngmod.uniform2(seed, stream, bounce, rngmod.LIGHT_U)
    (lqx, lqy, lqz, lux, luy, luz, lvx, lvy, lvz, lnx, lny, lnz, larea,
     lmat) = _rows_gather(
        [scene.light_q[:, 0], scene.light_q[:, 1], scene.light_q[:, 2],
         scene.light_u[:, 0], scene.light_u[:, 1], scene.light_u[:, 2],
         scene.light_v[:, 0], scene.light_v[:, 1], scene.light_v[:, 2],
         scene.light_normal[:, 0], scene.light_normal[:, 1],
         scene.light_normal[:, 2], scene.light_area, scene.light_mat], li)
    lq = V3(lqx, lqy, lqz)
    lu = V3(lux, luy, luz)
    lv = V3(lvx, lvy, lvz)
    lnrm = V3(lnx, lny, lnz)

    light_point = lq + lu * a_s + lv * b_s
    to_light = light_point - p
    dist = to_light.length()
    light_dir = to_light.unit()

    cos_theta = normal.dot(light_dir)
    facing = cos_theta > 0.0
    shadow_active = facing if active is None else (facing & active)

    if blocked is None:
        blocked, overflow = occluded(
            scene, p, light_dir, jnp.zeros_like(dist), SHADOW_EPS,
            dist - SHADOW_EPS, seed, stream, bounce, PURPOSE_VOL_SHADOW_AREA,
            active=shadow_active,
        )
    else:
        overflow = jnp.int32(0)

    # Emission at (u=0, v=0, light_point) (rt/camera.go:645)
    emission = mats.emitted(
        scene.materials, scene.textures, lmat,
        jnp.zeros_like(dist), jnp.zeros_like(dist), light_point,
        **scene.tex_flags,
    )

    cos_light = jnp.abs(lnrm.dot(-light_dir))
    grazing = cos_light < 1e-3  # rt/camera.go:651
    # Grazing lanes are discarded below (ok &= ~grazing), but their pdf
    # must still be FINITE-BACKWARD: a `maximum(x, 1e-20)` clamp makes the
    # division's backward compute a/b^2 with b^2 = 1e-40, which UNDERFLOWS
    # f32 to 0 -> inf partial -> 0*inf = NaN that poisons every summed
    # parameter gradient routed through p (rays that hit the light quad
    # itself sample a coplanar light point: cos_light == 0 exactly).
    pl_denom = jnp.where(grazing, 1.0, cos_light * larea)
    pdf_light = (dist * dist) / pl_denom

    wi = (-ray_d).unit()
    if mat_attrs is not None:
        pdf_brdf = mats.brdf_pdf_from_attrs(
            mat_attrs[0], mat_attrs[1], wi, light_dir, normal
        )
    else:
        pdf_brdf = mats.brdf_pdf(scene.materials, mat_id, wi, light_dir, normal)
    # Safe divisions: lanes masked below must not produce inf/NaN in the
    # primal (masked infinities poison the backward pass: 0 * inf).
    # Floor 1e-15 (not 1e-20): the backward of a/b squares the clamped
    # denominator, and (1e-20)^2 underflows f32 (see pl_denom above).
    weight = pdf_light / jnp.maximum(pdf_light + pdf_brdf, 1e-15)

    scale = cos_theta / jnp.maximum(pdf_light, 1e-12) * weight * float(n_lights)
    contrib = (emission * attenuation * scale).minimum(FIREFLY_CLAMP)
    ok = facing & ~blocked & ~grazing
    return V3.select(ok, contrib, V3.zeros(ok.shape)), overflow, blocked


def sample_hdri_light(scene: Scene, cam, p: V3, normal: V3, ray_d: V3,
                      attenuation: V3, mat_id, seed, stream, bounce,
                      mat_attrs=None, active=None, blocked=None):
    """NEE toward the HDRI via importance sampling (rt/camera.go:565-607).
    Returns (V3 contribution, mesh-frontier overflow scalar, blocked);
    ``blocked`` input as in :func:`sample_area_light`."""
    xi1 = rngmod.uniform(seed, stream, bounce, rngmod.HDRI_ROW)
    xi2 = rngmod.uniform(seed, stream, bounce, rngmod.HDRI_COL)
    light_dir, emission, pdf_h = hdri_mod.sample_direction_soa(scene.env, xi1, xi2)

    cos_theta = normal.dot(light_dir)
    facing = cos_theta > 0.0
    shadow_active = facing if active is None else (facing & active)

    r = p.x.shape[0]
    if blocked is None:
        blocked, overflow = occluded(
            scene, p, light_dir, jnp.zeros((r,), p.x.dtype), SHADOW_EPS,
            jnp.full((r,), BIG), seed, stream, bounce, PURPOSE_VOL_SHADOW_HDRI,
            active=shadow_active,
        )
    else:
        overflow = jnp.int32(0)

    wi = (-ray_d).unit()
    if mat_attrs is not None:
        pdf_b = mats.brdf_pdf_from_attrs(
            mat_attrs[0], mat_attrs[1], wi, light_dir, normal
        )
    else:
        pdf_b = mats.brdf_pdf(scene.materials, mat_id, wi, light_dir, normal)
    # Floor 1e-15: (1e-20)^2 underflows f32 in the division's backward.
    weight = pdf_h / jnp.maximum(pdf_h + pdf_b, 1e-15)
    scale = cos_theta / jnp.maximum(pdf_h, 1e-12) * weight
    contrib = (emission * attenuation * scale).minimum(FIREFLY_CLAMP)
    ok = facing & ~blocked
    return V3.select(ok, contrib, V3.zeros(ok.shape)), overflow, blocked


def _miss_radiance(scene: Scene, cam: Camera, d: V3, primary) -> V3:
    """Environment / sky gradient / flat background (rt/camera.go:452-466).

    ``primary``: bool mask — the lane's miss happened on the first segment
    (the phantom-HDRI test ``depth == MaxDepth``, rt/camera.go:456).
    """
    if scene.env is not None:
        col = hdri_mod.sample_soa(scene.env, d)
        if cam.phantom_hdri:
            col = V3.select(primary, V3.zeros(col.x.shape), col)
        return col
    if cam.use_sky_gradient:
        unit_d = d.unit()
        a = 0.5 * (unit_d.y + 1.0)
        return V3(
            (1.0 - a) + a * 0.5,
            (1.0 - a) + a * 0.7,
            (1.0 - a) + a * 1.0,
        )
    return V3.full(d.x.shape, cam.background, d.x.dtype)


def _vma_of(x):
    try:
        return frozenset(jax.typeof(x).vma)
    except Exception:
        return frozenset()


def _promote_vma(x, axes):
    """Add any missing varying-manual-axes (shard_map mesh axes) to a tree."""

    def one(v):
        missing = tuple(axes - _vma_of(v))
        if missing:
            try:
                return jax.lax.pcast(v, missing, to="varying")
            except (AttributeError, TypeError):
                return jax.lax.pvary(v, missing)
        return v

    return jax.tree_util.tree_map(one, x)


def image_prefactor_ok(scene: Scene) -> bool:
    """Static gate (concrete scene, outside jit) for the DEFERRED IMAGE
    ALBEDO factorization: with exactly one sphere, an image-lambertian
    material on it, and no lights / env / other geometry, an image hit
    can only happen on the PRIMARY segment (a cosine-hemisphere scatter
    off a convex body never re-enters it) and every radiance term is a
    miss term scaled once by its albedo — so
        radiance == albedo(primary u,v) * radiance(albedo := 1)
    exactly.  The megakernel then runs on the stripped scene and ONE
    XLA row-gather per camera ray applies the texels (the earth scene,
    rt/scenes.go:242-273 + rt/image_texture.go:26-41; per-ray gathers in
    the bounce loop are the reason image scenes were excluded from the
    kernel, CLAUDE.md perf rule 2)."""
    import numpy as np

    if not scene.has_image or scene.env is not None:
        return False
    if scene.n_lights or scene.n_volumes or scene.meshes:
        return False
    if scene.planar.d.shape[0] != 0 or scene.spheres.radius.shape[0] != 1:
        return False
    mat = int(np.asarray(scene.spheres.mat)[0])
    if int(np.asarray(scene.materials.kind)[mat]) != mats.MAT_LAMBERTIAN:
        return False
    tex_id = int(np.asarray(scene.materials.tex)[mat])
    return int(np.asarray(scene.textures.kind)[tex_id]) == tex.TEX_IMAGE


def _strip_image(scene: Scene) -> Scene:
    """Image textures -> solid white (traced ops; static has_image flag
    flips so the kernels see a gather-free scene)."""
    import dataclasses

    tp = scene.textures
    is_img = tp.kind == tex.TEX_IMAGE
    stripped = tp._replace(
        kind=jnp.where(is_img, tex.TEX_SOLID, tp.kind),
        color=jnp.where(is_img[:, None], 1.0, tp.color),
    )
    return dataclasses.replace(scene, textures=stripped, has_image=False)


def _primary_image_records(scene: Scene, o: V3, d: V3, tm):
    """Primary-hit image-albedo records for 'image' mega mode and its
    gradient tier: (albedo V3 (1.0 on miss), flat atlas texel id [R]
    i32 (nearest fetch, textures.evaluate semantics), hit mask [R]).
    Root selection/eps identical to the closest-hit sweep."""
    r_ = o.x.shape[0]
    t_s, i_s, h_s = packs.intersect_spheres(
        scene.spheres, o.rows(), d.rows(), tm, vec.EPS_HIT,
        jnp.full((r_,), BIG))
    t_rec = jnp.where(h_s, t_s, 1.0)
    p, _, _, uu, vv, mat = _sphere_record(
        scene.spheres, jnp.zeros((r_,), jnp.int32), o, d, tm, t_rec)
    tex_id = fetch.rows_fetch([scene.materials.tex], mat)[0]
    albedo = tex.evaluate(scene.textures, tex_id, uu, vv, p,
                          has_noise=False, has_image=True)
    # nearest-texel flat id, mirroring textures.evaluate's image branch
    pack = scene.textures
    img = fetch.rows_fetch([pack.image_id], tex_id)[0]
    w_, h_ = fetch.rows_fetch([pack.atlas_wh[:, 0], pack.atlas_wh[:, 1]],
                              img)
    uc = jnp.clip(uu, 0.0, 1.0)
    vc = 1.0 - jnp.clip(vv, 0.0, 1.0)
    xi = jnp.clip((uc * w_.astype(uu.dtype)).astype(jnp.int32), 0, w_ - 1)
    yi = jnp.clip((vc * h_.astype(uu.dtype)).astype(jnp.int32), 0, h_ - 1)
    _, hh, ww, _ = pack.atlas.shape
    texel = (img * hh + yi) * ww + xi
    return (V3.select(h_s, albedo, V3.full((r_,), (1.0, 1.0, 1.0))),
            texel, h_s)


def _primary_image_factor(scene: Scene, o: V3, d: V3, tm) -> V3:
    """Per-camera-ray image albedo at the primary sphere hit (1.0 on
    miss)."""
    return _primary_image_records(scene, o, d, tm)[0]


def choose_mega_mode(scene: Scene, cam, r: int, differentiable: bool) -> str:
    """Static megakernel dispatch decision: 'off' | 'single' | 'split' |
    'image' (single + deferred-image-albedo prefactor).
    Callers that jit around trace() should compute this OUTSIDE the jit
    and pass it as a static argument, so flipping megakernel flags (env
    vars, INTERPRET) retraces instead of silently reusing a cached
    executable."""
    import dataclasses

    from ..ops import pallas_wavefront as mega

    if (not differentiable and image_prefactor_ok(scene)
            and mega.applicable(dataclasses.replace(scene, has_image=False))):
        return "image"
    if differentiable or not mega.applicable(scene):
        return "off"
    use_hdri = scene.env is not None and scene.env_importance
    # Split mode re-streams the precomputed HDRI-NEE rows per phase
    # (7 rows x bounces x rays of HBM traffic) — measured 5.8x SLOWER
    # than single on hdri-test at depth 20 (69 -> 402 ms per 4M chunk);
    # deep HDRI configs stay single-phase.
    if (cam.max_depth >= mega.SPLIT_DEPTH_MIN and r >= mega.SPLIT_R_MIN
            and not use_hdri):
        return "split"
    # NOT auto-selected: mid-loop live-ray COMPACTION ('compact', the
    # round-3 roadmap's "compaction cheaper than split mode") measured
    # 0.74x single on random depth 10 (scripts/compact_probe.py) — the
    # state move itself is the floor, not the sort (DESIGN.md 5d).  The
    # mode stays available for explicit mega_mode='compact' experiments.
    return "single"


def trace(scene: Scene, cam: Camera, o, d, tm, stream, seed, *,
          differentiable: bool = True, mega_mode=None, with_stats: bool = False,
          record: bool = False, decisions: Decisions = None):
    """Radiance for a ray megabatch.

    o/d: V3 (or [R,3] arrays, converted); tm/stream [R].  Returns V3, or
    (V3, stats dict) when ``with_stats``; stats carries ``mesh_overflow``
    — the total dropped frontier pairs (scalar i32), which must be 0 for
    a trustworthy render (see MESH_CAP_FACTOR).
    ``differentiable=False`` (renders/benches) allows the gather-free
    winner-attribute fast path on TPU; gradient-bearing traces keep the
    differentiable gather path for material/texture parameters.

    Replay gradients (the fast fwd+bwd path, see render/grad.py):
      ``record=True`` — run the fast non-differentiable forward and ALSO
      return a :class:`Decisions` of the per-bounce sweep outcomes
      (appended to the normal return tuple).
      ``decisions=...`` — differentiable REPLAY: intersection sweeps and
      shadow sweeps are skipped; winners come from the recording and only
      the winner's analytic t is recomputed (see _winner_t).  Gradients
      equal the plain differentiable path's wherever the discrete winners
      are stable (tested in tests/test_replay.py).
    """
    if not isinstance(o, V3):
        o = V3.from_rows(o)
    if not isinstance(d, V3):
        d = V3.from_rows(d)
    r = o.x.shape[0]
    f32 = o.x.dtype
    assert not (record and decisions is not None)
    if decisions is not None:
        differentiable = True

    use_nee = scene.n_lights > 0  # len(c.Lights) > 0 (rt/camera.go:487-489)
    hdri_nee = use_nee and scene.env is not None and scene.env_importance
    fast = attr_path_ok(scene, differentiable) and decisions is None

    # The megakernel runs the whole bounce loop in one pallas kernel with
    # per-block early termination; it produces identical images (same RNG
    # streams).  HDRI-NEE scenes stay on the standard path (CDF sampling
    # needs large-table bisection the kernel doesn't do).
    # ``mega_mode`` must be decided OUTSIDE jit by callers that want the
    # choice in their cache key (see choose_mega_mode); a None default
    # decides here, at trace time.
    from ..ops import pallas_wavefront as mega

    if decisions is not None:
        mega_mode = "off"  # replay skips the sweeps entirely
    if mega_mode is None:
        mega_mode = choose_mega_mode(scene, cam, r, differentiable)
    if record and mega_mode == "split":
        mega_mode = "off"  # decision recording is single-phase only
    elif record and mega_mode == "compact":
        mega_mode = "single"  # recording stays at kernel speed
    elif record and mega_mode == "image":
        mega_mode = "off"  # replay owns image scenes (gather integrator)
    if mega_mode != "off":
        img_mode = mega_mode == "image"
        s_mega = _strip_image(scene) if img_mode else scene
        res = mega.trace_megakernel(
            s_mega, cam, o, d, tm, stream, seed,
            split=(mega_mode == "split"), record=record,
            compact=(mega_mode == "compact"),
        )
        if record:
            radiance, miss_dir, miss_tp, missed, miss_primary, dk = res
        else:
            radiance, miss_dir, miss_tp, missed, miss_primary = res
        safe_dir = V3.select(
            missed, miss_dir, V3.full((r,), (0.0, 0.0, 1.0), f32)
        )
        miss_col = _miss_radiance(scene, cam, safe_dir, miss_primary)
        rad = radiance + V3.select(
            missed, miss_tp * miss_col, V3.zeros((r,), f32)
        )
        if img_mode:
            # Deferred image albedo: one row gather per CAMERA ray
            # (image_prefactor_ok proves the factorization exact).
            rad = rad * _primary_image_factor(scene, o, d, tm)
        # megakernel scenes have no meshes (mega.applicable) -> no frontier
        out = (rad,)
        if with_stats:
            out = out + (dict(mesh_overflow=jnp.int32(0)),)
        if record:
            which, idx, blk_a, blk_h = dk
            out = out + (Decisions(which, idx, jnp.zeros_like(idx),
                                   blk_a, blk_h),)
        return out if len(out) > 1 else out[0]

    def bounce_step(carry, xs):
        bounce, dec = xs
        (o, d, throughput, radiance, alive, allow_light,
         miss_dir, miss_tp, miss_primary, missed, ovf_total) = carry
        dec_blk_a = dec_blk_h = None

        # Dead lanes get t_max = -1: the predicated mesh sweeps (and any
        # fully-terminated ray block) then skip all box/triangle work.
        t_cap = jnp.where(alive, BIG, -1.0).astype(f32)
        aux = jnp.zeros((r,), jnp.int32)
        if dec is not None:
            which, idx, aux, dec_blk_a, dec_blk_h = dec
            which = jnp.where(alive, which, HIT_NONE)
            t = _winner_t(scene, o, d, tm, vec.EPS_HIT, which, idx, aux,
                          seed, stream, bounce)
        elif fast:
            t, which, idx, attrs = _attr_closest_hit(
                scene, o, d, tm, vec.EPS_HIT, t_cap,
                seed, stream, bounce,
            )
        else:
            t, which, idx, aux, ovf = closest_hit(
                scene, o, d, tm, vec.EPS_HIT, t_cap,
                seed, stream, bounce,
            )
            ovf_total = ovf_total + ovf
        hit = (which != HIT_NONE) & alive

        # --- miss: DEFERRED environment evaluation ------------------------
        # A lane escapes at most once, so instead of evaluating the miss
        # shader (HDRI bilinear fetch = 12 gathers) every bounce, record the
        # escape direction/throughput and evaluate once after the loop.
        lit = alive & ~hit
        miss_dir = V3.select(lit, d, miss_dir)
        miss_tp = V3.select(lit, throughput, miss_tp)
        miss_primary = jnp.where(lit, jnp.equal(bounce, 0), miss_primary)
        missed = missed | lit

        # Miss lanes carry t = BIG; o + BIG*d overflows to inf and would
        # NaN-poison downstream masked math (and its gradients).
        t_rec = jnp.where(hit, t, 1.0)
        if fast:
            p, normal, front, matkind, albedo = _attr_record_and_albedo(
                scene, o, d, t_rec, which, attrs
            )
            sc = mats.scatter_from_attrs(
                matkind, attrs["fuzz"], attrs["ior"], albedo,
                d, normal, front, seed, stream, bounce,
            )
            mat_id = None
            mat_attrs = (matkind, attrs["fuzz"])
        else:
            p, normal, front, uu, vv, mat_id = extract_record(
                scene, o, d, tm, t_rec, which, idx, aux
            )
            sc = mats.scatter(
                scene.materials, scene.textures, mat_id, d, normal, front,
                uu, vv, p, seed, stream, bounce, **scene.tex_flags,
            )
            mat_attrs = None

        # --- emission (iff allow_light_hits, rt/camera.go:473-481) --------
        emit_mask = alive & hit & allow_light
        radiance = radiance + V3.select(
            emit_mask, throughput * sc.emitted, V3.zeros(emit_mask.shape)
        )

        # --- NEE + MIS ----------------------------------------------------
        use_mis = alive & False
        blk_a = blk_h = jnp.zeros(alive.shape, bool)
        if use_nee:
            use_mis = sc.can_use_nee & alive & hit
            direct, ovf, blk_a = sample_area_light(
                scene, cam, p, normal, d, sc.attenuation, mat_id,
                seed, stream, bounce, mat_attrs=mat_attrs, active=use_mis,
                blocked=None if decisions is None else dec_blk_a,
            )
            ovf_total = ovf_total + ovf
            if hdri_nee:
                hdri_direct, ovf, blk_h = sample_hdri_light(
                    scene, cam, p, normal, d, sc.attenuation, mat_id,
                    seed, stream, bounce, mat_attrs=mat_attrs, active=use_mis,
                    blocked=None if decisions is None else dec_blk_h,
                )
                direct = direct + hdri_direct
                ovf_total = ovf_total + ovf
            radiance = radiance + V3.select(
                use_mis, throughput * direct, V3.zeros(use_mis.shape)
            )

        # --- continue the path -------------------------------------------
        alive = alive & hit & sc.scattered
        throughput = V3.select(alive, throughput * sc.attenuation, throughput)
        o = V3.select(alive, p, o)
        d = V3.select(alive, sc.direction, d)
        allow_light = ~use_mis  # rt/camera.go:493 vs :514

        ys = None
        if record:
            ys = (which.astype(jnp.int32), idx.astype(jnp.int32),
                  aux.astype(jnp.int32), blk_a, blk_h)
        return (o, d, throughput, radiance, alive, allow_light,
                miss_dir, miss_tp, miss_primary, missed, ovf_total), ys

    # Inside shard_map the scan carry must have consistent varying-manual-
    # axes: promote every component to the union of the ray inputs' vma.
    axes = (
        _vma_of(o.x) | _vma_of(d.x) | _vma_of(tm) | _vma_of(stream)
    )
    init = _promote_vma(
        (
            o,
            d,
            V3.full((r,), (1.0, 1.0, 1.0), f32),
            V3.zeros((r,), f32),
            jnp.ones((r,), bool),
            jnp.ones((r,), bool),
            V3.zeros((r,), f32),    # miss_dir
            V3.zeros((r,), f32),    # miss throughput
            jnp.zeros((r,), bool),  # miss on primary segment
            jnp.zeros((r,), bool),  # missed at all
            jnp.int32(0),           # mesh frontier overflow
        ),
        axes,
    )
    ys = None
    if differentiable or record:
        # reverse-mode / recording need lax.scan (while_loop has no VJP
        # and no per-iteration outputs)
        bounces = jnp.arange(cam.max_depth, dtype=jnp.uint32)
        xs_dec = None
        if decisions is not None:
            xs_dec = (decisions.which, decisions.idx, decisions.aux,
                      decisions.blk_a, decisions.blk_h)
        # Backward-pass shape experiments (see DESIGN.md "replay backward"):
        # GRT_SCAN_UNROLL=d unrolls the bounce scan (fuses across bounces,
        # drops per-iteration residual round-trips); GRT_REMAT=1 wraps the
        # step in jax.checkpoint (recompute instead of save residuals).
        import os as _os

        step = bounce_step
        if differentiable and _os.environ.get("GRT_REMAT") == "1":
            step = jax.checkpoint(bounce_step)
        if _os.environ.get("GRT_SCAN_PY") == "1":
            # Debug mode: Python loop instead of scan so jax_debug_nans
            # reports the faulting op, not just "nan in scan".
            carry, ys_l = init, []
            for b in range(cam.max_depth):
                dec_b = (None if xs_dec is None
                         else tuple(x[b] for x in xs_dec))
                carry, y = step(carry, (jnp.uint32(b), dec_b))
                ys_l.append(y)
            ys = (None if ys_l[0] is None else
                  jax.tree_util.tree_map(lambda *z: jnp.stack(z), *ys_l))
        else:
            unroll_env = _os.environ.get("GRT_SCAN_UNROLL")
            if unroll_env is not None:
                unroll = int(unroll_env)
            elif jax.default_backend() == "tpu":
                # Unrolling the differentiable bounce loop cuts the
                # replay backward 2.3x on TPU (XLA fuses across bounces;
                # no per-iteration residual round trips through HBM).
                # CPU (tests) keeps the rolled scan: compile time there
                # scales with the unroll and correctness is identical.
                unroll = cam.max_depth
            else:
                unroll = 1
            carry, ys = lax.scan(step, init, (bounces, xs_dec),
                                 unroll=min(unroll, cam.max_depth))
    else:
        # Early termination: deep-depth configs (reference uses up to 50)
        # kill most lanes within a few bounces; stop when none survive.
        def cond(state):
            bounce, carry = state
            return (bounce < cam.max_depth) & jnp.any(carry[4])

        def body(state):
            bounce, carry = state
            carry, _ = bounce_step(carry, (bounce, None))
            return bounce + jnp.uint32(1), carry

        _, carry = lax.while_loop(cond, body, (jnp.uint32(0), init))
    (o, d, throughput, radiance, alive, allow_light,
     miss_dir, miss_tp, miss_primary, missed, ovf_total) = carry

    # Deferred miss-shader evaluation (once per ray, not once per bounce).
    safe_dir = V3.select(missed, miss_dir, V3.full((r,), (0.0, 0.0, 1.0), f32))
    miss_col = _miss_radiance(scene, cam, safe_dir, miss_primary)
    radiance = radiance + V3.select(
        missed, miss_tp * miss_col, V3.zeros((r,), f32)
    )
    out = (radiance,)
    if with_stats:
        out = out + (dict(mesh_overflow=ovf_total),)
    if record:
        out = out + (Decisions(*ys),)
    return out if len(out) > 1 else radiance
