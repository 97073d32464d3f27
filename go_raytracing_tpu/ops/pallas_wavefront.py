"""Wavefront megakernel: the whole bounce loop in one Pallas kernel.

The chunked integrator issues multiple pallas launches plus dozens of
fused XLA ops per bounce; dispatch overhead and HBM state round-trips cost
~23 ns/ray/bounce on Cornell.  This kernel keeps the ENTIRE path loop
on-chip: a grid step owns a (32,128) block of 4096 rays whose state
(origin, direction, throughput, radiance, flags) stays in registers/VMEM
across bounces, and an in-kernel ``while`` runs until the block's rays are
all dead or max_depth is reached — per-block early termination that the
XLA formulation cannot express (a chunk-level any(alive) gate is useless
when one live ray pins 4M).

Per bounce, entirely in-kernel (parity citations in integrator/wavefront):
  planar + sphere closest-hit sweeps with winner attributes, stochastic
  OBB volume scattering, miss capture for the deferred environment shader,
  emission w/ allowLightHits, branchless scatter, and NEE toward a
  uniformly picked quad light with a shadow sweep and balance-heuristic
  MIS.  The RNG is the same PCG3D counter scheme as core/rng.py, so the
  megakernel's image is IDENTICAL to the standard integrator's (tested).

Static specialization per scene: planar/sphere/volume/light counts,
NEE on/off, checker on/off.  Scenes with meshes or noise/image textures
use the regular integrator path.  Enabled on TPU unless
``GRT_NO_MEGAKERNEL=1``.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core import rng as rngmod
from ..core import vec as vec_consts
from ..geometry import packs

BIG = packs.BIG  # one shared definition (geometry/packs.py)
# Rays per grid step = BLOCK_ROWS * 128.  Smaller blocks cull finer (the
# sphere-segment test and the early block-exit are per block) but pay
# more grid steps; 32 measured best on cornell, see choose_mega_mode
# callers.  Env override for experiments only — it is baked into traced
# programs, so flip it ONLY in a fresh process (same caveat as
# INTERPRET, CLAUDE.md).
import os as _os

BLOCK_ROWS = int(_os.environ.get("GRT_MEGA_BLOCK_ROWS", "32"))
# Sphere-segment-culled scenes (RandomScene: 485 spheres, depth 10) run
# smaller blocks: the per-block segment slab test and the all-dead block
# exit both cull finer (measured 755 -> 671 ms on random's 4.19M-ray
# chunk), and the sweep loop dominates so the extra grid steps are noise.
SPH_BLOCK_ROWS = int(_os.environ.get("GRT_MEGA_SPH_BLOCK_ROWS", "8"))
LANES = 128
# Shared with the XLA oracle sweeps (core/vec.py EPS_HIT): ADVICE r4 —
# render/grad.py 'image' mega mode re-derives the primary hit with
# packs.intersect_spheres at vec.EPS_HIT and relies on root-selection
# identity; one definition keeps eps drift impossible.
EPS_HIT = np.float32(vec_consts.EPS_HIT)
EPS_PARALLEL = np.float32(1e-8)
FIREFLY = np.float32(20.0)

INTERPRET = False

# Table row indices ------------------------------------------------------
PT_ROWS = 31  # planar: n(3) d q(3) vxw(3) wxu(3) rad2 kind [14 mat rows] + tex id + mat id (grad routing)
ST_ROWS = 23  # sphere: c(3) vel(3) rad2 [14 mat rows] + tex id + mat id (grad routing)
VT_ROWS = 25  # volume: w2l(12) bmin(3) bmax(3) nid mat tex col(3) + tex id
LT_ROWS = 17  # light: q(3) u(3) v(3) n(3) area em(3) + tex id

SPH_SEG = int(_os.environ.get("GRT_MEGA_SPH_SEG", "16"))
# ^ spheres per cullable segment (Morton-sorted).  16 measured best on
# RandomScene (485 spheres, depth 10): the radius-1000 ground sphere's
# segment AABB spans the scene so its whole segment is swept by every
# block every bounce — halving the segment width halves that forced
# sweep, and the doubled per-block slab tests are cheaper than the
# avoided quadratics.  Env knob for experiments (baked into traces).
SPH_CULL_MIN = 64   # below this, brute sweep beats the cond ladder

_M = np.uint32(1664525)
_A = np.uint32(1013904223)


def enabled() -> bool:
    import os

    if os.environ.get("GRT_NO_MEGAKERNEL") == "1":
        return False
    if os.environ.get("GRT_NO_PALLAS") == "1":
        return False
    return jax.default_backend() == "tpu" or INTERPRET


def applicable(scene, max_prims: int = 1024) -> bool:
    """Static: can this scene run through the megakernel?  (Called
    outside jit — choose_mega_mode's contract — so concrete arrays.)"""
    return (
        enabled()
        and not scene.meshes
        and not scene.has_image
        and scene.planar.d.shape[0] <= max_prims
        and scene.spheres.radius.shape[0] <= max_prims
        and scene.n_volumes <= 4
        and scene.n_lights <= 8
        # in-kernel volume_window is box-only; sphere- and convex-
        # polyhedron-boundary media stay on the standard integrator
        and (scene.n_volumes == 0
             or bool((np.asarray(scene.volumes.kind)
                      == packs.VOL_BOX).all()))
    )


# -----------------------------------------------------------------------------
# Table packing (traced; runs under the caller's stop_gradient)
# -----------------------------------------------------------------------------

def _pad_cols(rows, n):
    pad = max(-(-n // 8) * 8, 8) - n
    return jnp.stack([jnp.pad(r, (0, pad)) for r in rows], axis=0)


def _mat_rows(materials, textures, mat_ids):
    kind = materials.kind[mat_ids].astype(jnp.float32)
    tex = materials.tex[mat_ids]
    texkind = textures.kind[tex].astype(jnp.float32)
    scale = jnp.where(
        textures.kind[tex] == 1, textures.inv_scale[tex], textures.noise_scale[tex]
    )
    return [
        kind, texkind,
        materials.fuzz[mat_ids], materials.ior[mat_ids],
        textures.color[:, 0][tex], textures.color[:, 1][tex], textures.color[:, 2][tex],
        textures.even_color[:, 0][tex], textures.even_color[:, 1][tex], textures.even_color[:, 2][tex],
        textures.odd_color[:, 0][tex], textures.odd_color[:, 1][tex], textures.odd_color[:, 2][tex],
        scale,
        tex.astype(jnp.float32),       # grad-kernel cotangent routing
        mat_ids.astype(jnp.float32),   # pathwise fuzz/ior cotangent routing
    ]


def build_tables(scene, sph_seg: int = SPH_SEG):
    """Scene -> (PT, ST, VT, LT) SMEM tables + counts."""
    p = scene.planar
    n_planar = int(p.d.shape[0])
    if n_planar:
        vxw = jnp.cross(p.v, p.w)
        wxu = jnp.cross(p.w, p.u)
        rows = [
            p.normal[:, 0], p.normal[:, 1], p.normal[:, 2], p.d,
            p.q[:, 0], p.q[:, 1], p.q[:, 2],
            vxw[:, 0], vxw[:, 1], vxw[:, 2],
            wxu[:, 0], wxu[:, 1], wxu[:, 2],
            p.radius * p.radius, p.kind.astype(jnp.float32),
        ] + _mat_rows(scene.materials, scene.textures, p.mat)
        pt = _pad_cols(rows, n_planar)
    else:
        pt = jnp.zeros((PT_ROWS, 8), jnp.float32)

    s = scene.spheres
    n_sphere = int(s.radius.shape[0])
    n_sph_seg = 0
    sb = jnp.zeros((1, 2, 3), jnp.float32)
    if n_sphere:
        if n_sphere >= SPH_CULL_MIN:
            # Morton-sort spheres so contiguous 32-column segments are
            # spatially tight, then record per-segment AABBs (over the
            # full t in [0,1] motion sweep) for block-level culling.
            mid = s.center + 0.5 * s.velocity
            mn = mid.min(axis=0)
            span = jnp.maximum(mid.max(axis=0) - mn, 1e-6)
            q = jnp.clip(((mid - mn) / span * 15.999).astype(jnp.int32), 0, 15)

            def spread(v):  # 4-bit -> every 3rd bit
                out = jnp.zeros_like(v)
                for b in range(4):
                    out = out | (((v >> b) & 1) << (3 * b))
                return out

            key = (spread(q[:, 0]) | (spread(q[:, 1]) << 1)
                   | (spread(q[:, 2]) << 2))
            order = jnp.argsort(key)
            s = jax.tree_util.tree_map(lambda a: a[order], s)

            n_sph_seg = -(-n_sphere // sph_seg)
            c1 = s.center + s.velocity
            lo = jnp.minimum(s.center, c1) - s.radius[:, None]
            hi = jnp.maximum(s.center, c1) + s.radius[:, None]
            pad = n_sph_seg * sph_seg - n_sphere
            lo = jnp.pad(lo, ((0, pad), (0, 0)), constant_values=BIG)
            hi = jnp.pad(hi, ((0, pad), (0, 0)), constant_values=-BIG)
            sb = jnp.stack(
                [lo.reshape(n_sph_seg, sph_seg, 3).min(axis=1),
                 hi.reshape(n_sph_seg, sph_seg, 3).max(axis=1)], axis=1,
            )
        rows = [
            s.center[:, 0], s.center[:, 1], s.center[:, 2],
            s.velocity[:, 0], s.velocity[:, 1], s.velocity[:, 2],
            s.radius * s.radius,
        ] + _mat_rows(scene.materials, scene.textures, s.mat)
        target = max(n_sph_seg * sph_seg, -(-n_sphere // 8) * 8, 8)
        st = jnp.stack(
            [jnp.pad(r, (0, target - n_sphere)) for r in rows], axis=0
        )
    else:
        st = jnp.zeros((ST_ROWS, 8), jnp.float32)

    v = scene.volumes
    n_vol = scene.n_volumes
    if n_vol:
        m = v.world_to_local.reshape(n_vol, 12)
        vtex = scene.materials.tex[v.mat]
        rows = (
            [m[:, i] for i in range(12)]
            + [v.box_min[:, i] for i in range(3)]
            + [v.box_max[:, i] for i in range(3)]
            + [v.neg_inv_density,
               scene.materials.kind[v.mat].astype(jnp.float32),
               scene.textures.kind[vtex].astype(jnp.float32)]
            + [scene.textures.color[:, i][vtex] for i in range(3)]
            + [vtex.astype(jnp.float32)]
        )
        vt = _pad_cols(rows, n_vol)
    else:
        vt = jnp.zeros((VT_ROWS, 8), jnp.float32)

    n_lights = scene.n_lights
    if n_lights:
        lem = [
            scene.textures.color[:, i][scene.materials.tex[scene.light_mat]]
            for i in range(3)
        ]
        rows = (
            [scene.light_q[:, i] for i in range(3)]
            + [scene.light_u[:, i] for i in range(3)]
            + [scene.light_v[:, i] for i in range(3)]
            + [scene.light_normal[:, i] for i in range(3)]
            + [scene.light_area]
            + lem
            + [scene.materials.tex[scene.light_mat].astype(jnp.float32)]
        )
        lt = _pad_cols(rows, n_lights)
    else:
        lt = jnp.zeros((LT_ROWS, 8), jnp.float32)

    return pt, st, sb, vt, lt, n_planar, n_sphere, n_sph_seg, n_vol, n_lights


# -----------------------------------------------------------------------------
# Kernel
# -----------------------------------------------------------------------------

def _pcg3d(x, y, z):
    x = x * _M + _A
    y = y * _M + _A
    z = z * _M + _A
    x = x + y * z
    y = y + z * x
    z = z + x * y
    x = x ^ (x >> np.uint32(16))
    y = y ^ (y >> np.uint32(16))
    z = z ^ (z >> np.uint32(16))
    x = x + y * z
    y = y + z * x
    z = z + x * y
    return x, y, z


def make_kernel(n_planar, n_sphere, n_sph_seg, n_vol, n_lights, has_checker,
                max_depth, resume=False, use_hdri=False, rec_dec=False,
                grad_mode=False, n_tex=0, miss_cfg=("flat", 0.0, 0.0, 0.0),
                sph_seg=None, has_noise=False, pathwise=False, n_mat=0,
                phase="both"):
    sph_seg = SPH_SEG if sph_seg is None else sph_seg
    has_extra = has_checker or has_noise  # stream even/odd/scale attrs
    use_nee = n_lights > 0
    f24 = np.float32(2.0 ** -24)

    def kernel(count_ref, seed_ref, *refs):
        dref = None
        if resume:
            # Resumable variant: full path state in/out + [start, end)
            # bounce bounds, so the caller can re-sort surviving rays into
            # dense blocks between phases (identical RNG streams -> same
            # image as the single-shot kernel).
            (bounds_ref, pt, st, sb, vt, lt,
             *hdri_refs,
             ox, oy, oz, dx, dy, dz, tmr, stream_ref,
             tpxr, tpyr, tpzr, rri, rgi, rbi, flgi,
             mdxi, mdyi, mdzi, mtri, mtgi, mtbi,
             rr, rg, rb, mdx, mdy, mdz, mtr, mtg, mtb, mfl,
             oox, ooy, ooz, odx, ody, odz, otx, oty, otz) = refs
        elif rec_dec:
            # Decision-recording variant (replay gradients): also emits,
            # per bounce, the packed discrete sweep outcome
            # hitk | winner_idx << 2 | blk_area << 20 | blk_hdri << 21
            # (wavefront.Decisions semantics; aux is 0 — no meshes here).
            (pt, st, sb, vt, lt,
             *hdri_refs,
             ox, oy, oz, dx, dy, dz, tmr, stream_ref,
             rr, rg, rb, mdx, mdy, mdz, mtr, mtg, mtb, mfl, dref) = refs
        elif grad_mode and phase == "fwd":
            # TWO-PHASE pass A (round 5): the gradient forward alone —
            # radiance rows out (they ARE the framebuffer contribution:
            # same code as the fused kernel's forward; env scenes get
            # the miss term applied XLA-side from the miss records),
            # the per-bounce stash written to HBM OUTPUTS instead of
            # VMEM scratch, the miss color rows out (the product
            # reverse consumes them), and the miss RECORDS out (env
            # two-phase: XLA computes mc / λ_mdir / texel grads from
            # them between the passes).  No cotangent inputs.
            (pt, st, sb, vt, lt,
             ox, oy, oz, dx, dy, dz, tmr, stream_ref,
             rr, rg, rb, mcx, mcy, mcz,
             mdx, mdy, mdz, mtr, mtg, mtb, mfl,
             stash_f, stash_i) = refs
            hdri_refs, env_refs = [], []
            eout = gout = gacc = None
        elif grad_mode and phase == "rev":
            # TWO-PHASE pass B: the reverse sweep alone, reading the
            # pass-A stash from HBM inputs.  Needs only the tables
            # (NEE / volume-window recompute), the stream ids (RNG
            # recompute), the loss cotangent rows, the miss color rows
            # (pass-A for flat/sky, XLA-computed for env "stream"), and
            # — env scenes — the λ_mdir rows (zeros otherwise).
            (pt, st, sb, vt, lt,
             stream_ref, gxr, gyr, gzr, mcx, mcy, mcz,
             lmdx, lmdy, lmdz,
             stash_f, stash_i, gout, gacc) = refs
            hdri_refs, env_refs = [], []
            eout = None
        elif grad_mode:
            # Gradient variant (see DESIGN.md "gradient megakernel"):
            # inputs add the per-ray loss cotangent rows g (= dL/d(rad));
            # outputs are the radiance rows (validation) + one flat
            # per-block parameter-gradient vector; trailing refs are the
            # per-bounce stash scratch (f32 + i32).  Env scenes (miss_cfg
            # "stream") add a [6, BR, 128] ref: the XLA-precomputed miss
            # radiance mc (3, phantom applied; the in-kernel `missed`
            # state masks it) and the miss direction cotangent λ_mdir
            # (3, from jax.vjp of the bilinear env fetch, pre-masked —
            # injected at the lit bounce so specular-chain fuzz/IOR
            # grads see the env term).
            # Extra input groups, in order: [hdri rows] (env-NEE scenes,
            # 7*depth rows — same streaming as the forward kernel) then
            # [env miss rows] (mc + λ_mdir, 6 rows).  Extra output when
            # use_hdri: eout (env-NEE texel cotangents, 3*depth rows).
            n_tail = 11 + 4 + (1 if use_hdri else 0) + 3
            pt, st, sb, vt, lt = refs[:5]
            extra_refs = refs[5:len(refs) - n_tail]
            (ox, oy, oz, dx, dy, dz, tmr, stream_ref,
             gxr, gyr, gzr, rr, rg, rb, gout,
             *tail) = refs[len(refs) - n_tail:]
            eout = tail[0] if use_hdri else None
            stash_f, stash_i, gacc = tail[-3:]
            hdri_refs = [extra_refs[0]] if use_hdri else []
            env_refs = list(extra_refs[1 if use_hdri else 0:])
        else:
            (pt, st, sb, vt, lt,
             *hdri_refs,
             ox, oy, oz, dx, dy, dz, tmr, stream_ref,
             rr, rg, rb, mdx, mdy, mdz, mtr, mtg, mtb, mfl) = refs
        rev_only = grad_mode and phase == "rev"
        if rev_only:
            o = d = tm = None
            zero = gxr[...] * 0.0
        else:
            o = [ox[...], oy[...], oz[...]]
            d = [dx[...], dy[...], dz[...]]
            tm = tmr[...]
            zero = o[0] * 0.0
        stream = stream_ref[...]
        zero_u = stream & np.uint32(0)
        true_v = zero >= 0.0
        false_v = zero < 0.0

        seed_mix = seed_ref[0] * np.uint32(0x9E3779B9)

        def uniform3(bounce_u, purpose):
            a = stream ^ (zero_u + seed_mix)
            if isinstance(bounce_u, (int, np.integer)):
                # static bounce (reverse sweeps): wrap in python ints —
                # numpy scalar uint32 multiply warns on overflow (the
                # wrap itself is the intent)
                bmix = np.uint32((int(bounce_u) * 0x85EBCA6B) & 0xFFFFFFFF)
            else:
                bmix = bounce_u * np.uint32(0x85EBCA6B)
            b = zero_u + (bmix ^ seed_ref[0])
            c_const = np.uint32((int(purpose) * 0xC2B2AE35 + 0x27D4EB2F) & 0xFFFFFFFF)
            c = zero_u + c_const
            x, y, z = _pcg3d(a, b, c)

            def to_f32(v):
                # Mosaic has no uint32->f32 cast; the top-24-bit values fit
                # in positive int32, which does cast.
                return (v >> np.uint32(8)).astype(jnp.int32).astype(jnp.float32) * f24

            return to_f32(x), to_f32(y), to_f32(z)

        def uniform3_dynp(bounce_u, purpose):
            """Volume purposes (static python int per call site)."""
            x, _, _ = uniform3(bounce_u, purpose)
            return x

        def dot3(a, b):
            return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]

        if has_noise:
            # In-kernel marble noise (textures.evaluate noise branch):
            # PCG3D-ish hashed lattice gradients — pure VPU math, exact
            # same arithmetic as textures._lattice_grad, so images match
            # the standard integrator bit-for-ulp.  Shared by the
            # forward bounce body and the pathwise reverse's ∂marble/∂p.
            def lattice_grad(li, lj, lk):
                hx = li.astype(jnp.uint32) * _M + _A
                hy = lj.astype(jnp.uint32) * _M + _A
                hz = lk.astype(jnp.uint32) * _M + _A
                hx = hx + hy * hz
                hy = hy + hz * hx
                hz = hz + hx * hy
                hx = hx ^ (hx >> np.uint32(16))
                hy = hy ^ (hy >> np.uint32(16))
                hz = hz ^ (hz >> np.uint32(16))
                hx = hx + hy * hz
                hy = hy + hz * hx
                hz = hz + hx * hy

                def cube(vv):
                    return 2.0 * ((vv >> np.uint32(8)).astype(
                        jnp.int32).astype(jnp.float32) * f24) - 1.0

                gx, gy, gz = cube(hx), cube(hy), cube(hz)
                ginv = 1.0 / jnp.sqrt(
                    jnp.maximum(gx * gx + gy * gy + gz * gz, 1e-12))
                return gx * ginv, gy * ginv, gz * ginv

            def noise1(px, py, pz, zero, with_grad=False):
                """Trilinear hashed-gradient noise; with_grad also
                returns the analytic (d/dpx, d/dpy, d/dpz) — the
                ∂marble/∂p building block (product rule over the 8
                corner weights wu*wv*ww times g.(frac-corner))."""
                fxx = jnp.floor(px)
                fyy = jnp.floor(py)
                fzz = jnp.floor(pz)
                uu2 = px - fxx
                vv2 = py - fyy
                ww2 = pz - fzz
                i0 = fxx.astype(jnp.int32)
                j0 = fyy.astype(jnp.int32)
                k0 = fzz.astype(jnp.int32)
                acc = zero * 1.0
                dx_ = dy_ = dz_ = zero * 1.0
                for di in range(2):
                    for dj in range(2):
                        for dk in range(2):
                            gx, gy, gz = lattice_grad(
                                i0 + di, j0 + dj, k0 + dk)
                            dtt = (gx * (uu2 - di) + gy * (vv2 - dj)
                                   + gz * (ww2 - dk))
                            wu = di * uu2 + (1 - di) * (1.0 - uu2)
                            wv = dj * vv2 + (1 - dj) * (1.0 - vv2)
                            ww_ = dk * ww2 + (1 - dk) * (1.0 - ww2)
                            acc = acc + wu * wv * ww_ * dtt
                            if with_grad:
                                su = float(2 * di - 1)
                                sv = float(2 * dj - 1)
                                sw = float(2 * dk - 1)
                                dx_ = dx_ + (su * wv * ww_ * dtt
                                             + wu * wv * ww_ * gx)
                                dy_ = dy_ + (wu * sv * ww_ * dtt
                                             + wu * wv * ww_ * gy)
                                dz_ = dz_ + (wu * wv * sw * dtt
                                             + wu * wv * ww_ * gz)
                if with_grad:
                    return acc, dx_, dy_, dz_
                return acc

        # attribute slots (merged winner constants)
        N_GEO = 7   # pn(3) sc(3) rad2
        N_MAT = (7 + (7 if has_extra else 0) + (1 if grad_mode else 0)
                 + (1 if pathwise else 0))
        # grad mode appends the winner's TEX ID as the last attr (routes
        # parameter cotangents back to texture-table slots); pathwise mode
        # additionally appends the winner's MAT ID (fuzz/ior routing)

        def planar_sweep(o, d, t_best, hitk, attrs, record, hidx=None):
            def body(j, carry):
                if hidx is None:
                    t_best, hitk, attrs = carry
                else:
                    t_best, hitk, attrs, hx = carry
                nx_j = pt[0, j]; ny_j = pt[1, j]; nz_j = pt[2, j]
                denom = d[0] * nx_j + d[1] * ny_j + d[2] * nz_j
                not_par = jnp.abs(denom) >= EPS_PARALLEL
                t = (pt[3, j] - (o[0] * nx_j + o[1] * ny_j + o[2] * nz_j)) / jnp.where(not_par, denom, 1.0)
                kv = zero + pt[14, j]
                is_plane = kv == float(packs.KIND_PLANE)
                # (selects over bool vectors don't legalize; mask algebra)
                t_ok = (is_plane & (t > EPS_HIT) & (t < t_best)) | (
                    ~is_plane & (t >= EPS_HIT) & (t <= t_best)
                )
                rx = o[0] + t * d[0] - pt[4, j]
                ry = o[1] + t * d[1] - pt[5, j]
                rz = o[2] + t * d[2] - pt[6, j]
                alpha = rx * pt[7, j] + ry * pt[8, j] + rz * pt[9, j]
                beta = rx * pt[10, j] + ry * pt[11, j] + rz * pt[12, j]
                in_quad = (alpha >= 0.0) & (alpha <= 1.0) & (beta >= 0.0) & (beta <= 1.0)
                in_tri = (alpha >= 0.0) & (alpha <= 1.0) & (beta >= 0.0) & (alpha + beta <= 1.0)
                dist2 = rx * rx + ry * ry + rz * rz
                interior = (
                    ((kv == float(packs.KIND_QUAD)) & in_quad)
                    | ((kv == float(packs.KIND_TRI)) & in_tri)
                    | ((kv == float(packs.KIND_CIRCLE)) & (dist2 <= pt[13, j]))
                    | is_plane
                )
                upd = not_par & t_ok & interior & (j < count_ref[0])
                t_best = jnp.where(upd, t, t_best)
                hitk = jnp.where(upd, 2, hitk)
                if record:
                    vals = [nx_j, ny_j, nz_j, 0.0, 0.0, 0.0, 1.0]
                    vals += [pt[15, j], pt[16, j], pt[17, j], pt[18, j],
                             pt[19, j], pt[20, j], pt[21, j]]
                    if has_extra:
                        vals += [pt[22, j], pt[23, j], pt[24, j],
                                 pt[25, j], pt[26, j], pt[27, j], pt[28, j]]
                    if grad_mode:
                        vals += [pt[29, j]]
                    if pathwise:
                        vals += [pt[30, j]]
                    attrs = [jnp.where(upd, v + zero, a_) for v, a_ in zip(vals, attrs)]
                if hidx is None:
                    return t_best, hitk, attrs
                hx = jnp.where(upd, j, hx)
                return t_best, hitk, attrs, hx

            init = ((t_best, hitk, attrs) if hidx is None
                    else (t_best, hitk, attrs, hidx))
            return jax.lax.fori_loop(0, pt.shape[1] if n_planar else 0, body,
                                     init)

        def sphere_sweep(o, d, tmv, t_best, hitk, attrs, record, hidx=None):
            # TWO independent accumulator sets, even/odd sphere columns:
            # the per-sphere quadratic+select chain serializes through
            # t_best (~5 cycles/op measured latency stall on RandomScene);
            # disjoint chains let the scheduler interleave them.  Both
            # start from the incoming carry, so the final min-merge (acc1
            # wins ties) reproduces the serial sweep's strict-< winner
            # order except for exact cross-parity t ties (measure zero).
            a_coef = dot3(d, d)
            inv_a = 1.0 / a_coef

            def body(j, carry):
                if hidx is None:
                    t_best, hitk, attrs = carry
                else:
                    t_best, hitk, attrs, hx = carry
                ctx = st[0, j] + tmv * st[3, j]
                cty = st[1, j] + tmv * st[4, j]
                ctz = st[2, j] + tmv * st[5, j]
                ocx = ctx - o[0]
                ocy = cty - o[1]
                ocz = ctz - o[2]
                h = d[0] * ocx + d[1] * ocy + d[2] * ocz
                c = ocx * ocx + ocy * ocy + ocz * ocz - st[6, j]
                disc = h * h - a_coef * c
                sq = jnp.sqrt(jnp.maximum(disc, 0.0))
                r0 = (h - sq) * inv_a
                r1 = (h + sq) * inv_a
                ok0 = (r0 > EPS_HIT) & (r0 < t_best)
                ok1 = (r1 > EPS_HIT) & (r1 < t_best)
                root = jnp.where(ok0, r0, r1)
                upd = (disc >= 0.0) & (ok0 | ok1) & (j < count_ref[1])
                t_best = jnp.where(upd, root, t_best)
                hitk = jnp.where(upd, 1, hitk)
                if record:
                    new_geo = [zero, zero, zero, ctx, cty, ctz, st[6, j] + zero]
                    matv = [st[7, j], st[8, j], st[9, j], st[10, j],
                            st[11, j], st[12, j], st[13, j]]
                    if has_extra:
                        matv += [st[14, j], st[15, j], st[16, j],
                                 st[17, j], st[18, j], st[19, j], st[20, j]]
                    if grad_mode:
                        matv += [st[21, j]]
                    if pathwise:
                        matv += [st[22, j]]
                    vals = new_geo + [zero + v for v in matv]
                    attrs = [jnp.where(upd, v, a_) for v, a_ in zip(vals, attrs)]
                if hidx is None:
                    return t_best, hitk, attrs
                hx = jnp.where(upd, j, hx)
                return t_best, hitk, attrs, hx

            def body2(jj, carry2):
                c1, c2 = carry2
                c1 = body(2 * jj, c1)
                c2 = body(2 * jj + 1, c2)
                return (c1, c2)

            def merge(c1, c2):
                if hidx is None:
                    t1, h1, a1 = c1
                    t2, h2, a2 = c2
                else:
                    t1, h1, a1, x1 = c1
                    t2, h2, a2, x2 = c2
                w2 = t2 < t1
                t = jnp.where(w2, t2, t1)
                hk = jnp.where(w2, h2, h1)
                am = [jnp.where(w2, v2, v1) for v1, v2 in zip(a1, a2)]
                if hidx is None:
                    return t, hk, am
                return t, hk, am, jnp.where(w2, x2, x1)

            init = ((t_best, hitk, attrs) if hidx is None
                    else (t_best, hitk, attrs, hidx))
            if not n_sph_seg:
                n_cols = st.shape[1] if n_sphere else 0
                c1, c2 = jax.lax.fori_loop(0, n_cols // 2, body2,
                                           (init, init))
                out = merge(c1, c2)
                if n_cols % 2:
                    out = body(n_cols - 1, out)
                return out

            # Segment-culled sweep: spheres are Morton-sorted, so each
            # SPH_SEG-column segment is spatially tight; skip segments whose
            # AABB no ray in the block can reach within its current t.
            invd = []
            for i in range(3):
                safe = jnp.where(jnp.abs(d[i]) < 1e-12,
                                 jnp.where(d[i] < 0, -1e-12, 1e-12), d[i])
                invd.append(1.0 / safe)

            def seg_body(si, carry):
                def seg_any(t_cap):
                    near = zero + EPS_HIT
                    far = t_cap * 1.0
                    for i in range(3):
                        ta = (sb[si, 0, i] - o[i]) * invd[i]
                        tb = (sb[si, 1, i] - o[i]) * invd[i]
                        near = jnp.maximum(near, jnp.minimum(ta, tb))
                        far = jnp.minimum(far, jnp.maximum(ta, tb))
                    return jnp.any(far > near)

                def do_seg(carry2):
                    def sub(jj, carry2):
                        c1, c2 = carry2
                        c1 = body(si * sph_seg + 2 * jj, c1)
                        c2 = body(si * sph_seg + 2 * jj + 1, c2)
                        return (c1, c2)

                    return jax.lax.fori_loop(0, sph_seg // 2, sub, carry2)

                # conservative skip: the segment must be unreachable for
                # BOTH accumulators' current bests
                cap2 = jnp.maximum(carry[0][0], carry[1][0])
                return jax.lax.cond(seg_any(cap2), do_seg,
                                    lambda c_: c_, carry)

            c1, c2 = jax.lax.fori_loop(0, n_sph_seg, seg_body, (init, init))
            return merge(c1, c2)

        def volume_window(o, d, vi):
            olc, dlc = [], []
            for i in range(3):
                oli = (vt[4 * i + 0, vi] * o[0] + vt[4 * i + 1, vi] * o[1]
                       + vt[4 * i + 2, vi] * o[2] + vt[4 * i + 3, vi])
                dli = (vt[4 * i + 0, vi] * d[0] + vt[4 * i + 1, vi] * d[1]
                       + vt[4 * i + 2, vi] * d[2])
                olc.append(oli)
                dlc.append(dli)
            near = zero - BIG
            far = zero + BIG
            for i in range(3):
                dli = dlc[i]
                safe = jnp.where(jnp.abs(dli) < 1e-12,
                                 jnp.where(dli < 0, -1e-12, 1e-12), dli)
                inv = 1.0 / safe
                ta = (vt[12 + i, vi] - olc[i]) * inv
                tb = (vt[15 + i, vi] - olc[i]) * inv
                near = jnp.maximum(near, jnp.minimum(ta, tb))
                far = jnp.minimum(far, jnp.maximum(ta, tb))
            return near, far

        def volume_entry(o, d, vi):
            """Entry-slab data for the PATHWISE volume adjoint: (near,
            ne[3] world row, inv_e, act_e) where near = max_i min(ta, tb)
            (volume_window's entry distance) and ne is the w2l row of the
            winning axis.  The scatter distance t = max(near, eps) + K/|d|
            (K RNG-only), so dt/do = -ne * inv_e, dt/dd = -near * ne *
            inv_e * act_e — the same implicit rule as a planar surface
            with the slab plane as the surface (mirrors jax.grad through
            wavefront._winner_t's volume branch op-for-op, incl. the
            |dl| < 1e-12 'safe' gating)."""
            olc, dlc = [], []
            for i in range(3):
                oli = (vt[4 * i + 0, vi] * o[0] + vt[4 * i + 1, vi] * o[1]
                       + vt[4 * i + 2, vi] * o[2] + vt[4 * i + 3, vi])
                dli = (vt[4 * i + 0, vi] * d[0] + vt[4 * i + 1, vi] * d[1]
                       + vt[4 * i + 2, vi] * d[2])
                olc.append(oli)
                dlc.append(dli)
            tmins, invs, acts = [], [], []
            near = zero - BIG
            for i in range(3):
                dli = dlc[i]
                act = jnp.abs(dli) >= 1e-12
                safe = jnp.where(act, dli,
                                 jnp.where(dli < 0, -1e-12, 1e-12))
                inv = 1.0 / safe
                ta = (vt[12 + i, vi] - olc[i]) * inv
                tb = (vt[15 + i, vi] - olc[i]) * inv
                tmins.append(jnp.minimum(ta, tb))
                invs.append(inv)
                acts.append(act)
                near = jnp.maximum(near, tmins[i])
            ne = [zero * 1.0 for _ in range(3)]
            inv_e = zero * 1.0
            act_e = zero * 1.0
            chosen = false_v
            for i in range(3):
                wsel = ~chosen & (tmins[i] == near)
                for c in range(3):
                    ne[c] = jnp.where(wsel, vt[4 * i + c, vi] + zero, ne[c])
                inv_e = jnp.where(wsel, invs[i], inv_e)
                act_e = jnp.where(wsel & acts[i], zero + 1.0, act_e)
                chosen = chosen | wsel
            return near, ne, inv_e, act_e

        def volume_scatter(o, d, t_cap, vi, u):
            near, far = volume_window(o, d, vi)
            crosses = far > near
            t0c = jnp.maximum(near, EPS_HIT)
            t1c = jnp.minimum(far, t_cap)
            inside = crosses & (t0c < t1c)
            ray_len = jnp.sqrt(jnp.maximum(dot3(d, d), 1e-20))
            dist_inside = (t1c - t0c) * ray_len
            hit_dist = vt[18, vi] * jnp.log(jnp.maximum(u, 1e-38))
            accept = inside & (hit_dist <= dist_inside)
            return accept, t0c + hit_dist / ray_len

        def occluded(o, d, t_cap, bounce_u, purpose_base):
            t_best = t_cap * 1.0
            hitk = (zero_u & np.uint32(0)).astype(jnp.int32)
            dummy = []
            t_best, hitk, _ = planar_sweep(o, d, t_best, hitk, dummy, False)
            t_best, hitk, _ = sphere_sweep(o, d, zero, t_best, hitk, dummy, False)
            blocked = hitk > 0
            for vi in range(n_vol):
                u = uniform3_dynp(
                    bounce_u, np.uint32(purpose_base + 32 * vi)
                )
                acc, _ = volume_scatter(o, d, jnp.minimum(t_best, t_cap), vi, u)
                blocked = blocked | acc
            return blocked

        def bounce_body(state):
            # Mosaic cannot carry vector<i1> through scf.while: the boolean
            # lanes travel as f32 masks (1.0/0.0) and are decoded here.
            (bounce_u, o, d, tp, rad, alive_f, allow_f,
             m_dir, m_tp, missed_f, m_prim_f) = state
            alive = alive_f > 0.5
            allow = allow_f > 0.5
            missed = missed_f > 0.5
            m_prim = m_prim_f > 0.5

            # Dead lanes start at t_cap = 0: the segment slab tests then
            # fail for them, so a mostly-dead block only sweeps segments
            # its few LIVE rays can reach (late-bounce stragglers were
            # paying full sweeps for 4095 dead lanes).
            t = jnp.where(alive, zero + BIG, zero)
            hitk = (zero_u & np.uint32(0)).astype(jnp.int32)
            hidx = hitk if rec_dec else None
            attrs = [zero * 1.0 for _ in range(N_GEO + N_MAT)]
            if rec_dec:
                t, hitk, attrs, hidx = planar_sweep(
                    o, d, t, hitk, attrs, True, hidx)
                t, hitk, attrs, hidx = sphere_sweep(
                    o, d, tm, t, hitk, attrs, True, hidx)
            else:
                t, hitk, attrs = planar_sweep(o, d, t, hitk, attrs, True)
                t, hitk, attrs = sphere_sweep(o, d, tm, t, hitk, attrs, True)
            hit = (hitk > 0) & alive

            is_vol = false_v
            vwin = (zero_u & np.uint32(0)).astype(jnp.int32)
            for vi in range(n_vol):
                u = uniform3_dynp(bounce_u, np.uint32(64 + 32 * vi))
                t_limit = jnp.where(hit, t, zero + BIG)
                acc, t_v = volume_scatter(o, d, t_limit, vi, u)
                win = acc & (~hit | (t_v < t))
                t = jnp.where(win, t_v, t)
                hit = hit | win
                is_vol = is_vol | win
                vwin = jnp.where(win, vi, vwin)
                hitk = jnp.where(win, 3, hitk)
                if rec_dec:
                    hidx = jnp.where(win, vi, hidx)
                # inject volume material constants
                vals = [zero, zero, zero, zero, zero, zero, zero + 1.0,
                        vt[19, vi] + zero, vt[20, vi] + zero, zero, zero + 1.0,
                        vt[21, vi] + zero, vt[22, vi] + zero, vt[23, vi] + zero]
                if has_extra:
                    vals += [zero] * 7
                if grad_mode:
                    vals += [vt[24, vi] + zero]
                if pathwise:
                    # no materials-table row: isotropic has no fuzz/ior,
                    # so route the mat slot to the inert sentinel
                    vals += [zero - 9.0]
                attrs = [jnp.where(win, v, a_) for v, a_ in zip(vals, attrs)]

            lit = alive & ~hit
            for c in range(3):
                m_dir[c] = jnp.where(lit, d[c], m_dir[c])
                m_tp[c] = jnp.where(lit, tp[c], m_tp[c])
            is_primary = (zero_u + bounce_u) == np.uint32(0)
            m_prim = (lit & is_primary) | (~lit & m_prim)
            missed = missed | lit

            t_rec = jnp.where(hit, t, 1.0)
            p = [o[c] + t_rec * d[c] for c in range(3)]

            is_sphere = hitk == 1
            inv_rad = 1.0 / jnp.sqrt(jnp.maximum(attrs[6], 1e-20))
            outn = [
                jnp.where(is_sphere, (p[c] - attrs[3 + c]) * inv_rad, attrs[c])
                for c in range(3)
            ]
            ddn = dot3(d, outn)
            front = (ddn < 0.0) | is_vol
            flip = jnp.where(front, 1.0, -1.0)
            nrm = [outn[c] * flip for c in range(3)]
            nrm[0] = jnp.where(is_vol, zero + 1.0, nrm[0])
            nrm[1] = jnp.where(is_vol, zero, nrm[1])
            nrm[2] = jnp.where(is_vol, zero, nrm[2])

            matkind = attrs[N_GEO + 0]
            texkind = attrs[N_GEO + 1]
            fuzz = attrs[N_GEO + 2]
            ior = jnp.maximum(attrs[N_GEO + 3], 1e-3)
            col = [attrs[N_GEO + 4], attrs[N_GEO + 5], attrs[N_GEO + 6]]
            albedo = col
            variant = zero  # 0 solid, 1 checker-even, 2 checker-odd
            if has_checker:
                even = [attrs[N_GEO + 7 + c] for c in range(3)]
                odd = [attrs[N_GEO + 10 + c] for c in range(3)]
                inv_scale = attrs[N_GEO + 13]
                lat = (jnp.floor(inv_scale * p[0] + 1e-4)
                       + jnp.floor(inv_scale * p[1] + 1e-4)
                       + jnp.floor(inv_scale * p[2] + 1e-4))
                is_even = lat - 2.0 * jnp.floor(lat * 0.5) == 0.0
                checker = [jnp.where(is_even, even[c], odd[c]) for c in range(3)]
                albedo = [
                    jnp.where(texkind == 1.0, checker[c], col[c]) for c in range(3)
                ]
                variant = jnp.where(texkind == 1.0,
                                    jnp.where(is_even, zero + 1.0, zero + 2.0),
                                    zero)
            if has_noise:
                # In-kernel marble (textures.evaluate noise branch):
                # 0.5*(1+sin(scale*z + 10*turb(p*scale, 7))) via the
                # kernel-scope hashed-lattice noise1.
                nscale = attrs[N_GEO + 13]
                tacc = zero * 1.0
                twt = 1.0
                tpx, tpy, tpz = (p[0] * nscale, p[1] * nscale,
                                 p[2] * nscale)
                for _oct in range(7):
                    tacc = tacc + twt * noise1(tpx, tpy, tpz, zero)
                    twt *= 0.5
                    tpx, tpy, tpz = tpx * 2.0, tpy * 2.0, tpz * 2.0
                marble = 0.5 * (1.0 + jnp.sin(
                    nscale * p[2] + 10.0 * jnp.abs(tacc)))
                albedo = [
                    jnp.where(texkind == 2.0, marble, albedo[c])
                    for c in range(3)
                ]

            su1, su2, _ = uniform3(bounce_u, rngmod.SCATTER_U)
            zr = 1.0 - 2.0 * su1
            phi = np.float32(2.0 * np.pi) * su2
            rrr = jnp.sqrt(jnp.maximum(0.0, 1.0 - zr * zr))
            ru = [rrr * jnp.cos(phi), rrr * jnp.sin(phi), zr]
            ufr, _, _ = uniform3(bounce_u, rngmod.FRESNEL)

            lam = [nrm[c] + ru[c] for c in range(3)]
            near0 = ((jnp.abs(lam[0]) < 1e-8) & (jnp.abs(lam[1]) < 1e-8)
                     & (jnp.abs(lam[2]) < 1e-8))
            lam = [jnp.where(near0, nrm[c], lam[c]) for c in range(3)]

            ddn_f = dot3(d, nrm)
            rfl = [d[c] - nrm[c] * (2.0 * ddn_f) for c in range(3)]
            rlen = jnp.sqrt(jnp.maximum(dot3(rfl, rfl), 1e-20))
            met = [rfl[c] / rlen + ru[c] * fuzz for c in range(3)]
            metal_ok = dot3(met, nrm) > 0.0

            ri = jnp.where(front, 1.0 / ior, ior)
            dlen = jnp.sqrt(jnp.maximum(dot3(d, d), 1e-20))
            ud = [d[c] / dlen for c in range(3)]
            udn = dot3(ud, nrm)
            cos_t = jnp.minimum(-udn, 1.0)
            sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_t * cos_t))
            cannot = ri * sin_t > 1.0
            r0s = (1.0 - ri) / (1.0 + ri)
            r0s = r0s * r0s
            omc = jnp.maximum(1.0 - cos_t, 0.0)
            omc2 = omc * omc
            schl = r0s + (1.0 - r0s) * omc2 * omc2 * omc
            do_refl = cannot | (schl > ufr)
            perp = [(ud[c] + nrm[c] * cos_t) * ri for c in range(3)]
            parl = -jnp.sqrt(jnp.maximum(jnp.abs(1.0 - dot3(perp, perp)), 1e-20))
            refr = [perp[c] + nrm[c] * parl for c in range(3)]
            drefl = [ud[c] - nrm[c] * (2.0 * udn) for c in range(3)]
            diel = [jnp.where(do_refl, drefl[c], refr[c]) for c in range(3)]

            is_lam = matkind == 0.0
            is_met = matkind == 1.0
            is_die = matkind == 2.0
            is_light = matkind == 3.0
            new_d = [
                jnp.where(is_lam, lam[c],
                          jnp.where(is_met, met[c],
                                    jnp.where(is_die, diel[c], ru[c])))
                for c in range(3)
            ]
            atten = [jnp.where(is_die, zero + 1.0, albedo[c]) for c in range(3)]
            scattered = ~is_light & ((is_met & metal_ok) | ~is_met)

            emit_mask = alive & hit & allow & is_light
            for c in range(3):
                rad[c] = rad[c] + jnp.where(emit_mask, tp[c] * albedo[c], 0.0)

            use_mis = (alive & hit & is_lam) if use_nee else false_v
            blk_a = blk_h = false_v
            if grad_mode and not pathwise:
                g_em_su = [zero * 1.0 for _ in range(3)]
                g_alb_su = [zero * 1.0 for _ in range(3)]
                g_clamped = [false_v for _ in range(3)]
                g_lslot = zero - 3.0
            if use_nee:
                # LOCKSTEP INVARIANT: the clamp floors below (1e-20 dist
                # / s2 / r, 1e-12 q) are re-derived OP-FOR-OP by the
                # pathwise reverse's NEE recompute — change one without
                # the other and gradients silently skew.  Safe against
                # perf rule 14 (f32 underflow in jax.grad's division
                # backward) because this kernel is never jax.grad'ed:
                # the reverse sanitizes not-ok lanes before its partials.
                up, _, _ = uniform3(bounce_u, rngmod.LIGHT_PICK)
                li_f = jnp.minimum(jnp.floor(up * float(n_lights)),
                                   float(n_lights - 1))
                ua, ub, _ = uniform3(bounce_u, rngmod.LIGHT_U)
                lsel = [zero * 1.0 for _ in range(LT_ROWS)]
                for l in range(n_lights):
                    msk = li_f == float(l)
                    for f in range(LT_ROWS):
                        lsel[f] = jnp.where(msk, lt[f, l] + zero, lsel[f])
                lp = [lsel[c] + ua * lsel[3 + c] + ub * lsel[6 + c] for c in range(3)]
                tl = [lp[c] - p[c] for c in range(3)]
                dist = jnp.sqrt(jnp.maximum(dot3(tl, tl), 1e-20))
                ld = [tl[c] / dist for c in range(3)]
                cos_th = dot3(nrm, ld)
                facing = cos_th > 0.0
                # Inactive shadow lanes get t_cap = 0 so the segment slab
                # tests skip them (same trick as the dead-lane closest hit).
                shadow_cap = jnp.where(use_mis & facing, dist - EPS_HIT, zero)
                blocked = occluded(p, ld, shadow_cap, bounce_u, 65)
                blk_a = blocked
                cos_l = jnp.abs(-(lsel[9] * ld[0] + lsel[10] * ld[1] + lsel[11] * ld[2]))
                grazing = cos_l < 1e-3
                pdf_l = (dist * dist) / jnp.maximum(cos_l * lsel[12], 1e-20)
                pdf_b = jnp.maximum(cos_th, 0.0) * np.float32(1.0 / np.pi)
                weight = pdf_l / jnp.maximum(pdf_l + pdf_b, 1e-20)
                scale = cos_th / jnp.maximum(pdf_l, 1e-12) * weight * float(n_lights)
                ok = facing & ~blocked & ~grazing & use_mis
                for c in range(3):
                    contrib = jnp.minimum(lsel[13 + c] * atten[c] * scale, FIREFLY)
                    rad[c] = rad[c] + jnp.where(ok, tp[c] * contrib, 0.0)
                    if grad_mode and not pathwise:
                        unclamped = (lsel[13 + c] * atten[c] * scale
                                     < FIREFLY)
                        okf = jnp.where(ok, zero + 1.0, zero)
                        uf = jnp.where(unclamped, okf, zero)
                        g_em_su[c] = lsel[13 + c] * scale * uf
                        g_alb_su[c] = atten[c] * scale * uf
                        g_clamped[c] = ok & ~unclamped
                if grad_mode and not pathwise:
                    g_lslot = lsel[16]

            if use_hdri:
                # HDRI NEE: the importance sample (direction, emission,
                # pdf) depends only on the RNG stream, never on ray
                # state, so it is precomputed XLA-side (alias-table
                # gathers are cheap there, impossible here) and streamed
                # in as 7 rows per bounce; the kernel keeps the shadow
                # sweep, lambertian brdf pdf, and balance-heuristic MIS
                # (wavefront.sample_hdri_light semantics, identical RNG
                # -> identical images).
                (href,) = hdri_refs
                if resume:
                    b_rel = (bounce_u.astype(jnp.int32)
                             - bounds_ref[0]) * np.int32(7)
                else:
                    b_rel = bounce_u.astype(jnp.int32) * np.int32(7)
                hrow = [href[b_rel + np.int32(c)] for c in range(7)]
                hd = hrow[0:3]
                hem = hrow[3:6]
                pdf_h = hrow[6]
                cos_h = dot3(nrm, hd)
                facing_h = cos_h > 0.0
                shadow_cap_h = jnp.where(use_mis & facing_h,
                                         zero + np.float32(3.0e38), zero)
                blocked_h = occluded(p, hd, shadow_cap_h, bounce_u, 66)
                blk_h = blocked_h
                pdf_bh = jnp.maximum(cos_h, 0.0) * np.float32(1.0 / np.pi)
                weight_h = pdf_h / jnp.maximum(pdf_h + pdf_bh, 1e-20)
                scale_h = cos_h / jnp.maximum(pdf_h, 1e-12) * weight_h
                ok_h = facing_h & ~blocked_h & use_mis
                for c in range(3):
                    contrib = jnp.minimum(hem[c] * atten[c] * scale_h,
                                          FIREFLY)
                    rad[c] = rad[c] + jnp.where(ok_h, tp[c] * contrib, 0.0)

            if rec_dec:
                # Pack this bounce's discrete outcome: hitk (2b) |
                # winner idx (18b) | blk_area (1b) | blk_hdri (1b).  The
                # kernel's winner/blocked semantics match the scan-path
                # record exactly (same RNG, same tie order), so the
                # replay backward is interchangeable.
                pk = jnp.where(hit, hitk, 0)
                pk = pk | (jnp.where(hit, hidx, 0) << 2)
                pk = pk | jnp.where(blk_a, 1 << 20, 0)
                pk = pk | jnp.where(blk_h, 1 << 21, 0)
                dref[bounce_u.astype(jnp.int32)] = pk

            alive_next = alive & hit & scattered
            if grad_mode and pathwise:
                # PATHWISE stash: enough per-bounce state to re-derive, in
                # the reverse sweep, the full position/direction adjoint
                # (metal/dielectric scatter Jacobians, NEE geometric terms,
                # intersection-distance backprop).  Everything RNG-derived
                # (ru, ufr, light sample) is recomputed in reverse from the
                # counter streams; only the shadow-sweep outcome (blocked)
                # is stashed as a bit.
                b_i = bounce_u.astype(jnp.int32)
                mat_attr = attrs[N_GEO + N_MAT - 1]
                tex_attr = attrs[N_GEO + N_MAT - 2]
                for c in range(3):
                    stash_f[b_i, 0 + c] = tp[c]          # T_k (entry)
                    stash_f[b_i, 3 + c] = atten[c]       # alb
                    stash_f[b_i, 6 + c] = p[c]           # hit point
                    stash_f[b_i, 9 + c] = d[c]           # incoming dir
                    stash_f[b_i, 12 + c] = nrm[c]        # flipped normal
                stash_f[b_i, 15] = fuzz
                stash_f[b_i, 16] = ior
                # d(nrm)/d(p) = dndp * I for spheres (0 planar/volume)
                stash_f[b_i, 17] = jnp.where(is_sphere & hit,
                                             flip * inv_rad, zero)
                stash_f[b_i, 18] = t_rec
                if has_noise:
                    # marble winners: the reverse needs the texture
                    # scale for the ∂marble/∂p lattice-gradient adjoint
                    stash_f[b_i, 19] = attrs[N_GEO + 13]
                # dielectric albedo never enters (atten = 1) and marble
                # albedo is parameter-free grayscale (0.5*(1+sin),
                # rt/perlin.go) — both route to slot -3; marble's
                # POSITION dependence is handled by the reverse sweep's
                # ∂marble/∂p chain (mk bit 13)
                slot = jnp.where(hit & ~is_die & (texkind != 2.0),
                                 tex_attr * 3.0 + variant, zero - 3.0)
                stash_i[b_i, 0] = slot.astype(jnp.int32)
                stash_i[b_i, 1] = jnp.where(hit, mat_attr,
                                            zero - 9.0).astype(jnp.int32)
                mk = (jnp.where(emit_mask, 1, 0)
                      | jnp.where(alive_next, 2, 0)
                      | jnp.where(lit, 4, 0)
                      | jnp.where(blk_a, 8, 0)
                      | jnp.where(front, 16, 0)
                      | jnp.where(is_met & hit, 32, 0)
                      | jnp.where(is_die & hit, 64, 0)
                      | jnp.where(hit, 128, 0)
                      | jnp.where(use_mis, 256, 0)
                      | jnp.where(blk_h, 512, 0)
                      # volume winner: bit 10 + its index in bits 11-12
                      # (n_vol <= 4 by the applicable() gate) — the
                      # reverse recomputes the entry window from
                      # o = p - t*d and needs vi for the w2l rows
                      | jnp.where(is_vol & hit, 1024, 0)
                      | (jnp.where(is_vol & hit, vwin, 0) << 11)
                      | jnp.where(hit & ~is_die & (texkind == 2.0),
                                  8192, 0))
                stash_i[b_i, 2] = mk
            elif grad_mode:
                # Per-bounce stash for the in-kernel reverse sweep: with
                # direction-parameter-independent materials (the grad
                # gate), the adjoint of the whole path is a product-chain
                # reverse recurrence over these rows (DESIGN.md).
                b_i = bounce_u.astype(jnp.int32)
                tex_attr = attrs[N_GEO + N_MAT - 1]
                for c in range(3):
                    stash_f[b_i, 0 + c] = tp[c]          # T_k
                    stash_f[b_i, 3 + c] = atten[c]       # alb
                    stash_f[b_i, 6 + c] = g_em_su[c]     # em*scale*uncl*ok
                    stash_f[b_i, 9 + c] = g_alb_su[c]    # alb*scale*uncl*ok
                # marble albedo has no trainable-parameter dependence
                # (grayscale 0.5*(1+sin)): noise winners route to -3
                slot = jnp.where(hit & (texkind != 2.0),
                                 tex_attr * 3.0 + variant, zero - 3.0)
                stash_i[b_i, 0] = slot.astype(jnp.int32)
                stash_i[b_i, 1] = (g_lslot * 3.0).astype(jnp.int32)
                mk = (jnp.where(emit_mask, 1, 0)
                      | jnp.where(alive_next, 2, 0)
                      | jnp.where(lit, 4, 0)
                      | jnp.where(g_clamped[0], 8, 0)
                      | jnp.where(g_clamped[1], 16, 0)
                      | jnp.where(g_clamped[2], 32, 0))
                stash_i[b_i, 2] = mk
            alive = alive_next
            for c in range(3):
                tp[c] = jnp.where(alive, tp[c] * atten[c], tp[c])
                o[c] = jnp.where(alive, p[c], o[c])
                d[c] = jnp.where(alive, new_d[c], d[c])
            allow = ~use_mis

            def enc(b):
                return jnp.where(b, zero + 1.0, zero)

            return (bounce_u + np.uint32(1), o, d, tp, rad, enc(alive),
                    enc(allow), m_dir, m_tp, enc(missed), enc(m_prim))

        if resume:
            bounce_end = bounds_ref[1].astype(jnp.uint32)
        else:
            bounce_end = np.uint32(max_depth)

        def cond(state):
            return (state[0] < bounce_end) & jnp.any(state[5] > 0.5)

        f1v = zero + 1.0
        if rev_only:
            state = None
        elif resume:
            flg = flgi[...]
            state = (
                bounds_ref[0].astype(jnp.uint32),
                list(o), list(d),
                [tpxr[...], tpyr[...], tpzr[...]],
                [rri[...], rgi[...], rbi[...]],
                jnp.where((flg & 4) > 0, f1v, zero),
                jnp.where((flg & 8) > 0, f1v, zero),
                [mdxi[...], mdyi[...], mdzi[...]],
                [mtri[...], mtgi[...], mtbi[...]],
                jnp.where((flg & 1) > 0, f1v, zero),
                jnp.where((flg & 2) > 0, f1v, zero),
            )
        else:
            state = (
                jnp.uint32(0), list(o), list(d),
                [f1v, f1v * 1.0, f1v * 1.0],
                [zero * 1.0, zero * 1.0, zero * 1.0],
                f1v * 1.0, f1v * 1.0,
                [zero * 1.0, zero * 1.0, zero * 1.0],
                [zero * 1.0, zero * 1.0, zero * 1.0],
                zero * 1.0, zero * 1.0,
            )
        if rec_dec:
            # Blocks can exit the bounce loop early: bounces never reached
            # must read as HIT_NONE (= 0), not garbage.
            for b in range(max_depth):
                dref[b] = jnp.zeros_like(dref[b])
        if grad_mode and not rev_only:
            # Early-exited blocks' unreached bounces must read as inert:
            # masks 0 (all cotangent terms vanish) and slots -3.
            n_srows = (20 if has_noise else 19) if pathwise else 12
            for b in range(max_depth):
                for rw in range(n_srows):
                    stash_f[b, rw] = zero * 1.0
                stash_i[b, 0] = (zero_u & np.uint32(0)).astype(jnp.int32) - 3
                stash_i[b, 1] = (zero_u & np.uint32(0)).astype(jnp.int32) - 9
                stash_i[b, 2] = (zero_u & np.uint32(0)).astype(jnp.int32)
        if not rev_only:
            state = jax.lax.while_loop(cond, bounce_body, state)
            (_, o, d, tp, rad, alive_f, allow_f, m_dir, m_tp, missed_f,
             m_prim_f) = state
            missed = missed_f > 0.5
            m_prim = m_prim_f > 0.5

        if grad_mode and rev_only:
            # pass B: miss color rows (pass-A for flat/sky, XLA env
            # fetch for "stream") + λ_mdir rows (env only, else zeros)
            miss_col = [mcx[...], mcy[...], mcz[...]]
            lmd_in = [lmdx[...], lmdy[...], lmdz[...]]
        elif grad_mode:
            # ---- miss radiance, in-kernel (the grad gate excludes env
            # maps; sky gradient / flat background are parameter-free
            # but enter the reverse recurrence through s_k at the lit
            # bounce).  A lane misses at most once, so miss_col is one
            # vector shared by every bounce's lit bit.
            if miss_cfg[0] == "sky":
                dl = jnp.sqrt(jnp.maximum(dot3(m_dir, m_dir), 1e-20))
                aa = 0.5 * (m_dir[1] / dl + 1.0)
                miss_col = [(1.0 - aa) + aa * 0.5,
                            (1.0 - aa) + aa * 0.7,
                            (1.0 - aa) + aa * 1.0]
            elif miss_cfg[0] == "stream":
                if phase == "fwd":
                    # env two-phase: the env miss term is applied
                    # XLA-side from the miss records; rad stays
                    # env-less here
                    miss_col = [zero * 1.0 for _ in range(3)]
                else:
                    (eref,) = env_refs
                    miss_col = [eref[c] + zero for c in range(3)]
            else:
                miss_col = [zero + np.float32(miss_cfg[1 + c])
                            for c in range(3)]
            miss_col = [jnp.where(missed, miss_col[c], zero)
                        for c in range(3)]
            for c in range(3):
                rad[c] = rad[c] + m_tp[c] * miss_col[c]
            rr[...] = rad[0]
            rg[...] = rad[1]
            rb[...] = rad[2]
            if phase == "fwd":
                mcx[...] = miss_col[0]
                mcy[...] = miss_col[1]
                mcz[...] = miss_col[2]
                mdx[...] = m_dir[0]
                mdy[...] = m_dir[1]
                mdz[...] = m_dir[2]
                mtr[...] = m_tp[0]
                mtg[...] = m_tp[1]
                mtb[...] = m_tp[2]
                mfl[...] = (
                    missed.astype(jnp.int32)
                    + 2 * m_prim.astype(jnp.int32)
                    + 4 * (alive_f > 0.5).astype(jnp.int32)
                    + 8 * (allow_f > 0.5).astype(jnp.int32)
                )
                return

        if grad_mode:
            if pathwise:
                # ---- PATHWISE reverse sweep (metal/dielectric admitted).
                # Carries three cotangent vectors through the bounces in
                # reverse: λ_tp (throughput), λ_o (origin), λ_d (direction).
                # Per bounce it (a) recomputes the NEE chain + RNG samples
                # from the stash, (b) reverses the scatter Jacobians
                # (reflect / refract / fuzz / IOR), (c) backprops the hit
                # point through the intersection distance via the implicit-
                # function rule dt/do = -n/(n.d), dt/dd = t*dt/do (exact for
                # the quadratic/planar forms the forward uses), and (d)
                # accumulates texture / fuzz / IOR cotangent rows.
                # Equivalence-tested against jax.grad of the XLA
                # differentiable path (tests/test_grad_pathwise.py).
                g = [gxr[...], gyr[...], gzr[...]]
                lo_ = [zero * 1.0, zero * 1.0, zero * 1.0]
                ldv = [zero * 1.0, zero * 1.0, zero * 1.0]
                ltp = [zero * 1.0, zero * 1.0, zero * 1.0]
                n_gacc = 9 * n_tex + 2 * n_mat
                gvec = jnp.zeros((8, LANES), jnp.float32)
                r8 = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 0)
                l128 = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 1)
                flat_i = r8 * LANES + l128
                sky_s = (0.5, 0.7, 1.0)
                first_k = True
                for k in range(max_depth - 1, -1, -1):
                    bu = np.uint32(k)
                    T = [stash_f[k, 0 + c] for c in range(3)]
                    alb = [stash_f[k, 3 + c] for c in range(3)]
                    pv = [stash_f[k, 6 + c] for c in range(3)]
                    din = [stash_f[k, 9 + c] for c in range(3)]
                    nv = [stash_f[k, 12 + c] for c in range(3)]
                    # inert bounces stash 0: clamp so 1/io_ stays finite
                    # (masked lanes must produce 0, not 0 * Inf = NaN)
                    io_ = jnp.maximum(stash_f[k, 16], 1e-3)
                    dndp = stash_f[k, 17]
                    tk = stash_f[k, 18]
                    slot = stash_i[k, 0]
                    mslot = stash_i[k, 1]
                    mk = stash_i[k, 2]
                    emitf = jnp.where((mk & 1) > 0, zero + 1.0, zero)
                    Af = jnp.where((mk & 2) > 0, zero + 1.0, zero)
                    litf = jnp.where((mk & 4) > 0, zero + 1.0, zero)
                    blkb = (mk & 8) > 0
                    frontb = (mk & 16) > 0
                    metf = jnp.where((mk & 32) > 0, zero + 1.0, zero)
                    dief = jnp.where((mk & 64) > 0, zero + 1.0, zero)
                    hitf = jnp.where((mk & 128) > 0, zero + 1.0, zero)
                    misb = (mk & 256) > 0
                    # RNG recompute: same counters as the forward bounce
                    su1, su2, _ = uniform3(bu, rngmod.SCATTER_U)
                    zr = 1.0 - 2.0 * su1
                    phi = np.float32(2.0 * np.pi) * su2
                    rrr = jnp.sqrt(jnp.maximum(0.0, 1.0 - zr * zr))
                    ru = [rrr * jnp.cos(phi), rrr * jnp.sin(phi), zr]
                    ufr, _, _ = uniform3(bu, rngmod.FRESNEL)

                    # ---- NEE recompute (must mirror the forward block
                    # op-for-op — LOCKSTEP INVARIANT: the 1e-20 / 1e-12
                    # clamp floors here must equal the forward NEE
                    # block's) + scale partials wrt (p, nrm)
                    em_su = [zero * 1.0 for _ in range(3)]
                    alb_su = [zero * 1.0 for _ in range(3)]
                    clampf = [zero * 1.0 for _ in range(3)]
                    lp_nee = [zero * 1.0 for _ in range(3)]
                    ln_nee = [zero * 1.0 for _ in range(3)]
                    lslot = (zero_u & np.uint32(0)).astype(jnp.int32) - 9
                    if use_nee:
                        up, _, _ = uniform3(bu, rngmod.LIGHT_PICK)
                        li_f = jnp.minimum(jnp.floor(up * float(n_lights)),
                                           float(n_lights - 1))
                        ua, ub, _ = uniform3(bu, rngmod.LIGHT_U)
                        lsel = [zero * 1.0 for _ in range(LT_ROWS)]
                        for l in range(n_lights):
                            lmsk = li_f == float(l)
                            for f in range(LT_ROWS):
                                lsel[f] = jnp.where(lmsk, lt[f, l] + zero,
                                                    lsel[f])
                        lpnt = [lsel[c] + ua * lsel[3 + c] + ub * lsel[6 + c]
                                for c in range(3)]
                        tl = [lpnt[c] - pv[c] for c in range(3)]
                        tl2 = dot3(tl, tl)
                        dist = jnp.sqrt(jnp.maximum(tl2, 1e-20))
                        ldir = [tl[c] / dist for c in range(3)]
                        cos_th = dot3(nv, ldir)
                        facing = cos_th > 0.0
                        zlc = -(lsel[9] * ldir[0] + lsel[10] * ldir[1]
                                + lsel[11] * ldir[2])
                        cos_l = jnp.abs(zlc)
                        grazing = cos_l < 1e-3
                        s2v = cos_l * lsel[12]
                        s2 = jnp.maximum(s2v, 1e-20)
                        pdf_l = (dist * dist) / s2
                        qv = jnp.maximum(pdf_l, 1e-12)
                        pdf_b = jnp.maximum(cos_th, 0.0) * np.float32(1.0 / np.pi)
                        rv = jnp.maximum(pdf_l + pdf_b, 1e-20)
                        weight = pdf_l / rv
                        scale = cos_th / qv * weight * float(n_lights)
                        ok = facing & ~blkb & ~grazing & misb
                        okf = jnp.where(ok, zero + 1.0, zero)
                        W = zero * 1.0
                        for c in range(3):
                            unclamped = lsel[13 + c] * alb[c] * scale < FIREFLY
                            uf = jnp.where(unclamped, okf, zero)
                            em_su[c] = lsel[13 + c] * scale * uf
                            alb_su[c] = alb[c] * scale * uf
                            clampf[c] = okf - uf
                            W = W + g[c] * T[c] * lsel[13 + c] * alb[c] * uf
                        lslot = (lsel[16] * 3.0).astype(jnp.int32)
                        # sanitize the chain on not-ok lanes BEFORE the
                        # partials: inv_qr^2 overflows to Inf when both
                        # pdfs are ~0 (cos_th <= 0), and the W=0 mask
                        # cannot kill Inf (0 * Inf = NaN).  ok-lane values
                        # are untouched, so the derivatives are exact.
                        dist = jnp.where(ok, dist, zero + 1.0)
                        pdf_l = jnp.where(ok, pdf_l, zero + 1.0)
                        pdf_b = jnp.where(ok, pdf_b, zero + 1.0)
                        qv = jnp.where(ok, qv, zero + 1.0)
                        rv = jnp.where(ok, rv, zero + 1.0)
                        s2 = jnp.where(ok, s2, zero + 1.0)
                        # scale = nL * cos_th * pdf_l / (q * r)
                        q_act = jnp.where(pdf_l > 1e-12, zero + 1.0, zero)
                        r_act = jnp.where(pdf_l + pdf_b > 1e-20,
                                          zero + 1.0, zero)
                        s2_act = jnp.where(s2v > 1e-20, zero + 1.0, zero)
                        nL = float(n_lights)
                        inv_qr = 1.0 / (qv * rv)
                        ds_dcos = nL * pdf_l * inv_qr
                        ds_dpl = nL * cos_th * (
                            inv_qr - pdf_l * (q_act * rv + qv * r_act)
                            * inv_qr * inv_qr)
                        ds_dpb = -nL * cos_th * pdf_l * r_act * inv_qr / rv
                        dpb_dcos = jnp.where(cos_th > 0.0,
                                             zero + np.float32(1.0 / np.pi),
                                             zero)
                        c_cos = W * (ds_dcos + ds_dpb * dpb_dcos)
                        c_pl = W * ds_dpl
                        c_dist = c_pl * (2.0 * dist / s2)
                        c_cosl = c_pl * (-(dist * dist) * lsel[12] * s2_act
                                         / (s2 * s2))
                        sgn_z = jnp.where(zlc >= 0.0, zero + 1.0, zero - 1.0)
                        lam_ld = [c_cos * nv[c] - c_cosl * sgn_z * lsel[9 + c]
                                  for c in range(3)]
                        ln_nee = [c_cos * ldir[c] for c in range(3)]
                        ldd = dot3(ldir, lam_ld)
                        dist_act = jnp.where(tl2 > 1e-20, zero + 1.0, zero)
                        lam_tl = [(lam_ld[c] - dist_act * ldir[c] * ldd) / dist
                                  + c_dist * dist_act * ldir[c]
                                  for c in range(3)]
                        lp_nee = [-lam_tl[c] for c in range(3)]

                    # ---- HDRI-NEE reverse (env + lights scenes): the
                    # importance sample rows are streamed inputs (static
                    # bounce index), the shadow outcome is the stashed
                    # blk_h bit, and — unlike the area light — there is
                    # NO p-dependence (solid-angle pdf, no distance
                    # term): only the normal cotangent and the env TEXEL
                    # cotangent (written to eout; XLA scatter-adds it at
                    # the alias-picked texel it recomputes from the same
                    # RNG).  Mirrors the forward block op-for-op.
                    if use_hdri:
                        (href,) = hdri_refs
                        hrow = [href[k * 7 + c] for c in range(7)]
                        hdv = hrow[0:3]
                        hemr = hrow[3:6]
                        pdf_h = hrow[6]
                        cos_h = dot3(nv, hdv)
                        blkh_b = (mk & 512) > 0
                        ok_h = (cos_h > 0.0) & ~blkh_b & misb
                        okf_h = jnp.where(ok_h, zero + 1.0, zero)
                        pdf_bh = jnp.maximum(cos_h, 0.0) \
                            * np.float32(1.0 / np.pi)
                        qh = jnp.maximum(pdf_h, 1e-12)
                        rh = jnp.maximum(pdf_h + pdf_bh, 1e-20)
                        wgt_h = pdf_h / rh
                        scale_h = cos_h / qh * wgt_h
                        W_h = zero * 1.0
                        for c in range(3):
                            uncl_h = hemr[c] * alb[c] * scale_h < FIREFLY
                            uf_h = jnp.where(uncl_h, okf_h, zero)
                            # em_su/clampf fold: cot_alb and the ltp
                            # recurrence treat area and env NEE terms
                            # identically (both scale alb)
                            em_su[c] = em_su[c] + hemr[c] * scale_h * uf_h
                            clampf[c] = clampf[c] + (okf_h - uf_h)
                            eout[k * 3 + c] = (g[c] * T[c] * alb[c]
                                               * scale_h * uf_h)
                            W_h = W_h + g[c] * T[c] * hemr[c] * alb[c] * uf_h
                        # sanitize the chain on not-ok lanes (0*inf = NaN)
                        pdf_h_s = jnp.where(ok_h, pdf_h, zero + 1.0)
                        pdf_bh_s = jnp.where(ok_h, pdf_bh, zero + 1.0)
                        qh_s = jnp.where(ok_h, qh, zero + 1.0)
                        rh_s = jnp.where(ok_h, rh, zero + 1.0)
                        r_act_h = jnp.where(pdf_h + pdf_bh > 1e-20,
                                            zero + 1.0, zero)
                        inv_qr_h = 1.0 / (qh_s * rh_s)
                        # scale_h = cos_h * pdf_h / (q * r)
                        ds_dcos_h = pdf_h_s * inv_qr_h
                        ds_dpbh = (-cos_h * pdf_h_s * r_act_h
                                   * inv_qr_h / rh_s)
                        dpbh_dcos = jnp.where(cos_h > 0.0,
                                              zero + np.float32(1.0 / np.pi),
                                              zero)
                        c_cos_h = W_h * (ds_dcos_h + ds_dpbh * dpbh_dcos)
                        for c in range(3):
                            ln_nee[c] = ln_nee[c] + c_cos_h * hdv[c]

                    # ---- scatter Jacobian reverse (u = λ_{d_{k+1}})
                    u = ldv
                    lamf = (1.0 - metf) * (1.0 - dief)
                    # metal: new_d = rfl/|rfl| + fuzz*ru
                    ddn_f = dot3(din, nv)
                    rfl = [din[c] - nv[c] * (2.0 * ddn_f) for c in range(3)]
                    rlen = jnp.sqrt(jnp.maximum(dot3(rfl, rfl), 1e-20))
                    rhat = [rfl[c] / rlen for c in range(3)]
                    cot_fuzz = Af * metf * dot3(ru, u)
                    rhu = dot3(rhat, u)
                    vv = [(u[c] - rhat[c] * rhu) / rlen for c in range(3)]
                    nvv = dot3(nv, vv)
                    l_din_met = [vv[c] - 2.0 * nv[c] * nvv for c in range(3)]
                    l_n_met = [-2.0 * din[c] * nvv - 2.0 * ddn_f * vv[c]
                               for c in range(3)]
                    # dielectric: reflect/refract on unit ud (branch frozen)
                    dlen = jnp.sqrt(jnp.maximum(dot3(din, din), 1e-20))
                    ud = [din[c] / dlen for c in range(3)]
                    udn = dot3(ud, nv)
                    cos_t = jnp.minimum(-udn, 1.0)
                    ct_act = jnp.where(-udn < 1.0, zero + 1.0, zero)
                    sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_t * cos_t))
                    ri = jnp.where(frontb, 1.0 / io_, io_)
                    cannot = ri * sin_t > 1.0
                    r0s = (1.0 - ri) / (1.0 + ri)
                    r0s = r0s * r0s
                    omc = jnp.maximum(1.0 - cos_t, 0.0)
                    omc2 = omc * omc
                    schl = r0s + (1.0 - r0s) * omc2 * omc2 * omc
                    do_refl = cannot | (schl > ufr)
                    nu = dot3(nv, u)
                    l_ud_r = [u[c] - 2.0 * nv[c] * nu for c in range(3)]
                    l_n_r = [-2.0 * ud[c] * nu - 2.0 * udn * u[c]
                             for c in range(3)]
                    perp = [(ud[c] + nv[c] * cos_t) * ri for c in range(3)]
                    pp = dot3(perp, perp)
                    xv = 1.0 - pp
                    parl = -jnp.sqrt(jnp.maximum(jnp.abs(xv), 1e-20))
                    sx_act = (jnp.where(xv >= 0.0, zero + 1.0, zero - 1.0)
                              * jnp.where(jnp.abs(xv) > 1e-20,
                                          zero + 1.0, zero))
                    l_parl = nu
                    l_perp = [u[c] - sx_act * (l_parl / parl) * perp[c]
                              for c in range(3)]
                    npp = dot3(nv, l_perp)
                    l_ud_t = [ri * (l_perp[c] - ct_act * nv[c] * npp)
                              for c in range(3)]
                    l_n_t = [ri * (cos_t * l_perp[c] - ct_act * ud[c] * npp)
                             + parl * u[c] for c in range(3)]
                    cot_ri = (ud[0] + nv[0] * cos_t) * l_perp[0] + \
                        (ud[1] + nv[1] * cos_t) * l_perp[1] + \
                        (ud[2] + nv[2] * cos_t) * l_perp[2]
                    reflf = jnp.where(do_refl, zero + 1.0, zero)
                    dri = jnp.where(frontb, -1.0 / (io_ * io_), zero + 1.0)
                    # dief (the stashed dielectric mask bit) is the inert-
                    # lane gate; io_'s 1e-3 clamp is only NaN hygiene for
                    # the 1/io_ above (ADVICE r4: a magnitude gate here
                    # would silently zero a genuine tiny-IOR gradient)
                    cot_ior = Af * dief * (1.0 - reflf) * cot_ri * dri
                    l_ud = [reflf * l_ud_r[c] + (1.0 - reflf) * l_ud_t[c]
                            for c in range(3)]
                    l_n_die = [reflf * l_n_r[c] + (1.0 - reflf) * l_n_t[c]
                               for c in range(3)]
                    udu = dot3(ud, l_ud)
                    l_din_die = [(l_ud[c] - ud[c] * udu) / dlen
                                 for c in range(3)]

                    l_n_s = [Af * (lamf * u[c] + metf * l_n_met[c]
                                   + dief * l_n_die[c]) for c in range(3)]
                    l_din_s = [Af * (metf * l_din_met[c]
                                     + dief * l_din_die[c])
                               for c in range(3)]

                    # ---- texture-slot cotangents + λ_tp recurrence
                    cot_alb = [g[c] * T[c] * (emitf + em_su[c])
                               + ltp[c] * T[c] * Af for c in range(3)]
                    cot_lem = [g[c] * T[c] * alb_su[c] for c in range(3)]

                    # ---- ∂marble/∂p (rt/noise.go:29-92, rt/texture.go:
                    # 81-85): marble = .5(1 + sin(s*pz + 10|turb|)),
                    # turb = Σ_o w_o noise1(p*s*2^o).  Grayscale: all
                    # three albedo channels share the value, so its
                    # position cotangent is (Σ_c cot_alb_c) * dm/dp,
                    # injected into λ_p before the intersection backprop.
                    lam_mrb = None
                    if has_noise:
                        marbf = jnp.where((mk & 8192) > 0, zero + 1.0,
                                          zero)
                        nsc = stash_f[k, 19]
                        mtx, mty, mtz = (pv[0] * nsc, pv[1] * nsc,
                                         pv[2] * nsc)
                        tacc = zero * 1.0
                        da = [zero * 1.0 for _ in range(3)]
                        twt = 1.0
                        osc = nsc * 1.0
                        for _oct in range(7):
                            nval, ndx, ndy, ndz = noise1(
                                mtx, mty, mtz, zero, with_grad=True)
                            tacc = tacc + twt * nval
                            da[0] = da[0] + twt * osc * ndx
                            da[1] = da[1] + twt * osc * ndy
                            da[2] = da[2] + twt * osc * ndz
                            twt *= 0.5
                            osc = osc * 2.0
                            mtx, mty, mtz = mtx * 2.0, mty * 2.0, mtz * 2.0
                        arg = nsc * pv[2] + 10.0 * jnp.abs(tacc)
                        sgn_t = jnp.where(tacc > 0.0, zero + 1.0,
                                          jnp.where(tacc < 0.0,
                                                    zero - 1.0, zero))
                        half_cos = 0.5 * jnp.cos(arg)
                        cotm = marbf * (cot_alb[0] + cot_alb[1]
                                        + cot_alb[2]) * half_cos
                        lam_mrb = [cotm * (10.0 * sgn_t * da[c]
                                           + (nsc if c == 2 else 0.0))
                                   for c in range(3)]
                    # miss color recompute (din IS the miss direction on
                    # lit lanes)
                    if miss_cfg[0] == "sky":
                        dl2 = jnp.maximum(dot3(din, din), 1e-20)
                        dlm = jnp.sqrt(dl2)
                        aa = 0.5 * (din[1] / dlm + 1.0)
                        mc = [1.0 + aa * (sky_s[c] - 1.0) for c in range(3)]
                        w_sky = (g[0] * T[0] * (sky_s[0] - 1.0)
                                 + g[1] * T[1] * (sky_s[1] - 1.0)
                                 + g[2] * T[2] * (sky_s[2] - 1.0))
                        l_d_sky = [litf * w_sky * 0.5
                                   * (((zero + 1.0) if c == 1 else zero)
                                      / dlm - din[1] * din[c] / (dl2 * dlm))
                                   for c in range(3)]
                    elif miss_cfg[0] == "stream":
                        # env: mc + λ_mdir precomputed XLA-side against
                        # the miss direction (a lane lits exactly once,
                        # so the per-RAY rows are valid at its lit
                        # bounce; litf gates every other bounce).
                        if rev_only:
                            mc = [miss_col[c] for c in range(3)]
                            l_d_sky = [litf * lmd_in[c] for c in range(3)]
                        else:
                            (eref,) = env_refs
                            mc = [eref[c] + zero for c in range(3)]
                            l_d_sky = [litf * eref[3 + c]
                                       for c in range(3)]
                    else:
                        mc = [zero + np.float32(miss_cfg[1 + c])
                              for c in range(3)]
                        l_d_sky = [zero * 1.0 for _ in range(3)]
                    ltp = [ltp[c] * (Af * alb[c] + (1.0 - Af))
                           + g[c] * (alb[c] * emitf + em_su[c] * alb[c]
                                     + FIREFLY * clampf[c])
                           + litf * g[c] * mc[c] for c in range(3)]

                    # ---- assemble λ_p / λ_n, backprop the intersection
                    lam_n = [l_n_s[c] + ln_nee[c] for c in range(3)]
                    lam_p = [Af * lo_[c] + lp_nee[c] + dndp * lam_n[c]
                             + (lam_mrb[c] if lam_mrb is not None else 0.0)
                             for c in range(3)]
                    den = dot3(nv, din)
                    dsafe = jnp.where(jnp.abs(den) > 1e-20, den, zero + 1.0)
                    dlp = dot3(din, lam_p)
                    bb_c = [lam_p[c] - nv[c] * dlp / dsafe for c in range(3)]
                    ld_t = [tk * bb_c[c] for c in range(3)]
                    if n_vol:
                        # ---- volume scatter-distance adjoint
                        # (rt/volume.go:34-79): t = max(near, eps) + K/|d|
                        # with K RNG-only, so the position chain runs
                        # through the entry SLAB plane (implicit rule with
                        # ne = w2l row of the winning axis) plus the
                        # free-flight |d| term.  Entry window recomputed
                        # from o = p - t*d (cheaper than stashing, rule 10);
                        # the winning volume's index lives in mk bits 11-12.
                        volf = (mk & 1024) > 0
                        vidx = (mk >> 11) & 3
                        o_rec = [pv[c] - tk * din[c] for c in range(3)]
                        near_v = zero * 1.0
                        ne_v = [zero * 1.0 for _ in range(3)]
                        inv_v = zero * 1.0
                        act_v = zero * 1.0
                        for vi in range(n_vol):
                            vm = volf & (vidx == vi)
                            nr, ne_, inv_e, act_e = volume_entry(
                                o_rec, din, vi)
                            near_v = jnp.where(vm, nr, near_v)
                            for c in range(3):
                                ne_v[c] = jnp.where(vm, ne_[c], ne_v[c])
                            inv_v = jnp.where(vm, inv_e, inv_v)
                            act_v = jnp.where(vm, act_e, act_v)
                        # near < eps (origin inside): t0 clamps to the
                        # constant eps, the slab term dies (matches the
                        # jnp.maximum subgradient in _winner_t)
                        ent = jnp.where(near_v >= EPS_HIT, zero + 1.0, zero)
                        t0c_v = jnp.maximum(near_v, EPS_HIT)
                        dl2v = jnp.maximum(dot3(din, din), 1e-20)
                        for c in range(3):
                            bvol = lam_p[c] - ent * ne_v[c] * inv_v * dlp
                            lvol = (tk * lam_p[c]
                                    - ent * act_v * near_v * ne_v[c]
                                    * inv_v * dlp
                                    - (tk - t0c_v) * din[c] * dlp / dl2v)
                            bb_c[c] = jnp.where(volf, bvol, bb_c[c])
                            ld_t[c] = jnp.where(volf, lvol, ld_t[c])
                    bb = [hitf * bb_c[c] for c in range(3)]
                    lo_ = [(1.0 - Af) * lo_[c] + bb[c] for c in range(3)]
                    ldv = [(1.0 - Af) * ldv[c] + l_din_s[c] + hitf * ld_t[c]
                           + l_d_sky[c] for c in range(3)]

                    # ---- accumulate cotangent rows per parameter slot
                    for sc in range(3 * n_tex):
                        am = slot == sc
                        lm = lslot == sc
                        for c in range(3):
                            contrib = (jnp.where(am, cot_alb[c], 0.0)
                                       + jnp.where(lm, cot_lem[c], 0.0))
                            if first_k:
                                gacc[sc * 3 + c] = contrib
                            else:
                                gacc[sc * 3 + c] = gacc[sc * 3 + c] + contrib
                    for mi in range(n_mat):
                        fm = mslot == mi
                        fz_row = 9 * n_tex + 2 * mi
                        io_row = fz_row + 1
                        cf = jnp.where(fm, cot_fuzz, 0.0)
                        ci = jnp.where(fm, cot_ior, 0.0)
                        if first_k:
                            gacc[fz_row] = cf
                            gacc[io_row] = ci
                        else:
                            gacc[fz_row] = gacc[fz_row] + cf
                            gacc[io_row] = gacc[io_row] + ci
                    first_k = False
                for sc in range(n_gacc):
                    v = jnp.sum(gacc[sc])
                    gvec = gvec + v * jnp.where(flat_i == sc, 1.0, 0.0)
                gout[...] = gvec
                return

            # ---- reverse sweep: R_k = s_k + aeff_k * R_{k+1};
            # cot(alb)_c = g_c T_c (R_c*alive_next + emit + em_su_c),
            # cot(em)_c  = g_c T_c alb_su_c  -> light tex slot.
            g = [gxr[...], gyr[...], gzr[...]]
            R = [zero * 1.0, zero * 1.0, zero * 1.0]
            gvec = jnp.zeros((8, LANES), jnp.float32)
            r8 = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 0)
            l128 = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 1)
            flat_i = r8 * LANES + l128
            first_k = True
            for k in range(max_depth - 1, -1, -1):
                T = [stash_f[k, 0 + c] for c in range(3)]
                alb = [stash_f[k, 3 + c] for c in range(3)]
                em_su = [stash_f[k, 6 + c] for c in range(3)]
                alb_su = [stash_f[k, 9 + c] for c in range(3)]
                slot = stash_i[k, 0]
                lslot = stash_i[k, 1]
                mk = stash_i[k, 2]
                emitf = jnp.where((mk & 1) > 0, zero + 1.0, zero)
                alive_nf = jnp.where((mk & 2) > 0, zero + 1.0, zero)
                litf = jnp.where((mk & 4) > 0, zero + 1.0, zero)
                cot_alb, cot_lem, s = [], [], []
                for c in range(3):
                    clampf = jnp.where((mk & (8 << c)) > 0, zero + 1.0,
                                       zero)
                    s_c = (alb[c] * emitf + alb[c] * em_su[c]
                           + FIREFLY * clampf + miss_col[c] * litf)
                    s.append(s_c)
                    cotb = g[c] * T[c]
                    cot_alb.append(cotb * (R[c] * alive_nf + emitf
                                           + em_su[c]))
                    cot_lem.append(cotb * alb_su[c])
                for c in range(3):
                    aeff = alb[c] * alive_nf + (1.0 - alive_nf)
                    R[c] = s[c] + aeff * R[c]
                # accumulate per-slot cotangent rows in VMEM (gacc) —
                # a full [BR,128]->scalar reduce per (bounce, slot,
                # channel) cost ~17 us/block; summing masked VECTORS per
                # bounce and lane-reducing ONCE at the end is ~20x less
                for sc in range(3 * n_tex):
                    am = slot == sc
                    lm = lslot == sc
                    for c in range(3):
                        contrib = (jnp.where(am, cot_alb[c], 0.0)
                                   + jnp.where(lm, cot_lem[c], 0.0))
                        if first_k:
                            gacc[sc * 3 + c] = contrib
                        else:
                            gacc[sc * 3 + c] = gacc[sc * 3 + c] + contrib
                first_k = False
            for sc in range(3 * n_tex):
                for c in range(3):
                    v = jnp.sum(gacc[sc * 3 + c])
                    gvec = gvec + v * jnp.where(
                        flat_i == (sc * 3 + c), 1.0, 0.0)
            gout[...] = gvec
            return

        rr[...] = rad[0]
        rg[...] = rad[1]
        rb[...] = rad[2]
        mdx[...] = m_dir[0]
        mdy[...] = m_dir[1]
        mdz[...] = m_dir[2]
        mtr[...] = m_tp[0]
        mtg[...] = m_tp[1]
        mtb[...] = m_tp[2]
        mfl[...] = (
            missed.astype(jnp.int32) + 2 * m_prim.astype(jnp.int32)
            + 4 * (alive_f > 0.5).astype(jnp.int32)
            + 8 * (allow_f > 0.5).astype(jnp.int32)
        )
        if resume:
            oox[...] = o[0]
            ooy[...] = o[1]
            ooz[...] = o[2]
            odx[...] = d[0]
            ody[...] = d[1]
            odz[...] = d[2]
            otx[...] = tp[0]
            oty[...] = tp[1]
            otz[...] = tp[2]

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("n_planar", "n_sphere", "n_sph_seg", "n_vol",
                     "n_lights", "has_checker", "max_depth", "rec_dec",
                     "block_rows", "sph_seg", "has_noise"),
)
def _call(pt, st, sb, vt, lt, seed, o, d, tm, stream, *, n_planar, n_sphere,
          n_sph_seg, n_vol, n_lights, has_checker, max_depth, hdri_rows=None,
          rec_dec=False, block_rows=BLOCK_ROWS, sph_seg=None,
          has_noise=False):
    from ..core.vec3 import V3

    oc = [o.x, o.y, o.z]
    dc = [d.x, d.y, d.z]
    r = oc[0].shape[0]
    block = block_rows * LANES
    padded = -(-r // block) * block
    rows = padded // LANES

    def prep(a, dtype=jnp.float32):
        if padded != r:
            a = jnp.pad(a, (0, padded - r))
        return a.reshape(rows, LANES).astype(dtype)

    rays = [prep(a) for a in oc + dc + [tm]] + [prep(stream, jnp.uint32)]

    grid = (rows // block_rows,)
    ray_spec = pl.BlockSpec((block_rows, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    out_spec = pl.BlockSpec((block_rows, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    use_hdri = hdri_rows is not None
    hdri_in, hdri_spec = [], []
    if use_hdri:
        hdri = jnp.stack([prep(a) for a in hdri_rows], axis=0)
        hdri_in = [hdri]
        d7 = len(hdri_rows)
        hdri_spec = [pl.BlockSpec((d7, block_rows, LANES),
                                  lambda i: (0, i, 0),
                                  memory_space=pltpu.VMEM)]

    dec_spec, dec_shape = [], []
    if rec_dec:
        dec_spec = [pl.BlockSpec((max_depth, block_rows, LANES),
                                 lambda i: (0, i, 0),
                                 memory_space=pltpu.VMEM)]
        dec_shape = [jax.ShapeDtypeStruct((max_depth, rows, LANES),
                                          jnp.int32)]

    outs = pl.pallas_call(
        make_kernel(n_planar, n_sphere, n_sph_seg, n_vol, n_lights,
                    has_checker, max_depth, use_hdri=use_hdri,
                    rec_dec=rec_dec, sph_seg=sph_seg,
                    has_noise=has_noise),
        grid=grid,
        in_specs=[smem] * 7 + hdri_spec + [ray_spec] * 8,
        out_specs=[out_spec] * 10 + dec_spec,
        out_shape=[jax.ShapeDtypeStruct((rows, LANES), jnp.float32)] * 9
        + [jax.ShapeDtypeStruct((rows, LANES), jnp.int32)] + dec_shape,
        interpret=INTERPRET,
    )(
        jnp.asarray([n_planar, n_sphere], jnp.int32),
        jnp.asarray([seed], jnp.uint32),
        pt, st, sb, vt, lt, *hdri_in, *rays,
    )
    flat = [x.reshape(-1)[:r] for x in outs[:10]]
    rad = V3(flat[0], flat[1], flat[2])
    m_dir = V3(flat[3], flat[4], flat[5])
    m_tp = V3(flat[6], flat[7], flat[8])
    missed = (flat[9] & 1) == 1
    m_primary = (flat[9] & 2) == 2
    if rec_dec:
        pk = outs[10].reshape(max_depth, -1)[:, :r]
        dec = (pk & 3, (pk >> 2) & 0x3FFFF,
               ((pk >> 20) & 1) == 1, ((pk >> 21) & 1) == 1)
        return rad, m_dir, m_tp, missed, m_primary, dec
    return rad, m_dir, m_tp, missed, m_primary


# Gradient-kernel VMEM stash budget: the per-block stash is
# [max_depth, rows, block_rows, 128] f32 (+3 i32 rows).  Deep configs
# (depth > 12) drop to 8-row blocks — finer grid, but the stash shrinks
# 4x and every depth the reference ships (20 for hdri-test, 50 max)
# fits; measured on-chip at depth 20/50 (scripts/depth_gate_probe.py).
GRAD_STASH_BUDGET = int(_os.environ.get("GRT_GRAD_STASH_BUDGET",
                                        8 << 20))
GRAD_DEPTH_MAX = 50  # reverse sweep unrolls per bounce: compile bound


def _grad_block_rows(scene, max_depth: int) -> int:
    br = (SPH_BLOCK_ROWS
          if scene.spheres.radius.shape[0] >= SPH_CULL_MIN else BLOCK_ROWS)
    if max_depth > 12:
        br = min(br, 8)
    return br


def _grad_stash_ok(scene, max_depth: int, pathwise: bool) -> bool:
    if max_depth > GRAD_DEPTH_MAX:
        return False
    rows = ((20 if scene.has_noise else 19) if pathwise else 12) + 3
    br = _grad_block_rows(scene, max_depth)
    return max_depth * rows * br * LANES * 4 <= GRAD_STASH_BUDGET


def grad_applicable(scene, max_depth: int) -> bool:
    """Static gate for the GRADIENT megakernel: on top of applicable(),
    every material's scatter DIRECTION must be parameter-independent
    (lambertian / light / isotropic — no metal fuzz, no dielectric IOR),
    there must be no environment map (its texel gradients need the XLA
    quad-table path), and the flat slot space (3 variants x 3 channels
    per texture) must fit the [8, 128] per-block gradient vector.  Under
    the gate, fuzz/ior/atlas gradients are structurally zero and the
    path adjoint is an exact product-chain reverse sweep (in-kernel).
    Noise textures are admitted (round 4): marble albedo is
    parameter-FREE grayscale and positions are parameter-independent
    here, so noise winners simply route to the null cotangent slot."""
    import numpy as np

    if not applicable(scene):
        return False
    if scene.env is not None and scene.n_lights > 0:
        return False  # NEE env texel scatter needs the pathwise kernel
    if not _grad_stash_ok(scene, max_depth, pathwise=False):
        return False
    kinds = np.asarray(scene.materials.kind)
    if np.any((kinds == 1) | (kinds == 2)):   # metal / dielectric
        return False
    n_tex = int(scene.textures.color.shape[0])
    return 9 * n_tex <= 8 * LANES


def grad_pathwise_applicable(scene, max_depth: int) -> bool:
    """Static gate for the PATHWISE gradient megakernel: admits metal and
    dielectric (fuzz / IOR gradients via in-kernel scatter-direction
    adjoints + intersection backprop) and environment maps: miss-only
    env (texel scatter + λ_mdir computed XLA-side and streamed) AND —
    round 4 — env + NEE quad lights (the per-bounce HDRI importance
    rows are streamed in, the per-bounce env texel COTANGENT rows are
    streamed back out, and the alias-picked texel scatter happens
    XLA-side; see grad_megakernel).  Volumes are admitted (round 5):
    the scatter-distance adjoint through the boundary window runs in
    the reverse sweep (entry-slab implicit rule + free-flight |d| term,
    rt/volume.go:34-79) — all-diffuse volume scenes still prefer the
    cheaper product-chain kernel (grad_applicable wins the routing).
    Noise textures are admitted too (round 5): marble is parameter-FREE
    grayscale, but positions here are parameter-DEPENDENT, so the
    reverse sweep carries the analytic ∂marble/∂p (7-octave
    lattice-gradient adjoint, rt/noise.go:29-92) into λ_p."""
    if not applicable(scene):
        return False
    if not _grad_stash_ok(scene, max_depth, pathwise=True):
        return False
    n_tex = int(scene.textures.color.shape[0])
    n_mat = int(scene.materials.kind.shape[0])
    return 9 * n_tex + 2 * n_mat <= 8 * LANES


@functools.partial(
    jax.jit,
    static_argnames=("n_planar", "n_sphere", "n_sph_seg", "n_vol",
                     "n_lights", "has_checker", "max_depth", "n_tex",
                     "miss_cfg", "block_rows", "sph_seg", "pathwise",
                     "n_mat", "has_noise"),
)
def _call_grad(pt, st, sb, vt, lt, seed, o, d, tm, stream, gx, gy, gz, *,
               n_planar,
               n_sphere, n_sph_seg, n_vol, n_lights, has_checker, max_depth,
               n_tex, miss_cfg, block_rows=BLOCK_ROWS, sph_seg=None,
               pathwise=False, n_mat=0, env_rows=None, hdri_rows=None,
               has_noise=False):
    """Gradient megakernel launch.  gx/gy/gz: [R] per-channel loss
    cotangent rows (dL/d(radiance); zero for padding lanes).  Returns
    (rad V3 [R], grads [n_tex, 3, 3]) where grads[t, v, c] is
    d L / d theta[t, v, c] with v in (color, even_color, odd_color);
    in pathwise mode additionally (fuzz [n_mat], ior [n_mat]).
    ``env_rows`` (miss_cfg ("stream",)): 6 [R] rows — miss radiance mc
    (3, phantom applied) + miss-direction cotangent λ_mdir (3)."""
    from ..core.vec3 import V3

    oc = [o.x, o.y, o.z]
    dc = [d.x, d.y, d.z]
    r = oc[0].shape[0]
    block = block_rows * LANES
    padded = -(-r // block) * block
    rows = padded // LANES

    def prep(a, dtype=jnp.float32):
        if padded != r:
            a = jnp.pad(a, (0, padded - r))
        return a.reshape(rows, LANES).astype(dtype)

    rays = [prep(a) for a in oc + dc + [tm]] + [prep(stream, jnp.uint32)]
    grows = [prep(a) for a in (gx, gy, gz)]

    grid = (rows // block_rows,)
    n_blocks = rows // block_rows
    ray_spec = pl.BlockSpec((block_rows, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    out_spec = pl.BlockSpec((block_rows, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    gout_spec = pl.BlockSpec((8, LANES), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)

    env_in, env_spec = [], []
    if env_rows is not None:
        assert miss_cfg == ("stream",)
        env_in = [jnp.stack([prep(a) for a in env_rows], axis=0)]
        env_spec = [pl.BlockSpec((len(env_rows), block_rows, LANES),
                                 lambda i: (0, i, 0),
                                 memory_space=pltpu.VMEM)]

    use_hdri = hdri_rows is not None
    hdri_in, hdri_spec = [], []
    if use_hdri:
        assert pathwise, "env-NEE grad rows need the pathwise reverse"
        hdri_in = [jnp.stack([prep(a) for a in hdri_rows], axis=0)]
        d7 = len(hdri_rows)
        hdri_spec = [pl.BlockSpec((d7, block_rows, LANES),
                                  lambda i: (0, i, 0),
                                  memory_space=pltpu.VMEM)]
    eout_spec, eout_shape = [], []
    if use_hdri:
        eout_spec = [pl.BlockSpec((3 * max_depth, block_rows, LANES),
                                  lambda i: (0, i, 0),
                                  memory_space=pltpu.VMEM)]
        eout_shape = [jax.ShapeDtypeStruct((3 * max_depth, rows, LANES),
                                           jnp.float32)]

    n_gacc = 9 * max(n_tex, 1) + (2 * n_mat if pathwise else 0)
    assert n_gacc <= 8 * LANES, "parameter slots exceed the [8,128] gout"
    outs = pl.pallas_call(
        make_kernel(n_planar, n_sphere, n_sph_seg, n_vol, n_lights,
                    has_checker, max_depth, grad_mode=True, n_tex=n_tex,
                    miss_cfg=miss_cfg, sph_seg=sph_seg, pathwise=pathwise,
                    n_mat=n_mat, use_hdri=use_hdri, has_noise=has_noise),
        grid=grid,
        in_specs=[smem] * 7 + hdri_spec + env_spec + [ray_spec] * 11,
        out_specs=[out_spec] * 3 + [gout_spec] + eout_spec,
        out_shape=[jax.ShapeDtypeStruct((rows, LANES), jnp.float32)] * 3
        + [jax.ShapeDtypeStruct((n_blocks * 8, LANES), jnp.float32)]
        + eout_shape,
        scratch_shapes=[
            pltpu.VMEM((max_depth,
                        (20 if has_noise else 19) if pathwise else 12,
                        block_rows, LANES), jnp.float32),
            pltpu.VMEM((max_depth, 3, block_rows, LANES), jnp.int32),
            pltpu.VMEM((n_gacc, block_rows, LANES), jnp.float32),
        ],
        interpret=INTERPRET,
    )(
        jnp.asarray([n_planar, n_sphere], jnp.int32),
        jnp.asarray([seed], jnp.uint32),
        pt, st, sb, vt, lt, *hdri_in, *env_in, *rays, *grows,
    )
    flat = [x.reshape(-1)[:r] for x in outs[:3]]
    rad = V3(flat[0], flat[1], flat[2])
    gsum = outs[3].reshape(n_blocks, 8 * LANES).sum(axis=0)
    grads = gsum[: 9 * n_tex].reshape(n_tex, 3, 3)
    cot_env = None
    if use_hdri:
        cot_env = outs[4].reshape(3 * max_depth, -1)[:, :r]
    if not pathwise:
        return rad, grads
    mg = gsum[9 * n_tex: 9 * n_tex + 2 * n_mat].reshape(n_mat, 2)
    return rad, grads, mg[:, 0], mg[:, 1], cot_env


@functools.partial(
    jax.jit,
    static_argnames=("n_planar", "n_sphere", "n_sph_seg", "n_vol",
                     "n_lights", "has_checker", "max_depth", "n_tex",
                     "miss_cfg", "block_rows", "sph_seg", "pathwise",
                     "n_mat", "has_noise"),
)
def _call_grad_fwd(pt, st, sb, vt, lt, seed, o, d, tm, stream, *,
                   n_planar, n_sphere, n_sph_seg, n_vol, n_lights,
                   has_checker, max_depth, n_tex, miss_cfg,
                   block_rows=BLOCK_ROWS, sph_seg=None, pathwise=False,
                   n_mat=0, has_noise=False):
    """TWO-PHASE pass A: gradient forward with the per-bounce stash
    written to HBM.  Returns (rad x3 flat, mc rows x3 padded, m_dir x3
    flat, m_tp x3 flat, mfl flat i32, stash_f [D, S, rows, 128] f32,
    stash_i [D, 3, rows, 128] i32).  The rad rows ARE the framebuffer
    contribution (same forward code as the fused kernel; env scenes
    add the miss term XLA-side from the miss records), so callers skip
    the separate forward render."""
    oc = [o.x, o.y, o.z]
    dc = [d.x, d.y, d.z]
    r = oc[0].shape[0]
    block = block_rows * LANES
    padded = -(-r // block) * block
    rows = padded // LANES

    def prep(a, dtype=jnp.float32):
        if padded != r:
            a = jnp.pad(a, (0, padded - r))
        return a.reshape(rows, LANES).astype(dtype)

    rays = [prep(a) for a in oc + dc + [tm]] + [prep(stream, jnp.uint32)]
    grid = (rows // block_rows,)
    ray_spec = pl.BlockSpec((block_rows, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    out_spec = pl.BlockSpec((block_rows, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    n_srows = (20 if has_noise else 19) if pathwise else 12
    sf_spec = pl.BlockSpec((max_depth, n_srows, block_rows, LANES),
                           lambda i: (0, 0, i, 0),
                           memory_space=pltpu.VMEM)
    si_spec = pl.BlockSpec((max_depth, 3, block_rows, LANES),
                           lambda i: (0, 0, i, 0),
                           memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        make_kernel(n_planar, n_sphere, n_sph_seg, n_vol, n_lights,
                    has_checker, max_depth, grad_mode=True, n_tex=n_tex,
                    miss_cfg=miss_cfg, sph_seg=sph_seg, pathwise=pathwise,
                    n_mat=n_mat, has_noise=has_noise, phase="fwd"),
        grid=grid,
        in_specs=[smem] * 7 + [ray_spec] * 8,
        out_specs=[out_spec] * 13 + [sf_spec, si_spec],
        out_shape=[jax.ShapeDtypeStruct((rows, LANES), jnp.float32)] * 12
        + [jax.ShapeDtypeStruct((rows, LANES), jnp.int32)]
        + [jax.ShapeDtypeStruct((max_depth, n_srows, rows, LANES),
                                jnp.float32),
           jax.ShapeDtypeStruct((max_depth, 3, rows, LANES), jnp.int32)],
        interpret=INTERPRET,
    )(
        jnp.asarray([n_planar, n_sphere], jnp.int32),
        jnp.asarray([seed], jnp.uint32),
        pt, st, sb, vt, lt, *rays,
    )

    def flat(x):
        return x.reshape(-1)[:r]

    rad = [flat(x) for x in outs[:3]]
    mdir = [flat(x) for x in outs[6:9]]
    mtp = [flat(x) for x in outs[9:12]]
    return (rad, outs[3:6], mdir, mtp, flat(outs[12]),
            outs[13], outs[14])


@functools.partial(
    jax.jit,
    static_argnames=("n_planar", "n_sphere", "n_sph_seg", "n_vol",
                     "n_lights", "has_checker", "max_depth", "n_tex",
                     "miss_cfg", "block_rows", "sph_seg", "pathwise",
                     "n_mat", "has_noise"),
    donate_argnames=("stash_f", "stash_i", "mc"),
)
def _call_grad_rev(pt, st, sb, vt, lt, seed, stream, gx, gy, gz,
                   mc, stash_f, stash_i, lmd=None, *,
                   n_planar, n_sphere, n_sph_seg, n_vol, n_lights,
                   has_checker, max_depth, n_tex, miss_cfg,
                   block_rows=BLOCK_ROWS, sph_seg=None, pathwise=False,
                   n_mat=0, has_noise=False):
    """TWO-PHASE pass B: the reverse sweep alone against the pass-A
    stash (donated — freed after this chunk).  ``lmd``: λ_mdir rows
    (env "stream" scenes; zeros otherwise).  Returns the same grads
    layout as _call_grad."""
    r = stream.shape[0]
    block = block_rows * LANES
    padded = -(-r // block) * block
    rows = padded // LANES
    assert stash_f.shape[2] == rows, "stash/ray shape mismatch"

    def prep(a, dtype=jnp.float32):
        if padded != r:
            a = jnp.pad(a, (0, padded - r))
        return a.reshape(rows, LANES).astype(dtype)

    grid = (rows // block_rows,)
    n_blocks = rows // block_rows
    ray_spec = pl.BlockSpec((block_rows, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    gout_spec = pl.BlockSpec((8, LANES), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    n_srows = (20 if has_noise else 19) if pathwise else 12
    sf_spec = pl.BlockSpec((max_depth, n_srows, block_rows, LANES),
                           lambda i: (0, 0, i, 0),
                           memory_space=pltpu.VMEM)
    si_spec = pl.BlockSpec((max_depth, 3, block_rows, LANES),
                           lambda i: (0, 0, i, 0),
                           memory_space=pltpu.VMEM)
    n_gacc = 9 * max(n_tex, 1) + (2 * n_mat if pathwise else 0)
    assert n_gacc <= 8 * LANES, "parameter slots exceed the [8,128] gout"
    outs = pl.pallas_call(
        make_kernel(n_planar, n_sphere, n_sph_seg, n_vol, n_lights,
                    has_checker, max_depth, grad_mode=True, n_tex=n_tex,
                    miss_cfg=miss_cfg, sph_seg=sph_seg, pathwise=pathwise,
                    n_mat=n_mat, has_noise=has_noise, phase="rev"),
        grid=grid,
        in_specs=[smem] * 7 + [ray_spec] * 10 + [sf_spec, si_spec],
        out_specs=[gout_spec],
        out_shape=[jax.ShapeDtypeStruct((n_blocks * 8, LANES),
                                        jnp.float32)],
        scratch_shapes=[
            pltpu.VMEM((n_gacc, block_rows, LANES), jnp.float32),
        ],
        interpret=INTERPRET,
    )(
        jnp.asarray([n_planar, n_sphere], jnp.int32),
        jnp.asarray([seed], jnp.uint32),
        pt, st, sb, vt, lt,
        prep(stream, jnp.uint32), prep(gx), prep(gy), prep(gz),
        *[a if a.ndim == 2 else prep(a) for a in mc],
        *([jnp.zeros((rows, LANES), jnp.float32)] * 3 if lmd is None
          else [a if a.ndim == 2 else prep(a) for a in lmd]),
        stash_f, stash_i,
    )
    gsum = outs[0].reshape(n_blocks, 8 * LANES).sum(axis=0)
    grads = gsum[: 9 * n_tex].reshape(n_tex, 3, 3)
    if not pathwise:
        return grads, None, None
    mg = gsum[9 * n_tex: 9 * n_tex + 2 * n_mat].reshape(n_mat, 2)
    return grads, mg[:, 0], mg[:, 1]


def _grad_statics(scene, cam, pathwise):
    pt, st, sb, vt, lt, n_planar, n_sphere, n_sph_seg, n_vol, n_lights = (
        build_tables(scene, sph_seg=SPH_SEG)
    )
    n_tex = int(scene.textures.color.shape[0])
    n_mat = int(scene.materials.kind.shape[0]) if pathwise else 0
    statics = dict(
        n_planar=n_planar, n_sphere=n_sphere, n_sph_seg=n_sph_seg,
        n_vol=n_vol, n_lights=n_lights,
        has_checker=bool(scene.has_checker), max_depth=int(cam.max_depth),
        block_rows=_grad_block_rows(scene, int(cam.max_depth)),
        sph_seg=SPH_SEG, n_tex=n_tex, n_mat=n_mat,
        has_noise=bool(scene.has_noise), pathwise=pathwise,
    )
    if cam.use_sky_gradient:
        miss_cfg = ("sky", 0.0, 0.0, 0.0)
    else:
        bg = tuple(float(x) for x in np.asarray(cam.background).reshape(3))
        miss_cfg = ("flat",) + bg
    return (pt, st, sb, vt, lt), statics, miss_cfg


def grad_two_phase_ok(scene, max_depth: int) -> bool:
    """Two-phase (stash-to-HBM) eligibility: kernel-tier scenes,
    including miss-only env (the env term is applied XLA-side from
    pass-A miss records).  Env + NEE lights stays on the fused path
    (per-bounce hdri rows in / eout rows out)."""
    if scene.env is not None and scene.n_lights > 0:
        return False
    return (grad_applicable(scene, max_depth)
            or grad_pathwise_applicable(scene, max_depth))


def grad_fwd_stash(scene, cam, o, d, tm, stream, seed, pathwise=False):
    """TWO-PHASE pass A for one chunk: returns (rad V3 — the chunk's
    framebuffer rows, carry tuple for grad_rev_stash).  The forward is
    the SAME code as the fused gradient kernel's forward, so fb is
    bit-identical to the plain render and pass B needs no re-trace.
    Env scenes: the kernel emits env-less radiance + miss records; the
    env miss term (bilinear fetch) is applied here and the footprint
    columns are carried for pass B (one env fetch for the whole
    fwd+bwd, vs three traversals + two fetches on the fused path)."""
    from ..core.vec3 import V3
    from ..lights import hdri as hdri_mod

    tables, statics, miss_cfg = _grad_statics(scene, cam, pathwise)
    sg = jax.lax.stop_gradient
    if scene.env is not None:
        assert scene.n_lights == 0
        miss_cfg = ("stream",)
    rad, mc, mdir, mtp, mfl, sf, si = _call_grad_fwd(
        *tables, seed, sg(o), sg(d), sg(tm), stream,
        miss_cfg=miss_cfg, **statics)
    rad = V3(*rad)
    if scene.env is None:
        return rad, (mc, sf, si)
    missed = (mfl & 1) > 0
    m_prim = (mfl & 2) > 0
    env_sg = sg(scene.env)
    safe = V3(*(jnp.where(missed, v, w_) for v, w_ in
                ((mdir[0], 0.0), (mdir[1], 0.0), (mdir[2], 1.0))))
    fx, fy, base = hdri_mod.miss_footprint(env_sg, safe)
    q = hdri_mod.quad_table(sg(scene.env.data))[base]
    qcols = [q[:, j] for j in range(12)]  # dense [R] columns (rule 1)
    mc_v = hdri_mod.blend_quad(qcols, fx, fy)
    if cam.phantom_hdri:
        mc_v = V3.select(m_prim, V3.zeros(mc_v.x.shape), mc_v)
    zero_v = V3.zeros(mc_v.x.shape)
    mc_v = V3.select(missed, mc_v, zero_v)
    rad = rad + V3(*mtp) * mc_v
    return rad, (qcols, mdir, mtp, mfl, sf, si)


def grad_rev_stash(scene, cam, stream, seed, g3, carry, pathwise=False):
    """TWO-PHASE pass B for one chunk: reverse sweep against the pass-A
    stash (donated).  Env scenes: mc / λ_mdir / texel grads computed
    here from the carried footprint (the quad columns are CONSTANT
    w.r.t. direction — gather indices have zero derivative — so
    jax.grad through blend_quad equals the fused path's λ_mdir
    exactly).  Returns the same grads dict as grad_megakernel."""
    from ..core.vec3 import V3
    from ..lights import hdri as hdri_mod

    tables, statics, miss_cfg = _grad_statics(scene, cam, pathwise)
    sg = jax.lax.stop_gradient
    env_grad = None
    lmd = None
    if scene.env is None:
        mc, sf, si = carry
    else:
        miss_cfg = ("stream",)
        qcols, mdir, mtp, mfl, sf, si = carry
        missed = (mfl & 1) > 0
        m_prim = (mfl & 2) > 0
        env_sg = sg(scene.env)
        safe = tuple(jnp.where(missed, v, w_) for v, w_ in
                     ((mdir[0], 0.0), (mdir[1], 0.0), (mdir[2], 1.0)))
        lam3 = [jnp.where(missed, g3[c] * mtp[c], 0.0) for c in range(3)]
        if cam.phantom_hdri:
            lam3 = [jnp.where(m_prim, 0.0, v) for v in lam3]
        lam = V3(*lam3)
        env_grad = hdri_mod.miss_texel_grad(env_sg, V3(*safe), lam)

        def dir_loss(d3):
            fx, fy, _ = hdri_mod.miss_footprint(env_sg, V3(*d3))
            col = hdri_mod.blend_quad(qcols, fx, fy)
            return (jnp.sum(lam.x * col.x) + jnp.sum(lam.y * col.y)
                    + jnp.sum(lam.z * col.z))

        lmd = list(jax.grad(dir_loss)(safe))
        fx, fy, _ = hdri_mod.miss_footprint(env_sg, V3(*safe))
        mc_v = hdri_mod.blend_quad(qcols, fx, fy)
        if cam.phantom_hdri:
            mc_v = V3.select(m_prim, V3.zeros(mc_v.x.shape), mc_v)
        mc_v = V3.select(missed, mc_v, V3.zeros(mc_v.x.shape))
        mc = [mc_v.x, mc_v.y, mc_v.z]
    grads, gfuzz, gior = _call_grad_rev(
        *tables, seed, stream, g3[0], g3[1], g3[2], mc, sf, si, lmd,
        miss_cfg=miss_cfg, **statics)
    gdict = dict(color=grads[:, 0], even_color=grads[:, 1],
                 odd_color=grads[:, 2])
    if pathwise:
        gdict["fuzz"] = gfuzz
        gdict["ior"] = gior
    if env_grad is not None:
        gdict["env_data"] = env_grad
    return gdict


def grad_megakernel(scene, cam, o, d, tm, stream, seed, g3,
                    pathwise=False):
    """Run the gradient megakernel for one ray chunk (see grad_applicable
    / grad_pathwise_applicable for the gates).  Returns (rad V3, dict of
    texture-table grads: color / even_color / odd_color, each [n_tex, 3];
    pathwise mode adds fuzz / ior, each [n_mat])."""
    pt, st, sb, vt, lt, n_planar, n_sphere, n_sph_seg, n_vol, n_lights = (
        build_tables(scene, sph_seg=SPH_SEG)
    )
    sg = jax.lax.stop_gradient
    n_tex = int(scene.textures.color.shape[0])
    n_mat = int(scene.materials.kind.shape[0]) if pathwise else 0
    statics = dict(
        n_planar=n_planar, n_sphere=n_sphere, n_sph_seg=n_sph_seg,
        n_vol=n_vol, n_lights=n_lights,
        has_checker=bool(scene.has_checker), max_depth=int(cam.max_depth),
        # deep configs (depth > 12) drop to 8-row blocks so the
        # per-block VMEM stash stays inside GRAD_STASH_BUDGET
        block_rows=_grad_block_rows(scene, int(cam.max_depth)),
        sph_seg=SPH_SEG,
    )

    env_rows = env_grad = None
    hdri_rows = None
    hdri_xy = None
    if scene.env is not None:
        # Env scenes: the miss-shader env term is handled by streaming —
        # launch the plain forward kernel for the per-ray miss records,
        # do the bilinear env fetch + its texel scatter AND direction
        # cotangent XLA-side (exactly what the differentiable path
        # computes, integrator/wavefront._miss_radiance), then stream
        # the miss radiance + λ_mdir rows into the gradient kernel so
        # the specular-chain fuzz/IOR adjoints see the env term.
        # Env + NEE LIGHTS scenes additionally stream the per-bounce
        # HDRI importance-sample rows in (same rows as the forward
        # kernel) and receive the per-bounce env texel COTANGENT rows
        # back (eout) — the texel ids are recomputed here from the same
        # RNG (alias picks are ray-state-independent) and scatter-added.
        # Reference: rt/hdri.go:120-297, rt/camera.go:452-607.
        from ..core.vec3 import V3
        from ..lights import hdri as hdri_mod

        use_env_nee = n_lights > 0 and scene.env_importance
        if use_env_nee:
            assert pathwise, "env+lights grads need the pathwise kernel"
            env_sg = sg(scene.env)
            seed_u = jnp.uint32(seed) if not hasattr(seed, "dtype") else seed
            rows_h, xys = [], []
            for b in range(int(cam.max_depth)):
                xi1 = rngmod.uniform(seed_u, stream,
                                     jnp.uint32(b), rngmod.HDRI_ROW)
                xi2 = rngmod.uniform(seed_u, stream,
                                     jnp.uint32(b), rngmod.HDRI_COL)
                ld, em, pdf_h = hdri_mod.sample_direction_soa(
                    env_sg, xi1, xi2)
                rows_h += [ld.x, ld.y, ld.z, em.x, em.y, em.z, pdf_h]
                yb, xb = hdri_mod._alias_pick(env_sg, xi1, xi2)
                xys.append(yb * scene.env.data.shape[1] + xb)
            hdri_rows = tuple(rows_h)
            hdri_xy = xys

        _, m_dir, m_tp, missed, m_prim = _call(
            pt, st, sb, vt, lt, seed, sg(o), sg(d), sg(tm), stream,
            hdri_rows=hdri_rows,
            has_noise=bool(scene.has_noise), **statics)
        safe = [jnp.where(missed, v, w) for v, w in
                ((m_dir.x, 0.0), (m_dir.y, 0.0), (m_dir.z, 1.0))]

        def mc_of(env_data, d3):
            env2 = scene.env._replace(data=env_data)
            col = hdri_mod.sample_soa(env2, V3(*d3))
            if cam.phantom_hdri:
                col = V3.select(m_prim, V3.zeros(col.x.shape), col)
            return col

        def miss_loss(env_data, d3):
            col = mc_of(env_data, d3)
            tot = 0.0
            for c, (tpv, colv) in enumerate(
                    zip((m_tp.x, m_tp.y, m_tp.z), (col.x, col.y, col.z))):
                tot = tot + jnp.sum(
                    jnp.where(missed, g3[c] * tpv * colv, 0.0))
            return tot

        if _os.environ.get("GRT_ENV_SCATTER") == "xla":
            # A/B fallback: autodiff texel scatter ([R,12] rows at
            # ~75 ns/row — the round-4 hdri-fwd-bwd wall, DESIGN 7a).
            env_grad, lmd = jax.grad(miss_loss, argnums=(0, 1))(
                scene.env.data, tuple(safe))
        else:
            # λ_mdir via autodiff (its backward has no scatter — the
            # texel cotangent is DCE'd), texel grads via the exact
            # sorted segment-sum (hdri.miss_texel_grad): duplicate
            # footprint rows collapse per base texel before the one
            # [H*W, 12]-row placement, ~2x cheaper per 4M chunk.
            lmd = jax.grad(miss_loss, argnums=1)(
                sg(scene.env.data), tuple(safe))
            lam = V3(*(jnp.where(missed, g3[c] * tpv, 0.0)
                       for c, tpv in enumerate((m_tp.x, m_tp.y, m_tp.z))))
            if cam.phantom_hdri:
                lam = V3.select(m_prim, V3.zeros(lam.x.shape), lam)
            env_grad = hdri_mod.miss_texel_grad(
                sg(scene.env), V3(*safe), lam)
        mc = mc_of(sg(scene.env.data), tuple(sg(x) for x in safe))
        env_rows = (sg(mc.x), sg(mc.y), sg(mc.z),
                    sg(lmd[0]), sg(lmd[1]), sg(lmd[2]))
        miss_cfg = ("stream",)
    elif cam.use_sky_gradient:
        miss_cfg = ("sky", 0.0, 0.0, 0.0)
    else:
        bg = tuple(float(x) for x in np.asarray(cam.background).reshape(3))
        miss_cfg = ("flat",) + bg
    out = _call_grad(
        pt, st, sb, vt, lt, seed, sg(o), sg(d), sg(tm), stream,
        g3[0], g3[1], g3[2],
        n_tex=n_tex, miss_cfg=miss_cfg,
        pathwise=pathwise, n_mat=n_mat, env_rows=env_rows,
        hdri_rows=hdri_rows, has_noise=bool(scene.has_noise), **statics,
    )
    if not pathwise:
        rad, grads = out
        gdict = dict(color=grads[:, 0], even_color=grads[:, 1],
                     odd_color=grads[:, 2])
    else:
        rad, grads, gfuzz, gior, cot_env = out
        gdict = dict(color=grads[:, 0], even_color=grads[:, 1],
                     odd_color=grads[:, 2], fuzz=gfuzz, ior=gior)
        if cot_env is not None:
            # NEE env texel scatter: per (bounce, ray) cotangent rows at
            # the alias-picked texel (recomputed from the same RNG).
            # rows_segment_sum collapses the [depth*R, 3] rows per texel
            # before the placement — the raw scatter-add pays ~40-75 ns
            # per ROW (DESIGN 7a), depth x chunk of them here.
            from ..core.segsum import cols_segment_sum

            h, w = scene.env.data.shape[:2]
            idx = jnp.concatenate(hdri_xy)                 # [depth*R]
            vals = [jnp.concatenate([cot_env[k * 3 + c]
                                     for k in range(int(cam.max_depth))])
                    for c in range(3)]                     # 3 x [depth*R]
            nee_grad = cols_segment_sum(idx, vals, h * w).reshape(h, w, 3)
            env_grad = env_grad + nee_grad
    if env_grad is not None:
        gdict["env_data"] = env_grad
    return rad, gdict


@functools.partial(
    jax.jit,
    static_argnames=("n_planar", "n_sphere", "n_sph_seg", "n_vol",
                     "n_lights", "has_checker", "max_depth", "b_start",
                     "b_end", "block_rows", "sph_seg", "has_noise"),
)
def _call_resume(pt, st, sb, vt, lt, seed, flat, *, n_planar, n_sphere,
                 n_sph_seg, n_vol, n_lights, has_checker, max_depth,
                 b_start, b_end, hdri_rows=None, block_rows=BLOCK_ROWS,
                 sph_seg=None, has_noise=False):
    """Resumable phase: `flat` is the 21-tuple of [R] state arrays
    (o3, d3, tm, stream, tp3, rad3, flags, mdir3, mtp3); returns the
    19-tuple (rad3, mdir3, mtp3, flags, o3, d3, tp3) of [R] arrays."""
    r = flat[0].shape[0]
    block = block_rows * LANES
    padded = -(-r // block) * block
    rows = padded // LANES

    def prep(a):
        if padded != r:
            a = jnp.pad(a, (0, padded - r))
        return a.reshape(rows, LANES)

    rays = [prep(a) for a in flat]

    use_hdri = hdri_rows is not None
    hdri_in, hdri_spec = [], []
    if use_hdri:
        hdri = jnp.stack([prep(a) for a in hdri_rows], axis=0)
        hdri_in = [hdri]
        d7 = len(hdri_rows)
        hdri_spec = [pl.BlockSpec((d7, block_rows, LANES),
                                  lambda i: (0, i, 0),
                                  memory_space=pltpu.VMEM)]

    grid = (rows // block_rows,)
    ray_spec = pl.BlockSpec((block_rows, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    out_spec = pl.BlockSpec((block_rows, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    f32s = jax.ShapeDtypeStruct((rows, LANES), jnp.float32)
    i32s = jax.ShapeDtypeStruct((rows, LANES), jnp.int32)
    outs = pl.pallas_call(
        make_kernel(n_planar, n_sphere, n_sph_seg, n_vol, n_lights,
                    has_checker, max_depth, resume=True,
                    use_hdri=use_hdri, sph_seg=sph_seg,
                    has_noise=has_noise),
        grid=grid,
        in_specs=[smem] * 8 + hdri_spec + [ray_spec] * 21,
        out_specs=[out_spec] * 19,
        out_shape=[f32s] * 3 + [f32s] * 6 + [i32s] + [f32s] * 9,
        interpret=INTERPRET,
    )(
        jnp.asarray([n_planar, n_sphere], jnp.int32),
        jnp.asarray([seed], jnp.uint32),
        jnp.asarray([b_start, b_end], jnp.int32),
        pt, st, sb, vt, lt, *hdri_in, *rays,
    )
    return tuple(x.reshape(-1)[:r] for x in outs)


# Split thresholds: a mid-loop re-sort only pays when the tail of the
# bounce loop is long enough that straggler blocks dominate.  Measured on
# RandomScene depth 10: the split's fixed cost (second launch + full-state
# HBM round trip + sort, ~0.3 s at 5M rays) exceeds the straggler savings
# at depths <= 10, so it engages only for very deep configs (the
# reference exposes depth up to 50).
SPLIT_DEPTH_MIN = 16
SPLIT_R_MIN = 1 << 18
SPLIT_AT = 4

# Compact mode (mega_mode='compact', NOT auto-selected): mid-loop
# live-ray COMPACTION via a sort-free stable partition — the round-3
# roadmap's "compaction cheaper than split mode" candidate.  MEASURED
# LOSS on its target (random depth 10, 4.2M rays, compact_probe.py):
# 606 ms vs single's 451 (0.74x), compact@5 584.  The partition pieces
# (part_micro): cumsum pos 29 ms, +scatter order 77, argsort(bool)
# order 32, the [R,12] row move 165 (~3.3 ns/element) — i.e. the MOVE
# is the floor, not the sort, and it alone exceeds the whole straggler
# residual, because dead-lane t_cap=0 already keeps mostly-dead blocks
# cheap (their live rays' segments only).  Kept for explicit
# experiments at depth 16+ (vs split) and as the measured record.
COMPACT_DEPTH_MIN = 8
COMPACT_R_MIN = 1 << 18
COMPACT_AT = 3


def _phase_state_sort(flat, alive):
    """Sort the 21-array state so live rays pack into dense (4096-ray)
    blocks, ordered by (origin cell, direction octant) for sweep
    coherence; dead rays sink to the back where whole blocks early-exit.
    One packed [R, 24] row gather moves everything (separate [R] gathers
    are latency-bound ~12 ns/element)."""
    ox, oy, oz, dx, dy, dz = flat[0], flat[1], flat[2], flat[3], flat[4], flat[5]
    mn = [jnp.min(c) for c in (ox, oy, oz)]
    mx = [jnp.max(c) for c in (ox, oy, oz)]

    def cell(c, i):
        scale = 8.0 / jnp.maximum(mx[i] - mn[i], 1e-6)
        return jnp.clip(jnp.floor((c - mn[i]) * scale).astype(jnp.int32), 0, 7)

    octant = ((dx > 0).astype(jnp.int32) + 2 * (dy > 0).astype(jnp.int32)
              + 4 * (dz > 0).astype(jnp.int32))
    key = ((cell(ox, 0) * 8 + cell(oy, 1)) * 8 + cell(oz, 2)) * 8 + octant
    key = jnp.where(alive, key, 1 << 13)
    order = jnp.argsort(key)
    inv = jnp.zeros_like(order).at[order].set(
        jnp.arange(order.shape[0], dtype=order.dtype)
    )

    bc = jax.lax.bitcast_convert_type
    cols = []
    for a in flat:
        cols.append(bc(a, jnp.float32) if a.dtype != jnp.float32 else a)
    pad = [jnp.zeros_like(cols[0])] * (24 - len(cols))
    packed = jnp.stack(cols + pad, axis=1)[order]
    out = []
    for i, a in enumerate(flat):
        c = packed[:, i]
        out.append(bc(c, a.dtype) if a.dtype != jnp.float32 else c)
    return tuple(out), inv


def _compact_partition(rows12, alive):
    """Stable live-ray partition — the 'compaction cheaper than split
    mode' item from the round-3 roadmap.  Versus _phase_state_sort it

      - computes the permutation with two cumsums instead of an argsort
        (the 13-bit-key sort was the dominant fixed cost),
      - moves only the 12 rows a live ray actually needs (o, d, tm,
        stream, tp, flags); radiance/miss rows restart at zero in phase
        2 and the caller merges them back with one inverse row gather,
      - keeps survivors in their ORIGINAL relative order, so the pixel-
        tile coherence of the renderer's layout survives compaction
        (the cell re-sort destroyed it for sparse survivors).

    ``rows12`` = (ox, oy, oz, dx, dy, dz, tm, stream, tpx, tpy, tpz,
    flags).  Returns (flat2 21-tuple for _call_resume, pos [R] i32 —
    ray i's slot in the compacted layout, i.e. the inverse permutation).
    Tail (dead) slots hold zeros: flags 0 reads as dead, so phase 2
    early-exits whole tail blocks."""
    r = rows12[0].shape[0]
    i32 = jnp.int32
    al = alive.astype(i32)
    cl = jnp.cumsum(al)
    n_live = cl[-1]
    cd = jnp.cumsum(1 - al)
    pos = jnp.where(alive, cl - 1, n_live + cd - 1)
    iota = jnp.arange(r, dtype=i32)
    order = jnp.zeros((r,), i32).at[pos].set(iota, unique_indices=True)

    bc = jax.lax.bitcast_convert_type
    # Strip the missed/primary bits before the move: a LIVE ray never
    # has them set (missing kills the lane), and a dead tail ray must
    # not re-report its phase-1 miss from a slot whose miss-dir rows
    # were zeroed — the caller takes miss data from phase 1 for lanes
    # phase 2 did not mark.
    rows12 = tuple(rows12[:11]) + (rows12[11] & (4 | 8),)
    cols = [a if a.dtype == jnp.float32 else bc(a, jnp.float32)
            for a in rows12]
    # one packed [R, 12] row gather (separate [R] gathers are
    # latency-bound at ~12 ns/element; see _phase_state_sort); the dead
    # tail's stale ray state is inert (alive bit 0 -> the kernel never
    # touches it, and with missed stripped it can't contribute outputs)
    packed = jnp.stack(cols, axis=1)[order]
    m = [packed[:, j] for j in range(12)]
    zero = jnp.zeros((r,), jnp.float32)
    flat2 = (
        m[0], m[1], m[2], m[3], m[4], m[5], m[6],
        bc(m[7], rows12[7].dtype),              # stream (uint32)
        m[8], m[9], m[10],                      # throughput
        zero, zero * 1.0, zero * 1.0,           # radiance restarts at 0
        bc(m[11], jnp.int32),                   # flags
        zero * 1.0, zero * 1.0, zero * 1.0,     # miss dir
        zero * 1.0, zero * 1.0, zero * 1.0,     # miss throughput
    )
    return flat2, pos


def trace_megakernel(scene, cam, o, d, tm, stream, seed, split=None,
                     record=False, compact=False):
    """Full bounce loop via the megakernel.  Returns (radiance V3,
    miss_dir V3, miss_tp V3, missed, miss_primary) — the caller applies
    the deferred miss shader.  ``split=None`` decides the phase split
    from the SPLIT_* thresholds; pass an explicit bool to pin it (and
    keep the decision in the caller's jit cache key).

    ``record=True`` (single-phase only): appends the per-bounce discrete
    sweep outcomes as a (which, idx, blk_a, blk_h) tuple of [D, R] arrays
    — the megakernel-speed record pass for replay gradients
    (render/grad.py); semantics identical to the scan-path record."""
    from ..core.vec3 import V3

    sg = jax.lax.stop_gradient
    (pt, st, sb, vt, lt, n_planar, n_sphere, n_sph_seg, n_vol,
     n_lights) = build_tables(sg(scene), sph_seg=SPH_SEG)
    seed_u = jnp.uint32(seed) if not hasattr(seed, "dtype") else seed
    statics = dict(
        n_planar=n_planar, n_sphere=n_sphere, n_sph_seg=n_sph_seg,
        n_vol=n_vol, n_lights=n_lights,
        has_checker=scene.has_checker, max_depth=cam.max_depth,
        block_rows=SPH_BLOCK_ROWS if n_sph_seg else BLOCK_ROWS,
        # explicit cache keys: flipping the env knobs in-process now
        # RETRACES instead of silently reusing a stale kernel
        sph_seg=SPH_SEG,
        has_noise=bool(scene.has_noise),
    )
    r = o.x.shape[0]

    # HDRI NEE: the importance sample depends only on the RNG stream, so
    # precompute (direction, emission, pdf) per (ray, bounce) XLA-side
    # (alias-table gathers) and stream 7 rows/bounce into the kernel.
    use_hdri = (n_lights > 0 and scene.env is not None
                and scene.env_importance)

    def hdri_rows_for(stream_ids, b0, b1):
        from ..lights import hdri as hdri_mod

        rows = []
        env = sg(scene.env)
        for b in range(b0, b1):
            xi1 = rngmod.uniform(seed_u, stream_ids, jnp.uint32(b),
                                 rngmod.HDRI_ROW)
            xi2 = rngmod.uniform(seed_u, stream_ids, jnp.uint32(b),
                                 rngmod.HDRI_COL)
            ld, em, pdf_h = hdri_mod.sample_direction_soa(env, xi1, xi2)
            rows += [ld.x, ld.y, ld.z, em.x, em.y, em.z, pdf_h]
        return rows

    if split is None:
        split = (cam.max_depth >= SPLIT_DEPTH_MIN and r >= SPLIT_R_MIN
                 and not use_hdri)  # see choose_mega_mode: 5.8x slower
    if record:
        assert not (split or compact), "record mode is single-phase only"
        return _call(pt, st, sb, vt, lt, seed_u, sg(o), sg(d), sg(tm),
                     stream,
                     hdri_rows=(hdri_rows_for(stream, 0, cam.max_depth)
                                if use_hdri else None),
                     rec_dec=True, **statics)
    assert not (split and compact)

    if compact:
        # Phase 1: bounces [0, COMPACT_AT) in pixel order.
        o, d, tm = sg(o), sg(d), sg(tm)
        zero = jnp.zeros_like(o.x)
        one = jnp.ones_like(o.x)
        flags0 = jnp.full(o.x.shape, 4 + 8, jnp.int32)  # alive | allow
        flat = (o.x, o.y, o.z, d.x, d.y, d.z, tm, stream,
                one, one * 1.0, one * 1.0,
                zero, zero * 1.0, zero * 1.0,
                flags0,
                zero * 1.0, zero * 1.0, zero * 1.0,
                zero * 1.0, zero * 1.0, zero * 1.0)
        k = min(COMPACT_AT, cam.max_depth - 1)
        out1 = _call_resume(pt, st, sb, vt, lt, seed_u, flat,
                            b_start=0, b_end=k,
                            hdri_rows=(hdri_rows_for(stream, 0, k)
                                       if use_hdri else None),
                            **statics)
        rad1 = out1[0:3]
        mdir1, mtp1 = out1[3:6], out1[6:9]
        flg1 = out1[9]
        o3, d3, tp3 = out1[10:13], out1[13:16], out1[16:19]

        # Stable partition of the survivors, then finish the loop on the
        # compacted layout (dead tail blocks early-exit instantly).
        alive1 = (flg1 & 4) > 0
        flat2, pos = _compact_partition(
            (o3[0], o3[1], o3[2], d3[0], d3[1], d3[2], tm, stream,
             tp3[0], tp3[1], tp3[2], flg1), alive1)
        out2 = _call_resume(pt, st, sb, vt, lt, seed_u, flat2,
                            b_start=k, b_end=cam.max_depth,
                            hdri_rows=(
                                hdri_rows_for(flat2[7], k, cam.max_depth)
                                if use_hdri else None),
                            **statics)

        # Ray i's phase-2 results live at slot pos[i]: one packed
        # inverse row gather, then merge with the in-place phase-1 rows.
        bc = jax.lax.bitcast_convert_type
        res = list(out2[0:9]) + [out2[9]]
        cols = [a if a.dtype == jnp.float32 else bc(a, jnp.float32)
                for a in res]
        cols += [jnp.zeros_like(cols[0])] * (12 - len(cols))
        packed = jnp.stack(cols, axis=1)[pos]
        rad = V3(rad1[0] + packed[:, 0], rad1[1] + packed[:, 1],
                 rad1[2] + packed[:, 2])
        flg2 = bc(packed[:, 9], jnp.int32)
        missed2 = (flg2 & 1) == 1
        # a lane misses at most once, and phase-1 misses kill the lane
        # before the partition: the two miss sets are disjoint
        m_dir = V3(*[jnp.where(missed2, packed[:, 3 + c], mdir1[c])
                     for c in range(3)])
        m_tp = V3(*[jnp.where(missed2, packed[:, 6 + c], mtp1[c])
                    for c in range(3)])
        missed = ((flg1 & 1) == 1) | missed2
        m_primary = (((flg1 | flg2) & 2) == 2)
        return rad, m_dir, m_tp, missed, m_primary

    if not split:
        return _call(pt, st, sb, vt, lt, seed_u, sg(o), sg(d), sg(tm),
                     stream,
                     hdri_rows=(hdri_rows_for(stream, 0, cam.max_depth)
                                if use_hdri else None),
                     **statics)

    # Phase 1: bounces [0, SPLIT_AT) in pixel order (primary coherence).
    o, d, tm = sg(o), sg(d), sg(tm)
    zero = jnp.zeros_like(o.x)
    one = jnp.ones_like(o.x)
    flags0 = jnp.full(o.x.shape, 4 + 8, jnp.int32)  # alive | allowLightHits
    flat = (o.x, o.y, o.z, d.x, d.y, d.z, tm, stream,
            one, one * 1.0, one * 1.0,            # throughput
            zero, zero * 1.0, zero * 1.0,         # radiance
            flags0,
            zero * 1.0, zero * 1.0, zero * 1.0,   # miss dir
            zero * 1.0, zero * 1.0, zero * 1.0)   # miss throughput
    out1 = _call_resume(pt, st, sb, vt, lt, seed_u, flat,
                        b_start=0, b_end=SPLIT_AT,
                        hdri_rows=(hdri_rows_for(stream, 0, SPLIT_AT)
                                   if use_hdri else None),
                        **statics)
    rad3, mdir3, mtp3 = out1[0:3], out1[3:6], out1[6:9]
    flg1 = out1[9]
    o3, d3, tp3 = out1[10:13], out1[13:16], out1[16:19]

    # Re-sort survivors into dense coherent blocks, then finish the loop.
    alive1 = (flg1 & 4) > 0
    flat2 = (o3[0], o3[1], o3[2], d3[0], d3[1], d3[2], tm, stream,
             tp3[0], tp3[1], tp3[2], rad3[0], rad3[1], rad3[2], flg1,
             mdir3[0], mdir3[1], mdir3[2], mtp3[0], mtp3[1], mtp3[2])
    flat2s, inv = _phase_state_sort(flat2, alive1)
    out2 = _call_resume(pt, st, sb, vt, lt, seed_u, flat2s,
                        b_start=SPLIT_AT, b_end=cam.max_depth,
                        hdri_rows=(
                            hdri_rows_for(flat2s[7], SPLIT_AT,
                                          cam.max_depth)
                            if use_hdri else None),
                        **statics)

    # Inverse-permute the consumed outputs with one packed row gather.
    bc = jax.lax.bitcast_convert_type
    res = list(out2[0:9]) + [out2[9]]
    cols = [bc(a, jnp.float32) if a.dtype != jnp.float32 else a for a in res]
    cols += [jnp.zeros_like(cols[0])] * (16 - len(cols))
    packed = jnp.stack(cols, axis=1)[inv]
    rad = V3(packed[:, 0], packed[:, 1], packed[:, 2])
    m_dir = V3(packed[:, 3], packed[:, 4], packed[:, 5])
    m_tp = V3(packed[:, 6], packed[:, 7], packed[:, 8])
    flg = bc(packed[:, 9], jnp.int32)
    missed = (flg & 1) == 1
    m_primary = (flg & 2) == 2
    return rad, m_dir, m_tp, missed, m_primary