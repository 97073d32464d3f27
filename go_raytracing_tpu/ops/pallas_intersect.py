"""Pallas (Mosaic TPU) kernels for the hot intersection path.

The jnp megabatch intersectors (geometry/packs.py) materialize [R, N]
pair buffers in HBM; these kernels keep the whole ray-x-primitive sweep in
VMEM/registers.  Layout: a grid step owns a block of rays shaped
(BR/128, 128) — rays on the vector lanes — and loops primitives with their
constants broadcast from SMEM scalars, so every VPU op processes 1024+
rays against one primitive: ~1 op/pair, no pair materialization, and the
only HBM traffic is the ray components in and (t, idx) out (~40 B/ray).

This replaces the reference's per-ray recursive BVH walk (rt/bvh.go:219-239)
for small scenes the TPU-native way: brute force at full lane utilization
beats pointer chasing until the primitive count reaches the thousands
(meshes use geometry/mesh_bvh.py instead).

Parity: the math mirrors geometry/packs.py exactly (same epsilons, same
Contains/Surrounds strictness, same quad/tri/circle/plane interior rules;
spheres use the stable oc-form quadratic per pair — the pallas kernel has
no [R,N] memory pressure, so it can afford full precision everywhere).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..geometry import packs

BIG = np.float32(3.0e38)
EPS_PARALLEL = np.float32(1e-8)

LANES = 128
DEFAULT_BLOCK_ROWS = 32  # rays per grid step = 32 * 128 = 4096

# Flip for CPU correctness testing of the kernels (pallas interpreter).
INTERPRET = False


def enabled() -> bool:
    """Use the pallas kernels? TPU backend only (jnp path elsewhere);
    disable explicitly with GRT_NO_PALLAS=1."""
    import os

    if os.environ.get("GRT_NO_PALLAS") == "1":
        return False
    return jax.default_backend() == "tpu" or INTERPRET


def _pad_rays(arrs, block):
    """Pad 1-D ray arrays to a multiple of block and reshape to (rows, 128)."""
    r = arrs[0].shape[0]
    padded = -(-r // block) * block
    out = []
    for a in arrs:
        if padded != r:
            a = jnp.pad(a, (0, padded - r))
        out.append(a.reshape(padded // LANES, LANES))
    return out, padded


def _pad_prims(arrs, fill=0.0):
    n = arrs[0].shape[0]
    padded = max(-(-n // 8) * 8, 8)
    return [
        jnp.pad(a, (0, padded - n), constant_values=fill) for a in arrs
    ], n


# -----------------------------------------------------------------------------
# Planar closest hit
# -----------------------------------------------------------------------------

def _planar_kernel(n_prims_ref,
                   ox, oy, oz, dx, dy, dz, tmax,
                   nx, ny, nz, dconst, qx, qy, qz,
                   vxwx, vxwy, vxwz, wxux, wxuy, wxuz,
                   rad2, kind,
                   t_out, idx_out, *, t_min):
    shape = ox.shape
    t_best = jnp.full(shape, BIG, jnp.float32)
    idx_best = jnp.full(shape, -1, jnp.int32)

    o_x, o_y, o_z = ox[...], oy[...], oz[...]
    d_x, d_y, d_z = dx[...], dy[...], dz[...]
    t_max = tmax[...]

    def body(j, carry):
        t_best, idx_best = carry
        nx_j, ny_j, nz_j = nx[j], ny[j], nz[j]
        denom = d_x * nx_j + d_y * ny_j + d_z * nz_j
        not_par = jnp.abs(denom) >= EPS_PARALLEL
        t = (dconst[j] - (o_x * nx_j + o_y * ny_j + o_z * nz_j)) / jnp.where(
            not_par, denom, 1.0
        )
        kind_j = kind[j]
        # Scalar-conditioned selects don't legalize in Mosaic; broadcast the
        # scalar predicates into the vector masks instead.
        ones = t >= t  # all-True vector mask
        is_plane = ones & (kind_j == packs.KIND_PLANE)
        is_quad = ones & (kind_j == packs.KIND_QUAD)
        is_tri = ones & (kind_j == packs.KIND_TRI)
        is_circle = ones & (kind_j == packs.KIND_CIRCLE)
        t_ok = (is_plane & (t > t_min) & (t < t_max)) | (
            ~is_plane & (t >= t_min) & (t <= t_max)
        )
        rel_x = o_x + t * d_x - qx[j]
        rel_y = o_y + t * d_y - qy[j]
        rel_z = o_z + t * d_z - qz[j]
        alpha = rel_x * vxwx[j] + rel_y * vxwy[j] + rel_z * vxwz[j]
        beta = rel_x * wxux[j] + rel_y * wxuy[j] + rel_z * wxuz[j]
        in_quad = (alpha >= 0.0) & (alpha <= 1.0) & (beta >= 0.0) & (beta <= 1.0)
        in_tri = (alpha >= 0.0) & (alpha <= 1.0) & (beta >= 0.0) & (alpha + beta <= 1.0)
        dist2 = rel_x * rel_x + rel_y * rel_y + rel_z * rel_z
        in_circle = dist2 <= rad2[j]
        interior = (
            (is_quad & in_quad)
            | (is_tri & in_tri)
            | (is_circle & in_circle)
            | is_plane
        )
        valid = not_par & t_ok & interior & (j < n_prims_ref[0])
        upd = valid & (t < t_best)
        t_best = jnp.where(upd, t, t_best)
        idx_best = jnp.where(upd, j, idx_best)
        return t_best, idx_best

    t_best, idx_best = jax.lax.fori_loop(0, nx.shape[0], body, (t_best, idx_best))
    t_out[...] = t_best
    idx_out[...] = idx_best


def _components(v):
    """Accept either a V3 or an [R,3] array."""
    from ..core.vec3 import V3

    if isinstance(v, V3):
        return v.x, v.y, v.z
    return v[:, 0], v[:, 1], v[:, 2]


@functools.partial(jax.jit, static_argnames=("t_min", "block_rows"))
def planar_closest(pack: packs.PlanarPack, o, d, t_max, *, t_min=1e-3,
                   block_rows=DEFAULT_BLOCK_ROWS):
    """Closest planar hit via the pallas kernel. Returns (t, idx, hit)."""
    ox_, oy_, oz_ = _components(o)
    dx_, dy_, dz_ = _components(d)
    r = ox_.shape[0]
    block = block_rows * LANES
    rays, padded = _pad_rays(
        [ox_, oy_, oz_, dx_, dy_, dz_, jnp.where(t_max >= BIG, BIG, t_max)],
        block,
    )
    vxw = jnp.cross(pack.v, pack.w)
    wxu = jnp.cross(pack.w, pack.u)
    prims, n = _pad_prims([
        pack.normal[:, 0], pack.normal[:, 1], pack.normal[:, 2],
        pack.d, pack.q[:, 0], pack.q[:, 1], pack.q[:, 2],
        vxw[:, 0], vxw[:, 1], vxw[:, 2],
        wxu[:, 0], wxu[:, 1], wxu[:, 2],
        pack.radius * pack.radius,
    ])
    kind_pad = jnp.pad(pack.kind, (0, prims[0].shape[0] - n), constant_values=-1)
    rows = padded // LANES

    grid = (rows // block_rows,)
    ray_spec = pl.BlockSpec((block_rows, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    prim_spec = pl.BlockSpec(memory_space=pltpu.SMEM)

    t, idx = pl.pallas_call(
        functools.partial(_planar_kernel, t_min=np.float32(t_min)),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]  # n_prims
        + [ray_spec] * 7 + [prim_spec] * 14
        + [pl.BlockSpec(memory_space=pltpu.SMEM)],  # kind
        out_specs=[
            pl.BlockSpec((block_rows, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
            jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
        ],
        interpret=INTERPRET,
    )(jnp.asarray([n], jnp.int32), *rays, *prims, kind_pad)

    t = t.reshape(-1)[:r]
    idx = idx.reshape(-1)[:r]
    hit = idx >= 0
    return jnp.where(hit, t, BIG), jnp.maximum(idx, 0), hit


# -----------------------------------------------------------------------------
# Sphere closest hit (stable oc-form per pair)
# -----------------------------------------------------------------------------

def _sphere_kernel(n_prims_ref,
                   ox, oy, oz, dx, dy, dz, tmr, tmax,
                   cx, cy, cz, vx, vy, vz, rad2,
                   t_out, idx_out, *, t_min):
    shape = ox.shape
    t_best = jnp.full(shape, BIG, jnp.float32)
    idx_best = jnp.full(shape, -1, jnp.int32)

    o_x, o_y, o_z = ox[...], oy[...], oz[...]
    d_x, d_y, d_z = dx[...], dy[...], dz[...]
    tmv = tmr[...]
    t_max = tmax[...]
    a = d_x * d_x + d_y * d_y + d_z * d_z
    inv_a = 1.0 / a

    def body(j, carry):
        t_best, idx_best = carry
        ocx = cx[j] + tmv * vx[j] - o_x
        ocy = cy[j] + tmv * vy[j] - o_y
        ocz = cz[j] + tmv * vz[j] - o_z
        h = d_x * ocx + d_y * ocy + d_z * ocz
        c = ocx * ocx + ocy * ocy + ocz * ocz - rad2[j]
        disc = h * h - a * c
        has_root = disc >= 0.0
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        r0 = (h - sq) * inv_a
        r1 = (h + sq) * inv_a
        ok0 = (r0 > t_min) & (r0 < t_max)
        ok1 = (r1 > t_min) & (r1 < t_max)
        root = jnp.where(ok0, r0, r1)
        valid = has_root & (ok0 | ok1) & (j < n_prims_ref[0])
        upd = valid & (root < t_best)
        t_best = jnp.where(upd, root, t_best)
        idx_best = jnp.where(upd, j, idx_best)
        return t_best, idx_best

    t_best, idx_best = jax.lax.fori_loop(0, cx.shape[0], body, (t_best, idx_best))
    t_out[...] = t_best
    idx_out[...] = idx_best


@functools.partial(jax.jit, static_argnames=("t_min", "block_rows"))
def sphere_closest(pack: packs.SpherePack, o, d, tm, t_max, *, t_min=1e-3,
                   block_rows=DEFAULT_BLOCK_ROWS):
    """Closest sphere hit via the pallas kernel. Returns (t, idx, hit)."""
    ox_, oy_, oz_ = _components(o)
    dx_, dy_, dz_ = _components(d)
    r = ox_.shape[0]
    block = block_rows * LANES
    rays, padded = _pad_rays(
        [ox_, oy_, oz_, dx_, dy_, dz_, tm,
         jnp.where(t_max >= BIG, BIG, t_max)],
        block,
    )
    prims, n = _pad_prims([
        pack.center[:, 0], pack.center[:, 1], pack.center[:, 2],
        pack.velocity[:, 0], pack.velocity[:, 1], pack.velocity[:, 2],
        pack.radius * pack.radius,
    ])
    rows = padded // LANES

    grid = (rows // block_rows,)
    ray_spec = pl.BlockSpec((block_rows, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    prim_spec = pl.BlockSpec(memory_space=pltpu.SMEM)

    t, idx = pl.pallas_call(
        functools.partial(_sphere_kernel, t_min=np.float32(t_min)),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [ray_spec] * 8 + [prim_spec] * 7,
        out_specs=[
            pl.BlockSpec((block_rows, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
            jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
        ],
        interpret=INTERPRET,
    )(jnp.asarray([n], jnp.int32), *rays, *prims)

    t = t.reshape(-1)[:r]
    idx = idx.reshape(-1)[:r]
    hit = idx >= 0
    return jnp.where(hit, t, BIG), jnp.maximum(idx, 0), hit


# -----------------------------------------------------------------------------
# Closest hit WITH winner attributes
#
# Per-ray gathers from [N]-sized tables cost ~8 ns/ray each on TPU (the
# gather lowers to scalar access); a bounce needs ~20 of them for records +
# materials, which dominated scenes with hundreds of primitives (RandomScene
# ran at 0.3 Mrays/s).  Instead the kernels carry the *winner's* geometry
# and (denormalized, per-primitive) material constants through the sweep —
# a handful of extra vector selects per primitive — and emit them directly,
# so record extraction and scatter need no per-ray table lookups at all.
#
# The attribute path is non-differentiable (SMEM constants); renders use
# it, while gradient-bearing traces (train_step) keep the gather path.
# -----------------------------------------------------------------------------

SPHERE_ATTRS = 10  # ctx, cty, ctz, rad, kindpack, fuzz, ior, colr, colg, colb
PLANAR_ATTRS = 12  # nx, ny, nz, alpha, beta, kindpack, fuzz, ior, colr/g/b, scale
CHECKER_EXTRA = 7  # evenr/g/b, oddr/g/b, inv_scale (planar/sphere share layout)


def _material_consts(scene_mats, scene_tex, prim_mat):
    """Per-primitive denormalized material/texture constants ([N]-sized
    joins — cheap, host of the expensive per-ray gathers this kills).

    kindpack = mat_kind * 8 + tex_kind (both < 8).
    Returns dict of [N] arrays.
    """
    kind = scene_mats.kind[prim_mat]
    tex = scene_mats.tex[prim_mat]
    texkind = scene_tex.kind[tex]
    return dict(
        kindpack=(kind * 8 + texkind).astype(jnp.float32),
        fuzz=scene_mats.fuzz[prim_mat],
        ior=scene_mats.ior[prim_mat],
        colr=scene_tex.color[:, 0][tex],
        colg=scene_tex.color[:, 1][tex],
        colb=scene_tex.color[:, 2][tex],
        evenr=scene_tex.even_color[:, 0][tex],
        eveng=scene_tex.even_color[:, 1][tex],
        evenb=scene_tex.even_color[:, 2][tex],
        oddr=scene_tex.odd_color[:, 0][tex],
        oddg=scene_tex.odd_color[:, 1][tex],
        oddb=scene_tex.odd_color[:, 2][tex],
        scale=jnp.where(
            texkind == 1, scene_tex.inv_scale[tex], scene_tex.noise_scale[tex]
        ),
        tex_id=tex.astype(jnp.float32),
    )


def _sphere_attr_kernel(n_ref, ox, oy, oz, dx, dy, dz, tmr, tmax,
                        cx, cy, cz, vx, vy, vz, rad2,
                        kindpack, fuzz, ior, colr, colg, colb,
                        evenr, eveng, evenb, oddr, oddg, oddb, scale, texid,
                        t_out, idx_out, *attr_outs, t_min):
    shape = ox.shape
    t_best = jnp.full(shape, BIG, jnp.float32)
    idx_best = jnp.full(shape, -1, jnp.int32)
    n_attr = len(attr_outs)
    attrs = [jnp.zeros(shape, jnp.float32) for _ in range(n_attr)]

    o_x, o_y, o_z = ox[...], oy[...], oz[...]
    d_x, d_y, d_z = dx[...], dy[...], dz[...]
    tmv = tmr[...]
    t_max = tmax[...]
    a = d_x * d_x + d_y * d_y + d_z * d_z
    inv_a = 1.0 / a

    def body(j, carry):
        t_best, idx_best, attrs = carry
        ctx = cx[j] + tmv * vx[j]
        cty = cy[j] + tmv * vy[j]
        ctz = cz[j] + tmv * vz[j]
        ocx = ctx - o_x
        ocy = cty - o_y
        ocz = ctz - o_z
        h = d_x * ocx + d_y * ocy + d_z * ocz
        c = ocx * ocx + ocy * ocy + ocz * ocz - rad2[j]
        disc = h * h - a * c
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        r0 = (h - sq) * inv_a
        r1 = (h + sq) * inv_a
        ok0 = (r0 > t_min) & (r0 < t_max)
        ok1 = (r1 > t_min) & (r1 < t_max)
        root = jnp.where(ok0, r0, r1)
        valid = (disc >= 0.0) & (ok0 | ok1) & (j < n_ref[0])
        upd = valid & (root < t_best)
        t_best = jnp.where(upd, root, t_best)
        idx_best = jnp.where(upd, j, idx_best)
        zv = 0.0 * h  # scalar -> vector broadcast (Mosaic legalization)
        vals = [ctx, cty, ctz, rad2[j] + zv, kindpack[j] + zv, fuzz[j] + zv,
                ior[j] + zv, colr[j] + zv, colg[j] + zv, colb[j] + zv,
                evenr[j] + zv, eveng[j] + zv, evenb[j] + zv,
                oddr[j] + zv, oddg[j] + zv, oddb[j] + zv,
                scale[j] + zv, texid[j] + zv][:n_attr]
        attrs = [jnp.where(upd, v, acc) for v, acc in zip(vals, attrs)]
        return t_best, idx_best, attrs

    t_best, idx_best, attrs = jax.lax.fori_loop(
        0, cx.shape[0], body, (t_best, idx_best, attrs)
    )
    t_out[...] = t_best
    idx_out[...] = idx_best
    for ref, val in zip(attr_outs, attrs):
        ref[...] = val


def _planar_attr_kernel(n_ref, ox, oy, oz, dx, dy, dz, tmax,
                        nx, ny, nz, dconst, qx, qy, qz,
                        vxwx, vxwy, vxwz, wxux, wxuy, wxuz, rad2, kind,
                        kindpack, fuzz, ior, colr, colg, colb,
                        evenr, eveng, evenb, oddr, oddg, oddb, scale, texid,
                        t_out, idx_out, *attr_outs, t_min):
    shape = ox.shape
    t_best = jnp.full(shape, BIG, jnp.float32)
    idx_best = jnp.full(shape, -1, jnp.int32)
    n_attr = len(attr_outs)
    attrs = [jnp.zeros(shape, jnp.float32) for _ in range(n_attr)]

    o_x, o_y, o_z = ox[...], oy[...], oz[...]
    d_x, d_y, d_z = dx[...], dy[...], dz[...]
    t_max = tmax[...]

    def body(j, carry):
        t_best, idx_best, attrs = carry
        nx_j, ny_j, nz_j = nx[j], ny[j], nz[j]
        denom = d_x * nx_j + d_y * ny_j + d_z * nz_j
        not_par = jnp.abs(denom) >= EPS_PARALLEL
        t = (dconst[j] - (o_x * nx_j + o_y * ny_j + o_z * nz_j)) / jnp.where(
            not_par, denom, 1.0
        )
        kind_j = kind[j]
        ones = t >= t
        is_plane = ones & (kind_j == packs.KIND_PLANE)
        is_quad = ones & (kind_j == packs.KIND_QUAD)
        is_tri = ones & (kind_j == packs.KIND_TRI)
        is_circle = ones & (kind_j == packs.KIND_CIRCLE)
        t_ok = (is_plane & (t > t_min) & (t < t_max)) | (
            ~is_plane & (t >= t_min) & (t <= t_max)
        )
        rel_x = o_x + t * d_x - qx[j]
        rel_y = o_y + t * d_y - qy[j]
        rel_z = o_z + t * d_z - qz[j]
        alpha = rel_x * vxwx[j] + rel_y * vxwy[j] + rel_z * vxwz[j]
        beta = rel_x * wxux[j] + rel_y * wxuy[j] + rel_z * wxuz[j]
        in_quad = (alpha >= 0.0) & (alpha <= 1.0) & (beta >= 0.0) & (beta <= 1.0)
        in_tri = (alpha >= 0.0) & (alpha <= 1.0) & (beta >= 0.0) & (alpha + beta <= 1.0)
        dist2 = rel_x * rel_x + rel_y * rel_y + rel_z * rel_z
        in_circle = dist2 <= rad2[j]
        interior = (
            (is_quad & in_quad) | (is_tri & in_tri) | (is_circle & in_circle)
            | is_plane
        )
        valid = not_par & t_ok & interior & (j < n_ref[0])
        upd = valid & (t < t_best)
        t_best = jnp.where(upd, t, t_best)
        idx_best = jnp.where(upd, j, idx_best)
        zv = 0.0 * t  # scalar -> vector broadcast (Mosaic legalization)
        vals = [nx_j + zv, ny_j + zv, nz_j + zv, alpha, beta,
                kindpack[j] + zv, fuzz[j] + zv, ior[j] + zv,
                colr[j] + zv, colg[j] + zv, colb[j] + zv,
                kind_j.astype(jnp.float32) + zv,
                evenr[j] + zv, eveng[j] + zv, evenb[j] + zv,
                oddr[j] + zv, oddg[j] + zv, oddb[j] + zv,
                scale[j] + zv, texid[j] + zv][:n_attr]
        attrs = [jnp.where(upd, v, acc) for v, acc in zip(vals, attrs)]
        return t_best, idx_best, attrs

    t_best, idx_best, attrs = jax.lax.fori_loop(
        0, nx.shape[0], body, (t_best, idx_best, attrs)
    )
    t_out[...] = t_best
    idx_out[...] = idx_best
    for ref, val in zip(attr_outs, attrs):
        ref[...] = val


def _run_attr_kernel(kernel, rays, prims, extra_smem, n, r, n_attr, t_min,
                     block_rows):
    rows = rays[0].shape[0]
    grid = (rows // block_rows,)
    ray_spec = pl.BlockSpec((block_rows, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    out_spec = pl.BlockSpec((block_rows, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        functools.partial(kernel, t_min=np.float32(t_min)),
        grid=grid,
        in_specs=[smem] + [ray_spec] * len(rays) + [smem] * len(prims)
        + [smem] * len(extra_smem),
        out_specs=[out_spec] * (2 + n_attr),
        out_shape=[jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
                   jax.ShapeDtypeStruct((rows, LANES), jnp.int32)]
        + [jax.ShapeDtypeStruct((rows, LANES), jnp.float32)] * n_attr,
        interpret=INTERPRET,
    )(jnp.asarray([n], jnp.int32), *rays, *prims, *extra_smem)
    t = outs[0].reshape(-1)[:r]
    idx = outs[1].reshape(-1)[:r]
    attrs = [a.reshape(-1)[:r] for a in outs[2:]]
    hit = idx >= 0
    return jnp.where(hit, t, BIG), jnp.maximum(idx, 0), hit, attrs


@functools.partial(jax.jit, static_argnames=("t_min", "block_rows", "n_attr"))
def sphere_closest_attrs(pack, mat_consts, o, d, tm, t_max, *, t_min=1e-3,
                         block_rows=DEFAULT_BLOCK_ROWS, n_attr=10):
    """Closest sphere hit + winner attributes.

    Returns (t, idx, hit, attrs) with attrs = [center_x, center_y,
    center_z, radius^2, kindpack, fuzz, ior, col r/g/b, (+checker extras
    when n_attr=18)].
    """
    ox_, oy_, oz_ = _components(o)
    dx_, dy_, dz_ = _components(d)
    r = ox_.shape[0]
    block = block_rows * LANES
    rays, _ = _pad_rays(
        [ox_, oy_, oz_, dx_, dy_, dz_, tm, jnp.where(t_max >= BIG, BIG, t_max)],
        block,
    )
    geo, n = _pad_prims([
        pack.center[:, 0], pack.center[:, 1], pack.center[:, 2],
        pack.velocity[:, 0], pack.velocity[:, 1], pack.velocity[:, 2],
        pack.radius * pack.radius,
    ])
    consts, _ = _pad_prims([
        mat_consts["kindpack"], mat_consts["fuzz"], mat_consts["ior"],
        mat_consts["colr"], mat_consts["colg"], mat_consts["colb"],
        mat_consts["evenr"], mat_consts["eveng"], mat_consts["evenb"],
        mat_consts["oddr"], mat_consts["oddg"], mat_consts["oddb"],
        mat_consts["scale"], mat_consts["tex_id"],
    ])
    return _run_attr_kernel(
        _sphere_attr_kernel, rays, geo + consts, [], n, r, n_attr, t_min,
        block_rows,
    )


@functools.partial(jax.jit, static_argnames=("t_min", "block_rows", "n_attr"))
def planar_closest_attrs(pack, mat_consts, o, d, t_max, *, t_min=1e-3,
                         block_rows=DEFAULT_BLOCK_ROWS, n_attr=12):
    """Closest planar hit + winner attributes.

    attrs = [nx, ny, nz, alpha, beta, kindpack, fuzz, ior, col r/g/b,
    planar_kind, (+checker extras when n_attr=20)].
    """
    ox_, oy_, oz_ = _components(o)
    dx_, dy_, dz_ = _components(d)
    r = ox_.shape[0]
    block = block_rows * LANES
    rays, _ = _pad_rays(
        [ox_, oy_, oz_, dx_, dy_, dz_, jnp.where(t_max >= BIG, BIG, t_max)],
        block,
    )
    vxw = jnp.cross(pack.v, pack.w)
    wxu = jnp.cross(pack.w, pack.u)
    geo, n = _pad_prims([
        pack.normal[:, 0], pack.normal[:, 1], pack.normal[:, 2],
        pack.d, pack.q[:, 0], pack.q[:, 1], pack.q[:, 2],
        vxw[:, 0], vxw[:, 1], vxw[:, 2],
        wxu[:, 0], wxu[:, 1], wxu[:, 2],
        pack.radius * pack.radius,
    ])
    kind_pad = jnp.pad(pack.kind, (0, geo[0].shape[0] - n), constant_values=-1)
    consts, _ = _pad_prims([
        mat_consts["kindpack"], mat_consts["fuzz"], mat_consts["ior"],
        mat_consts["colr"], mat_consts["colg"], mat_consts["colb"],
        mat_consts["evenr"], mat_consts["eveng"], mat_consts["evenb"],
        mat_consts["oddr"], mat_consts["oddg"], mat_consts["oddb"],
        mat_consts["scale"], mat_consts["tex_id"],
    ])
    return _run_attr_kernel(
        _planar_attr_kernel, rays, geo + [kind_pad] + consts, [], n, r,
        n_attr, t_min, block_rows,
    )
