"""Texture tables: solid / checker / Perlin-marble / image.

The reference's ``Texture`` interface (rt/texture.go:5-7) becomes a dense
SoA pack evaluated branchlessly for a whole ray batch.  Image textures live
in a single padded atlas ``[n_images, Hmax, Wmax, 3]`` so lookup is one
gather regardless of how many images a scene uses.

Behavioral parity notes:
  - Checker: 3D lattice parity of floor(p/scale + 1e-4) (rt/texture.go:63-77).
  - Perlin "marble": 0.5*(1+sin(scale*z + 10*turb(p*scale, 7)))
    (rt/texture.go:81-85).  The reference's Perlin uses *plain trilinear*
    interpolation of gradient dots (no Hermite smoothing, rt/noise.go:75-92)
    and gradient vectors that are normalized cube samples (rt/noise.go:19)
    — both quirks reproduced.  The gradient SOURCE is TPU-native: a
    PCG3D hash of the lattice point instead of the reference's
    permutation-table XOR lookup.  The reference's tables are filled
    from an unseeded global RNG (its noise pattern differs run to run),
    so only the STRUCTURE is parity-relevant — and the table path cost
    336 per-ray gathers per turbulence eval on TPU (8 ns each: the
    perlin scene rendered at 0.06 Mrays/s).  Hashed gradients are pure
    VPU math: same distribution (normalized cube samples), same
    interpolation, ~40x faster, and megakernel-compatible.
  - Image: nearest texel, v flipped, clamp addressing
    (rt/image_texture.go:26-41).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

from ..core import vec

TEX_SOLID = 0
TEX_CHECKER = 1
TEX_NOISE = 2
TEX_IMAGE = 3


class TexturePack(NamedTuple):
    kind: jnp.ndarray        # [T] i32
    color: jnp.ndarray       # [T, 3] solid color
    even_color: jnp.ndarray  # [T, 3] checker even
    odd_color: jnp.ndarray   # [T, 3] checker odd
    inv_scale: jnp.ndarray   # [T] checker 1/scale
    noise_scale: jnp.ndarray  # [T]
    image_id: jnp.ndarray    # [T] i32 index into atlas
    atlas: jnp.ndarray       # [I, Hmax, Wmax, 3] f32 (I >= 1; dummy if unused)
    atlas_wh: jnp.ndarray    # [I, 2] i32 (width, height) of each image


_PM = np.uint32(1664525)
_PA = np.uint32(1013904223)


def _lattice_grad(i, j, k):
    """Gradient at integer lattice point (i, j, k): PCG3D-hashed
    normalized cube sample (the reference's gradient distribution,
    rt/noise.go:19, from an arithmetic hash instead of perm-table
    gathers).  Inputs are i32 arrays of any shape; returns 3 arrays."""
    x = i.astype(jnp.uint32) * _PM + _PA
    y = j.astype(jnp.uint32) * _PM + _PA
    z = k.astype(jnp.uint32) * _PM + _PA
    x = x + y * z
    y = y + z * x
    z = z + x * y
    x = x ^ (x >> np.uint32(16))
    y = y ^ (y >> np.uint32(16))
    z = z ^ (z >> np.uint32(16))
    x = x + y * z
    y = y + z * x
    z = z + x * y
    f24 = np.float32(2.0 ** -24)

    def cube(v):
        u = (v >> np.uint32(8)).astype(jnp.int32).astype(jnp.float32) * f24
        return 2.0 * u - 1.0

    gx, gy, gz = cube(x), cube(y), cube(z)
    inv = 1.0 / jnp.sqrt(jnp.maximum(gx * gx + gy * gy + gz * gz, 1e-12))
    return gx * inv, gy * inv, gz * inv


def perlin_noise(p):
    """Gradient noise in [-1, 1]-ish for points p [R, 3] (rt/noise.go:29-56).

    Plain trilinear interpolation of corner-gradient dot products — the
    reference deliberately(?) omits Hermite smoothing; we match it.
    """
    pf = jnp.floor(p)
    uvw = p - pf
    ijk = pf.astype(jnp.int32)

    accum = jnp.zeros(p.shape[:-1], p.dtype)
    for di in range(2):
        for dj in range(2):
            for dk in range(2):
                gx, gy, gz = _lattice_grad(
                    ijk[..., 0] + di, ijk[..., 1] + dj, ijk[..., 2] + dk)
                weight_v = uvw - jnp.array([di, dj, dk], p.dtype)
                wu = di * uvw[..., 0] + (1 - di) * (1.0 - uvw[..., 0])
                wv = dj * uvw[..., 1] + (1 - dj) * (1.0 - uvw[..., 1])
                ww = dk * uvw[..., 2] + (1 - dk) * (1.0 - uvw[..., 2])
                dot = (gx * weight_v[..., 0] + gy * weight_v[..., 1]
                       + gz * weight_v[..., 2])
                accum = accum + wu * wv * ww * dot
    return accum


def perlin_turb(p, depth: int = 7):
    """|fBm| turbulence (rt/noise.go:58-68)."""
    accum = jnp.zeros(p.shape[:-1], p.dtype)
    weight = 1.0
    pt = p
    for _ in range(depth):
        accum = accum + weight * perlin_noise(pt)
        weight *= 0.5
        pt = pt * 2.0
    return jnp.abs(accum)


def _gather_v3(table, idx):
    """[T,3] table gathered by [R] idx -> V3 (per-component gathers keep
    everything in dense [R] layout — no padded [R,3] intermediates)."""
    from ..core.vec3 import V3

    return V3(table[:, 0][idx], table[:, 1][idx], table[:, 2][idx])


def evaluate(pack: TexturePack, tex_id, u, v, p, *, has_noise=True, has_image=True):
    """Texture value for each ray: tex_id [R] i32, u/v [R], p: V3 -> V3.

    ``has_noise`` / ``has_image`` are static flags letting scenes without
    those texture kinds skip the (comparatively expensive) evaluations.
    """
    from ..core import fetch
    from ..core.vec3 import V3

    (kind, c0, c1, c2, inv_scale, e0, e1, e2, o0, o1, o2, noise_scale,
     image_id) = fetch.rows_fetch(
        [pack.kind, pack.color[:, 0], pack.color[:, 1], pack.color[:, 2],
         pack.inv_scale,
         pack.even_color[:, 0], pack.even_color[:, 1], pack.even_color[:, 2],
         pack.odd_color[:, 0], pack.odd_color[:, 1], pack.odd_color[:, 2],
         pack.noise_scale, pack.image_id], tex_id)
    out = V3(c0, c1, c2)
    lx = jnp.floor(inv_scale * p.x + 1e-4).astype(jnp.int32)
    ly = jnp.floor(inv_scale * p.y + 1e-4).astype(jnp.int32)
    lz = jnp.floor(inv_scale * p.z + 1e-4).astype(jnp.int32)
    is_even = (lx + ly + lz) % 2 == 0
    checker = V3.select(is_even, V3(e0, e1, e2), V3(o0, o1, o2))
    out = V3.select(kind == TEX_CHECKER, checker, out)

    if has_noise:
        scale = noise_scale
        s = scale * p.z + 10.0 * perlin_turb_soa(p * scale, 7)
        marble = 0.5 * (1.0 + jnp.sin(s))
        out = V3.select(kind == TEX_NOISE, V3(marble, marble, marble), out)

    if has_image:
        img = image_id
        w, h = fetch.rows_fetch([pack.atlas_wh[:, 0], pack.atlas_wh[:, 1]], img)
        uc = jnp.clip(u, 0.0, 1.0)
        vc = 1.0 - jnp.clip(v, 0.0, 1.0)  # flip v (rt/image_texture.go:33)
        xi = jnp.clip((uc * w.astype(u.dtype)).astype(jnp.int32), 0, w - 1)
        yi = jnp.clip((vc * h.astype(u.dtype)).astype(jnp.int32), 0, h - 1)
        # One [N, 3] row gather instead of 3 element gathers (gathers are
        # latency-bound ~12 ns/lookup on TPU regardless of payload width).
        ni, hh, ww, _ = pack.atlas.shape
        flat = pack.atlas.reshape(ni * hh * ww, 3)
        t = flat[(img * hh + yi) * ww + xi]
        texel = V3(t[:, 0], t[:, 1], t[:, 2])
        out = V3.select(kind == TEX_IMAGE, texel, out)

    return out


def perlin_noise_soa(p):
    """SoA gradient noise (rt/noise.go:29-56): p is a V3 of [R] arrays.
    Gather-free: gradients come from _lattice_grad (pure VPU)."""
    fx, fy, fz = jnp.floor(p.x), jnp.floor(p.y), jnp.floor(p.z)
    u, v, w = p.x - fx, p.y - fy, p.z - fz
    i = fx.astype(jnp.int32)
    j = fy.astype(jnp.int32)
    k = fz.astype(jnp.int32)

    accum = jnp.zeros_like(p.x)
    for di in range(2):
        for dj in range(2):
            for dk in range(2):
                gx, gy, gz = _lattice_grad(i + di, j + dj, k + dk)
                dot = gx * (u - di) + gy * (v - dj) + gz * (w - dk)
                wu = di * u + (1 - di) * (1.0 - u)
                wv = dj * v + (1 - dj) * (1.0 - v)
                ww = dk * w + (1 - dk) * (1.0 - w)
                accum = accum + wu * wv * ww * dot
    return accum


def perlin_turb_soa(p, depth: int = 7):
    """|fBm| turbulence, SoA (rt/noise.go:58-68)."""
    accum = jnp.zeros_like(p.x)
    weight = 1.0
    pt = p
    for _ in range(depth):
        accum = accum + weight * perlin_noise_soa(pt)
        weight *= 0.5
        pt = pt * 2.0
    return jnp.abs(accum)
