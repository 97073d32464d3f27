"""Material tables and branchless scatter evaluation (component SoA).

The reference's ``Material`` interface with dynamic dispatch
(rt/material.go:9-27) becomes a dense parameter table plus a masked-select
scatter kernel evaluated for the whole ray wavefront at once.  All vectors
are ``core.vec3.V3`` component SoA (see core/vec3.py for the TPU layout
rationale).

Kinds and parity:
  - LAMBERTIAN: scatter = normal + random_unit (NOT normalized), near-zero
    fallback to the normal (rt/material.go:57-68); pdf = cos/pi
    (rt/material.go:70-76); CanUseNEE = true (rt/material.go:49-55).
  - METAL: reflect + fuzz * random_unit; absorbed when the fuzzed direction
    dips below the surface (rt/material.go:113-119); Phong-like pdf with
    exponent (1-fuzz)*50 (rt/material.go:121-136); **CanUseNEE = false
    always** — deliberate, NEE washes out the metallic look
    (rt/material.go:101-111).
  - DIELECTRIC: Snell + total internal reflection + Schlick-probabilistic
    reflection (rt/material.go:164-188, reflectance rt/material.go:284-288);
    attenuation = 1; IOR inverted on back faces.
  - DIFFUSE_LIGHT: emissive only, never scatters (rt/material.go:226-236).
  - ISOTROPIC: uniform-sphere scatter, pdf = 1/4pi (rt/material.go:266-274).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

from ..core import rng as rngmod
from ..core import fetch
from ..core.vec3 import V3
from . import textures as tex

MAT_LAMBERTIAN = 0
MAT_METAL = 1
MAT_DIELECTRIC = 2
MAT_DIFFUSE_LIGHT = 3
MAT_ISOTROPIC = 4


class MaterialPack(NamedTuple):
    kind: jnp.ndarray  # [M] i32
    tex: jnp.ndarray   # [M] i32 albedo/emission texture id
    fuzz: jnp.ndarray  # [M] f32 (metal)
    ior: jnp.ndarray   # [M] f32 (dielectric)


class ScatterResult(NamedTuple):
    direction: V3     # new ray direction (unnormalized, as reference)
    attenuation: V3
    emitted: V3
    scattered: jnp.ndarray    # [R] bool — False for lights / absorbed metal
    can_use_nee: jnp.ndarray  # [R] bool — Lambertian only


def can_use_nee_table(pack: MaterialPack):
    return pack.kind == MAT_LAMBERTIAN


def emitted(pack: MaterialPack, tpack: tex.TexturePack, mat_id, u, v, p: V3,
            **tex_flags) -> V3:
    """Emission per ray: nonzero only for DIFFUSE_LIGHT (value = its texture)."""
    kind, tex_id = fetch.rows_fetch([pack.kind, pack.tex], mat_id)
    is_light = kind == MAT_DIFFUSE_LIGHT
    val = tex.evaluate(tpack, tex_id, u, v, p, **tex_flags)
    return V3.select(is_light, val, V3.zeros(is_light.shape))


def scatter(pack: MaterialPack, tpack: tex.TexturePack, mat_id,
            ray_d: V3, normal: V3, front_face, u, v, p: V3,
            seed, stream, bounce, **tex_flags) -> ScatterResult:
    """Branchless scatter for the whole wavefront."""
    kind, fuzz, ior, tex_id = fetch.rows_fetch(
        [pack.kind, pack.fuzz, pack.ior, pack.tex], mat_id)

    su1, su2, _ = rngmod.uniform3(seed, stream, bounce, rngmod.SCATTER_U)
    z = 1.0 - 2.0 * su1
    phi = (2.0 * np.pi) * su2
    rr = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    rand_unit = V3(rr * jnp.cos(phi), rr * jnp.sin(phi), z)
    u_fresnel = rngmod.uniform(seed, stream, bounce, rngmod.FRESNEL)

    albedo = tex.evaluate(tpack, tex_id, u, v, p, **tex_flags)

    # --- Lambertian ---------------------------------------------------------
    lam_dir = normal + rand_unit
    lam_dir = V3.select(lam_dir.near_zero(), normal, lam_dir)

    # --- Metal --------------------------------------------------------------
    reflected = ray_d.reflect(normal).unit() + rand_unit * fuzz
    metal_ok = reflected.dot(normal) > 0.0

    # --- Dielectric ---------------------------------------------------------
    ri = jnp.where(front_face, 1.0 / ior, ior)
    unit_d = ray_d.unit()
    cos_theta = jnp.minimum((-unit_d).dot(normal), 1.0)
    sin_theta = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_theta * cos_theta))
    cannot_refract = ri * sin_theta > 1.0
    r0 = (1.0 - ri) / (1.0 + ri)
    r0 = r0 * r0
    one_m_cos = jnp.maximum(1.0 - cos_theta, 0.0)
    omc2 = one_m_cos * one_m_cos
    schlick = r0 + (1.0 - r0) * (omc2 * omc2 * one_m_cos)
    do_reflect = cannot_refract | (schlick > u_fresnel)
    refr = unit_d.refract(normal, ri)
    refl = unit_d.reflect(normal)
    diel_dir = V3.select(do_reflect, refl, refr)

    # --- Select by kind -----------------------------------------------------
    direction = V3.select(
        kind == MAT_LAMBERTIAN,
        lam_dir,
        V3.select(
            kind == MAT_METAL,
            reflected,
            V3.select(kind == MAT_DIELECTRIC, diel_dir, rand_unit),  # isotropic
        ),
    )
    attenuation = V3.select(
        kind == MAT_DIELECTRIC, V3.full(kind.shape, (1.0, 1.0, 1.0)), albedo
    )
    scattered = jnp.where(
        kind == MAT_DIFFUSE_LIGHT,
        False,
        jnp.where(kind == MAT_METAL, metal_ok, True),
    )
    emitted_col = V3.select(
        kind == MAT_DIFFUSE_LIGHT, albedo, V3.zeros(kind.shape)
    )
    return ScatterResult(
        direction=direction,
        attenuation=attenuation,
        emitted=emitted_col,
        scattered=scattered,
        can_use_nee=kind == MAT_LAMBERTIAN,
    )


def brdf_pdf(pack: MaterialPack, mat_id, wi: V3, wo: V3, normal: V3):
    """PDF(wi, wo, n) for the MIS weight (PDFEvaluator, rt/material.go:15-17).

    wi: unit vector toward the viewer (-ray_dir), wo: light direction.
    Lambertian: max(cos,0)/pi.  Metal: Phong lobe with exponent (1-fuzz)*50,
    0 when fuzz == 0.  Dielectric/light: 0 (delta).  Isotropic: 1/4pi.
    """
    kind, fuzz = fetch.rows_fetch([pack.kind, pack.fuzz], mat_id)

    cos_theta = normal.dot(wo)
    lam_pdf = jnp.maximum(cos_theta, 0.0) / np.pi

    refl = (-wi).reflect(normal)
    cos_alpha = refl.dot(wo)
    exponent = (1.0 - fuzz) * 50.0
    phong = (exponent + 1.0) / (2.0 * np.pi) * jnp.power(
        jnp.maximum(cos_alpha, 1e-20), exponent
    )
    metal_pdf = jnp.where((fuzz == 0.0) | (cos_alpha < 0.0), 0.0, phong)

    iso_pdf = jnp.full_like(lam_pdf, 1.0 / (4.0 * np.pi))

    return jnp.where(
        kind == MAT_LAMBERTIAN,
        lam_pdf,
        jnp.where(
            kind == MAT_METAL,
            metal_pdf,
            jnp.where(kind == MAT_ISOTROPIC, iso_pdf, 0.0),
        ),
    )


def scatter_from_attrs(mat_kind, fuzz, ior, albedo: V3,
                       ray_d: V3, normal: V3, front_face,
                       seed, stream, bounce) -> ScatterResult:
    """Scatter evaluation from per-ray *attributes* (winner constants
    streamed out of the pallas closest-hit kernels) — the gather-free fast
    path.  Math identical to :func:`scatter`."""
    su1, su2, _ = rngmod.uniform3(seed, stream, bounce, rngmod.SCATTER_U)
    z = 1.0 - 2.0 * su1
    phi = (2.0 * np.pi) * su2
    rr = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    rand_unit = V3(rr * jnp.cos(phi), rr * jnp.sin(phi), z)
    u_fresnel = rngmod.uniform(seed, stream, bounce, rngmod.FRESNEL)

    lam_dir = normal + rand_unit
    lam_dir = V3.select(lam_dir.near_zero(), normal, lam_dir)

    reflected = ray_d.reflect(normal).unit() + rand_unit * fuzz
    metal_ok = reflected.dot(normal) > 0.0

    ri = jnp.where(front_face, 1.0 / ior, ior)
    unit_d = ray_d.unit()
    cos_theta = jnp.minimum((-unit_d).dot(normal), 1.0)
    sin_theta = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_theta * cos_theta))
    cannot_refract = ri * sin_theta > 1.0
    r0 = (1.0 - ri) / (1.0 + ri)
    r0 = r0 * r0
    omc = jnp.maximum(1.0 - cos_theta, 0.0)
    omc2 = omc * omc
    schlick = r0 + (1.0 - r0) * (omc2 * omc2 * omc)
    do_reflect = cannot_refract | (schlick > u_fresnel)
    diel_dir = V3.select(
        do_reflect, unit_d.reflect(normal), unit_d.refract(normal, ri)
    )

    direction = V3.select(
        mat_kind == MAT_LAMBERTIAN,
        lam_dir,
        V3.select(
            mat_kind == MAT_METAL,
            reflected,
            V3.select(mat_kind == MAT_DIELECTRIC, diel_dir, rand_unit),
        ),
    )
    attenuation = V3.select(
        mat_kind == MAT_DIELECTRIC, V3.full(mat_kind.shape, (1.0, 1.0, 1.0)),
        albedo,
    )
    scattered = jnp.where(
        mat_kind == MAT_DIFFUSE_LIGHT,
        False,
        jnp.where(mat_kind == MAT_METAL, metal_ok, True),
    )
    emitted_col = V3.select(
        mat_kind == MAT_DIFFUSE_LIGHT, albedo, V3.zeros(mat_kind.shape)
    )
    return ScatterResult(
        direction=direction,
        attenuation=attenuation,
        emitted=emitted_col,
        scattered=scattered,
        can_use_nee=mat_kind == MAT_LAMBERTIAN,
    )


def brdf_pdf_from_attrs(mat_kind, fuzz, wi: V3, wo: V3, normal: V3):
    """Attribute-path twin of :func:`brdf_pdf`."""
    cos_theta = normal.dot(wo)
    lam_pdf = jnp.maximum(cos_theta, 0.0) / np.pi

    refl = (-wi).reflect(normal)
    cos_alpha = refl.dot(wo)
    exponent = (1.0 - fuzz) * 50.0
    phong = (exponent + 1.0) / (2.0 * np.pi) * jnp.power(
        jnp.maximum(cos_alpha, 1e-20), exponent
    )
    metal_pdf = jnp.where((fuzz == 0.0) | (cos_alpha < 0.0), 0.0, phong)
    iso_pdf = jnp.full_like(lam_pdf, 1.0 / (4.0 * np.pi))

    return jnp.where(
        mat_kind == MAT_LAMBERTIAN,
        lam_pdf,
        jnp.where(
            mat_kind == MAT_METAL,
            metal_pdf,
            jnp.where(mat_kind == MAT_ISOTROPIC, iso_pdf, 0.0),
        ),
    )
