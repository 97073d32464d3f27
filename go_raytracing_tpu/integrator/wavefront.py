"""Wavefront path-tracing integrator.

The reference's recursive integrator (``rayColorInternal``,
rt/camera.go:443-518) becomes an iterative bounce loop over a ray megabatch
— the only XLA-shaped formulation.  Per-ray state (origin, direction,
throughput, radiance, alive, allow_light_hits) is carried through a
``lax.scan`` over ``max_depth`` bounces with masked lanes; the
``allowLightHits`` flag that kills BRDF-path double counting of NEE-sampled
lights (rt/camera.go:473-517) becomes a per-ray bit.

Algorithm parity with the reference per bounce:
  1. closest hit over spheres + planar prims, then stochastic volume
     scattering may preempt the surface hit (rt/volume.go:34-79);
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

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ..core import rng as rngmod
from ..core import vec
from ..geometry import mesh_bvh, packs
from ..geometry.scene import Scene
from ..materials import tables as mats
from ..lights import hdri as hdri_mod
from ..camera import Camera

FIREFLY_CLAMP = 20.0  # rt/camera.go:601-604, 671-675
SHADOW_EPS = 1e-3     # rt/camera.go:639

HIT_NONE = 0
HIT_SPHERE = 1
HIT_PLANAR = 2
HIT_VOLUME = 3
HIT_MESH_BASE = 4  # + mesh prototype index

# Extra RNG purpose bases (see core/rng.py for the primary enumeration).
PURPOSE_VOL_MAIN = 64      # + 32 * volume_index
PURPOSE_VOL_SHADOW_AREA = 65
PURPOSE_VOL_SHADOW_HDRI = 66


def _volume_uniforms(seed, stream, bounce, base, n_volumes):
    purpose = base + 32 * jnp.arange(n_volumes, dtype=jnp.uint32)[None, :]
    u, _, _ = rngmod.uniform3(seed, stream[:, None], bounce, purpose)
    return u


def _surface_intersects(scene: Scene, o, d, tm, t_min, t_max):
    """Sphere + planar closest hits, dispatched to the pallas kernels on
    TPU (geometry detached there — intersections are non-differentiable
    control flow; shading gradients flow through the hit *records*)."""
    from ..ops import pallas_intersect as pk

    if pk.enabled():
        sg = jax.lax.stop_gradient
        o_, d_, tm_, tmax_ = sg(o), sg(d), sg(tm), sg(t_max)
        if scene.spheres.radius.shape[0] > 0:
            t_s, i_s, h_s = pk.sphere_closest(
                sg(scene.spheres), o_, d_, tm_, tmax_, t_min=float(t_min)
            )
        else:
            r_ = o.shape[0]
            t_s = jnp.full((r_,), packs.BIG)
            i_s = jnp.zeros((r_,), jnp.int32)
            h_s = jnp.zeros((r_,), bool)
        if scene.planar.d.shape[0] > 0:
            t_p, i_p, h_p = pk.planar_closest(
                sg(scene.planar), o_, d_, tmax_, t_min=float(t_min)
            )
        else:
            r_ = o.shape[0]
            t_p = jnp.full((r_,), packs.BIG)
            i_p = jnp.zeros((r_,), jnp.int32)
            h_p = jnp.zeros((r_,), bool)
        return (t_s, i_s, h_s), (t_p, i_p, h_p)

    t_s, i_s, h_s = packs.intersect_spheres(scene.spheres, o, d, tm, t_min, t_max)
    t_p, i_p, h_p = packs.intersect_planar(scene.planar, o, d, t_min, t_max)
    return (t_s, i_s, h_s), (t_p, i_p, h_p)


def closest_hit(scene: Scene, o, d, tm, t_min, t_max, seed, stream, bounce):
    """Closest surface hit, then stochastic volume preemption.

    Returns (t [R], which [R] i32 in {HIT_NONE, HIT_SPHERE, HIT_PLANAR,
    HIT_VOLUME, HIT_MESH_BASE + proto}, idx [R], aux [R] — the mesh
    instance id for mesh hits, 0 otherwise).
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

    for mi, proto in enumerate(scene.meshes):
        t_limit = jnp.where(hit_surf, jnp.minimum(t_surf, t_max), t_max)
        t_m, tri_m, inst_m, h_m, _ovf = mesh_bvh.intersect_mesh(
            proto, o, d, t_min, t_limit
        )
        mesh_wins = h_m & (~hit_surf | (t_m < t_surf))
        t_surf = jnp.where(mesh_wins, t_m, t_surf)
        which = jnp.where(mesh_wins, HIT_MESH_BASE + mi, which).astype(jnp.int32)
        idx = jnp.where(mesh_wins, tri_m, idx)
        aux = jnp.where(mesh_wins, inst_m, aux)
        hit_surf = hit_surf | h_m

    if scene.n_volumes > 0:
        t_limit = jnp.where(hit_surf, t_surf, jnp.full_like(t_surf, packs.BIG))
        u_vol = _volume_uniforms(seed, stream, bounce, PURPOSE_VOL_MAIN, scene.n_volumes)
        t_v, i_v, h_v = packs.sample_volumes(scene.volumes, o, d, t_min, t_limit, u_vol)
        vol_wins = h_v & (~hit_surf | (t_v < t_surf))
        t_surf = jnp.where(vol_wins, t_v, t_surf)
        which = jnp.where(vol_wins, HIT_VOLUME, which).astype(jnp.int32)
        idx = jnp.where(vol_wins, i_v, idx)

    return t_surf, which, idx, aux


def extract_record(scene: Scene, o, d, tm, t, which, idx, aux):
    """Hit record for the winning primitive per ray."""
    r = o.shape[0]
    p = vec.ray_at(o, d, t)
    normal = jnp.zeros_like(p).at[:, 0].set(1.0)  # volume normal (rt/volume.go:73)
    front = jnp.ones((r,), bool)
    uu = jnp.zeros((r,), o.dtype)
    vv = jnp.zeros((r,), o.dtype)
    mat_id = jnp.zeros((r,), jnp.int32)

    if scene.spheres.radius.shape[0] > 0:
        sp, sn, sf, su, sv, sm = packs.sphere_hit_record(
            scene.spheres, idx, o, d, tm, t
        )
        m = which == HIT_SPHERE
        p = jnp.where(m[:, None], sp, p)
        normal = jnp.where(m[:, None], sn, normal)
        front = jnp.where(m, sf, front)
        uu = jnp.where(m, su, uu)
        vv = jnp.where(m, sv, vv)
        mat_id = jnp.where(m, sm, mat_id)

    if scene.planar.d.shape[0] > 0:
        pp, pn, pf, pu, pv, pm = packs.planar_hit_record(scene.planar, idx, o, d, t)
        m = which == HIT_PLANAR
        p = jnp.where(m[:, None], pp, p)
        normal = jnp.where(m[:, None], pn, normal)
        front = jnp.where(m, pf, front)
        uu = jnp.where(m, pu, uu)
        vv = jnp.where(m, pv, vv)
        mat_id = jnp.where(m, pm, mat_id)

    for mi, proto in enumerate(scene.meshes):
        mp, mn, mf, mu, mv, mm = mesh_bvh.mesh_hit_record(proto, idx, aux, o, d, t)
        m = which == HIT_MESH_BASE + mi
        p = jnp.where(m[:, None], mp, p)
        normal = jnp.where(m[:, None], mn, normal)
        front = jnp.where(m, mf, front)
        uu = jnp.where(m, mu, uu)
        vv = jnp.where(m, mv, vv)
        mat_id = jnp.where(m, mm, mat_id)

    if scene.n_volumes > 0:
        m = which == HIT_VOLUME
        mat_id = jnp.where(m, scene.volumes.mat[idx], mat_id)

    return p, normal, front, uu, vv, mat_id


def occluded(scene: Scene, o, d, tm, t_min, t_max, seed, stream, bounce, purpose_base):
    """Shadow-ray test: anything (surface or stochastic medium) in
    (t_min, t_max)?  Mirrors world.Hit on shadow rays (rt/camera.go:582,639),
    which includes volumes."""
    (t_s, _, h_s), (t_p, _, h_p) = _surface_intersects(
        scene, o, d, tm, t_min, t_max
    )
    blocked = h_s | h_p
    t_surf = jnp.minimum(
        jnp.where(h_s, t_s, packs.BIG), jnp.where(h_p, t_p, packs.BIG)
    )
    for proto in scene.meshes:
        t_m, _, _, h_m, _ = mesh_bvh.intersect_mesh(
            proto, o, d, t_min, jnp.minimum(t_surf, t_max)
        )
        blocked = blocked | h_m
        t_surf = jnp.where(h_m, jnp.minimum(t_surf, t_m), t_surf)
    if scene.n_volumes > 0:
        u_vol = _volume_uniforms(seed, stream, bounce, purpose_base, scene.n_volumes)
        t_limit = jnp.minimum(t_surf, t_max)
        _, _, h_v = packs.sample_volumes(scene.volumes, o, d, t_min, t_limit, u_vol)
        blocked = blocked | h_v
    return blocked


def _clamp_contribution(c):
    return jnp.minimum(c, FIREFLY_CLAMP)


def sample_area_light(scene: Scene, cam, p, normal, ray_d, attenuation, mat_id,
                      seed, stream, bounce):
    """NEE toward one uniformly chosen registered quad light
    (rt/camera.go:609-678).  Returns [R,3] contribution (no throughput)."""
    n_lights = scene.n_lights
    u_pick = rngmod.uniform(seed, stream, bounce, rngmod.LIGHT_PICK)
    li = jnp.minimum(
        (u_pick * n_lights).astype(jnp.int32), n_lights - 1
    )

    a_s, b_s = rngmod.uniform2(seed, stream, bounce, rngmod.LIGHT_U)
    lq = scene.light_q[li]
    lu = scene.light_u[li]
    lv = scene.light_v[li]
    lnrm = scene.light_normal[li]
    larea = scene.light_area[li]

    light_point = lq + a_s[:, None] * lu + b_s[:, None] * lv
    to_light = light_point - p
    dist = vec.length(to_light)
    light_dir = vec.unit(to_light)

    cos_theta = vec.dot(normal, light_dir)
    facing = cos_theta > 0.0

    blocked = occluded(
        scene, p, light_dir, jnp.zeros_like(dist), SHADOW_EPS,
        dist - SHADOW_EPS, seed, stream, bounce, PURPOSE_VOL_SHADOW_AREA,
    )

    # Emission at (u=0, v=0, light_point) (rt/camera.go:645)
    emission = mats.emitted(
        scene.materials, scene.textures, scene.light_mat[li],
        jnp.zeros_like(dist), jnp.zeros_like(dist), light_point,
        **scene.tex_flags,
    )

    cos_light = jnp.abs(vec.dot(lnrm, -light_dir))
    grazing = cos_light < 1e-3  # rt/camera.go:651
    pdf_light = (dist * dist) / jnp.maximum(cos_light * larea, 1e-20)

    wi = vec.unit(-ray_d)
    pdf_brdf = mats.brdf_pdf(scene.materials, mat_id, wi, light_dir, normal)
    # Safe divisions: lanes masked below (e.g. the shading point ON the
    # light, dist ~ 0) must not produce inf/NaN in the primal — masked
    # infinities poison the backward pass (0 * inf).
    weight = pdf_light / jnp.maximum(pdf_light + pdf_brdf, 1e-20)

    contrib = emission * (cos_theta / jnp.maximum(pdf_light, 1e-12) * weight)[:, None]
    contrib = contrib * attenuation * float(n_lights)
    contrib = _clamp_contribution(contrib)
    ok = facing & ~blocked & ~grazing
    return jnp.where(ok[:, None], contrib, 0.0)


def sample_hdri_light(scene: Scene, cam, p, normal, ray_d, attenuation, mat_id,
                      seed, stream, bounce):
    """NEE toward the HDRI via importance sampling (rt/camera.go:565-607)."""
    xi1 = rngmod.uniform(seed, stream, bounce, rngmod.HDRI_ROW)
    xi2 = rngmod.uniform(seed, stream, bounce, rngmod.HDRI_COL)
    light_dir, emission, pdf_h = hdri_mod.sample_direction(scene.env, xi1, xi2)

    cos_theta = vec.dot(normal, light_dir)
    facing = cos_theta > 0.0

    blocked = occluded(
        scene, p, light_dir, jnp.zeros(p.shape[0], p.dtype), SHADOW_EPS,
        jnp.full(p.shape[0], packs.BIG), seed, stream, bounce,
        PURPOSE_VOL_SHADOW_HDRI,
    )

    wi = vec.unit(-ray_d)
    pdf_b = mats.brdf_pdf(scene.materials, mat_id, wi, light_dir, normal)
    weight = pdf_h / (pdf_h + pdf_b)
    contrib = emission * (cos_theta / pdf_h * weight)[:, None] * attenuation
    contrib = _clamp_contribution(contrib)
    ok = facing & ~blocked
    return jnp.where(ok[:, None], contrib, 0.0)


def _miss_radiance(scene: Scene, cam: Camera, d, bounce):
    """Environment / sky gradient / flat background (rt/camera.go:452-466)."""
    if scene.env is not None:
        col = hdri_mod.sample(scene.env, d)
        if cam.phantom_hdri:
            col = jnp.where(jnp.equal(bounce, 0), jnp.zeros_like(col), col)
        return col
    if cam.use_sky_gradient:
        unit_d = vec.unit(d)
        a = 0.5 * (unit_d[:, 1] + 1.0)
        white = jnp.ones(3, d.dtype)
        blue = jnp.asarray([0.5, 0.7, 1.0], d.dtype)
        return (1.0 - a)[:, None] * white + a[:, None] * blue
    return jnp.broadcast_to(jnp.asarray(cam.background, d.dtype), d.shape)


def _vma_of(x):
    try:
        return frozenset(jax.typeof(x).vma)
    except Exception:
        return frozenset()


def _promote_vma(x, axes):
    """Add any missing varying-manual-axes (shard_map mesh axes) to x."""
    missing = tuple(axes - _vma_of(x))
    if missing:
        return jax.lax.pvary(x, missing)
    return x


def trace(scene: Scene, cam: Camera, o, d, tm, stream, seed):
    """Radiance for a ray megabatch. o/d [R,3], tm/stream [R] -> [R,3]."""
    r = o.shape[0]
    f32 = o.dtype

    use_nee = scene.n_lights > 0  # len(c.Lights) > 0 (rt/camera.go:487-489)
    hdri_nee = use_nee and scene.env is not None and scene.env_importance

    def bounce_step(carry, bounce):
        o, d, throughput, radiance, alive, allow_light = carry

        t, which, idx, aux = closest_hit(
            scene, o, d, tm, vec.EPS_HIT, jnp.full((r,), packs.BIG, f32),
            seed, stream, bounce,
        )
        hit = which != HIT_NONE

        # --- miss ---------------------------------------------------------
        miss_col = _miss_radiance(scene, cam, d, bounce)
        radiance = radiance + jnp.where(
            (alive & ~hit)[:, None], throughput * miss_col, 0.0
        )

        # Miss lanes carry t = BIG; o + BIG*d overflows to inf and would
        # NaN-poison downstream masked math (and its gradients).
        t_rec = jnp.where(hit, t, 1.0)
        p, normal, front, uu, vv, mat_id = extract_record(
            scene, o, d, tm, t_rec, which, idx, aux
        )

        sc = mats.scatter(
            scene.materials, scene.textures, mat_id, d, normal, front,
            uu, vv, p, seed, stream, bounce, **scene.tex_flags,
        )

        # --- emission (iff allow_light_hits, rt/camera.go:473-481) --------
        radiance = radiance + jnp.where(
            (alive & hit & allow_light)[:, None], throughput * sc.emitted, 0.0
        )

        # --- NEE + MIS ----------------------------------------------------
        use_mis = alive & False  # all-False with alive's vma
        if use_nee:
            use_mis = sc.can_use_nee & alive & hit
            direct = sample_area_light(
                scene, cam, p, normal, d, sc.attenuation, mat_id,
                seed, stream, bounce,
            )
            if hdri_nee:
                direct = direct + sample_hdri_light(
                    scene, cam, p, normal, d, sc.attenuation, mat_id,
                    seed, stream, bounce,
                )
            radiance = radiance + jnp.where(
                use_mis[:, None], throughput * direct, 0.0
            )

        # --- continue the path -------------------------------------------
        alive = alive & hit & sc.scattered
        throughput = jnp.where(alive[:, None], throughput * sc.attenuation, throughput)
        o = jnp.where(alive[:, None], p, o)
        d = jnp.where(alive[:, None], sc.direction, d)
        allow_light = ~use_mis  # rt/camera.go:493 vs :514

        return (o, d, throughput, radiance, alive, allow_light), None

    # Inside shard_map the scan carry must have consistent varying-manual-
    # axes: promote every component to the union of the ray inputs' vma.
    axes = _vma_of(o) | _vma_of(d) | _vma_of(tm) | _vma_of(stream)
    init = tuple(
        _promote_vma(x, axes)
        for x in (
            o,
            d,
            jnp.ones((r, 3), f32),
            jnp.zeros((r, 3), f32),
            jnp.ones((r,), bool),
            jnp.ones((r,), bool),
        )
    )
    bounces = jnp.arange(cam.max_depth, dtype=jnp.uint32)
    (o, d, throughput, radiance, alive, allow_light), _ = lax.scan(
        bounce_step, init, bounces
    )
    return radiance
