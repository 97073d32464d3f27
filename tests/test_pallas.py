"""Pallas intersection kernels vs the jnp reference path (interpreter mode
on CPU; the same kernels compile natively on TPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

import go_raytracing_tpu as grt
from go_raytracing_tpu.geometry import packs
from go_raytracing_tpu.ops import pallas_intersect as pk


@pytest.fixture(autouse=True)
def _interpret_mode():
    pk.INTERPRET = True
    yield
    pk.INTERPRET = False


def _random_scene(n_spheres=40, n_planar=True, seed=0):
    r = np.random.default_rng(seed)
    b = grt.SceneBuilder()
    m = b.lambertian((1, 1, 1))
    for _ in range(n_spheres):
        if r.random() < 0.3:
            c = r.normal(size=3) * 4
            b.moving_sphere(c, c + r.normal(size=3), r.uniform(0.3, 1.2), m)
        else:
            b.sphere(r.normal(size=3) * 4, r.uniform(0.3, 1.2), m)
    if n_planar:
        b.quad((-2, -2, -6), (4, 0, 0), (0, 4, 0), m)
        b.triangle((-3, -1, -4), (0, -1, -4), (-1.5, 2, -4), m)
        b.circle((2, 0, -5), (0.3, 0.2, 1), 1.0, m)
        b.plane((0, -5, 0), (0, 1, 0), m)
        b.quad((5, -2, -2), (0, 0, 4), (0, 4, 0), m)
    return b.build()


def _rays(n=700, seed=1):
    r = np.random.default_rng(seed)
    o = jnp.asarray(r.normal(size=(n, 3)) * 3, jnp.float32)
    d = jnp.asarray(r.normal(size=(n, 3)), jnp.float32)
    tm = jnp.asarray(r.random(n), jnp.float32)
    tmax = jnp.full((n,), packs.BIG, jnp.float32)
    return o, d, tm, tmax


def _sphere_grazing_margin(pack, o, d, tm):
    """Per-ray min over spheres of |closest-approach - radius| / radius.

    Near 0 means the ray grazes *some* sphere tangentially — the regime
    where the kernel's expanded f32 quadratic and the jnp path's top-2
    refined quadratic legitimately disagree about hit/miss."""
    o = np.asarray(o, np.float64)
    dn = np.asarray(d, np.float64)
    dn = dn / np.linalg.norm(dn, axis=-1, keepdims=True)
    c = np.asarray(pack.center, np.float64)[None] + (
        np.asarray(pack.velocity, np.float64)[None]
        * np.asarray(tm, np.float64)[:, None, None]
    )
    oc = c - o[:, None, :]
    proj = np.einsum("rnd,rd->rn", oc, dn)
    dist2 = np.einsum("rnd,rnd->rn", oc, oc) - proj**2
    dist = np.sqrt(np.maximum(dist2, 0.0))
    rad = np.asarray(pack.radius, np.float64)[None]
    # behind-the-origin spheres can't explain a disagreement
    margin = np.where(proj > 0, np.abs(dist - rad) / rad, np.inf)
    return margin.min(axis=1)


def test_sphere_kernel_matches_jnp():
    scene = _random_scene()
    o, d, tm, tmax = _rays()
    t_ref, i_ref, h_ref = packs.intersect_spheres(
        scene.spheres, o, d, tm, 1e-3, tmax
    )
    t_pal, i_pal, h_pal = pk.sphere_closest(scene.spheres, o, d, tm, tmax)
    h_ref, h_pal = np.asarray(h_ref), np.asarray(h_pal)
    disagree = h_ref != h_pal
    # Every hit/miss disagreement must be a tangential grazing ray (f32
    # discriminant sign noise), not a systematic kernel bug.
    if disagree.any():
        margin = _sphere_grazing_margin(scene.spheres, o, d, tm)[disagree]
        assert margin.max() < 1e-3, (
            f"{disagree.sum()} disagreements, worst grazing margin "
            f"{margin.max():.2e} — not explainable as tangent noise"
        )
    both = h_ref & h_pal
    np.testing.assert_allclose(
        np.asarray(t_pal)[both], np.asarray(t_ref)[both], rtol=2e-4, atol=1e-4
    )
    # Winner-index mismatches are only legitimate for photon-level ties.
    idx_mismatch = both & (np.asarray(i_pal) != np.asarray(i_ref))
    if idx_mismatch.any():
        dt = np.abs(np.asarray(t_pal) - np.asarray(t_ref))[idx_mismatch]
        assert dt.max() < 1e-3, "index mismatch without a t tie"


def test_planar_kernel_matches_jnp():
    scene = _random_scene(n_spheres=0)
    o, d, tm, tmax = _rays(seed=2)
    t_ref, i_ref, h_ref = packs.intersect_planar(scene.planar, o, d, 1e-3, tmax)
    t_pal, i_pal, h_pal = pk.planar_closest(scene.planar, o, d, tmax)
    h_ref, h_pal = np.asarray(h_ref), np.asarray(h_pal)
    disagree = h_ref != h_pal
    if disagree.any():
        # Classify: disagreeing rays must lie within f32 noise of a
        # primitive boundary (interior-test edge or near-parallel plane).
        margin = _planar_edge_margin(scene.planar, o, d)[disagree]
        assert margin.max() < 1e-3, (
            f"{disagree.sum()} disagreements, worst edge margin "
            f"{margin.max():.2e}"
        )
    both = h_ref & h_pal
    np.testing.assert_allclose(
        np.asarray(t_pal)[both], np.asarray(t_ref)[both], rtol=2e-4, atol=1e-4
    )
    idx_mismatch = both & (np.asarray(i_pal) != np.asarray(i_ref))
    if idx_mismatch.any():
        dt = np.abs(np.asarray(t_pal) - np.asarray(t_ref))[idx_mismatch]
        assert dt.max() < 1e-3, "index mismatch without a t tie"


def _planar_edge_margin(pack, o, d):
    """Per-ray min over planar prims of the distance (in interior-test
    units) to the nearest accept/reject boundary."""
    o = np.asarray(o, np.float64)
    dv = np.asarray(d, np.float64)
    n = np.asarray(pack.normal, np.float64)
    q = np.asarray(pack.q, np.float64)
    u = np.asarray(pack.u, np.float64)
    v = np.asarray(pack.v, np.float64)
    w = np.asarray(pack.w, np.float64)
    dd = np.asarray(pack.d, np.float64)
    kind = np.asarray(pack.kind)
    rad = np.asarray(pack.radius, np.float64)

    denom = np.einsum("pd,rd->rp", n, dv)
    near_parallel = np.abs(denom) < 1e-6 * np.linalg.norm(dv, axis=-1)[:, None]
    t = (dd[None, :] - np.einsum("pd,rd->rp", n, o)) / np.where(
        near_parallel, 1.0, denom
    )
    p = o[:, None, :] + t[..., None] * dv[:, None, :]
    rel = p - q[None, :, :]
    alpha = np.einsum("pd,rpd->rp", w, np.cross(rel, v[None, :, :]))
    beta = np.einsum("pd,rpd->rp", w, np.cross(u[None, :, :], rel))

    # quad: boundary at alpha/beta in {0, 1}; tri: alpha/beta 0 or sum 1
    edge_quad = np.minimum.reduce([
        np.abs(alpha), np.abs(alpha - 1), np.abs(beta), np.abs(beta - 1)
    ])
    edge_tri = np.minimum.reduce([
        np.abs(alpha), np.abs(beta), np.abs(alpha + beta - 1)
    ])
    rdist = np.linalg.norm(rel, axis=-1)
    edge_circ = np.abs(rdist - rad[None, :]) / np.maximum(rad[None, :], 1e-9)
    margin = np.where(
        kind[None, :] == packs.KIND_QUAD, edge_quad,
        np.where(kind[None, :] == packs.KIND_TRI, edge_tri,
                 np.where(kind[None, :] == packs.KIND_CIRCLE, edge_circ,
                          np.inf)),
    )
    # t <= 0 or near-parallel hits can also flip on f32 noise
    margin = np.where(near_parallel, 0.0, margin)
    margin = np.where(np.abs(t) < 2e-3, np.minimum(margin, np.abs(t)), margin)
    return margin.min(axis=1)


def test_kernel_respects_tmax():
    scene = _random_scene(n_spheres=10, n_planar=False, seed=3)
    o, d, tm, _ = _rays(n=200, seed=4)
    tmax_big = jnp.full((200,), packs.BIG, jnp.float32)
    t1, _, h1 = pk.sphere_closest(scene.spheres, o, d, tm, tmax_big)
    # clamp tmax below each hit -> those rays must miss
    tmax_small = jnp.where(h1, t1 * 0.5, tmax_big)
    _, _, h2 = pk.sphere_closest(scene.spheres, o, d, tm, tmax_small)
    assert not bool(np.asarray(h2)[np.asarray(h1)].any())


def test_end_to_end_render_with_interpret_kernels():
    """Full trace with the kernels substituted (enabled() honors INTERPRET)."""
    scene, cam = grt.load_scene("simple")
    import dataclasses

    cam = dataclasses.replace(cam, image_width=16, samples_per_pixel=2, max_depth=4)
    img_pal = np.asarray(grt.render_image(scene, cam, spp=2, seed=3))
    pk.INTERPRET = False  # jnp path
    img_ref = np.asarray(grt.render_image(scene, cam, spp=2, seed=3))
    np.testing.assert_allclose(img_pal, img_ref, rtol=1e-3, atol=2e-3)


def test_attr_path_render_matches_gather_path():
    """The winner-attribute fast path must produce the same image as the
    differentiable gather path (cornell-like: quads + spheres + checker
    plane + volume + NEE light)."""
    import dataclasses

    b = grt.SceneBuilder()
    checker_floor = b.lambertian(b.checker(0.7, (0.2, 0.2, 0.2), (0.9, 0.9, 0.9)))
    b.plane((0, 0, 0), (0, 1, 0), checker_floor)
    b.sphere((0, 1, -1), 0.8, b.metal((0.9, 0.8, 0.5), 0.2))
    b.sphere((-1.8, 0.8, 0), 0.7, b.dielectric(1.5))
    b.quad((1.0, 0.2, 0.8), (1.2, 0, 0), (0, 1.2, 0), b.lambertian((0.7, 0.2, 0.2)))
    light = b.diffuse_light((6, 6, 6))
    q = b.quad((-1, 4, -1), (2, 0, 0), (0, 0, 2), light)
    b.add_light(q)
    b.volume_box((-3, 0, -3), (3, 3, 3), 0.02, (0.8, 0.8, 0.8))
    scene = b.build()
    assert scene.has_checker

    from go_raytracing_tpu.camera import Camera

    cam = Camera(
        image_width=16, aspect_ratio=1.0, samples_per_pixel=4, max_depth=4,
        look_from=(0, 2, 5), look_at=(0, 0.8, 0), background=(0.1, 0.1, 0.2),
        vfov=45.0,
    )
    # interpret mode: attr kernels active (pk.enabled() True via INTERPRET)
    img_fast = np.asarray(grt.render_image(scene, cam, spp=4, seed=2))
    pk.INTERPRET = False  # gather path
    img_ref = np.asarray(grt.render_image(scene, cam, spp=4, seed=2))
    np.testing.assert_allclose(img_fast, img_ref, rtol=1e-3, atol=2e-3)


def test_mesh_kernel_matches_frontier():
    """Segment-sweep mesh kernel vs the XLA frontier traversal."""
    from go_raytracing_tpu.geometry import mesh_bvh
    from go_raytracing_tpu.geometry.scene import Affine
    from go_raytracing_tpu.io import obj as obj_mod
    from go_raytracing_tpu.ops import pallas_mesh
    from go_raytracing_tpu.core.vec3 import V3

    pallas_mesh.INTERPRET = True
    try:
        verts, tris = obj_mod.lucy_standin(12, 10)
        instances = []
        for i in range(3):
            xf = Affine.trs(scale=(0.001, 0.001, 0.001),
                            rotation_deg=(0, 60 * i, 0),
                            position=(i * 1.5 - 1.5, -0.8, -3.0))
            instances.append((xf.m, 0))
        proto = mesh_bvh.build_proto(verts, tris, instances)
        assert pallas_mesh.kernel_ok(proto)

        rng = np.random.default_rng(0)
        n = 256
        o = np.zeros((n, 3))
        o[:, 2] = 2.0
        targets = np.stack([
            rng.uniform(-2.0, 1.0, n), rng.uniform(-0.8, 0.9, n),
            np.full(n, -3.0),
        ], axis=-1)
        d = (targets - o).astype(np.float32)
        o32 = jnp.asarray(o, jnp.float32)
        d32 = jnp.asarray(d, jnp.float32)
        tmax = jnp.full(n, 1e9, jnp.float32)

        t_f, tri_f, inst_f, hit_f, _ = mesh_bvh.intersect_mesh(
            proto, o32, d32, 1e-3, tmax
        )
        t_k, tri_k, inst_k, hit_k, _ = pallas_mesh.intersect_mesh_kernel(
            proto, V3.from_rows(o32), V3.from_rows(d32), 1e-3, tmax
        )
        hit_f, hit_k = np.asarray(hit_f), np.asarray(hit_k)
        assert hit_f.sum() > 20
        assert (hit_f == hit_k).mean() > 0.99
        both = hit_f & hit_k
        np.testing.assert_allclose(
            np.asarray(t_k)[both], np.asarray(t_f)[both], rtol=1e-4, atol=1e-4
        )
        assert (np.asarray(inst_k)[both] == np.asarray(inst_f)[both]).mean() > 0.99
        assert (np.asarray(tri_k)[both] == np.asarray(tri_f)[both]).mean() > 0.98
    finally:
        pallas_mesh.INTERPRET = False


def test_megakernel_matches_standard_path():
    """The wavefront megakernel must produce the SAME image as the
    standard integrator (identical RNG streams): cornell-like scene with
    spheres, quads, checker plane, volume, NEE light, moving sphere."""
    import dataclasses
    from go_raytracing_tpu.ops import pallas_wavefront as mega

    b = grt.SceneBuilder()
    checker_floor = b.lambertian(b.checker(0.7, (0.2, 0.2, 0.2), (0.9, 0.9, 0.9)))
    b.plane((0, 0, 0), (0, 1, 0), checker_floor)
    b.sphere((0, 1, -1), 0.8, b.metal((0.9, 0.8, 0.5), 0.2))
    b.sphere((-1.8, 0.8, 0), 0.7, b.dielectric(1.5))
    b.moving_sphere((1.8, 0.5, 0.5), (2.2, 0.9, 0.5), 0.4, b.lambertian((0.2, 0.5, 0.8)))
    b.quad((1.0, 0.2, 0.8), (1.2, 0, 0), (0, 1.2, 0), b.lambertian((0.7, 0.2, 0.2)))
    light = b.diffuse_light((6, 6, 6))
    q = b.quad((-1, 4, -1), (2, 0, 0), (0, 0, 2), light)
    b.add_light(q)
    b.volume_box((-3, 0, -3), (3, 3, 3), 0.02, (0.8, 0.8, 0.8))
    scene = b.build()

    from go_raytracing_tpu.camera import Camera

    cam = Camera(
        image_width=16, aspect_ratio=1.0, samples_per_pixel=4, max_depth=4,
        look_from=(0, 2, 5), look_at=(0, 0.8, 0), background=(0.1, 0.1, 0.2),
        vfov=45.0, use_sky_gradient=False,
    )
    mega.INTERPRET = True
    try:
        assert mega.applicable(scene)
        img_mega = np.asarray(grt.render_image(scene, cam, spp=4, seed=2))
    finally:
        mega.INTERPRET = False
    img_ref = np.asarray(grt.render_image(scene, cam, spp=4, seed=2))
    np.testing.assert_allclose(img_mega, img_ref, rtol=1e-3, atol=2e-3)


def test_megakernel_sphere_segment_culling_matches():
    """>= 64 spheres triggers the Morton-sorted segment-culled sphere
    sweep; the image must stay identical to the standard integrator."""
    from go_raytracing_tpu.ops import pallas_wavefront as mega

    b = grt.SceneBuilder()
    b.plane((0, 0, 0), (0, 1, 0), b.lambertian((0.5, 0.5, 0.5)))
    k = 0
    for i in range(9):
        for j in range(9):
            x, z = i - 4.0, j - 4.0
            mat = [
                b.lambertian((0.2 + 0.08 * (k % 9), 0.4, 0.6)),
                b.metal((0.8, 0.7, 0.6), 0.05 * (k % 5)),
                b.dielectric(1.5),
            ][k % 3]
            if k % 7 == 0:
                b.moving_sphere((x, 0.2, z), (x, 0.4, z), 0.18, mat)
            else:
                b.sphere((x, 0.2, z), 0.2, mat)
            k += 1
    scene = b.build()
    assert scene.spheres.radius.shape[0] >= mega.SPH_CULL_MIN

    from go_raytracing_tpu.camera import Camera

    cam = Camera(
        image_width=16, aspect_ratio=1.0, samples_per_pixel=2, max_depth=4,
        look_from=(6, 3, 6), look_at=(0, 0, 0), background=(0.6, 0.7, 0.9),
        vfov=40.0, use_sky_gradient=True,
    )
    mega.INTERPRET = True
    try:
        assert mega.applicable(scene)
        img_mega = np.asarray(grt.render_image(scene, cam, spp=2, seed=5))
    finally:
        mega.INTERPRET = False
    img_ref = np.asarray(grt.render_image(scene, cam, spp=2, seed=5))
    np.testing.assert_allclose(img_mega, img_ref, rtol=1e-3, atol=2e-3)


def test_megakernel_phase_split_matches():
    """The mid-loop re-sort phase split (resumable kernel) must be
    image-identical to the single-shot megakernel / standard path."""
    from go_raytracing_tpu.ops import pallas_wavefront as mega

    b = grt.SceneBuilder()
    b.plane((0, 0, 0), (0, 1, 0), b.lambertian((0.5, 0.5, 0.5)))
    for i in range(10):
        b.sphere((i - 5.0, 0.4, -1.0 + 0.3 * i), 0.4,
                 b.lambertian((0.3, 0.5 + 0.05 * i, 0.4)))
    b.sphere((0, 1.2, 1.5), 0.6, b.metal((0.9, 0.9, 0.9), 0.0))
    light = b.diffuse_light((5, 5, 5))
    q = b.quad((-1, 5, -1), (2, 0, 0), (0, 0, 2), light)
    b.add_light(q)
    scene = b.build()

    from go_raytracing_tpu.camera import Camera

    cam = Camera(
        image_width=16, aspect_ratio=1.0, samples_per_pixel=2, max_depth=9,
        look_from=(0, 2, 6), look_at=(0, 0.5, 0), background=(0.3, 0.4, 0.6),
        vfov=45.0, use_sky_gradient=False,
    )
    saved = (mega.SPLIT_R_MIN, mega.SPLIT_DEPTH_MIN)
    mega.INTERPRET = True
    mega.SPLIT_R_MIN, mega.SPLIT_DEPTH_MIN = 1, 1
    try:
        assert mega.applicable(scene)
        img_split = np.asarray(grt.render_image(scene, cam, spp=2, seed=3))
    finally:
        mega.INTERPRET = False
        mega.SPLIT_R_MIN, mega.SPLIT_DEPTH_MIN = saved
    img_ref = np.asarray(grt.render_image(scene, cam, spp=2, seed=3))
    np.testing.assert_allclose(img_split, img_ref, rtol=1e-3, atol=2e-3)


def test_megakernel_compact_matches():
    """The mid-loop live-ray COMPACTION (stable partition, no sort) must
    be image-identical to the single-shot megakernel / standard path —
    including deferred miss data for rays that escape in either phase
    and radiance accumulated across the phase boundary."""
    from go_raytracing_tpu.ops import pallas_wavefront as mega

    b = grt.SceneBuilder()
    b.plane((0, 0, 0), (0, 1, 0), b.lambertian((0.5, 0.5, 0.5)))
    k = 0
    for i in range(9):
        for j in range(9):
            x, z = i - 4.0, j - 4.0
            mat = [
                b.lambertian((0.2 + 0.08 * (k % 9), 0.4, 0.6)),
                b.metal((0.8, 0.7, 0.6), 0.05 * (k % 5)),
                b.dielectric(1.5),
            ][k % 3]
            b.sphere((x, 0.2, z), 0.2, mat)
            k += 1
    light = b.diffuse_light((5, 5, 5))
    q = b.quad((-1, 5, -1), (2, 0, 0), (0, 0, 2), light)
    b.add_light(q)
    scene = b.build()
    assert scene.spheres.radius.shape[0] >= mega.SPH_CULL_MIN

    from go_raytracing_tpu.camera import Camera

    cam = Camera(
        image_width=16, aspect_ratio=1.0, samples_per_pixel=2, max_depth=9,
        look_from=(6, 3, 6), look_at=(0, 0, 0), background=(0.6, 0.7, 0.9),
        vfov=40.0, use_sky_gradient=True,
    )
    from go_raytracing_tpu.camera import generate_rays
    from go_raytracing_tpu.integrator import wavefront as wf
    from go_raytracing_tpu.render.renderer import _id_to_pixel

    r = 16 * 16 * 4
    ids = jnp.arange(r, dtype=jnp.uint32)
    px, py, _ = _id_to_pixel(ids % (16 * 16), 16, 16, False)
    o, d, tm = generate_rays(cam, px, py, ids, 7)

    mega.INTERPRET = True
    try:
        assert mega.applicable(scene)
        rad_c = wf.trace(scene, cam, o, d, tm, ids, jnp.uint32(7),
                         differentiable=False, mega_mode="compact")
        rad_s = wf.trace(scene, cam, o, d, tm, ids, jnp.uint32(7),
                         differentiable=False, mega_mode="single")
    finally:
        mega.INTERPRET = False
    np.testing.assert_allclose(
        np.asarray(rad_c.rows()), np.asarray(rad_s.rows()),
        rtol=1e-4, atol=1e-5)


def test_mesh_stream_kernel_matches_frontier():
    """Leaf-stream (tilemask) mesh kernel vs the XLA frontier traversal.

    Shrinks the small-kernel cap so a ~3.7K-tri mesh builds stream
    tables (2 segments -> exercises the double-buffered DMA walk), then
    checks closest-hit and any-hit equivalence on mixed coherent/random
    rays with dead lanes."""
    from go_raytracing_tpu.geometry import mesh_bvh
    from go_raytracing_tpu.geometry.scene import Affine
    from go_raytracing_tpu.io import obj as obj_mod
    from go_raytracing_tpu.ops import pallas_mesh, pallas_mesh_stream
    from go_raytracing_tpu.core.vec3 import V3

    old_cap = pallas_mesh.MAX_KERNEL_TRIS
    pallas_mesh.MAX_KERNEL_TRIS = 512
    pallas_mesh_stream.INTERPRET = True
    try:
        verts, tris = obj_mod.lucy_standin(48, 40)   # 3,744 tris
        instances = []
        for i in range(3):
            xf = Affine.trs(scale=(0.8, 0.8, 0.8),
                            rotation_deg=(0, 30 * i, 0),
                            position=(i * 1.5 - 1.5, 0.0, -3.0))
            instances.append((xf.m, 0))
        proto = mesh_bvh.build_proto(verts, tris, instances)
        assert proto.s_n_seg == 2
        assert not pallas_mesh.kernel_ok(proto)
        assert pallas_mesh_stream.stream_ok(proto)

        rng = np.random.default_rng(3)
        n = pallas_mesh_stream.BLOCK  # one grid step
        o = np.stack([rng.uniform(-3, 3, n), rng.uniform(-1, 3, n),
                      np.full(n, 2.0)], axis=-1)
        targets = np.stack([
            rng.uniform(-2.5, 2.5, n), rng.uniform(-0.5, 1.5, n),
            np.full(n, -3.0),
        ], axis=-1)
        d = targets - o
        wild = rng.random(n) < 0.2
        d[wild] = rng.normal(size=(int(wild.sum()), 3))
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        o32 = jnp.asarray(o, jnp.float32)
        d32 = jnp.asarray(d, jnp.float32)
        tmax = jnp.full(n, 3.0e38, jnp.float32)
        tmax = tmax.at[::13].set(-1.0)   # dead lanes

        t_f, tri_f, inst_f, hit_f, _ = mesh_bvh.intersect_mesh(
            proto, o32, d32, 1e-3, tmax
        )
        t_k, tri_k, inst_k, hit_k, _ = (
            pallas_mesh_stream.intersect_mesh_stream(
                proto, V3.from_rows(o32), V3.from_rows(d32), 1e-3, tmax
            )
        )
        hit_f, hit_k = np.asarray(hit_f), np.asarray(hit_k)
        assert hit_f.sum() > 100
        assert (hit_f == hit_k).all()
        both = hit_f & hit_k
        np.testing.assert_allclose(
            np.asarray(t_k)[both], np.asarray(t_f)[both],
            rtol=2e-4, atol=2e-4,
        )
        assert (np.asarray(inst_k)[both] == np.asarray(inst_f)[both]).all()
        assert (np.asarray(tri_k)[both] == np.asarray(tri_f)[both]).all()

        _, _, _, ah_k, _ = pallas_mesh_stream.intersect_mesh_stream(
            proto, V3.from_rows(o32), V3.from_rows(d32), 1e-3, tmax,
            any_hit=True,
        )
        assert (np.asarray(ah_k) == hit_f).all()
    finally:
        pallas_mesh.MAX_KERNEL_TRIS = old_cap
        pallas_mesh_stream.INTERPRET = False


def test_mesh_stream_slot_grouping_matches_frontier():
    """tps > 1 (multiple tiles per cull slot, the >114K-tri regime) via a
    shrunken MAXT_INST: slot boxes group adjacent leaf-order tiles and
    phase B sweeps all of a set slot's tiles.  Kernel must still match
    the frontier exactly, with zero overflow."""
    from go_raytracing_tpu.geometry import mesh_bvh
    from go_raytracing_tpu.geometry.scene import Affine
    from go_raytracing_tpu.io import obj as obj_mod
    from go_raytracing_tpu.ops import pallas_mesh, pallas_mesh_stream
    from go_raytracing_tpu.core.vec3 import V3

    old_cap = pallas_mesh.MAX_KERNEL_TRIS
    old_maxt = pallas_mesh_stream.MAXT_INST
    old_ww = pallas_mesh_stream.W_WORDS
    pallas_mesh.MAX_KERNEL_TRIS = 512
    pallas_mesh_stream.MAXT_INST = 32
    pallas_mesh_stream.W_WORDS = 1
    pallas_mesh_stream.INTERPRET = True
    try:
        verts, tris = obj_mod.lucy_standin(64, 56)   # 6,930 tris, 55 tiles
        instances = []
        for i in range(2):
            xf = Affine.trs(scale=(0.8, 0.8, 0.8),
                            rotation_deg=(0, 45 * i, 0),
                            position=(i * 1.5 - 0.75, 0.0, -3.0))
            instances.append((xf.m, 0))
        proto = mesh_bvh.build_proto(verts, tris, instances)
        nt = proto.s_tri.shape[0]
        nslot = proto.s_tilebox.shape[0] * pallas_mesh_stream.SEG_TILES
        assert nt // nslot == 2   # tps = 2
        assert pallas_mesh_stream.stream_ok(proto)

        rng = np.random.default_rng(7)
        n = pallas_mesh_stream.BLOCK
        o = np.stack([rng.uniform(-3, 3, n), rng.uniform(-1, 3, n),
                      np.full(n, 2.0)], axis=-1)
        targets = np.stack([
            rng.uniform(-2.5, 2.5, n), rng.uniform(-0.5, 1.5, n),
            np.full(n, -3.0),
        ], axis=-1)
        d = targets - o
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        o32 = jnp.asarray(o, jnp.float32)
        d32 = jnp.asarray(d, jnp.float32)
        tmax = jnp.full(n, 3.0e38, jnp.float32)
        tmax = tmax.at[::11].set(-1.0)

        t_f, tri_f, inst_f, hit_f, _ = mesh_bvh.intersect_mesh(
            proto, o32, d32, 1e-3, tmax
        )
        t_k, tri_k, inst_k, hit_k, ovf = (
            pallas_mesh_stream.intersect_mesh_stream(
                proto, V3.from_rows(o32), V3.from_rows(d32), 1e-3, tmax
            )
        )
        assert int(ovf) == 0
        hit_f, hit_k = np.asarray(hit_f), np.asarray(hit_k)
        assert hit_f.sum() > 100
        assert (hit_f == hit_k).all()
        both = hit_f & hit_k
        np.testing.assert_allclose(
            np.asarray(t_k)[both], np.asarray(t_f)[both],
            rtol=2e-4, atol=2e-4,
        )
        assert (np.asarray(inst_k)[both] == np.asarray(inst_f)[both]).all()
        assert (np.asarray(tri_k)[both] == np.asarray(tri_f)[both]).all()
    finally:
        pallas_mesh.MAX_KERNEL_TRIS = old_cap
        pallas_mesh_stream.MAXT_INST = old_maxt
        pallas_mesh_stream.W_WORDS = old_ww
        pallas_mesh_stream.INTERPRET = False


def test_megakernel_hdri_nee_matches_standard_path():
    """HDRI-NEE scenes through the megakernel: the importance sample is
    precomputed XLA-side per (ray, bounce) and streamed into the kernel;
    the image must be IDENTICAL to the standard integrator (same RNG)."""
    from go_raytracing_tpu.ops import pallas_wavefront as mega

    rng = np.random.default_rng(5)
    data = 0.2 + rng.random((16, 32, 3)).astype(np.float32)
    data[4:7, 20:24] = 40.0   # hotspot drives importance sampling

    b = grt.SceneBuilder()
    b.set_environment(data, rotation_degrees=30.0)
    b.plane((0, 0, 0), (0, 1, 0), b.lambertian((0.6, 0.6, 0.6)))
    b.sphere((0, 1, -1), 0.8, b.lambertian((0.3, 0.5, 0.7)))
    b.sphere((-1.8, 0.8, 0), 0.7, b.metal((0.9, 0.8, 0.5), 0.1))
    light = b.diffuse_light((5, 5, 5))
    q = b.quad((-1, 4, -1), (2, 0, 0), (0, 0, 2), light)
    b.add_light(q)
    scene = b.build()
    assert scene.env is not None and scene.env_importance
    assert scene.n_lights > 0

    from go_raytracing_tpu.camera import Camera

    cam = Camera(
        image_width=16, aspect_ratio=1.0, samples_per_pixel=4, max_depth=4,
        look_from=(0, 2, 5), look_at=(0, 0.8, 0),
        vfov=45.0, use_sky_gradient=False,
    )
    mega.INTERPRET = True
    try:
        assert mega.applicable(scene)
        from go_raytracing_tpu.integrator import wavefront as wf

        assert wf.choose_mega_mode(scene, cam, 1 << 20, False) == "single"
        img_mega = np.asarray(grt.render_image(scene, cam, spp=4, seed=2))
    finally:
        mega.INTERPRET = False
    img_ref = np.asarray(grt.render_image(scene, cam, spp=4, seed=2))
    np.testing.assert_allclose(img_mega, img_ref, rtol=1e-3, atol=2e-3)


def test_megakernel_noise_texture_matches():
    """Perlin-marble scenes now run IN the megakernel (round 3: hashed
    lattice gradients are pure VPU math, no tables).  Image must match
    the standard integrator's gather-path noise evaluation."""
    from go_raytracing_tpu.ops import pallas_wavefront as mega

    b = grt.SceneBuilder()
    noise = b.lambertian(b.noise(2.5))
    b.plane((0, 0, 0), (0, 1, 0), noise)
    b.sphere((0, 1.2, 0), 1.2, b.lambertian(b.noise(0.9)))
    b.sphere((-2.2, 0.6, 1.0), 0.6, b.lambertian((0.8, 0.3, 0.2)))
    scene = b.build()
    assert scene.has_noise

    from go_raytracing_tpu.camera import Camera

    cam = Camera(
        image_width=20, aspect_ratio=1.0, samples_per_pixel=4, max_depth=4,
        look_from=(0, 2.2, 6), look_at=(0, 1.0, 0), vfov=40.0,
        use_sky_gradient=True,
    )
    mega.INTERPRET = True
    try:
        assert mega.applicable(scene)
        img_mega = np.asarray(grt.render_image(scene, cam, spp=4, seed=2))
    finally:
        mega.INTERPRET = False
    img_ref = np.asarray(grt.render_image(scene, cam, spp=4, seed=2))
    assert img_mega.std() > 0.02  # marble actually varies
    np.testing.assert_allclose(img_mega, img_ref, rtol=1e-3, atol=2e-3)


def test_megakernel_image_prefactor_matches():
    """'image' mode (deferred image albedo): the earth scene — the one
    image-texture config the kernel gate admits (single image-lambertian
    sphere, no lights, rt/scenes.go:242-273) — must match the gather
    integrator exactly: the factorization radiance == albedo(primary
    u,v) * radiance(albedo := 1) is algebraic, not approximate."""
    import dataclasses
    from go_raytracing_tpu.camera import generate_rays
    from go_raytracing_tpu.integrator import wavefront
    from go_raytracing_tpu.ops import pallas_wavefront as mega

    scene, cam = grt.load_scene("earth")
    cam = dataclasses.replace(cam, image_width=24, aspect_ratio=1.0,
                              samples_per_pixel=2, max_depth=6)
    r = 24 * 24 * 2
    ids = jnp.arange(r, dtype=jnp.uint32)
    px = ((ids % (24 * 24)) % 24).astype(jnp.int32)
    py = ((ids % (24 * 24)) // 24).astype(jnp.int32)
    o, d, tm = generate_rays(cam, px, py, ids, 0)

    mega.INTERPRET = True
    try:
        assert wavefront.choose_mega_mode(scene, cam, r, False) == "image"
        rad_img = wavefront.trace(scene, cam, o, d, tm, ids, 0,
                                  differentiable=False, mega_mode="image")
    finally:
        mega.INTERPRET = False
    rad_std = wavefront.trace(scene, cam, o, d, tm, ids, 0,
                              differentiable=False, mega_mode="off")
    np.testing.assert_allclose(np.asarray(rad_img.rows()),
                               np.asarray(rad_std.rows()),
                               rtol=1e-4, atol=1e-5)
