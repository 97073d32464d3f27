"""Intersection kernels vs scalar NumPy oracles implementing the
reference algorithms (rt/sphere.go:63-94, rt/quad.go:44-85,
rt/triangle.go:57-104, rt/plane.go:24-42, rt/circle.go:40-71)."""

import numpy as np
import jax.numpy as jnp

from go_raytracing_tpu.geometry import packs
from go_raytracing_tpu.geometry.scene import Affine, SceneBuilder


def _sphere_oracle(center, radius, o, d, tmin, tmax):
    """Returns (root_or_None, grazing_ratio); grazing_ratio ~ 0 means the
    ray is near-tangent (hit OR miss) and f32/f64 may legitimately
    disagree on it."""
    oc = center - o
    a = d @ d
    h = d @ oc
    c = oc @ oc - radius * radius
    disc = h * h - a * c
    grazing = abs(disc) / (h * h + abs(a * c) + 1e-12)
    if disc < 0:
        return None, grazing
    sq = np.sqrt(disc)
    for root in ((h - sq) / a, (h + sq) / a):
        if tmin < root < tmax:
            return root, grazing
    return None, grazing


def test_sphere_intersection_oracle():
    r = np.random.default_rng(0)
    centers = r.normal(size=(20, 3)) * 3
    radii = r.uniform(0.3, 1.5, 20)
    o = r.normal(size=(200, 3)) * 5
    d = r.normal(size=(200, 3))

    b = SceneBuilder()
    m = b.lambertian((1, 1, 1))
    for c, rad in zip(centers, radii):
        b.sphere(c, rad, m)
    scene = b.build()

    t, idx, hit = packs.intersect_spheres(
        scene.spheres,
        jnp.asarray(o, jnp.float32),
        jnp.asarray(d, jnp.float32),
        jnp.zeros(200, jnp.float32),
        1e-3,
        jnp.full(200, 1e9, jnp.float32),
    )
    t, idx, hit = np.asarray(t), np.asarray(idx), np.asarray(hit)

    checked = 0
    for i in range(200):
        best, best_j, runner, min_graze = np.inf, -1, np.inf, np.inf
        for j in range(20):
            root, graze = _sphere_oracle(centers[j], radii[j], o[i], d[i], 1e-3, 1e9)
            min_graze = min(min_graze, graze)
            if root is not None:
                if root < best:
                    runner, best, best_j = best, root, j
                elif root < runner:
                    runner = root
        # Skip rays where f32 may legitimately differ from the f64 oracle:
        # tangent hits or two primitives at nearly equal t.
        if min_graze < 1e-4 or (np.isfinite(runner) and runner - best < 1e-3 * best):
            continue
        checked += 1
        assert hit[i] == (best_j >= 0)
        if best_j >= 0:
            assert idx[i] == best_j
            np.testing.assert_allclose(t[i], best, rtol=2e-3, atol=1e-4)
    assert checked > 150  # the skip filter must not eat the test


def test_moving_sphere_uses_ray_time():
    b = SceneBuilder()
    m = b.lambertian((1, 1, 1))
    b.moving_sphere((0, 0, -5), (4, 0, -5), 1.0, m)
    scene = b.build()
    o = jnp.zeros((2, 3), jnp.float32)
    d = jnp.asarray([[0, 0, -1], [0, 0, -1]], jnp.float32)
    tm = jnp.asarray([0.0, 1.0], jnp.float32)
    t, idx, hit = packs.intersect_spheres(
        scene.spheres, o, d, tm, 1e-3, jnp.full(2, 1e9, jnp.float32)
    )
    assert bool(hit[0]) and not bool(hit[1])  # at t=1 the sphere moved away
    np.testing.assert_allclose(t[0], 4.0, atol=1e-4)


def test_quad_tri_circle_plane_oracle():
    b = SceneBuilder()
    m = b.lambertian((1, 1, 1))
    b.quad((-1, -1, -3), (2, 0, 0), (0, 2, 0), m)          # z=-3 square
    b.triangle((-1, -1, -5), (1, -1, -5), (0, 1, -5), m)   # z=-5 triangle
    b.circle((0, 0, -7), (0, 0, 1), 0.5, m)                # z=-7 disk
    b.plane((0, -2, 0), (0, 1, 0), m)                      # y=-2 floor
    scene = b.build()

    cases = [
        # (origin, dir, expected_t, expected_idx)
        ((0, 0, 0), (0, 0, -1), 3.0, 0),        # hits quad first
        ((0.9, 0.9, 0), (0, 0, -1), 3.0, 0),    # quad corner interior
        ((1.5, 0, 0), (0, 0, -1), None, None),  # outside quad/tri/circle; parallel to plane
        ((0.0, -0.5, -4), (0, 0, -1), 1.0, 1),  # past the quad, hits the triangle
        ((0, 0.5, 0), (0, 0, -1), 3.0, 0),
        ((0, -0.5, 0), (0.0, 0, -1), 3.0, 0),
        ((3, 0, 0), (0, 0, -1), None, None),    # misses all verticals, no floor hit (parallel)
        ((0, 0, 1), (0, -1, 0), 2.0, 3),        # straight down to plane (y: 0 -> -2)
        ((0.1, 0.1, 0), (0, 0, -1), 3.0, 0),
    ]
    o = jnp.asarray([c[0] for c in cases], jnp.float32)
    d = jnp.asarray([c[1] for c in cases], jnp.float32)
    t, idx, hit = packs.intersect_planar(
        scene.planar, o, d, 1e-3, jnp.full(len(cases), 1e9, jnp.float32)
    )
    for i, (_, _, et, ei) in enumerate(cases):
        if et is None:
            assert not bool(hit[i])
        else:
            assert bool(hit[i])
            assert int(idx[i]) == ei
            np.testing.assert_allclose(float(t[i]), et, atol=1e-4)

    # circle: hit inside radius, miss outside (origins past the quad/tri)
    o2 = jnp.asarray([[0.2, 0.0, -6.0], [0.7, 0.0, -6.0]], jnp.float32)
    d2 = jnp.asarray([[0, 0, -1], [0, 0, -1]], jnp.float32)
    t2, idx2, hit2 = packs.intersect_planar(
        scene.planar, o2, d2, 1e-3, jnp.full(2, 1e9, jnp.float32)
    )
    assert bool(hit2[0]) and int(idx2[0]) == 2 and abs(float(t2[0]) - 1.0) < 1e-4
    assert not bool(hit2[1])


def test_triangle_barycentric_uv():
    b = SceneBuilder()
    m = b.lambertian((1, 1, 1))
    b.triangle((0, 0, -2), (1, 0, -2), (0, 1, -2), m)
    scene = b.build()
    o = jnp.asarray([[0.25, 0.25, 0.0]], jnp.float32)
    d = jnp.asarray([[0.0, 0.0, -1.0]], jnp.float32)
    t, idx, hit = packs.intersect_planar(scene.planar, o, d, 1e-3, jnp.full(1, 1e9, jnp.float32))
    assert bool(hit[0])
    p, n, front, uu, vv, mat = packs.planar_hit_record(scene.planar, idx, o, d, t)
    np.testing.assert_allclose(float(uu[0]), 0.25, atol=1e-5)
    np.testing.assert_allclose(float(vv[0]), 0.25, atol=1e-5)


def test_sphere_uv_poles_and_equator():
    b = SceneBuilder()
    m = b.lambertian((1, 1, 1))
    b.sphere((0, 0, 0), 1.0, m)
    scene = b.build()
    # Ray hitting +x point of the sphere: outward normal (1,0,0) ->
    # theta=acos(0)=pi/2 -> v=0.5; phi=atan2(0,1)+pi=pi -> u=0.5
    o = jnp.asarray([[3.0, 0.0, 0.0]], jnp.float32)
    d = jnp.asarray([[-1.0, 0.0, 0.0]], jnp.float32)
    t, idx, hit = packs.intersect_spheres(
        scene.spheres, o, d, jnp.zeros(1), 1e-3, jnp.full(1, 1e9, jnp.float32)
    )
    p, n, front, uu, vv, mat = packs.sphere_hit_record(
        scene.spheres, idx, o, d, jnp.zeros(1), t
    )
    np.testing.assert_allclose(float(uu[0]), 0.5, atol=1e-5)
    np.testing.assert_allclose(float(vv[0]), 0.5, atol=1e-5)
    assert bool(front[0])
    np.testing.assert_allclose(np.asarray(n)[0], [1, 0, 0], atol=1e-5)


def test_volume_deterministic_limits():
    # Huge density -> scatters essentially at entry; tiny density -> passes.
    b = SceneBuilder()
    b.volume_box((-1, -1, -3), (1, 1, -1), 1e6, (1, 1, 1))
    scene = b.build()
    o = jnp.zeros((1, 3), jnp.float32)
    d = jnp.asarray([[0, 0, -1]], jnp.float32)
    u = jnp.full((1, 1), 0.5, jnp.float32)
    t, idx, hit = packs.sample_volumes(
        scene.volumes, o, d, 1e-3, jnp.full(1, 1e9, jnp.float32), u
    )
    assert bool(hit[0])
    np.testing.assert_allclose(float(t[0]), 1.0, atol=1e-3)

    b2 = SceneBuilder()
    b2.volume_box((-1, -1, -3), (1, 1, -1), 1e-6, (1, 1, 1))
    scene2 = b2.build()
    _, _, hit2 = packs.sample_volumes(
        scene2.volumes, o, d, 1e-3, jnp.full(1, 1e9, jnp.float32), u
    )
    assert not bool(hit2[0])


def test_volume_rotated_box():
    # A box rotated 45 deg about Y still bounds the medium correctly.
    xf = Affine.trs(rotation_deg=(0, 45, 0), position=(0, 0, -5))
    b = SceneBuilder()
    b.volume_box((-1, -1, -1), (1, 1, 1), 1e6, (1, 1, 1))
    # Manually apply transform via builder path:
    b2 = SceneBuilder()
    b2.volume_box((-1, -1, -1), (1, 1, 1), 1e6, (1, 1, 1), xf)
    scene = b2.build()
    o = jnp.zeros((2, 3), jnp.float32)
    d = jnp.asarray([[0, 0, -1], [1, 0, 0]], jnp.float32)
    u = jnp.full((2, 1), 0.5, jnp.float32)
    t, idx, hit = packs.sample_volumes(
        scene.volumes, o, d, 1e-3, jnp.full(2, 1e9, jnp.float32), u
    )
    # Along -z the rotated cube's near corner is at z = -5 + sqrt(2)
    assert bool(hit[0])
    np.testing.assert_allclose(float(t[0]), 5.0 - np.sqrt(2.0), atol=1e-3)
    assert not bool(hit[1])  # +x ray never reaches the box


def test_transform_order_matches_reference():
    # Scale -> rotate Y -> translate (rt/transform.go:24-46)
    xf = Affine.trs(scale=(2, 2, 2), rotation_deg=(0, 90, 0), position=(10, 0, 0))
    p = xf.apply_point((1, 0, 0))
    # scale -> (2,0,0); rotY 90 -> (0,0,-2); translate -> (10,0,-2)
    np.testing.assert_allclose(p, [10, 0, -2], atol=1e-9)


def test_sphere_volume_interval_analytic():
    """VOL_SPHERE boundary: entry/exit are the unit-sphere quadratic
    roots through the baked affine (center/radius folded in)."""
    import go_raytracing_tpu as grt
    from go_raytracing_tpu.geometry import packs

    b = grt.SceneBuilder()
    b.volume_sphere((0.0, 0.0, -5.0), 2.0, 0.5, (0.9, 0.9, 0.9))
    scene = b.build()
    pack = scene.volumes
    assert int(pack.kind[0]) == packs.VOL_SPHERE

    o = jnp.asarray([[0.0, 0.0, 0.0], [0.0, 4.0, -5.0], [10.0, 10.0, 10.0]],
                    jnp.float32)
    d = jnp.asarray([[0.0, 0.0, -1.0], [0.0, -1.0, 0.0], [1.0, 0.0, 0.0]],
                    jnp.float32)
    # u chosen so the free flight fits well inside (-1/rho * log u small)
    u = jnp.full((3, 1), 0.9, jnp.float32)
    t_vol, idx, hit = packs.sample_volumes(
        pack, o, d, 1e-3, jnp.full((3,), 1e30, jnp.float32), u
    )
    t_vol = np.asarray(t_vol)
    hit = np.asarray(hit)
    # ray 0: enters at z=-3 -> t0=3; scatter at t0 + (-1/0.5)*ln(0.9)
    expect0 = 3.0 + (-1.0 / 0.5) * np.log(0.9)
    assert hit[0] and abs(t_vol[0] - expect0) < 1e-4
    # ray 1: from above, enters at y=2 -> t0=2
    expect1 = 2.0 + (-1.0 / 0.5) * np.log(0.9)
    assert hit[1] and abs(t_vol[1] - expect1) < 1e-4
    # ray 2: never crosses the sphere
    assert not hit[2]


def test_sphere_volume_soa_matches_rows_oracle():
    """wavefront._sample_volumes (component SoA) must equal
    packs.sample_volumes (rows oracle) for mixed box+sphere packs."""
    import go_raytracing_tpu as grt
    from go_raytracing_tpu.core.vec3 import V3
    from go_raytracing_tpu.geometry import packs
    from go_raytracing_tpu.integrator import wavefront

    b = grt.SceneBuilder()
    b.volume_box((-1, 0, -4), (1, 2, -2), 0.8, (0.5, 0.5, 0.5))
    b.volume_sphere((2.0, 1.0, -3.0), 1.5, 0.4, (0.9, 0.9, 0.9))
    scene = b.build()

    rng = np.random.default_rng(11)
    n = 512
    o = rng.uniform(-4, 4, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    u = rng.random((n, 2)).astype(np.float32)
    t_surf = jnp.full((n,), 8.0, jnp.float32)

    t_r, i_r, h_r = packs.sample_volumes(
        scene.volumes, jnp.asarray(o), jnp.asarray(d), 1e-3, t_surf,
        jnp.asarray(u))
    t_s, i_s, h_s = wavefront._sample_volumes(
        scene.volumes, V3.from_rows(jnp.asarray(o)),
        V3.from_rows(jnp.asarray(d)), 1e-3, t_surf, jnp.asarray(u))
    np.testing.assert_array_equal(np.asarray(h_r), np.asarray(h_s))
    both = np.asarray(h_r)
    np.testing.assert_allclose(np.asarray(t_s)[both], np.asarray(t_r)[both],
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(i_r)[both],
                                  np.asarray(i_s)[both])


def test_volume_convex_box_matches_volume_box():
    """A box expressed as 6 half-spaces (VOL_PLANES) must produce the
    IDENTICAL free-flight interval as the native slab box: same uniforms
    -> same scatter t on every ray (the convex-polyhedron boundary is
    the general case of rt/volume.go:34's any-Hittable wrap)."""
    a, c = (-1.0, -1.0, -3.0), (1.0, 1.0, -1.0)
    b1 = SceneBuilder()
    b1.volume_box(a, c, 0.7, (1, 1, 1))
    s1 = b1.build()

    b2 = SceneBuilder()
    planes = [((1, 0, 0), c[0]), ((-1, 0, 0), -a[0]),
              ((0, 1, 0), c[1]), ((0, -1, 0), -a[1]),
              ((0, 0, 1), c[2]), ((0, 0, -1), -a[2])]
    b2.volume_convex(planes, 0.7, (1, 1, 1))
    s2 = b2.build()

    rng = np.random.default_rng(5)
    r = 256
    o = jnp.asarray(rng.uniform(-2, 2, (r, 3)).astype(np.float32))
    o = o.at[:, 2].set(2.0)
    d = jnp.asarray(rng.normal(size=(r, 3)).astype(np.float32))
    d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
    u = jnp.asarray(rng.uniform(1e-3, 1, (r, 1)).astype(np.float32))
    tmax = jnp.full((r,), 1e9, jnp.float32)

    t1, _, h1 = packs.sample_volumes(s1.volumes, o, d, 1e-3, tmax, u)
    t2, _, h2 = packs.sample_volumes(s2.volumes, o, d, 1e-3, tmax, u)
    assert bool(jnp.any(h1)), "no ray interacted; test geometry broken"
    np.testing.assert_array_equal(np.asarray(h1), np.asarray(h2))
    np.testing.assert_allclose(np.asarray(t1)[np.asarray(h1)],
                               np.asarray(t2)[np.asarray(h1)],
                               rtol=1e-5, atol=1e-5)


def test_volume_pyramid_medium():
    """Pyramid-bounded medium: rays through the apex region traverse a
    shorter interval than through the base (so with near-infinite
    density both scatter, with matching entry semantics), and rays
    missing the pyramid never scatter."""
    b = SceneBuilder()
    b.volume_pyramid((0, 0, -2), 2.0, 2.0, 1e6, (1, 1, 1))
    scene = b.build()

    o = jnp.asarray([[0.0, 0.5, 2.0],     # through mid pyramid
                     [0.0, 1.9, 2.0],     # just under apex
                     [0.0, 2.5, 2.0],     # above apex: miss
                     [1.5, 0.5, 2.0]],    # off to the side: miss
                    jnp.float32)
    d = jnp.asarray([[0.0, 0.0, -1.0]] * 4, jnp.float32)
    u = jnp.full((4, 1), 0.5, jnp.float32)
    t, _, hit = packs.sample_volumes(scene.volumes, o, d, 1e-3,
                                     jnp.full((4,), 1e9, jnp.float32), u)
    hit = np.asarray(hit)
    assert hit.tolist() == [True, True, False, False]
    # entry points: |x|,|z-(-2)| within the slab at that height
    tt = np.asarray(t)
    assert 2.0 < tt[0] < 4.0
