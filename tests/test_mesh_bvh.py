"""Mesh BVH: traversal result == brute-force triangle intersection."""

import numpy as np
import jax.numpy as jnp

import go_raytracing_tpu as grt
from go_raytracing_tpu.geometry import mesh_bvh
from go_raytracing_tpu.geometry.scene import Affine
from go_raytracing_tpu.io import obj as obj_mod


def _brute_force(verts, tris, w2l, o, d, tmin, tmax):
    """f64 oracle: closest Moller-Trumbore hit over all instances."""
    best_t = np.full(len(o), np.inf)
    best_tri = np.full(len(o), -1)
    best_inst = np.full(len(o), -1)
    for ii, m in enumerate(w2l):
        ol = (m[:3, :3] @ o.T).T + m[:3, 3]
        dl = (m[:3, :3] @ d.T).T
        for ti, t in enumerate(tris):
            v0, v1, v2 = verts[t[0]], verts[t[1]], verts[t[2]]
            e1, e2 = v1 - v0, v2 - v0
            h = np.cross(dl, e2)
            a = np.sum(e1 * h, axis=-1)
            ok = np.abs(a) >= 1e-8
            f = 1.0 / np.where(ok, a, 1.0)
            s = ol - v0
            u = f * np.sum(s * h, axis=-1)
            q = np.cross(s, e1)
            v = f * np.sum(dl * q, axis=-1)
            tc = f * np.sum(e2 * q, axis=-1)
            ok &= (u >= 0) & (u <= 1) & (v >= 0) & (u + v <= 1)
            ok &= (tc >= tmin) & (tc <= np.minimum(tmax, best_t))
            upd = ok & (tc < best_t)
            best_t = np.where(upd, tc, best_t)
            best_tri = np.where(upd, ti, best_tri)
            best_inst = np.where(upd, ii, best_inst)
    return best_t, best_tri, best_inst


def _mesh_scene(n_inst=2, segments=10, rings=8):
    verts, tris = obj_mod.lucy_standin(segments, rings)
    instances = []
    for i in range(n_inst):
        xf = Affine.trs(
            scale=(0.001, 0.001, 0.001),
            rotation_deg=(0, 45 * i, 0),
            position=(i * 2.0 - 1.0, -0.8, -3.0),
        )
        instances.append((xf.m, 0))
    proto = mesh_bvh.build_proto(verts, tris, instances)
    return verts, tris, instances, proto


def test_mesh_traversal_matches_brute_force():
    verts, tris, instances, proto = _mesh_scene()
    rng = np.random.default_rng(0)
    n = 300
    o = np.zeros((n, 3))
    o[:, 2] = 2.0
    o[:, :2] += rng.normal(size=(n, 2)) * 0.3
    # aim at the (small) instances: world boxes around (+-1, -0.8..0.8, -3)
    targets = np.stack([
        rng.uniform(-1.5, 1.5, n), rng.uniform(-0.8, 0.9, n),
        np.full(n, -3.0),
    ], axis=-1)
    d = targets - o

    t, tri, inst, hit, ovf = mesh_bvh.intersect_mesh(
        proto,
        jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32),
        1e-3, jnp.full(n, 1e9, jnp.float32),
    )
    assert int(ovf) == 0
    t, tri, inst, hit = map(np.asarray, (t, tri, inst, hit))

    w2l = [np.linalg.inv(m) for m, _ in instances]
    bt, btri, binst = _brute_force(verts, tris, w2l, o, d, 1e-3, 1e9)

    want_hit = np.isfinite(bt)
    assert want_hit.sum() > 30  # scene actually exercised
    # f32 vs f64 disagreement only near silhouettes; demand 98% agreement
    agree = hit == want_hit
    assert agree.mean() > 0.98
    both = hit & want_hit & agree
    np.testing.assert_allclose(t[both], bt[both], rtol=1e-3, atol=1e-3)
    # instance attribution matches where t matches
    assert (inst[both] == binst[both]).mean() > 0.98


def test_mesh_respects_tmax():
    # single instance sits at world x = -1 (see _mesh_scene)
    _, _, _, proto = _mesh_scene(n_inst=1)
    o = jnp.asarray([[-1.0, -0.5, 2.0]], jnp.float32)
    d = jnp.asarray([[0.0, 0.1, -1.0]], jnp.float32)  # y ~ 0 at the statue
    t1, _, _, hit1, _ = mesh_bvh.intersect_mesh(
        proto, o, d, 1e-3, jnp.full(1, 1e9, jnp.float32)
    )
    assert bool(hit1[0])
    # shrink t_max below the hit -> miss
    t2, _, _, hit2, _ = mesh_bvh.intersect_mesh(
        proto, o, d, 1e-3, jnp.asarray([float(t1[0]) * 0.5], jnp.float32)
    )
    assert not bool(hit2[0])


def test_mesh_hit_record_normals():
    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float64)
    tris = np.array([[0, 1, 2]])
    xf = Affine.trs(position=(0, 0, -2))
    proto = mesh_bvh.build_proto(verts, tris, [(xf.m, 3)])
    o = jnp.asarray([[0.2, 0.2, 1.0]], jnp.float32)
    d = jnp.asarray([[0.0, 0.0, -1.0]], jnp.float32)
    t, tri, inst, hit, _ = mesh_bvh.intersect_mesh(
        proto, o, d, 1e-3, jnp.full(1, 1e9, jnp.float32)
    )
    assert bool(hit[0]) and abs(float(t[0]) - 3.0) < 1e-5
    p, nrm, front, uu, vv, mat = mesh_bvh.mesh_hit_record(proto, tri, inst, o, d, t)
    np.testing.assert_allclose(np.asarray(nrm)[0], [0, 0, 1], atol=1e-6)
    assert bool(front[0]) and int(mat[0]) == 3
    np.testing.assert_allclose(float(uu[0]), 0.2, atol=1e-5)
    np.testing.assert_allclose(float(vv[0]), 0.2, atol=1e-5)


def test_lucy_scene_renders():
    import dataclasses

    scene, cam = grt.load_scene("cornell-lucy")
    assert len(scene.meshes) == 1
    assert scene.meshes[0].n_instances == 10
    cam = dataclasses.replace(cam, image_width=16, samples_per_pixel=2, max_depth=3)
    img = np.asarray(grt.render_image(scene, cam, spp=2))
    assert np.isfinite(img).all()
    assert img.mean() > 0.005


def test_frontier_overflow_surfaced():
    """Dropped frontier pairs must be *observable*: with a tiny capacity
    the overflow count is nonzero (and hits may be missed); with the
    default MESH_CAP_FACTOR it is exactly 0 on the same rays."""
    from go_raytracing_tpu.integrator import wavefront
    from go_raytracing_tpu.core.vec3 import V3

    verts, tris, instances, proto = _mesh_scene(n_inst=4)
    n = 256
    rng = np.random.default_rng(1)
    o = np.zeros((n, 3), np.float32)
    o[:, 2] = 2.0
    # Aim every ray at instance 0's center (with jitter) so the frontier
    # holds many live (ray, node) pairs per level.
    target = np.array([-1.0, 0.0, -3.0], np.float32)
    d = (target[None, :] - o + 0.1 * rng.normal(size=(n, 3))).astype(np.float32)
    o_v = V3.from_rows(jnp.asarray(o))
    d_v = V3.from_rows(jnp.asarray(d))
    t_max = jnp.full((n,), 3e38, jnp.float32)

    _, _, _, _, ovf_default = wavefront._mesh_intersect(
        proto, o_v, d_v, 1e-3, t_max
    )
    assert int(ovf_default) == 0

    old = wavefront.MESH_CAP_FACTOR
    try:
        wavefront.MESH_CAP_FACTOR = 1  # far below instances * levels
        _, _, _, _, ovf_tiny = wavefront._mesh_intersect(
            proto, o_v, d_v, 1e-3, t_max
        )
    finally:
        wavefront.MESH_CAP_FACTOR = old
    assert int(ovf_tiny) > 0


def test_render_stats_overflow_zero():
    """End-to-end: a normal mesh render reports mesh_overflow == 0."""
    import dataclasses
    from go_raytracing_tpu.render.renderer import RenderStats

    scene, cam = grt.load_scene("cornell-lucy")
    cam = dataclasses.replace(cam, image_width=8, samples_per_pixel=1,
                              max_depth=2)
    stats = RenderStats()
    img = np.asarray(grt.render(scene, cam, spp=1, stats=stats))
    assert np.isfinite(img).all()
    assert stats.mesh_overflow == 0
    assert stats.chunks >= 1
