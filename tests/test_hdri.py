"""HDRI environment: mapping, CDF build, importance sampling, RGBE I/O."""

import numpy as np
import jax.numpy as jnp

from go_raytracing_tpu.lights import hdri
from go_raytracing_tpu.io import hdr as hdr_io


def _toy_env(h=16, w=32, hotspot=True):
    data = np.full((h, w, 3), 0.1, np.float32)
    if hotspot:
        data[4, 10] = (500.0, 400.0, 300.0)  # bright pixel (~90% of power)
    return hdri.build_environment(data)


def test_uv_direction_roundtrip():
    env = _toy_env()
    rng = np.random.default_rng(0)
    d = rng.normal(size=(256, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    u, v = hdri.direction_to_uv(env, jnp.asarray(d))
    back = np.asarray(hdri.uv_to_direction(env, u, v))
    np.testing.assert_allclose(back, d, atol=1e-3)


def test_rotation_shifts_u():
    data = np.full((8, 16, 3), 1.0, np.float32)
    env0 = hdri.build_environment(data, 0.0)
    env90 = hdri.build_environment(data, 90.0)
    d = jnp.asarray([[1.0, 0.0, 0.0]])
    u0, _ = hdri.direction_to_uv(env0, d)
    u90, _ = hdri.direction_to_uv(env90, d)
    np.testing.assert_allclose((float(u90[0]) - float(u0[0])) % 1.0, 0.25, atol=1e-6)


def test_pdf_integrates_to_one():
    """Sum over pixels of pdf_solid_angle * pixel_solid_angle == 1."""
    env = _toy_env()
    h, w = 16, 32
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    u = (xs.ravel() + 0.5) / w
    v = (ys.ravel() + 0.5) / h
    d = np.asarray(hdri.uv_to_direction(env, jnp.asarray(u, jnp.float32), jnp.asarray(v, jnp.float32)))
    p = np.asarray(hdri.pdf(env, jnp.asarray(d)))
    theta = (0.5 - v) * np.pi
    d_omega = (2 * np.pi / w) * (np.pi / h) * np.cos(theta)
    np.testing.assert_allclose((p * d_omega).sum(), 1.0, rtol=0.02)


def test_importance_sampling_prefers_hotspot():
    env = _toy_env()
    n = 20000
    rng = np.random.default_rng(1)
    xi1 = jnp.asarray(rng.random(n), jnp.float32)
    xi2 = jnp.asarray(rng.random(n), jnp.float32)
    d, emission, p = hdri.sample_direction(env, xi1, xi2)
    emission = np.asarray(emission)
    # the single hot pixel carries most of the power -> most samples land on it
    frac_hot = (emission[:, 0] > 10).mean()
    assert frac_hot > 0.5
    # Monte Carlo estimate of the environment integral sum(L/pdf)/N per
    # channel should match the analytic integral of L over the sphere.
    est = (emission / np.asarray(p)[:, None]).mean(axis=0)
    h, w = 16, 32
    ys = np.arange(h)
    v = (ys + 0.5) / h
    d_omega = (2 * np.pi / w) * (np.pi / h) * np.cos((0.5 - v) * np.pi)
    data = np.asarray(env.data)
    ref = (data * d_omega[:, None, None]).sum(axis=(0, 1))
    np.testing.assert_allclose(est, ref, rtol=0.05)


def test_search_cdf_matches_reference_semantics():
    cdf = jnp.asarray([0.0, 0.1, 0.1, 0.5, 1.0], jnp.float32)  # n = 4
    xi = jnp.asarray([0.0, 0.05, 0.1, 0.3, 0.5, 0.99, 1.0], jnp.float32)
    got = np.asarray(hdri._search_cdf_1d(cdf, xi, 4))
    # smallest i with cdf[i+1] > xi (rt/hdri.go:300-322); clamped
    want = [0, 0, 2, 2, 3, 3, 3]
    np.testing.assert_array_equal(got, want)


def test_bilinear_sample_wraps_horizontally():
    data = np.zeros((4, 8, 3), np.float32)
    data[:, 0] = 1.0
    env = hdri.build_environment(data)
    # direction mapping to u ~ 0 (x axis negative: phi=pi -> u=1 -> wraps to 0)
    d = jnp.asarray([[-1.0, 0.0, 0.0]])
    c = np.asarray(hdri.sample(env, d))[0]
    assert c[0] > 0.4  # near the bright wrapped column


def test_sample_soa_matches_aos_oracle():
    """The quad-table single-gather miss shader (sample_soa) must match
    the 4-fetch AoS bilinear oracle everywhere, including the pole rows
    (vertical clamp) and the horizontal wrap seam."""
    from go_raytracing_tpu.core.vec3 import V3

    rng = np.random.default_rng(3)
    data = rng.uniform(0.0, 5.0, (6, 10, 3)).astype(np.float32)
    env = hdri.build_environment(data, rotation_degrees=33.0)
    d = rng.normal(size=(512, 3)).astype(np.float32)
    # Force pole and seam coverage.
    d[:64, 0] *= 0.01
    d[:64, 2] *= 0.01
    d[64:128, 1] *= 0.01
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    want = np.asarray(hdri.sample(env, jnp.asarray(d)))
    got = hdri.sample_soa(env, V3(*[jnp.asarray(d[:, i]) for i in range(3)]))
    got = np.stack([np.asarray(got.x), np.asarray(got.y), np.asarray(got.z)], axis=1)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_rgbe_roundtrip(tmp_path):
    """Write a minimal uncompressed .hdr and read it back."""
    h, w = 3, 5
    rng = np.random.default_rng(2)
    # Build RGBE bytes directly
    rgbe = rng.integers(0, 255, size=(h, w, 4), dtype=np.uint8)
    rgbe[..., 3] = rng.integers(120, 140, size=(h, w))
    path = str(tmp_path / "t.hdr")
    with open(path, "wb") as f:
        f.write(b"#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n")
        f.write(f"-Y {h} +X {w}\n".encode())
        f.write(rgbe.tobytes())
    img = hdr_io.load_hdr(path)
    e = rgbe[..., 3].astype(np.int32)
    want = (rgbe[..., :3] + 0.5) * np.ldexp(1.0, e - 136)[..., None]
    want[e == 0] = 0
    np.testing.assert_allclose(img, want.astype(np.float32), rtol=1e-6)


def test_real_hdri_asset_loads():
    import os

    path = "/root/reference/assets/hdri/abandoned_hall_01_1k.hdr"
    if not os.path.isfile(path):
        import pytest

        pytest.skip("reference asset unavailable")
    img = hdr_io.load_hdr(path)
    assert img.shape == (512, 1024, 3)
    assert np.isfinite(img).all() and img.max() > 1.0  # HDR range


def test_miss_texel_grad_matches_autodiff():
    """The sorted segment-sum env texel gradient (hdri.miss_texel_grad)
    == jax.grad through sample_soa's bilinear gather, on a hot-spot env
    exercising wrap/clamp edges and heavy texel duplication."""
    import jax
    from go_raytracing_tpu.core.vec3 import V3

    r = np.random.default_rng(1)
    data = r.uniform(0.0, 1.0, size=(24, 48, 3)).astype(np.float32)
    data[4, 7] = 900.0  # hot texel: big/small segment contrast
    env = hdri.build_environment(data, rotation_degrees=30.0)

    n = 4096
    d = r.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d[:512, 1] = np.abs(d[:512, 1]) * 40.0  # crowd the top edge (clamp)
    lam_rows = (r.uniform(-1, 1, size=(n, 3)) *
                (r.uniform(size=(n, 1)) < 0.7)).astype(np.float32)
    dv = V3.from_rows(jnp.asarray(d))
    lam = V3.from_rows(jnp.asarray(lam_rows))

    def loss(env_data):
        col = hdri.sample_soa(env._replace(data=env_data), dv)
        return jnp.sum(lam.x * col.x + lam.y * col.y + lam.z * col.z)

    want = np.asarray(jax.grad(loss)(env.data))
    got = np.asarray(hdri.miss_texel_grad(env, dv, lam))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)
