"""Unit tests for the math core, RNG, and film vs NumPy oracles."""

import numpy as np
import jax.numpy as jnp

from go_raytracing_tpu.core import vec, rng, film


def test_reflect_matches_oracle():
    r = np.random.default_rng(0)
    v = r.normal(size=(64, 3)).astype(np.float32)
    n = r.normal(size=(64, 3)).astype(np.float32)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    got = np.asarray(vec.reflect(jnp.asarray(v), jnp.asarray(n)))
    want = v - 2.0 * np.sum(v * n, -1, keepdims=True) * n
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_refract_matches_oracle():
    r = np.random.default_rng(1)
    uv = r.normal(size=(64, 3))
    uv /= np.linalg.norm(uv, axis=-1, keepdims=True)
    n = -uv + 0.3 * r.normal(size=(64, 3))
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    ratio = 1.0 / 1.5
    got = np.asarray(vec.refract(jnp.asarray(uv, jnp.float32), jnp.asarray(n, jnp.float32), ratio))
    cos = np.minimum(np.sum(-uv * n, -1, keepdims=True), 1.0)
    perp = ratio * (uv + cos * n)
    par = -np.sqrt(np.abs(1.0 - np.sum(perp * perp, -1, keepdims=True))) * n
    np.testing.assert_allclose(got, perp + par, rtol=1e-4, atol=1e-5)


def test_refraction_preserves_snell():
    # sin(theta_out) = ratio * sin(theta_in) for unit inputs
    uv = jnp.asarray([[0.6, -0.8, 0.0]], jnp.float32)
    n = jnp.asarray([[0.0, 1.0, 0.0]], jnp.float32)
    out = np.asarray(vec.refract(uv, n, 1.0 / 1.5))[0]
    sin_in = 0.6
    sin_out = abs(out[0]) / np.linalg.norm(out)
    np.testing.assert_allclose(sin_out, sin_in / 1.5, rtol=1e-5)


def test_rng_deterministic_and_uniform():
    s = jnp.arange(20000, dtype=jnp.uint32)
    a1 = np.asarray(rng.uniform(1, s, 0, rng.SCATTER_U))
    a2 = np.asarray(rng.uniform(1, s, 0, rng.SCATTER_U))
    np.testing.assert_array_equal(a1, a2)
    assert 0.0 <= a1.min() and a1.max() < 1.0
    assert abs(a1.mean() - 0.5) < 0.01
    # distinct purposes/bounces/seeds decorrelate
    b = np.asarray(rng.uniform(1, s, 0, rng.FRESNEL))
    c = np.asarray(rng.uniform(1, s, 1, rng.SCATTER_U))
    d = np.asarray(rng.uniform(2, s, 0, rng.SCATTER_U))
    for other in (b, c, d):
        assert abs(np.corrcoef(a1, other)[0, 1]) < 0.02


def test_unit_vector_distribution():
    s = jnp.arange(50000, dtype=jnp.uint32)
    v = np.asarray(rng.random_unit_vector(3, s, 0))
    np.testing.assert_allclose(np.linalg.norm(v, axis=-1), 1.0, atol=1e-5)
    assert np.abs(v.mean(axis=0)).max() < 0.02  # uniform on sphere
    # z-component uniform in [-1, 1]
    hist, _ = np.histogram(v[:, 2], bins=10, range=(-1, 1))
    assert hist.std() / hist.mean() < 0.05


def test_disk_distribution():
    s = jnp.arange(50000, dtype=jnp.uint32)
    u1, u2 = rng.uniform2(5, s, 0, rng.DEFOCUS_R)
    x, y = rng.in_unit_disk_from_uniforms(u1, u2)
    r2 = np.asarray(x) ** 2 + np.asarray(y) ** 2
    assert r2.max() <= 1.0
    # uniform in disk -> r^2 uniform in [0,1]
    assert abs(r2.mean() - 0.5) < 0.01


def test_tonemap_gamma_and_clamp():
    accum = jnp.asarray([[[0.25 * 8, 4.0 * 8, 0.0]]], jnp.float32)  # spp=8
    out = np.asarray(film.tonemap(accum, 8))
    np.testing.assert_allclose(out[0, 0], [0.5, 0.999, 0.0], atol=1e-6)


def test_png_roundtrip(tmp_path):
    r = np.random.default_rng(2)
    img = r.integers(0, 256, size=(17, 23, 3), dtype=np.uint8)
    p = str(tmp_path / "x.png")
    film.write_png(p, img)
    back = film.read_png(p)
    np.testing.assert_array_equal(img, back)


def test_perlin_soa_matches_rows():
    """The SoA perlin (hot path) must equal the rows-based reference
    implementation (kept as the readable oracle)."""
    from go_raytracing_tpu.materials import textures as tex
    from go_raytracing_tpu.core.vec3 import V3

    r = np.random.default_rng(0)
    p = jnp.asarray(r.uniform(-8, 8, size=(512, 3)), jnp.float32)
    rows = np.asarray(tex.perlin_turb(p, 7))
    soa = np.asarray(tex.perlin_turb_soa(V3.from_rows(p), 7))
    np.testing.assert_allclose(soa, rows, rtol=1e-4, atol=1e-5)
    rows_n = np.asarray(tex.perlin_noise(p))
    soa_n = np.asarray(tex.perlin_noise_soa(V3.from_rows(p)))
    np.testing.assert_allclose(soa_n, rows_n, rtol=1e-4, atol=1e-5)
    # structural sanity: zero-mean-ish gradient noise, turbulence >= 0
    assert abs(rows_n.mean()) < 0.05
    assert rows_n.std() > 0.05
    assert (soa >= 0).all() and soa.std() > 0.05


def test_rows_segment_sum_matches_scatter_oracle():
    """Sorted segmented-scan bin sums == scatter-add, including heavy
    duplication (the env texel cotangent profile), empty bins, and
    out-of-range drop semantics (DESIGN.md 7a accuracy bar: the global-
    cumsum variant lost 0.7% on small segments; this one must not)."""
    from go_raytracing_tpu.core.segsum import rows_segment_sum

    r = np.random.default_rng(0)
    n_bins = 257
    # heavy duplication: 80% of rows in 4 hot bins, rest uniform, some out of range
    ids = np.where(
        r.uniform(size=20_000) < 0.8,
        r.choice([3, 50, 51, 200], size=20_000),
        r.integers(0, n_bins + 40, size=20_000),
    ).astype(np.int32)
    rows = r.normal(size=(20_000, 12)).astype(np.float32)
    # tiny-magnitude rows in a small bin next to a huge bin: the
    # cancellation trap for prefix-differencing
    rows[ids == 51] *= 1e-5
    got = np.asarray(rows_segment_sum(jnp.asarray(ids), jnp.asarray(rows),
                                      n_bins))
    want = np.zeros((n_bins, 12), np.float64)
    np.add.at(want, ids[ids < n_bins], rows[ids < n_bins].astype(np.float64))
    np.testing.assert_allclose(got, want, rtol=3e-5, atol=1e-6)
    # small-segment relative accuracy specifically
    small = want[51]
    np.testing.assert_allclose(got[51], small, rtol=1e-4)


def test_rows_segment_sum_all_one_bin():
    from go_raytracing_tpu.core.segsum import rows_segment_sum

    rows = jnp.ones((4096, 3), jnp.float32)
    ids = jnp.zeros((4096,), jnp.int32)
    got = np.asarray(rows_segment_sum(ids, rows, 8))
    assert got[0, 0] == 4096.0
    assert np.all(got[1:] == 0.0)
